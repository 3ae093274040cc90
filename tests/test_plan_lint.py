"""Suite-wide physical-plan lint: EVERY registered query's plan must be
free of the two classic 100 TB scale-killers, forever.

* ``CartesianProduct`` — an unconstrained all-pairs join. The suite's few
  deliberate tiny crosses (1-row recall arithmetic, broadcast dimension
  legs) compile to BroadcastNestedLoopJoin, so any CartesianProduct here
  is an accident (e.g. a join condition silently dropped by a refactor).
* ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan. All
  cleaning/scoring/fingerprinting is built-in Column expressions; Python
  appears only as Arrow-batched pandas operators (FlatMapGroupsInPandas /
  FlatMapCoGroupsInPandas / MapInPandas), which render differently.

Compiling all plans also guarantees every query ANALYZES against the
testdata schema — a column typo or a bad lambda fails here in seconds,
without executing anything.
"""

from etl_edi_data_scrapper_spark.suite import QUERIES


def test_no_cartesian_products_or_row_python_udfs_anywhere(spark, sf_dir):
    offenders: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        bad = [
            marker
            for marker in ("CartesianProduct", "BatchEvalPython")
            if marker in plan
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"scale-killer operators in plans: {offenders}"

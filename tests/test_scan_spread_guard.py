"""The size-gated small-scan spread guard (functions/clustering.py):
byte-size conf parsing, private-API hardening, and the gate decisions."""

from pyspark.sql import functions as F

from etl_edi_data_scrapper_spark.functions.clustering import (
    _SPREAD_FLOOR_BYTES,
    _UNKNOWN_SIZE,
    _parse_bytes,
    _plan_size_bytes,
    _spread_small_scan,
)


def test_parse_bytes_suffixes():
    # the r8 digit-strip bug read '128m' as 128 BYTES
    assert _parse_bytes("134217728") == 134217728
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("128M") == 128 << 20
    assert _parse_bytes("128mb") == 128 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("64k") == 64 << 10
    assert _parse_bytes("2t") == 2 << 40
    assert _parse_bytes("1.5g") == 1 << 30  # fractional confs truncate
    assert _parse_bytes("garbage") == 134217728  # unparseable -> default
    assert _parse_bytes("", default=7) == 7


def test_plan_size_bytes_degrades_to_unknown_on_private_api_drift(spark):
    """If the _jdf queryExecution walk raises (Spark Connect, API drift),
    the guard must read 'unknown' (→ safe no-op), not fail mid-plan."""

    class _Raising:
        def __getattr__(self, name):
            raise AttributeError(name)

    df = spark.range(4)
    real = _plan_size_bytes(df)
    assert 0 < real < _UNKNOWN_SIZE  # sanity: the live walk works

    class _Wrapped:
        def __init__(self, inner):
            self.__dict__["_inner"] = inner

        @property
        def _jdf(self):
            raise RuntimeError("connect-mode: no _jdf")

        def __getattr__(self, name):
            return getattr(self.__dict__["_inner"], name)

    assert _plan_size_bytes(_Wrapped(df)) == _UNKNOWN_SIZE


def test_spread_guard_unknown_stats_is_noop(spark):
    df = spark.range(100).select(F.col("id").alias("vec_id"))
    out = _spread_small_scan(df, est_bytes=_UNKNOWN_SIZE)
    assert out is df  # unknown → already-wide branch → untouched


def test_spread_guard_below_floor_is_noop(spark):
    df = spark.range(100)
    assert _spread_small_scan(df, est_bytes=_SPREAD_FLOOR_BYTES - 1) is df


def test_spread_guard_spreads_single_footer(spark):
    # one "footer" worth of bytes above the floor, under maxPartitionBytes
    df = spark.range(100).coalesce(1)
    out = _spread_small_scan(df, est_bytes=64 << 20)
    assert out is not df
    assert "Repartition" in out._jdf.queryExecution().logical().toString() or (
        out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )


def test_spread_guard_respects_suffixed_conf(spark):
    """With maxPartitionBytes configured as '128m', a 64 MB frame is ONE
    scan partition and must spread; the digit-strip bug read 128 bytes,
    concluded 'already wide', and skipped the rescue."""
    old = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    try:
        df = spark.range(100).coalesce(1)
        out = _spread_small_scan(df, est_bytes=64 << 20)
        assert out is not df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)

"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference EDI ETL pipeline (sni10/ETL-EDI-data-scrapper).

Brand-new Spark-first design — NOT a port. The reference's declarative JSON
job config is compiled into a lazy DataFrame plan (scan → map/clean →
keyed merge → enrichment joins → sink) and Catalyst/Tungsten pick the
physical strategy. See SURVEY.md for the blueprint.

Layout:
    functions/   PHP-parity cleaning exprs, text analysis, dedup, similarity
    operators/   mapper (project/rename/clean), keyed merge, enrichment join
    plans/       job-config validation + config→DataFrame compiler
    sources/     reader registry (parquet/csv/json/xml/excel + transports)
    streaming/   Structured Streaming job-consumer (Kafka `edi_input` shape)
"""

from etl_edi_data_scrapper_spark.session import get_spark


def __getattr__(name):
    # lazy: Engine pulls in the full plan stack; keep bare imports cheap
    if name == "Engine":
        from etl_edi_data_scrapper_spark.engine import Engine

        return Engine
    raise AttributeError(name)


__all__ = ["get_spark", "Engine"]
__version__ = "0.1.0"

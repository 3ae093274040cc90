"""Engine facade: the one-object surface a user of the reference switches to.

    from etl_edi_data_scrapper_spark import Engine

    eng = Engine()                                  # builds a tuned session
    df  = eng.run_job(job_config)                   # config → DataFrame
    eng.run_job(job_config, sink="parquet", sink_path="/out")
    q   = eng.consume(source_path="/msgs", sink=my_sink)   # streaming loop

Readers default to the local staged registry; production wires transports
via ``build_registry(...)`` and passes the result in.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from etl_edi_data_scrapper_spark import sinks as sinkmod
from etl_edi_data_scrapper_spark.plans.config import InputConfig
from etl_edi_data_scrapper_spark.plans.pipeline import Reader, aggregate
from etl_edi_data_scrapper_spark.session import get_spark
from etl_edi_data_scrapper_spark.sources.registry import local_registry


class Engine:
    def __init__(
        self,
        spark: SparkSession | None = None,
        readers: dict[int, Reader] | None = None,
    ):
        self.spark = spark or get_spark()
        self.readers = readers or local_registry()

    def compile(self, config: InputConfig | dict[str, Any] | str) -> DataFrame:
        """Config → lazy DataFrame plan (no execution)."""
        return aggregate(self.spark, config, self.readers)

    def run_job(
        self,
        config: InputConfig | dict[str, Any] | str,
        sink: str | None = None,
        sink_path: str | None = None,
        kafka_topic: str = "edi_output",
        kafka_servers: str = "localhost:9092",
        key_col: str | None = None,
    ) -> DataFrame:
        """Compile and optionally execute into a named sink.

        sink: None (return the lazy frame) | 'parquet' | 'jsonl' | 'kafka'
        | 'collect' (returns list of dicts).
        """
        df = self.compile(config)
        if sink is None:
            return df
        if sink == "parquet":
            sinkmod.write_parquet(df, sink_path)
        elif sink == "jsonl":
            sinkmod.write_jsonl(df, sink_path)
        elif sink == "kafka":
            sinkmod.write_kafka(df, topic=kafka_topic,
                                bootstrap_servers=kafka_servers, key_col=key_col)
        elif sink == "collect":
            return sinkmod.collect_rows(df)  # type: ignore[return-value]
        else:
            raise ValueError(f"unknown sink {sink!r}")
        return df

    def consume(
        self,
        sink: Callable[[DataFrame, InputConfig], None],
        source_path: str | None = None,
        kafka_options: dict[str, str] | None = None,
        checkpoint_dir: str | None = None,
        **kwargs,
    ):
        """Streaming job loop (see streaming.consumer.run_job_stream)."""
        from etl_edi_data_scrapper_spark.streaming.consumer import run_job_stream

        return run_job_stream(
            self.spark, self.readers, sink,
            source_path=source_path, kafka_options=kafka_options,
            checkpoint_dir=checkpoint_dir, **kwargs,
        )

    def explain(self, config: InputConfig | dict[str, Any] | str, mode: str = "formatted") -> str:
        """Physical plan for a job — the scale-review tool."""
        df = self.compile(config)
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        )

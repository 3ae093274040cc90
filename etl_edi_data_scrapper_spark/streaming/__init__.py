from etl_edi_data_scrapper_spark.streaming.consumer import run_job_stream

__all__ = ["run_job_stream"]

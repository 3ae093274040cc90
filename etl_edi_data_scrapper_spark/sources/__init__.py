from etl_edi_data_scrapper_spark.sources.registry import local_registry

__all__ = ["local_registry"]

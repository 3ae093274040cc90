from etl_edi_data_scrapper_spark.plans.config import InputConfig, SubSource
from etl_edi_data_scrapper_spark.plans.pipeline import aggregate

__all__ = ["InputConfig", "SubSource", "aggregate"]

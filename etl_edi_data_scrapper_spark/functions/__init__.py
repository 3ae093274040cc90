from etl_edi_data_scrapper_spark.functions import clean

__all__ = ["clean"]

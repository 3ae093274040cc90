from etl_edi_data_scrapper_spark.operators.mapper import map_columns
from etl_edi_data_scrapper_spark.operators.merge import enrich, keyed_merge, with_seq

__all__ = ["map_columns", "keyed_merge", "enrich", "with_seq"]

from .readers import load_sf_tables, read_csv_table, read_parquet_table  # noqa: F401
from .schemas import HR_SCHEMAS, TESTDATA_TABLES  # noqa: F401

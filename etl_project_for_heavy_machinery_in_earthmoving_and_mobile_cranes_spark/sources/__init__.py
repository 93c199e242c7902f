from .readers import (  # noqa: F401
    read_csv,
    read_parquet,
    read_xlsx_as_df,
    write_parquet,
)

"""History maintenance (O3 union + O5 schema check).

Reference: xlsx concat after a column-name set check (nb cells 77-83,
prog.py:450-468).  Engine shape: a partitioned Parquet table keyed by
batch month — append is a metadata operation, year slices prune
partitions, and re-runs are idempotent via partition overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SchemaMismatch(ValueError):
    pass


def check_col_names(a: DataFrame, b: DataFrame) -> None:
    """O5: symmetric difference of column-name sets must be empty."""
    diff = set(a.columns) ^ set(b.columns)
    if diff:
        raise SchemaMismatch(f"column sets differ: {sorted(diff)}")


def append_history(hist: DataFrame, batch: DataFrame) -> DataFrame:
    """O3: schema-checked union (order-independent by name)."""
    check_col_names(hist, batch)
    return hist.unionByName(batch)


def write_history(df: DataFrame, path: str, partition_col: str = "month") -> None:
    """Partitioned Parquet append; dynamic partition overwrite makes a
    re-run of the same batch idempotent."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def year_slice(
    df: DataFrame, date_col: str, year: int, fmt: str | None = None
) -> DataFrame:
    """F3: partition-prunable year filter.  ``fmt`` parses string dates
    (e.g. the reference's 'yyyy/MM/dd'); date/timestamp columns pass
    through untouched."""
    c = F.col(date_col)
    if fmt is not None:
        c = F.to_date(c, fmt)
    elif dict(df.dtypes).get(date_col) == "string":
        c = F.coalesce(F.to_date(c), F.to_date(c, "yyyy/MM/dd"))
    return df.filter(F.year(c) == year)

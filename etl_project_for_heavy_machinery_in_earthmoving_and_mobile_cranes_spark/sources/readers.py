"""Sources & sinks (S1–S5).

Canonical storage is Parquet (columnar, splittable, predicate/projection
pushdown); CSV supported with explicit schemas; xlsx exists only at the
ingestion edge (reference S1/S2 read xlsx) via a pandas conversion on
the driver — xlsx files are small dims/batches by nature, never the
100 TB fact path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Explicit schema always (SURVEY §1.3: no inferred schemas);
    PERMISSIVE + columnNameOfCorruptRecord preserves bad rows for the
    validation stage instead of failing the job."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("mode", mode)
        .csv(path)
    )


def read_xlsx_as_df(
    spark: SparkSession,
    path: str,
    sheet_name: str | int = 0,
    schema: T.StructType | None = None,
) -> DataFrame:
    """S1/S2 edge converter: xlsx → pandas → Spark.  Driver-side by
    design — xlsx inputs are small batch extracts (10³ rows in the
    reference); big data arrives as Parquet/CSV."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError as e:  # pragma: no cover - openpyxl not installed
        raise NotImplementedError(
            "xlsx ingestion needs pandas+openpyxl on the driver"
        ) from e
    if schema is not None:
        return spark.createDataFrame(pdf, schema=schema)
    return spark.createDataFrame(pdf)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """``compression``: parquet codec override ("zstd", "snappy",
    "gzip", "none"); default None keeps the session codec.  At 100 TB
    the codec is a first-order storage/scan-cost knob — zstd typically
    reads smaller AND decompresses faster than gzip; text-heavy corpus
    tables compress several-fold."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """JSON-lines source (the lingua franca of LLM training corpora).
    Explicit schema: schema inference would scan the full 100 TB input
    once before the real job even starts."""
    return spark.read.schema(schema).option("mode", mode).json(path)


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """CSV export at the edge (header on by default; engine-canonical
    format stays parquet).  Compression off so downstream line tools work."""
    w = df.write.mode(mode).option("header", header)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


def write_jsonl(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = (), mode: str = "overwrite"
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC source — same columnar pushdown/pruning guarantees as
    parquet via Spark's built-in vectorized ORC reader (no extra
    packages).  Some lakehouse estates are ORC-native (Hive legacy);
    the engine treats it as a first-class interchange format."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_by: tuple[str, ...],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Layout-aware write: range-partition on ``cluster_by`` then sort
    within each file on the same keys.  Every output file covers a
    disjoint key range and every parquet row group carries tight
    min/max stats on the cluster keys, so later range/point predicates
    skip whole files and row groups at scan time — the poor man's
    Z-order, and the single highest-leverage layout choice for a table
    that is always filtered on the same key (date, tenant, shard).

    One range-exchange (sampled boundaries, skew-resistant) + a
    partition-local sort; no global sort."""
    cols = [F.col(c) for c in cluster_by]
    out = df.repartitionByRange(*([num_files] if num_files else []), *cols)
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 256,
) -> int:
    """Small-file compaction: rewrite a directory into ~target-sized
    files.  Streaming sinks and over-parallel writers fragment tables
    into many tiny files; scans then pay per-file open cost and lose
    row-group locality.  File count is estimated from on-disk bytes —
    no shuffle beyond the coalesce.  Returns the file count written."""
    import math

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)  # noqa: SLF001
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    size_bytes = fs.getContentSummary(jvm_path).getLength()
    n_files = max(1, math.ceil(size_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    num_files: int = 8,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) layout for tables filtered on ANY of the
    cluster columns, not just a leading key.

    Each column is bucketed into 2^bits equi-width cells (bounds from
    one tiny min/max agg), the cell indexes are bit-interleaved into a
    single z-value, and the table is range-partitioned + sorted on z.
    Every file then covers a small hyper-rectangle of the key space, so
    parquet min/max stats skip most files for a predicate on EITHER
    column — where ``write_clustered_parquet`` on (x, y) only helps x.
    Cost at any scale: one scalar agg + one range exchange + a
    partition-local sort — same exchange count as single-key
    clustering."""
    stats = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    ).collect()[0]
    n = 1 << bits
    cells = []
    for c in cols:
        mn = float(stats[f"__mn_{c}"])
        span = (float(stats[f"__mx_{c}"]) - mn) or 1.0
        cells.append(
            F.least(
                F.lit(n - 1), F.floor((F.col(c) - F.lit(mn)) / F.lit(span) * n)
            ).cast("long")
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, cell in enumerate(cells):
            z = z + F.shiftright(cell, i).bitwiseAND(F.lit(1)) * F.lit(
                1 << (i * len(cols) + j)
            )
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed_table(
    df,
    table: str,
    bucket_cols: "list[str]",
    num_buckets: int = 32,
    sort_cols: "list[str] | None" = None,
    mode: str = "overwrite",
) -> None:
    """Persist a Hive-bucketed (optionally sorted) managed table —
    the co-located-join primitive: two tables bucketed on the same
    keys with the same bucket count join WITHOUT any shuffle (each
    task reads bucket i of both sides), and bucket-sorted data skips
    the sort of a sort-merge join too.  This is THE amortization for
    a 100 TB fact table that joins on the same key every day: pay the
    shuffle once at write time, never again at read time.

    Bucketing metadata lives in the catalog, so this goes through
    ``saveAsTable`` (a plain ``.parquet(path)`` write cannot carry
    it); readers use ``spark.table(name)``.  The bucket function is
    Spark's Murmur3 — stable across Spark versions but engine-
    specific, which is why bucketed layout is a performance contract,
    not a data-exchange format."""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def footer_stats(spark, path: str, cols: "list[str]"):
    """Min/max/count for ``cols`` computed from parquet FOOTER
    statistics alone — Spark's DSv2 aggregate pushdown
    (``PushedAggregation`` in the scan) answers them without reading a
    single data page.  At 100 TB this is the data-discovery primitive:
    profiling a lake of cold tables costs footer reads, not scans.

    Pushdown needs the v2 parquet source and no data filters; both
    confs are set for the build of THIS plan and restored after.  Rows
    with NULLs are handled by the footers' own null accounting (parquet
    min/max exclude nulls; count(*) includes them).  Returns one row:
    ``cnt`` + ``<col>_min`` / ``<col>_max`` per column."""
    from pyspark.sql import functions as F

    v1_key = "spark.sql.sources.useV1SourceList"
    agg_key = "spark.sql.parquet.aggregatePushdown"
    old_v1, old_agg = spark.conf.get(v1_key), spark.conf.get(agg_key)
    try:
        spark.conf.set(v1_key, "")
        spark.conf.set(agg_key, "true")
        aggs = [F.count("*").alias("cnt")]
        for c in cols:
            aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
        df = spark.read.parquet(path).agg(*aggs)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "PushedAggregation: []" in plan or "PushedAggregation" not in plan:
            raise ValueError(
                "aggregate pushdown did not engage for "
                f"{path} {cols} — column type unsupported by footer stats"
            )
        return df.collect()[0]
    finally:
        spark.conf.set(v1_key, old_v1)
        spark.conf.set(agg_key, old_agg)

"""Deterministic text augmentation for LLM pre-training pipelines.

Span-corruption-style masking (the T5 / UL2 denoising objective's data
prep): a fraction of tokens is replaced by a sentinel and emitted
separately as the prediction target.  Selection is a pure function of
(doc, position) via the same md5 construction the dedup/sampling
family uses — reruns, backfills, and other engines mask the identical
positions, which row-random functions (``rand()``) cannot promise.

Scale notes
-----------
Pure per-row expression work: tokenize → one ``transform`` + one
indexed ``filter`` over the token array — no shuffle, no UDF, fully
whole-stage-codegen.  A 100 TB corpus masks in a single map pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_for_dedup

_BUCKETS = 1 << 32


def _pos_bucket(id_col: Column, pos: Column, seed: int) -> Column:
    """32-bit md5 bucket of (seed, doc id, token position) — the
    per-position analog of dedup.md5_hash64."""
    key = F.concat(
        F.lit(f"{seed}:"),
        id_col.cast("string"),
        F.lit(":"),
        pos.cast("string"),
    )
    return F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10).cast(
        "bigint"
    )


def span_corruption(
    df: DataFrame,
    id_col: str,
    text_col: str,
    mask_rate: float = 0.15,
    seed: int = 0,
    sentinel: str = "<extra_id>",
) -> DataFrame:
    """Mask ~``mask_rate`` of normalized tokens per document: token i of
    doc d is masked iff md5-bucket(seed, d, i) < rate — deterministic,
    position-independent Bernoulli.  Returns the corrupted text, the
    masked tokens (space-joined, in order — the denoising target), and
    audit counts."""
    cut = int(mask_rate * _BUCKETS)
    idc = F.col(id_col)
    toks = F.filter(
        F.split(normalize_for_dedup(F.col(text_col)), " "), lambda x: x != ""
    )

    def masked(x: Column, i: Column) -> Column:
        return _pos_bucket(idc, i, seed) < cut

    corrupted = F.array_join(
        F.transform(toks, lambda x, i: F.when(masked(x, i), sentinel).otherwise(x)),
        " ",
    )
    targets = F.filter(toks, masked)
    return df.select(
        idc,
        corrupted.alias("corrupted"),
        F.array_join(targets, " ").alias("target"),
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(targets).cast("int").alias("n_masked"),
    )

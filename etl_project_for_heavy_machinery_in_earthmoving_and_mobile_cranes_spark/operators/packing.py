"""Sequence packing: assign documents to fixed-token-budget training
chunks.  The classic pre-training batching step — concatenate documents
until a chunk exceeds the token budget, then start the next chunk.

Exact greedy packing is a sequential scan (each chunk boundary depends
on every prior document), which cannot parallelize.  The scale design
is bucketed greedy: documents are hash-partitioned into ``num_buckets``
independent streams, and each stream packs greedily in deterministic
(doc id) order.  Buckets pack in parallel — one shuffle (the window
partition), no driver-side loop — and the packing quality loss vs a
single global stream is negligible when buckets hold thousands of
documents each.  chunk ids are (bucket, seq) and stable across reruns
because the hash bucket and the in-bucket order are both pure functions
of the doc id.

The boundary rule is offset-aligned: conceptually concatenate the
bucket's documents into one token stream; chunk ``k`` owns stream
offsets ``[k*budget, (k+1)*budget)``; a document belongs to the chunk
where it STARTS.  Documents are never split, so a chunk can overflow
by part of one document — but the next boundary stays aligned, so fill
is self-correcting and every chunk id covers exactly ``budget`` stream
tokens amortized.  (True reset-at-boundary greedy packing needs a
sequential scan per stream — a recursive dependency no window function
expresses; offset alignment is the one-window, one-shuffle form with
the same packing quality.)  Callers that need hard caps split
oversized documents upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket


def pack_documents(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_buckets: int = 64,
) -> DataFrame:
    """Adds ``bucket`` and ``chunk_id``: greedy doc-preserving packing
    into ~``budget``-token chunks within each of ``num_buckets``
    hash-partitioned streams.

    chunk boundary = cumulative tokens of PRIOR docs in the bucket,
    integer-divided by budget: doc i starts a new chunk iff the stream
    crossed a budget multiple before it.  One window (partitioned by
    bucket, ordered by id) — a single shuffle on the bucket key.
    """
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn(
        "bucket", hash_bucket(F.col(id_col).cast("string")) % num_buckets
    ).withColumn("chunk_id", F.floor(prior / F.lit(budget)).cast("bigint"))


def chunk_stats(packed: DataFrame, tokens_col: str) -> DataFrame:
    """Per-chunk fill statistics — the packing-quality report: docs per
    chunk and total tokens (>= budget except each bucket's last chunk)."""
    return packed.groupBy("bucket", "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(tokens_col).cast("bigint").alias("chunk_tokens"),
    )


# sentence = maximal run of non-terminals plus its terminal run, OR the
# trailing terminator-less fragment.  Deliberately lookaround-free so
# both Java regex (Spark) and RE2 (the DuckDB oracle) evaluate it
# identically.
SENTENCE_RE = r"[^.!?]*[.!?]+|[^.!?]+$"


def sentence_chunks(
    df: DataFrame, id_col: str, text_col: str, budget: int
) -> DataFrame:
    """Sentence-boundary-aware chunking — the RAG-indexing variant that
    never cuts mid-sentence: the text splits into sentences on
    terminal-punctuation runs, and CONSECUTIVE sentences pack into
    ~``budget``-token chunks by the same offset-aligned rule as
    ``pack_documents``, applied within the document (a sentence belongs
    to the chunk where its token-stream offset starts; a chunk can
    overflow by one sentence tail but boundaries stay aligned).

    Output: (id, chunk_idx, n_sentences, n_tokens, chunk_text) —
    ``chunk_text`` re-joins the trimmed sentences in order.

    Scale shape: sentence extraction is a narrow posexplode; ONE
    doc-keyed window computes running token offsets; the (id, chunk)
    re-aggregation groups on a superset of the window key, so the
    corpus shuffles once.  Documents with no sentences (empty text)
    produce no rows.
    """
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_RE), F.lit(0)),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )
    rows = df.select(F.col(id_col), F.posexplode(sents).alias("__sidx", "__sent"))
    stoks = F.size(F.filter(F.split(F.col("__sent"), r"\s+"), lambda t: t != ""))
    rows = rows.withColumn("__stoks", stoks)
    w = (
        Window.partitionBy(id_col)
        .orderBy("__sidx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("__stoks").over(w), F.lit(0))
    chunked = rows.withColumn(
        "chunk_idx", F.floor(prior / F.lit(budget)).cast("bigint")
    )
    return chunked.groupBy(F.col(id_col), F.col("chunk_idx")).agg(
        F.count("*").cast("bigint").alias("n_sentences"),
        F.sum("__stoks").cast("bigint").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__sidx", "__sent"))),
                lambda s: s["__sent"],
            ),
            " ",
        ).alias("chunk_text"),
    )


def chunk_with_overlap(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    chunk_tokens: int,
    overlap: int,
) -> DataFrame:
    """Sliding-window document chunking with overlap (the RAG-indexing
    twin of pack_documents): each document's token array is cut into
    windows of ``chunk_tokens`` advancing by ``chunk_tokens − overlap``,
    so consecutive chunks share ``overlap`` tokens of context.

    ``tokens_col`` is an array<string> column.  Window starts are
    generated per row with ``sequence()`` (JVM-side, no driver loop)
    and sliced with ``slice()`` — a pure narrow explode, no shuffle at
    all; output size is input tokens × (1 + overlap/(chunk−overlap)),
    the explicit replication knob.  Returns
    (id, chunk_idx, n_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.col(tokens_col)
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step))
    out = (
        df.select(F.col(id_col), toks.alias("__t"), F.explode(starts).alias("__s"))
        .filter((F.col("__s") == 0) | (F.col("__s") < F.size("__t")))
        .select(
            F.col(id_col),
            (F.col("__s") / step).cast("int").alias("chunk_idx"),
            F.least(F.lit(chunk_tokens), F.size("__t") - F.col("__s")).alias(
                "n_tokens"
            ),
            F.array_join(
                F.slice(F.col("__t"), F.col("__s") + 1, F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
        )
    )
    return out

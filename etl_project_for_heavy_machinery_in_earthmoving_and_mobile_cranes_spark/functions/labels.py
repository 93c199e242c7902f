"""Conditional labeling cascades (C1–C7) as Column expressions.

These reproduce the reference's ordered ``when`` semantics; reference
bugs are implemented as *documented intent* with the divergences noted
(SURVEY §7.3, COMPAT.md).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UNKNOWN = "UNKNOWN"

# ---------------------------------------------------------------------------
# C1 — excavator type rules (prog.py:127-138).  Ordered; the final 'tire'
# rule is UNCONDITIONAL in the reference (overwrites known types) and that
# behavior is observable in golden output, so it is kept.
# ---------------------------------------------------------------------------


def excavator_type(desc: Column, cur_type: Column) -> Column:
    # Flat when-chain (no progressive `out` nesting — that triples the
    # expression tree per rule).  Precedence encoded directly: the
    # unconditional 'tire' overwrite first, then keep-known, then the
    # first matching unknown-guarded rule.
    d = F.upper(desc)
    known = cur_type.isNotNull() & (cur_type != UNKNOWN)
    return (
        F.when(d.contains("TIRE"), "WHEEL EXCAVATOR")  # unconditional (prog.py:138)
        .when(known, cur_type)
        .when(d.contains("CRAWLER EXCAVATOR"), "EXCAVATOR")
        # prog.py:132: contains('wheel excavator') AND contains('wheel')
        # — the second term is redundant, NOT an OR
        .when(d.contains("WHEEL EXCAVATOR"), "WHEEL EXCAVATOR")
        .when(d.contains("AMPHIBIOUS"), "AMPHIBIOUS EXCAVATOR")
        .otherwise(cur_type)
    )


# ---------------------------------------------------------------------------
# C2 — crane type rules (prog.py:140-144)
# ---------------------------------------------------------------------------


def crane_type(desc: Column, cur_type: Column) -> Column:
    d = F.upper(desc)
    known = cur_type.isNotNull() & (cur_type != UNKNOWN)
    return (
        # unconditional (prog.py:144)
        F.when(d.contains("CRAWLER") & d.contains("TELESCOPIC"), "CRAWLER CRANE (TELESCOPIC_BOOM)")
        .when(known, cur_type)
        .when(d.contains("WHEEL") | d.contains("TIRE"), "WHEELED CRANE")
        .when(d.contains("ROUGH"), "ROUGH-TERRAIN CRANE")
        .when(d.contains("CRAWLER"), "CRAWLER CRANE")
        .otherwise(cur_type)
    )


# ---------------------------------------------------------------------------
# C3 — new/used classifier (prog.py:146-158).
# Reference bug: multi-word keywords ('SECOND HAND', '2ND HAND') can never
# equal a single token.  Documented intent is implemented: multi-word
# keywords match as substrings, single-word keywords token-exact.
# ---------------------------------------------------------------------------

USED_TOKENS = ["USED", "SECONDHAND", "OLD", "REFURBISH"] + [str(y) for y in range(1950, 2019)]
USED_PHRASES = ["SECOND HAND", "2ND HAND"]


def new_or_used(desc: Column, strict_reference_compat: bool = False) -> Column:
    """``strict_reference_compat=True`` reproduces the reference bug
    where multi-word keywords can never equal a single token (COMPAT #4);
    default implements the documented intent (phrases match as
    substrings)."""
    d = F.upper(desc)
    tokens = F.split(d, " ")
    token_hit = F.arrays_overlap(tokens, F.array(*[F.lit(t) for t in USED_TOKENS]))
    used = token_hit
    if not strict_reference_compat:
        phrase_hit = F.lit(False)
        for p in USED_PHRASES:
            phrase_hit = phrase_hit | d.contains(p)
        used = used | phrase_hit
    label = F.when(used, "used").otherwise("new")
    # override: NEW|UNUSED substring flips back to new (prog.py:157-158)
    return F.when(d.rlike("NEW|UNUSED"), "new").otherwise(label)


# ---------------------------------------------------------------------------
# C4 — parts flag (prog.py:161-162)
# ---------------------------------------------------------------------------


def is_parts(desc: Column) -> Column:
    return F.upper(desc).rlike("CKD|SKD|PARTIAL")


# ---------------------------------------------------------------------------
# C5 — capacity binning (prog.py:343-402 define_load_interval).
# The reference loops over data-dependent bucket bounds; the closed form
# below is equivalent (documented intent: no gap for L>10) and needs no
# driver-side data pass — essential at scale.
# ---------------------------------------------------------------------------


def load_interval(value: Column, width: int = 10, kind: str = "excavator") -> Column:
    """Bucket a tonnage value into labels '<5T', '5-10T', '20-30T', ….

    ``value`` is the evaluate column (capacity, else unit weight for
    excavators — caller composes with ``coalesce``).
    """
    lo = (F.floor(value / width) * width).cast("long")
    bucket = F.concat(lo.cast("string"), F.lit("-"), (lo + width).cast("string"), F.lit("T"))
    if kind == "excavator":
        return (
            F.when(value.isNull() | (value == 0), UNKNOWN)
            .when(value < 5, "<5T")
            .when(value < 10, "5-10T")
            .otherwise(bucket)
        )
    # crane: single '<L' bucket then width buckets (prog.py:385-402)
    return (
        F.when(value.isNull() | (value == 0), UNKNOWN)
        .when(value < width, f"<{width}T")
        .otherwise(bucket)
    )


# ---------------------------------------------------------------------------
# C6 — fixed working-scenario bins (prog.py:406-431)
# ---------------------------------------------------------------------------


def excavator_type_interval(value: Column) -> Column:
    return (
        F.when(value.isNull() | (value == 0), UNKNOWN)
        .when(value < 5, "<5T")
        .when(value < 10, "5-10T")
        .when(value < 30, "10-30T")
        .when(value < 70, "30-70T")
        .when(value < 90, "70-90T")
        .otherwise("≥90T")
    )


# ---------------------------------------------------------------------------
# C7 — sentinel rendering at the export boundary only (SURVEY §1.4):
# internal representation is typed NULL; 'UNKNOWN' appears on write.
# ---------------------------------------------------------------------------


def render_unknown(col: Column) -> Column:
    return F.coalesce(col.cast("string"), F.lit(UNKNOWN))

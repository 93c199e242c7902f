"""Text normalization & extraction as pure Column expressions (T1–T7).

Reference semantics: ``data_processing_program_20240520.py`` (cited per
function).  Everything here is a JVM-side expression — no Python UDFs —
so the hot path stays inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# T2 — special-brand aliasing (prog.py:1-18 deal_special_brand)
# Supplier-alias → canonical brand token prepended to the text.
# NOTE the 'CAT' rule is token-exact (prog.py:2,6): 'CAT' must be a
# whitespace token, not a substring (else CATERPILLAR would self-match).
# ---------------------------------------------------------------------------

# (alias substring, canonical brand, token_exact) — exact alias strings
# per prog.py:1-18
BRAND_ALIASES: list[tuple[str, str, bool]] = [
    ("XUZHOU CONSTRUCTION MACHINERY", "XCMG", False),
    ("CAT", "CATERPILLAR", True),
    ("MANITOWOC", "GROVE", False),
    ("MARUBENI", "KOMATSU", False),
    ("TOYOTA TSUSHO CORPORATION", "TAKEUCHI", False),
    ("SHANDONG LINGONG CONSTRUCTION MACHINERY", "SDLG", False),
    ("HİDROMEK", "HIDROMEK", False),  # Turkish dotted-İ (prog.py:16)
]


def apply_brand_aliases(col: Column) -> Column:
    """Prepend the canonical brand token(s) when an alias is present.

    All hits are evaluated against the BASE column and prepended in one
    concat — NOT as a chain of ``when(...).otherwise(prev)`` layers,
    which would triple the expression tree per alias (3^N growth) and
    break whole-stage codegen.  Semantics match the reference's
    sequential prepends except multi-alias prepend order, which is
    unobservable (brand priority comes from ref_idx, not position).
    """
    hits = []
    for alias, canon, token_exact in BRAND_ALIASES:
        if token_exact:
            hit = F.array_contains(F.split(col, " "), alias)
        else:
            hit = col.contains(alias)
        hits.append(F.when(hit & ~col.contains(canon), F.lit(canon)))
    prefix = F.concat_ws(" ", *hits)
    return F.when(prefix != "", F.concat(prefix, F.lit(" "), col)).otherwise(col)


# ---------------------------------------------------------------------------
# T1 — pre_processing (prog.py:22-37): to-str, punctuation→space, strip
# '/' and '*', collapse whitespace (T3, prog.py:52,55), trim, UPPER.
# ---------------------------------------------------------------------------


def collapse_ws(col: Column) -> Column:
    """T3: ``re.sub(r'\\s+', ' ')``."""
    return F.regexp_replace(col, r"\s+", " ")


def normalize_text(col: Column, alias_brands: bool = False) -> Column:
    """T1 pipeline.  ``alias_brands`` also applies T2 first (the reference
    runs deal_special_brand inside pre_processing for supplier/description)."""
    c = col.cast("string")
    c = F.regexp_replace(c, r"[,()\[\]:;]", " ")
    c = F.regexp_replace(c, r"[/*]", "")
    c = F.upper(F.trim(collapse_ws(c)))
    if alias_brands:
        c = apply_brand_aliases(c)
    return c


def despace(col: Column) -> Column:
    """T4: model de-spacing (nb cells 60/82) — ``model.replace(' ','')``."""
    return F.regexp_replace(F.trim(col), " ", "")


# ---------------------------------------------------------------------------
# T5 — spelled-out quantity words (prog.py:582-607 extract_number_word)
# ---------------------------------------------------------------------------

NUMBER_WORDS = {
    "ONE": 1, "TWO": 2, "THREE": 3, "FOUR": 4, "FIVE": 5,
    "SIX": 6, "SEVEN": 7, "EIGHT": 8, "NINE": 9, "TEN": 10,
}
_NUMBER_WORD_RE = r"\b(" + "|".join(NUMBER_WORDS) + r")\b"


def extract_number_word(col: Column) -> Column:
    """Return the digit for the first spelled-out ONE..TEN, else NULL."""
    word = F.regexp_extract(F.upper(col), _NUMBER_WORD_RE, 1)
    mapping = F.create_map(
        *[x for w, n in NUMBER_WORDS.items() for x in (F.lit(w), F.lit(n))]
    )
    return F.when(word != "", F.element_at(mapping, word)).otherwise(F.lit(None))


# ---------------------------------------------------------------------------
# T6 — unit-count extraction (prog.py:550-558 extract_units)
# ---------------------------------------------------------------------------

UNITS_RE = r"(\d+)\s*UNITS"


def extract_units(col: Column) -> Column:
    """``(\\d+)\\s*UNITS`` → INT, NULL when absent."""
    hit = F.regexp_extract(F.upper(col), UNITS_RE, 1)
    return F.when(hit != "", hit.cast("int")).otherwise(F.lit(None))


# ---------------------------------------------------------------------------
# T7 — capacity-from-text (prog.py:239-252 search_capacity)
# ---------------------------------------------------------------------------

CAPACITY_RE = r"\b(\d+(?:\.\d+)?)\s*(?:METRIC\s*)?TONS?\b"


def extract_capacity_tons(col: Column) -> Column:
    """``N [METRIC] TON(S)`` → DOUBLE, NULL when absent."""
    hit = F.regexp_extract(F.upper(col), CAPACITY_RE, 1)
    return F.when(hit != "", hit.cast("double")).otherwise(F.lit(None))


# ---------------------------------------------------------------------------
# F2 — irrelevant-keyword anti-filter (prog.py:119-125): 31 unique
# case-insensitive substrings; matching rows are dropped.
# ---------------------------------------------------------------------------

# exact list per prog.py:119-125 (incl. its duplicates, deduped here;
# matching is case-insensitive substring)
IRRELEVANT_KEYWORDS = [
    "CARRIER", "TELESCOPLADER", "HARBOUR", "OPEN SHEET", "STACK",
    "BOAT", "BACKHOE", "SKID", "ROLLER", "BENZ", "TELEHANDLER",
    "LOADER", "FORK", "PAVER", "STACKER", "MATERIAL HANDLER",
    "BRIDGE", "REACH", "HANDER", "GRABBER", "GANTRY", "BACK HOE",
    "PORT", "MERCEDES", "VİNCE", "SPIDER", "PIPE", "HANDLING",
    "GLASS CRANE", "LOAD", "GRADER",
]


def irrelevant_keyword_filter(col: Column) -> Column:
    """True for rows to KEEP (no irrelevant keyword present)."""
    import re as _re

    alt = "|".join(_re.escape(k) for k in IRRELEVANT_KEYWORDS)
    return ~F.upper(col).rlike(alt)

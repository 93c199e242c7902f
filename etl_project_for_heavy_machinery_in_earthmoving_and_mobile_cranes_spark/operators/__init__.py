from . import (  # noqa: F401
    analysis,
    dedup,
    fuzzy_join,
    fx,
    history,
    outliers,
    range_join,
    similarity,
    textstats,
)

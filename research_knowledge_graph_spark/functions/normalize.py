"""Label normalization + confidence clamping as pure Catalyst expressions.

Replicates the reference's ``ValidationAgent._normalize_label``
(``src/agents/validation_agent.py:96-119``) byte-for-byte on ASCII input:

1. sanitize (drop control chars)
2. strip + collapse internal whitespace
3. per word: preserve ALL-CAPS acronyms (``word.isupper() and len(word) > 1``),
   else Python ``str.capitalize()`` (first char upper, REST LOWERED).

Pinned vectors (reference ``tests/test_entity_extraction.py:36-43``):
``"  3d gaussian splatting  " -> "3d Gaussian Splatting"`` (note: ``"3d"``
stays lowercase-d because ``str.capitalize`` upper-cases the digit, a no-op,
and lowers the tail), ``"PSNR" -> "PSNR"``,
``"neural radiance fields" -> "Neural Radiance Fields"``.

NOT ``initcap``: Spark's initcap lowercases acronym tails ("PSNR"→"Psnr").

Branch-coincidence note: for caseless words ("123", "--") the SQL guard
``w = upper(w)`` takes the preserve branch while Python ``isupper()`` is False
and takes the capitalize branch — but ``capitalize`` is the identity on
caseless words, so outputs agree. Divergence is only possible on exotic
unicode (titlecase digraphs, non-ASCII whitespace); `normalize_label_py` is
the exact twin used by tests and available as a pandas-UDF fallback.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from research_knowledge_graph_spark.functions.sanitize import (
    sanitize_string_col,
    sanitize_string_py,
)


def normalize_label_col(col: Column | str) -> Column:
    """Column form of the reference's label normalization."""
    c = F.col(col) if isinstance(col, str) else col
    s = sanitize_string_col(c)
    words = F.filter(F.split(s, "\\s+"), lambda w: w != F.lit(""))
    normalized = F.transform(
        words,
        lambda w: F.when(
            (w == F.upper(w)) & (F.length(w) > 1),
            w,  # preserve acronyms
        ).otherwise(
            F.concat(F.upper(F.substring(w, 1, 1)), F.lower(F.substring(w, 2, 2_000_000)))
        ),
    )
    return F.array_join(normalized, " ")


# DuckDB-oracle equivalent of normalize_label_col (same algebra, same output).
NORMALIZE_LABEL_SQL_TEMPLATE = (
    "array_to_string(list_transform("
    "  list_filter(string_split_regex(regexp_replace({col}, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g'), '\\s+'), w -> w != ''),"
    "  w -> CASE WHEN w = upper(w) AND length(w) > 1 THEN w"
    "       ELSE upper(substr(w, 1, 1)) || lower(substr(w, 2)) END"
    "), ' ')"
)


def normalize_label_py(label: str) -> str:
    """Exact Python twin of the reference algorithm (not copied — re-derived
    from the documented semantics at ``validation_agent.py:96-119``)."""
    label = sanitize_string_py(label)
    words = label.split()
    out = []
    for w in words:
        if w.isupper() and len(w) > 1:
            out.append(w)
        else:
            out.append(w.capitalize())
    return " ".join(out)


def clamp_confidence_col(col: Column | str, default: float = 0.5) -> Column:
    """Confidence validation (reference ``validation_agent.py:134-138``):
    missing -> 0.5; else clamp into [0, 1]."""
    c = F.col(col) if isinstance(col, str) else col
    # coalesce FIRST: Spark's greatest/least skip nulls, so a null confidence
    # would otherwise clamp to 0.0 instead of defaulting to 0.5.
    return F.least(
        F.greatest(F.coalesce(c.cast("double"), F.lit(float(default))), F.lit(0.0)),
        F.lit(1.0),
    )

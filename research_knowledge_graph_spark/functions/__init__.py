"""Scalar/column function layer: pure Catalyst expressions wherever possible.

Python "twin" implementations are provided next to each expression for
property-testing (expression output must match the reference's Python string
semantics byte-for-byte) and as the vectorized-UDF fallback for inputs where
JVM regex/string semantics could diverge (exotic unicode).
"""

from research_knowledge_graph_spark.functions.sanitize import (  # noqa: F401
    sanitize_string_col,
    sanitize_string_py,
)
from research_knowledge_graph_spark.functions.normalize import (  # noqa: F401
    clamp_confidence_col,
    normalize_label_col,
    normalize_label_py,
)
from research_knowledge_graph_spark.functions.hashing import (  # noqa: F401
    det_id,
    portable_hash64,
    portable_hash64_sql,
)

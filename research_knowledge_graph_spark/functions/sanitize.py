"""Control-character sanitization (reference: ``src/utils/text_sanitizer.py:6-32``).

The reference strips null bytes and control characters in
``[\\x00-\\x08\\x0B-\\x0C\\x0E-\\x1F]`` (keeping ``\\n \\r \\t``) before any
value reaches storage. Here it is a single Catalyst ``regexp_replace`` —
whole-stage-codegen'd, no Python in the path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java and Python regex agree on these escapes; \x00 is matched explicitly too.
_CONTROL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
_CONTROL_RE = re.compile("[\x00-\x08\x0B\x0C\x0E-\x1F]")


def sanitize_string_col(col: Column | str) -> Column:
    """Column form: drop NULs + control chars, keep \\n \\r \\t."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _CONTROL_CLASS, "")


def sanitize_string_py(text: str | None) -> str | None:
    """Python twin with identical semantics (for tests / UDF fallback)."""
    if text is None or not isinstance(text, str):
        return text
    return _CONTROL_RE.sub("", text.replace("\x00", ""))


# DuckDB-oracle equivalent (kept in one place so entry + tests share it):
SANITIZE_SQL_TEMPLATE = (
    "regexp_replace({col}, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')"
)

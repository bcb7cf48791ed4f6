"""Shared input-contract guards for public operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def guard_columns(df: DataFrame, reserved: set[str], where: str) -> None:
    """Public operators use internal scratch columns and emit fixed output
    columns; an input that already carries one of those names would produce
    ambiguous references deep in the plan or silently overwritten output —
    fail fast with the real cause instead."""
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"{where}: column name(s) {sorted(clash)} are reserved by this "
            "operator — rename them before calling"
        )

"""Deterministic, engine-portable hashing.

Two needs:

1. **Deterministic ids** replacing the reference's ``uuid4`` defaults
   (``src/graph/models.py:11,32``): ``sha2`` over a content key makes every
   stage idempotent and resumable (same input ⇒ same node/edge id ⇒ MERGE
   and re-runs converge).

2. **Portable 64-bit hash** computable identically in Spark SQL and DuckDB,
   so hash-dependent operators (MinHash, SimHash, hash-partitioned sampling)
   can be oracle-checked: first 15 hex chars of md5 interpreted as a base-16
   integer (60 bits, always non-negative, fits int64).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator: unlikely in labels, keeps keys unambiguous


def det_id(kind: str, *cols: Column | str) -> Column:
    """Deterministic id for a node/edge from its content key: first 128 bits
    of sha256, hex. 128 bits keeps the collision probability among 10¹² ids
    at ~1.5e-15 (birthday bound), while halving id bytes vs full sha256 hex —
    ids dominate shuffle volume in the join/dedup stages, so this directly
    halves their exchange size."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.substring(F.sha2(F.concat_ws(SEP, F.lit(kind), *cs), 256), 1, 32)


def id_to_bin(col: Column | str) -> Column:
    """Narrow a :func:`det_id`-style id to a tagged 17-byte BINARY for
    shuffle-heavy internal stages: ids dominate the exchange bytes of the
    blocking join / pair dedup (two ids per row, little else), so packing
    the 32-char lowercase-hex form into 16 raw bytes roughly halves those
    exchanges' volume — the term the N→4N scaling fit attributes the
    cross-executor loss to (BASELINE.md round-5 readout: excess_4N ≈
    8 s + 27 %·ideal, all shuffle serde).

    Encoding is alias-free for ARBITRARY ids, not just det_id output: a
    leading tag byte separates the two spaces (``00`` + unhex for exactly
    32 LOWERCASE hex chars, ``01`` + raw UTF-8 otherwise), so a foreign
    corpus mixing '61' and 'a' can never collide post-narrowing, and an
    UPPERCASE-hex id round-trips byte-identically instead of coming back
    lowercased. Within a homogeneous id space the unsigned-lexicographic
    BINARY order equals the source string order, so ``<`` / ``least`` /
    ``greatest`` pair canonicalization is unchanged by the narrowing."""
    c = F.col(col) if isinstance(col, str) else col
    # \A/\z anchors, not ^/$: Java regex '$' also matches just before a
    # trailing newline, so an id of 32 hex chars + '\n' would take the
    # unhex branch, unhex('..\n') would return NULL and the row would be
    # silently dropped from every posting/pair join (ADVICE r5). \z is
    # end-of-input unconditionally, so such ids fall to the raw-UTF-8 tag
    # branch and round-trip byte-identically.
    return F.when(
        c.rlike("\\A[0-9a-f]{32}\\z"),
        F.concat(F.lit(b"\x00"), F.unhex(c)),
    ).otherwise(F.concat(F.lit(b"\x01"), F.encode(c, "UTF-8")))


def bin_to_id(col: Column | str) -> Column:
    """Exact inverse of :func:`id_to_bin` (round-trip pinned by pytest)."""
    c = F.col(col) if isinstance(col, str) else col
    payload = F.substring(c, 2, F.octet_length(c) - F.lit(1))
    return F.when(
        F.substring(c, 1, 1) == F.lit(b"\x00"), F.lower(F.hex(payload))
    ).otherwise(F.decode(payload, "UTF-8"))


def bin_id_lt(a: Column, b: Column) -> Column:
    """String-order ``<`` over :func:`id_to_bin`-encoded ids. Within one id
    space (same tag byte) the raw binary memcmp already equals source
    string order, so that fast path stays; a CROSS-tag pair — a corpus
    mixing packed-hex with other id shapes — would otherwise order by the
    tag byte (all hex ids before all raw ids), so those decode and compare
    the source strings, keeping the documented paper_a < paper_b contract
    exact for arbitrary corpora. Spark's UTF8_BINARY string order is
    UTF-8 byte order, which preserves code-point order — identical to the
    pre-narrowing comparison."""
    same = F.substring(a, 1, 1) == F.substring(b, 1, 1)
    return F.when(same, a < b).otherwise(bin_to_id(a) < bin_to_id(b))


def portable_hash64(col: Column | str, seed: int | None = None) -> Column:
    """md5-derived 60-bit hash, identical in Spark and DuckDB.

    Spark:  conv(substr(md5(x), 1, 15), 16, 10) :: bigint
    DuckDB: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat_ws(":", F.lit(str(seed)), c)
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(col_expr: str, seed: int | None = None) -> str:
    """DuckDB-side rendering of :func:`portable_hash64` (same bits)."""
    inner = col_expr if seed is None else f"'{seed}' || ':' || {col_expr}"
    return f"CAST('0x' || substr(md5(CAST(({inner}) AS VARCHAR)), 1, 15) AS BIGINT)"


def portable_hash64_py(value: str, seed: int | None = None) -> int:
    """Python twin (same bits) — used to precompute constants (e.g. SRP
    hyperplane signs) that are inlined into both engines' plans."""
    import hashlib

    s = value if seed is None else f"{seed}:{value}"
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)

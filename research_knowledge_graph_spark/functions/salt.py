"""Salted repartitioning — the explicit skew defense the north rule names.

Head domains own 30-50% of web-crawl rows; any layout or downstream stage
keyed by domain (or by any hot value) gets hot partitions. Repartitioning by
``pmod(xxhash64(salt_col), n_buckets)`` redistributes rows uniformly
regardless of the key distribution, while staying deterministic (same row →
same bucket) so re-runs shuffle identically.

Used ahead of per-partition-sensitive stages (Arrow UDF batches, partitioned
writes) and available for salting one side of a skewed join (replicate the
other side across the salt domain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(col: Column | str, n_buckets: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")


def salted_repartition(df: DataFrame, by: str, n_partitions: int) -> DataFrame:
    """Uniform deterministic repartition by hash-salt of ``by`` (e.g. url).

    The salt domain is 32× the partition count: hashing a salt domain equal
    to the partition count leaves empty partitions (collisions), while a
    wide domain re-hashed into n partitions is near-uniform."""
    return (
        df.withColumn("_salt", salt_col(by, n_partitions * 32))
        .repartition(n_partitions, F.col("_salt"))
        .drop("_salt")
    )


def replicate_for_salted_join(
    small: DataFrame, n_buckets: int, salt_name: str = "_salt"
) -> DataFrame:
    """Explode the small side of a skewed join across the salt domain:
    join condition becomes (key, salt) — each hot key's rows spread over
    ``n_buckets`` reducers instead of one."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1)))
    return small.withColumn(salt_name, salts)

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
    from research_knowledge_graph_spark.functions.guards import guard_columns

    # withColumn would silently REPLACE a caller's _salt (e.g. the output
    # of replicate_for_salted_join) and drop() would then delete it —
    # the salt a pending (key, _salt) join condition needs would vanish
    guard_columns(df, {"_salt"}, "salted_repartition input")
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


# ---------------------------------------------------------------------------
# Two-phase (salted) aggregation for Zipf-keyed groupBys
# ---------------------------------------------------------------------------
#
# Plain ``count`` already combines map-side, but aggregations that carry
# per-group STATE through the shuffle (countDistinct, collect_set) ship a hot
# key's entire value set to one reducer. The two-phase shape — partial
# aggregate by (key, salt), final aggregate by key — bounds any reducer's
# state at 1/n_salts of the hot key. The salt must be a function of the
# VALUE (same value → same salt) so distinctness is decided locally.


def two_phase_count(df: DataFrame, key_cols: list[str], n_salts: int = 32) -> DataFrame:
    """count(*) per key via partial counts by (key, partition-salt) → sum.
    Output: key_cols + ``n``. Equivalent to ``groupBy(key).count()`` and
    useful when map-side combine is defeated (e.g. immediately after an
    explode that makes one input partition hold a whole hot key)."""
    return (
        df.groupBy(*key_cols, F.pmod(F.spark_partition_id(), F.lit(n_salts)).alias("_salt"))
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(*key_cols)
        .agg(F.sum("_partial").alias("n"))
    )


def two_phase_count_distinct(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 32
) -> DataFrame:
    """countDistinct(value) per key without shipping a hot key's whole value
    set to one reducer: distinct values are counted within (key,
    hash(value) mod n_salts) slots — a value always lands in ONE slot, so
    the per-key sum of slot-distincts is exact. Output: key_cols + ``n_distinct``."""
    slot = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).alias("_salt")
    return (
        df.groupBy(*key_cols, slot)
        .agg(F.countDistinct(value_col).alias("_partial"))
        .groupBy(*key_cols)
        .agg(F.sum("_partial").alias("n_distinct"))
    )


def two_phase_collect_set(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 32
) -> DataFrame:
    """Sorted distinct value array per key, assembled from per-(key, salt)
    partial sets — no reducer ever materializes more than one slot of a hot
    key until the (much smaller) final merge of pre-deduped arrays.
    Output: key_cols + ``values``."""
    slot = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).alias("_salt")
    return (
        df.groupBy(*key_cols, slot)
        .agg(F.collect_set(value_col).alias("_vals"))
        .groupBy(*key_cols)
        .agg(F.array_sort(F.flatten(F.collect_list("_vals"))).alias("values"))
    )


def salted_join_sides(
    big: DataFrame, small: DataFrame, id_col: str, salt_above: int, max_salts: int
) -> tuple[DataFrame, DataFrame]:
    """Degree-aware salting of a blocking join — the ONE home of the
    nsalt/slot construction (the self-join and the incremental
    batch-vs-corpus join previously each carried a copy; a fix to the
    formula must land once). Both frames must carry a ``deg`` column with
    the SAME value per blocking key (e.g. both joined against one
    :func:`attach_hot_degrees` dim); each key gets
    ``n_salts = min(max_salts, ceil(deg / salt_above))`` salt slots:

    - ``big``: each row lands in ONE slot (hash of its ``id_col``) — cost
      O(|big|) regardless of salting;
    - ``small``: each row is replicated into ALL of its key's slots —
      replication cost O(|small| × n_salts), so pass the bounded side here.

    The caller joins on (key, _salt, ...): a key of degree d spreads its
    comparisons over n_salts reducers instead of one, and every pair still
    meets in EXACTLY one slot (the big row's), so pair multiplicity — and
    any count aggregated from it — is preserved. Cold keys
    (deg ≤ salt_above) have n_salts = 1: zero replication, identical plan
    to the unsalted join."""
    nsalt = F.greatest(
        F.least(F.lit(max_salts), F.ceil(F.col("deg") / F.lit(salt_above))).cast("int"),
        F.lit(1),
    )
    a = big.withColumn("_nsalt", nsalt).withColumn(
        "_salt", F.pmod(F.xxhash64(id_col), F.col("_nsalt")).cast("int")
    )
    b = small.withColumn("_nsalt", nsalt).withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.col("_nsalt") - 1))
    )
    return a, b


def salted_self_join_sides(
    pe: DataFrame, id_col: str, salt_above: int, max_salts: int
) -> tuple[DataFrame, DataFrame]:
    """Self-join form of :func:`salted_join_sides`: both sides are the same
    frame, every unordered pair meets in exactly the left row's slot."""
    return salted_join_sides(pe, pe, id_col, salt_above, max_salts)


def attach_hot_degrees(df: DataFrame, key_col: str, cutoff: int) -> DataFrame:
    """Attach a ``deg`` column holding each row's ``key_col`` frequency —
    but join back ONLY the hot keys (count > ``cutoff``); cold rows
    default to ``deg = 1``. The hot set is at most |rows|/cutoff keys by
    pigeonhole (in practice the Zipf head), so the attach costs one
    filtered aggregate + one join against a small dim instead of a second
    full shuffle of the posting table (measured 2.2× degree-shuffle
    overhead before this on the query surface). The dim is NOT
    force-broadcast: AQE converts at runtime when it is actually small
    and degrades to a shuffle join on a pathological many-hot-keys corpus
    where a forced broadcast would OOM the driver.

    Every key a degree-cap or the salter must see exactly sits in the hot
    set as long as their thresholds are ≥ ``cutoff``; callers enforcing
    several thresholds pass ``min(thresholds)``."""
    hot = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") > cutoff)
    )
    return df.join(hot, key_col, "left").withColumn(
        "deg", F.coalesce("deg", F.lit(1))
    )

"""Fuzzy entity canonicalization — the scale path beyond exact-label linking.

The reference links entities by exact normalized label
(``ingestion_service.py:105-129``; the P/R-scored default, implemented in
:mod:`.linking`). At web scale the same entity surfaces under typo/spacing/
case variants, so the north rule specifies the upgrade implemented here:

1. **MinHash-LSH blocking** over label character shingles → candidate alias
   pairs (never all-pairs);
2. **pair verification** by exact shingle Jaccard ≥ threshold;
3. **connected components** over the alias graph via min-label propagation
   with pointer jumping (each round: p(u) ← min(p(u), p(p(u)), min over
   neighbors' parents) — the DataFrame rendition of the large-star/small-star
   family, Kiveris et al. SOCC'14), iterative self-joins with per-iteration
   localCheckpoint;
4. **broadcast alias dictionary**: the (alias_key → canonical_key) map is
   orders of magnitude smaller than the mention stream — broadcast-joined
   back onto mentions.

Skew: hot labels create hot LSH buckets; buckets larger than
``max_bucket_size`` are dropped (a bucket with 10⁶ members is a stopword
shingle pattern, not an entity cluster — standard ER guardrail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from research_knowledge_graph_spark.functions.guards import guard_columns
from research_knowledge_graph_spark.operators.dedup import minhash_near_dups


def alias_pairs(
    labels: DataFrame,
    threshold: float = 0.6,
    k: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int = 200,
) -> DataFrame:
    """labels(key, label) → verified alias pairs (key_a, key_b).

    Delegates to :func:`dedup.minhash_near_dups` (ONE home for the
    signature/banding/verify pipeline and its k % bands guard) with the
    hot-bucket cap enabled: buckets holding more than ``max_bucket_size``
    keys are a stopword shingle pattern, not an entity cluster, and are
    dropped before the pair join (the module-header guardrail).

    Note: embedding the entity type in ``key`` makes keys DISTINCT across
    types, but similarity runs on the label text alone — the caller must
    still drop cross-type pairs before clustering
    (:func:`canonicalize_fuzzy` does)."""
    docs = labels.select(F.col("key").alias("doc_id"), F.col("label").alias("text"))
    verified = minhash_near_dups(
        docs, "doc_id", "text", k=k, bands=bands, threshold=threshold,
        shingle_k=shingle_k, max_bucket_size=max_bucket_size,
    )
    return verified.select(
        F.col("doc_a").alias("key_a"), F.col("doc_b").alias("key_b")
    )


def connected_components(
    pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """(key_a, key_b) undirected edges → (key, component) with component =
    min key of the component.

    Min-label propagation + pointer jumping as DataFrame aggregations;
    converges in O(log n) rounds. Each round localCheckpoints to cut lineage
    (iterative self-joins otherwise build exponential plans).
    """
    # edge list, symmetric, no self-loops — materialized ONCE before the
    # loop (the pagerank/BFS-family rule, guide §2.4): the nb step joins
    # ``e`` every round, and an unmaterialized frame re-derives the whole
    # pair input per round — for the dedup callers (t10) that was the
    # entire MinHash+LSH banding pipeline re-running each iteration
    e = (
        pairs.select(F.col("key_a").alias("u"), F.col("key_b").alias("v"))
        .unionByName(pairs.select(F.col("key_b").alias("u"), F.col("key_a").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # parent pointer init: p(u) = min(u, min neighbor)
    parent = e.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("p"))

    for _ in range(max_iter):
        # propagate: p(u) <- min(p(u), p(p(u))) via join on parent's parent
        p2 = parent.alias("a").join(
            parent.alias("b"), F.col("a.p") == F.col("b.u"), "left"
        ).select(
            F.col("a.u").alias("u"),
            F.least(F.col("a.p"), F.coalesce(F.col("b.p"), F.col("a.p"))).alias("p_new"),
            F.col("a.p").alias("p_old"),
        )
        # also pull min over neighbors' parents (large-star step)
        nb = (
            e.join(parent.withColumnRenamed("u", "v2"), e.v == F.col("v2"))
            .groupBy("u")
            .agg(F.min("p").alias("p_nb"))
        )
        merged = (
            p2.join(nb, "u", "left")
            .select(
                "u",
                F.least(F.col("p_new"), F.coalesce(F.col("p_nb"), F.col("p_new"))).alias("p"),
                "p_old",
            )
        )
        merged = merged.localCheckpoint(eager=True)
        changed = merged.filter(F.col("p") != F.col("p_old")).isEmpty() is False
        parent = merged.select("u", "p")
        if not changed:
            break
    return parent.select(F.col("u").alias("key"), F.col("p").alias("component"))


def canonicalize_fuzzy(
    mentions_valid: DataFrame,
    threshold: float = 0.6,
    shingle_k: int = 3,
) -> DataFrame:
    """mentions_valid(url, seq, entity_type, label, …) → mentions with an
    extra ``canonical_label`` column: variants within an LSH/Jaccard/CC
    cluster map to the cluster's lexicographically-smallest label.

    The alias dictionary (cluster members → canonical) is tiny relative to
    the mention stream and is broadcast for the final join — the
    "broadcast-join alias dictionary" stage of the north rule.
    """
    guard_columns(mentions_valid, {"_key", "key", "canonical_label"},
                  "canonicalize_fuzzy input")
    # key codec: type \x1f label, with \x1f STRIPPED from the type side so
    # the key parses unambiguously with split(limit=2) — unescaped, a
    # label 'A\x1fB' would truncate to canonical 'A' and key('T\x1fA','B')
    # would collide byte-for-byte with key('T','A\x1fB'), merging across
    # types (labels are crawled text; the control char is reachable).
    # Types are enum-ish — stripping is defensive, not lossy in practice.
    _type = F.regexp_replace(F.col("entity_type"), "\x1f", "")
    labels = (
        mentions_valid.select("entity_type", "label")
        .distinct()
        .select(
            F.concat_ws("\x1f", _type, F.col("label")).alias("key"),
            F.col("label"),
        )
    )
    pairs = alias_pairs(labels, threshold=threshold, shingle_k=shingle_k)
    # similarity ran on label TEXT alone — drop cross-type pairs BEFORE
    # clustering, or a dataset label could alias a near-identical method
    # label (and chain same-type labels transitively through it)
    _tp = lambda c: F.split(c, "\x1f", 2).getItem(0)  # noqa: E731
    pairs = pairs.filter(_tp(F.col("key_a")) == _tp(F.col("key_b")))
    comps = connected_components(pairs)

    # canonical label per component = label of the min key (keys sort by
    # (entity_type, label), so this is the lexicographically first variant
    # within the type); split limit=2 keeps a label's own \x1f intact
    alias_dict = comps.select(
        "key",
        F.split(F.col("component"), "\x1f", 2).getItem(1).alias("canonical_label"),
    )

    keyed = mentions_valid.withColumn(
        "_key", F.concat_ws("\x1f", _type, F.col("label"))
    )
    return (
        keyed.join(F.broadcast(alias_dict), keyed._key == alias_dict.key, "left")
        .withColumn("canonical_label", F.coalesce("canonical_label", "label"))
        .drop("_key", "key")
    )

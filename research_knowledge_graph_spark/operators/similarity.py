"""Similarity search over embedding columns (J4/J5, the pgvector surface).

- :func:`knn_bruteforce` — exact cosine top-k for a set of query vectors.
  Replaces the reference's per-row ``ORDER BY embedding <-> q LIMIT k`` loop
  (``repository.py:385-418``): ALL queries rank at once via a window, the
  queries side is broadcast.
- :func:`knn_lsh` — the scale path: sign-random-projection LSH buckets;
  candidates = same-bucket pairs, exact rerank inside buckets. Hyperplanes
  are derived from the portable hash (deterministic, reproducible on any
  cluster, no state to ship).

Ordering ties: scores are ranked on ``round(cosine, 9)`` with vec_id as the
final tie-break, so rankings are stable across engines and float summation
orders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from research_knowledge_graph_spark.functions.vectors import cosine_col


def knn_bruteforce(
    embs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query vector (self-matches excluded when ids
    collide). Broadcast the (small) query side; one shuffle for the window."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    d = embs.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    scored = F.broadcast(q).crossJoin(d).filter(F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        "vec_id",
        F.round(cosine_col(F.col("qv"), F.col("vec")), 9).alias("_score9"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_score9"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round(F.col("_score9"), 6).alias("cosine"))
    )


def srp_bucket_col(vec: Column, dim: int, planes: int = 8) -> Column:
    """Sign-random-projection bucket id: for each pseudo-random hyperplane p,
    bit_p = [Σ_i vec[i]·h(p,i) > 0] where h(p,i) ∈ {-1,+1} comes from the
    portable hash — fully deterministic, expressible in SQL for oracles.

    A vector whose length differs from ``dim`` gets a NULL bucket and
    drops out of the bucket equi-join entirely: ``zip_with`` pads the
    short side with NULL, every plane's dot would be NULL, and the old
    ``otherwise(0)`` per-bit fallback silently sent EVERY mismatched
    vector (e.g. a dim typo, or ragged rows) to bucket 0 — collapsing
    the 2^planes-selective join into a full cross product at scale."""
    from research_knowledge_graph_spark.functions.hashing import portable_hash64_py

    bucket = F.lit(0).cast("bigint")
    for p in range(planes):
        # hyperplane signs precomputed driver-side with the portable hash —
        # the plane is a LITERAL array, so the projection is a plain dot
        # product (and the oracle SQL inlines the identical literals)
        signs = F.array(
            *[
                F.lit(1.0 if portable_hash64_py(f"{p}_{i}") & 1 else -1.0)
                for i in range(dim)
            ]
        )
        dot = F.aggregate(
            F.zip_with(vec, signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2**p).cast("bigint")).otherwise(F.lit(0))
    return F.when(F.size(vec) == dim, bucket)


def _probe_buckets_col(bucket: Column, planes: int, probe_bits: int) -> Column:
    """Multi-probe SRP: the query's bucket plus every bucket within Hamming
    distance ``probe_bits`` (0 → exact bucket only; 1 → flip each plane bit;
    2 → also every 2-bit flip). A vector whose angle straddles j hyperplanes
    lands j bit-flips away — probing the 1-flip shell recovers most of the
    recall single-bucket SRP loses, at (1 + planes) buckets per query.

    Shells past 2 flips are not implemented — fail fast rather than
    silently serving 2-flip recall to a caller who asked (and budgeted)
    for a wider probe."""
    if probe_bits not in (0, 1, 2):
        raise ValueError(
            f"probe_bits must be 0, 1 or 2 (wider flip shells not "
            f"implemented), got {probe_bits}"
        )
    probes = [bucket]
    if probe_bits >= 1:
        probes += [bucket.bitwiseXOR(F.lit(2**p).cast("bigint")) for p in range(planes)]
    if probe_bits >= 2:
        probes += [
            bucket.bitwiseXOR(F.lit((2**p) | (2**r)).cast("bigint"))
            for p in range(planes)
            for r in range(p + 1, planes)
        ]
    return F.array(*probes)


def knn_lsh(
    embs: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    probe_bits: int = 0,
) -> DataFrame:
    """ANN via SRP-LSH bucketing: exact rerank only within matching buckets.
    At 10⁹ vectors the bucket join replaces the full cross product with a
    1/2^planes-selective equi-join; recall is tunable via ``planes`` and
    ``probe_bits`` (multi-probe — see :func:`_probe_buckets_col`; measured
    recall@10 per setting is tabulated in BASELINE.md §ANN)."""
    d = embs.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        srp_bucket_col(F.col(vec_col), dim, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
        srp_bucket_col(F.col(query_vec_col), dim, planes).alias("bucket"),
    )
    if probe_bits > 0:
        q = q.select(
            "query_id",
            "qv",
            F.explode(
                _probe_buckets_col(F.col("bucket"), planes, probe_bits)
            ).alias("bucket"),
        )
    scored = (
        F.broadcast(q)
        .join(d, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col(F.col("qv"), F.col("vec")), 9).alias("_score9"),
        )
    )
    if probe_bits > 0:
        # a vector can match via several probed buckets → dedup pairs
        scored = scored.groupBy("query_id", "vec_id").agg(
            F.max("_score9").alias("_score9")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("_score9"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round(F.col("_score9"), 6).alias("cosine"))
    )


def mmr_rerank(
    embs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k retrieval: greedily
    pick ``k`` of the ``pool`` most-relevant candidates per query,
    trading relevance against redundancy —
    ``score(c) = λ·cos(q,c) − (1−λ)·max_{s∈selected} cos(c,s)`` —
    the standard serving-side rerank that stops a near-dup cluster from
    monopolizing a result page. Returns (query_id, rank, vec_id,
    relevance).

    Scale: candidate generation is the distributed part — the same
    broadcast-query scan + per-query top-``pool`` window as
    :func:`knn_bruteforce` (swap in the LSH/IVF variants for the 100-TB
    path; the rerank is agnostic to how the pool was produced). The
    greedy rerank is inherently sequential in ``k`` but local to ONE
    query's ≤``pool`` rows, so it runs as ``applyInPandas`` over the
    query_id groups: thousands of queries rerank in parallel, each group
    Arrow-batched, no driver round-trip. Determinism: relevance and
    pairwise cosines are rounded to 9 decimals before any comparison
    (same discipline as knn_bruteforce, half-away-from-zero to match
    Spark/DuckDB round), ties broken by vec_id ASC. Residual caveat: the
    pairwise dot products accumulate in BLAS order vs the oracle's
    sequential sum — divergence requires a cosine within ~1 ulp of a
    0.5e-9 boundary, which the rounding discipline makes measure-zero in
    practice.
    """
    import numpy as np
    import pandas as pd

    if k < 1 or pool < 1:
        # the greedy seed unconditionally selects row 0, so k<=0 would
        # still emit one phantom row per query — fail fast like siblings
        raise ValueError(f"mmr_rerank needs k >= 1 and pool >= 1, got k={k} pool={pool}")
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    d = embs.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    scored = (
        F.broadcast(q)
        .crossJoin(d)
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            "vec",
            F.round(cosine_col(F.col("qv"), F.col("vec")), 9).alias("rel9"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel9"), F.asc("vec_id"))
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= pool)
        .drop("rn")
    )

    def _round_away(x, d: int):
        # HALF-AWAY-FROM-ZERO, matching Spark F.round / DuckDB round —
        # np.round's banker's half-to-even would diverge exactly on the
        # rounding boundaries the 9-decimal discipline exists to pin down
        p = 10.0**d
        return np.copysign(np.floor(np.abs(x) * p + 0.5), x) / p

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["rel9", "vec_id"], ascending=[False, True]
        ).reset_index(drop=True)
        m = np.array(pdf["vec"].tolist(), dtype=np.float64)
        # pairwise cosine with the SAME algebra as cosine_col/cosine_sql:
        # dot / (||a||·||b||), 0.0 on zero norm, rounded to 9
        norms = np.sqrt(np.einsum("ij,ij->i", m, m))
        denom = np.outer(norms, norms)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.where(denom > 0, (m @ m.T) / denom, 0.0)
        sims = _round_away(sims, 9)
        rel = pdf["rel9"].to_numpy()
        ids = pdf["vec_id"].to_numpy()
        n = len(pdf)
        selected: list[int] = [0]  # row 0 = argmax (rel9 DESC, vec_id ASC)
        while len(selected) < min(k, n):
            red = sims[:, selected].max(axis=1)
            score = lam * rel - (1.0 - lam) * red
            best = None
            for i in range(n):
                if i in selected:
                    continue
                key = (-score[i], ids[i])
                if best is None or key < best[0]:
                    best = (key, i)
            selected.append(best[1])
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[:1].repeat(len(selected)).to_numpy(),
                "rank": np.arange(1, len(selected) + 1, dtype=np.int32),
                "vec_id": ids[selected],
                "relevance": _round_away(rel[selected], 6),
            }
        )

    # output schema mirrors the caller's actual id types (string doc ids
    # are as valid as longs — a hardcoded 'long' would die in Arrow)
    qt = cand.schema["query_id"].dataType.simpleString()
    vt = cand.schema["vec_id"].dataType.simpleString()
    return cand.groupBy("query_id").applyInPandas(
        _greedy,
        f"query_id {qt}, rank int, vec_id {vt}, relevance double",
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label embedding centroid in exact fixed-point — the class-
    prototype computation behind clustering audits, IVF coarse-quantizer
    seeding (``ann_ivf``'s centroid table is exactly this shape), and
    embedding-space drift monitoring between corpus snapshots.

    Returns one row per (label, dim): (label, dim, n_vecs, sum_nano,
    mean_nano). Each float component is scaled to integer NANOS once on
    the map side (``round(val * 10^9)`` — float→double cast and the
    multiply are IEEE-identical across engines, the t23 pattern), so
    ``sum_nano`` is an exact bigint and the check is bit-exact regardless
    of partitioning or aggregation order — a plain double sum would be
    order-dependent and cross-engine flaky. ``mean_nano =
    floor(sum_nano / n_vecs)`` computes the division in double (both
    engines divide bigint/bigint in IEEE double): exact while
    |sum_nano| < 2^53 — at larger corpora publish (sum, n) and divide at
    the consumer.

    Scale: posexplode is map-only; the aggregate keys on (label, dim) —
    cardinality #labels × dim, uniform by construction (every vector
    contributes one row per dim), with map-side partial sums bounding the
    shuffle at #keys × #partitions rows. No Python anywhere."""
    return _centroid_fixed_point(embeddings, label_col, vec_col, 10**9).select(
        "label",
        "dim",
        "n_vecs",
        F.col("s").alias("sum_nano"),
        F.col("m").alias("mean_nano"),
    )


def _centroid_fixed_point(
    embeddings: DataFrame, label_col: str, vec_col: str, scale: int
) -> DataFrame:
    """The ONE copy of the per-(label, dim) fixed-point centroid pipeline
    (posexplode → scale components to integers → exact bigint sums →
    floor-double mean) shared by :func:`label_centroids` (nano scale) and
    :func:`nearest_centroid_assign` (micro scale — squared differences
    must fit int64). Returns (label, dim, n_vecs, s, m); the 2^53 |s|
    exactness cap on the double division is documented on
    :func:`label_centroids`."""
    ex = embeddings.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("dim", "val"),
    )
    fx = F.round(F.col("val").cast("double") * F.lit(float(scale))).cast("long")
    return (
        ex.select("label", "dim", fx.alias("fx"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("fx").cast("long").alias("s"),
        )
        .withColumn("m", F.floor(F.col("s") / F.col("n_vecs")).cast("long"))
    )


def _centroid_distances(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """The ONE copy of the vector × candidate-centroid distance trunk
    shared by :func:`nearest_centroid_assign` (argmin tail) and
    :func:`silhouette_audit` (own-vs-nearest-foreign split): components
    scaled to integer MICROS map-side, per-label centroids from
    ``_centroid_fixed_point``, squared L2 as exact bigint sums of
    products — bit-exact under any partitioning. Returns one row per
    (vec_id, own_label, cand_label, dist_micro2).

    Scale: the centroid-array dim is #labels rows — a TRUE bounded
    dimension (fixed taxonomy), so the broadcast is safe by construction;
    the distance math is pure Catalyst ``zip_with``/``aggregate`` (no
    Python)."""
    def micro(c):
        return F.round(c.cast("double") * F.lit(1e6)).cast("long")

    if centroids is None:
        centroids = _centroid_fixed_point(embeddings, label_col, vec_col, 10**6)
    cent = centroids.select("label", "dim", F.col("m").alias("c"))
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
        ).alias("carr")
    ).select(F.col("label").alias("cand_label"), "carr")
    vm = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("own_label"),
        F.transform(F.col(vec_col), lambda x: micro(x)).alias("v"),
    )
    return vm.join(F.broadcast(carr)).select(
        "vec_id",
        "own_label",
        "cand_label",
        F.aggregate(
            F.zip_with("v", "carr", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dist_micro2"),
    )


def silhouette_audit(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-label SIMPLIFIED silhouette — the standard clustering-quality
    score computed against centroids instead of all-pairs (the only
    silhouette form that scales: the classic definition is an O(N²)
    all-pairs average; the simplified form is one bounded broadcast per
    vector and is what large-scale libraries ship). Per vector:
    ``a`` = squared micro-distance to its OWN label centroid, ``b`` =
    squared distance to the nearest FOREIGN centroid, silhouette =
    (b−a)/max(a,b) in PER-MILLE fixed point — per-mille, not ppm,
    because |b−a|·10³ must stay int64: distances bound at
    dims·(2·10⁶)², so the scaled product binds at dims ≈ 2300 (ANSI
    fails loudly beyond; drop to centi-scale there). The division is
    sign-split (non-negative dividend both branches) so Spark ``div`` ==
    DuckDB ``//`` bit-exactly.

    Returns one row per label: (label, n_vecs, n_negative, sum_sil_milli,
    mean_sil_milli) — n_negative counts vectors sitting closer to a
    foreign prototype than their own (misassignment candidates, the
    per-vector view of e12's confusion matrix). A single-label corpus has
    no foreign centroid: those vectors drop out (b undefined), matching
    the SQL NULL-min semantics.

    Scale: one row per vector × #labels (bounded) → per-vector
    conditional agg keyed on the uniform vec_id → per-label rollup;
    no windows, no unbounded broadcasts."""
    d = _centroid_distances(embeddings, label_col, vec_col, id_col)
    per_vec = (
        d.groupBy("vec_id", "own_label")
        .agg(
            F.max(
                F.when(F.col("cand_label") == F.col("own_label"), F.col("dist_micro2"))
            ).alias("a2"),
            F.min(
                F.when(F.col("cand_label") != F.col("own_label"), F.col("dist_micro2"))
            ).alias("b2"),
        )
        .filter(F.col("b2").isNotNull() & F.col("a2").isNotNull())
    )
    s = per_vec.select(
        F.col("own_label").alias("label"),
        F.expr(
            "CASE WHEN b2 - a2 >= 0"
            " THEN ((b2 - a2) * 1000) div greatest(a2, b2, 1L)"
            " ELSE -(((a2 - b2) * 1000) div greatest(a2, b2, 1L)) END"
        )
        .cast("long")
        .alias("sil_milli"),
    )
    agg = s.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum((F.col("sil_milli") < 0).cast("long")).cast("long").alias("n_negative"),
        F.sum("sil_milli").cast("long").alias("sum_sil_milli"),
    )
    return agg.select(
        "label",
        "n_vecs",
        "n_negative",
        "sum_sil_milli",
        F.expr(
            "CASE WHEN sum_sil_milli >= 0"
            " THEN sum_sil_milli div n_vecs"
            " ELSE -((-sum_sil_milli) div n_vecs) END"
        )
        .cast("long")
        .alias("mean_sil_milli"),
    )


def nearest_centroid_assign(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """K-means E-step in exact integer arithmetic: assign every vector to
    its nearest per-label centroid by squared L2 — the cluster-purity /
    drift audit (does each embedding still land on its own label's
    prototype?) and the assignment half of a k-means iteration over an
    embedding corpus.

    Exactness: components are scaled to integer MICROS (not nanos — the
    squared differences must fit int64: |v-c| ≲ 2^22 micros squared ×
    dims stays ≪ 2^63, where nano-squared would overflow). Centroids are
    ``floor(sum_micro / n)`` (exact while |sum| < 2^53, both engines
    divide in IEEE double); distances are sums of products of bigints —
    bit-exact under any partitioning. Ties break toward the smaller
    label (explicit, so the argmin is a total order).

    Returns (vec_id, own_label, assigned_label, dist_micro2).

    Scale: the centroid table is #labels × dim rows — a TRUE bounded
    dimension (labels are a fixed taxonomy), so broadcasting the
    #labels-row array form is safe by construction (contrast the
    unbounded dims this repo refuses to hint). The per-vector work is a
    broadcast nested-loop over #labels rows with pure Catalyst
    ``zip_with``/``aggregate`` integer math (no Python), then one
    rank-1 window partitioned by vec_id — uniform high-cardinality key.

    ``centroids`` optionally supplies a precomputed micro-scale
    ``_centroid_fixed_point`` frame (label, dim, ..., m) so a caller that
    also needs the seed centroids (:func:`kmeans_update_step`) shares ONE
    logical subtree instead of relying on physical ReuseExchange to
    deduplicate two identical posexplode+shuffle plans."""
    scored = _centroid_distances(
        embeddings, label_col, vec_col, id_col, centroids
    )
    from pyspark.sql.window import Window

    # NULLS LAST: a NULL distance (NULL component, ragged dims) must never
    # win the argmin — and DuckDB's default ASC ordering is NULLS LAST, so
    # the oracle agrees on such inputs
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist_micro2").asc_nulls_last(), "cand_label"
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "vec_id",
            "own_label",
            F.col("cand_label").alias("assigned_label"),
            "dist_micro2",
        )
    )


def kmeans_update_step(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One FULL Lloyd iteration in exact integer arithmetic: the E-step
    assignment (:func:`nearest_centroid_assign`, micro fixed point) followed
    by the M-step centroid recompute over the assigned memberships — plus
    the per-(label, dim) integer shift against the seed centroid, which is
    the convergence signal a k-means driver loops on (max |shift| below
    tolerance ⇒ stop). With e10 this makes the whole k-means kernel
    oracle-checkable: both halves are plain DataFrame ops, so iterating is a
    driver-side loop over this function, not a new operator.

    Returns one row per (label, dim) for labels that RETAINED ≥1 member:
    (label, dim, n_vecs, sum_micro, mean_micro, old_mean_micro,
    shift_micro). A label every vector abandoned disappears — the standard
    empty-cluster case a production k-means re-seeds explicitly; publishing
    the disappearance (rather than carrying a stale centroid) is the honest
    contract. All sums are exact bigints (micro components); means are
    ``floor(sum/n)`` (exact while |sum| < 2^53 — both engines divide in
    IEEE double).

    Scale: the E-step is e10's broadcast nested-loop (centroid dim is
    #labels rows — TRUE bounded); the membership attach is ONE equi-join on
    the uniform high-cardinality vec id; the M-step is the same
    (label, dim)-keyed map-side-combinable hash-agg as
    :func:`label_centroids`. No Python anywhere. The seed-centroid frame
    is computed ONCE and passed into the E-step, so the M-step's
    old-centroid join and the assignment share one logical subtree
    (structural dedup, not a bet on physical ReuseExchange)."""
    seed = _centroid_fixed_point(embeddings, label_col, vec_col, 10**6)
    assigned = nearest_centroid_assign(
        embeddings, label_col, vec_col, id_col, centroids=seed
    )
    members = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
    ).join(assigned.select("vec_id", "assigned_label"), "vec_id")
    new = _centroid_fixed_point(
        members.select(F.col("assigned_label").alias("label"), F.col("_v").alias("v")),
        "label",
        "v",
        10**6,
    )
    old = seed.select("label", "dim", F.col("m").alias("old_mean_micro"))
    # inner join is total: assigned labels are drawn from the seed-centroid
    # label set, so every surviving (label, dim) has an old centroid row
    return (
        new.select(
            "label",
            "dim",
            "n_vecs",
            F.col("s").alias("sum_micro"),
            F.col("m").alias("mean_micro"),
        )
        .join(old, ["label", "dim"])
        .withColumn(
            "shift_micro",
            (F.col("mean_micro") - F.col("old_mean_micro")).cast("long"),
        )
    )


def centroid_separation(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-separation audit: for every label's micro fixed-point
    centroid, the nearest OTHER label's centroid by exact squared L2 —
    the "are any two label prototypes on top of each other?" read taken
    alongside the per-vector purity audit (:func:`nearest_centroid_assign`
    / e12's confusion matrix): a pair of labels with tiny separation
    explains exactly the cells that bleed.

    Returns (label, nearest_label, dist_micro2) — one row per label, ties
    toward the smaller nearest_label (total order). Same micro fixed
    point and the same exactness argument as
    :func:`nearest_centroid_assign`; distances are sums of products of
    bigints, bit-exact under any partitioning.

    Scale: everything runs on the #labels×dim centroid frame — a TRUE
    bounded dimension — so the pairwise #labels² comparison is a
    broadcast nested loop over rows that fit on one executor by
    construction. The corpus is touched exactly once (the centroid
    hash-agg)."""
    cent = _centroid_fixed_point(embeddings, label_col, vec_col, 10**6)
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("carr")
    )
    a = carr.select(F.col("label"), F.col("carr").alias("va"))
    b = carr.select(F.col("label").alias("other_label"), F.col("carr").alias("vb"))
    scored = (
        a.join(F.broadcast(b))
        .filter(F.col("label") != F.col("other_label"))
        .select(
            "label",
            "other_label",
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dist_micro2"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("label").orderBy(
        F.col("dist_micro2").asc_nulls_last(), "other_label"
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "label",
            F.col("other_label").alias("nearest_label"),
            F.col("dist_micro2").cast("long").alias("dist_micro2"),
        )
    )


def _block_pair_d2(
    emb: DataFrame, id_col: str, vec_col: str, block_col: str
) -> DataFrame:
    """THE micro fixed-point block-pair distance trunk — ONE copy shared
    by :func:`hubness_audit` (e20) and :func:`intrinsic_dimension_twonn`
    (e21): components fixed-pointed to micro longs, same-block pairs with
    self excluded, exact bigint squared L2 via zip_with/aggregate.
    Returns (a_id, label, b_id, d2). A fix to the fixed-point scale, the
    NULL handling or the self-pair condition lands once for both audits."""
    vm = F.transform(
        F.col(vec_col),
        lambda c: F.round(c.cast("double") * F.lit(1e6)).cast("long"),
    )
    base = emb.select(
        F.col(id_col).alias("vec_id"), F.col(block_col).alias("label"),
        vm.alias("v"),
    )
    a = base.select(
        F.col("vec_id").alias("a_id"), "label", F.col("v").alias("va")
    )
    b = base.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_label"),
        F.col("v").alias("vb"),
    )
    return (
        a.join(
            b,
            (F.col("label") == F.col("b_label"))
            & (F.col("a_id") != F.col("b_id")),
        )
        .select(
            "a_id",
            "label",
            F.col("b_id"),
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
    )


def hubness_audit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Per-vector HUBNESS audit — the classic high-dimensional ANN
    pathology read (Radovanović et al.): count how often each vector
    appears in OTHER vectors' exact k-nearest lists inside its block. In a
    well-behaved space inbound degree concentrates near k; hubs (inbound
    ≫ k) dominate retrieval results and anti-hubs (inbound 0) become
    unreachable — the shape that decides whether cosine top-k serving
    (e01/e03/e06) degrades on this corpus.

    Exactness: components are fixed-pointed to micros (the e16/e19 rule)
    and the squared L2 distance is an exact bigint via zip_with/aggregate,
    so the neighbor ORDER — (d2 asc, id asc) — is a total order over
    integers and every rank is engine-exact; inbound counts and the
    inbound/k ppm ratio are pure bigint arithmetic. No float crosses an
    ordering or aggregation boundary.

    Scale: pair volume is O(Σ block²) like the e02/e17/e19 family — the
    block column is the LSH/IVF bucket at web scale, never the whole
    corpus; the top-k window partitions by source vector (bounded by
    block size), and the inbound count is one map-side-combinable
    hash-agg. Blocks of size ≤ k simply rank everyone (n_block carried so
    readers can condition on it)."""
    if k < 1:
        # k=0 would divide by zero in the inbound/k ppm ratio (ANSI mode
        # throws deep in the plan) — fail fast like k_core/k_truss/hits
        raise ValueError(f"hubness_audit needs k >= 1, got {k}")
    pairs = _block_pair_d2(emb, id_col, vec_col, block_col)
    w = Window.partitionBy("a_id").orderBy(
        F.col("d2").asc_nulls_last(), F.col("b_id").asc()
    )
    topk = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("b_id")
    )
    inbound = topk.groupBy("b_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_inbound")
    )
    blocks = emb.groupBy(F.col(block_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_block")
    )
    return (
        emb.select(F.col(id_col).alias("vec_id"), F.col(block_col).alias("label"))
        .join(blocks, "label")
        .join(inbound, F.col("vec_id") == F.col("b_id"), "left")
        .select(
            "vec_id",
            "label",
            "n_block",
            F.coalesce("n_inbound", F.lit(0)).cast("long").alias("n_inbound"),
            F.expr(f"coalesce(n_inbound, 0L) * 1000000L div {k}")
            .cast("long")
            .alias("inbound_ppm_of_k"),
        )
    )


def intrinsic_dimension_twonn(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """Per-block TwoNN intrinsic-dimension estimate (Facco et al. 2017,
    Sci. Rep.): the MLE ``d = n / Σ ln(r2/r1)`` over each point's exact
    1st/2nd nearest-neighbor distances. THE capacity read for the
    embedding space that e20's hubness reads the symptom of: retrieval
    pathologies (hub formation, distance concentration) scale with the
    data's INTRINSIC dimension, not the ambient dim — a corpus whose
    TwoNN estimate is far below the ambient dimension quantizes (e16)
    and LSH-blocks (e03/e17) far better than the ambient dim predicts.

    Exactness (the e20/e16 rule + the t23/v24 nano-ln rule): components
    are fixed-pointed to micros so the squared L2 distance is an exact
    bigint and the neighbor order (d2 asc, id asc) is a total order over
    integers; ``ln μ = ½·ln(d2₂/d2₁)`` is carried as the exact bigint
    ``round(ln d2₂·1e9) − round(ln d2₁·1e9)`` (≥ 0 per point: d2₂ ≥ d2₁
    and round is monotone), summed with no float crossing an aggregation
    boundary; the published estimate is ONE double expression at the end
    (``id_est = 2e9·n / Σ``, the ½ folded in). Drops, all by exact
    integer predicates: points with d2₁ = 0 (an exact-duplicate nearest
    neighbor makes μ undefined — the paper's own preprocessing step),
    points without a 2nd neighbor (block size < 3), and blocks whose Σ
    is 0 (every point's two NNs tie — the estimate diverges; the v12
    baseline-less rule).

    Scale: pair volume is O(Σ block²) like the e02/e17/e19/e20 family —
    ``block_col`` is the LSH/IVF bucket at web scale, never the corpus;
    the per-point reduce is a rank-2 window inside the block and the
    per-block reduce is one bounded hash-agg. Reference analog: the
    embedding-space health checks around ``repository.py``'s pgvector
    serving surface, which the reference never audits."""
    pairs = _block_pair_d2(emb, id_col, vec_col, block_col)
    # partition by (a_id, label), not a_id alone: a vector assigned to
    # several blocks (multi-probe LSH at web scale) must get an
    # independent rank-2 neighbor list PER BLOCK — a single a_id window
    # would keep only the two globally-smallest d2 and drop the point
    # from its other blocks' estimates
    w = Window.partitionBy("a_id", "label").orderBy(
        F.col("d2").asc_nulls_last(), F.col("b_id").asc()
    )
    two = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("a_id", "label")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("d2"))).alias("d2_1"),
            F.min(F.when(F.col("rn") == 2, F.col("d2"))).alias("d2_2"),
        )
        # exact-integer drops: duplicate NN (d2_1 = 0) and no 2nd NN
        .filter((F.col("d2_1") > 0) & F.col("d2_2").isNotNull())
    )
    ln_nano = lambda c: F.round(  # noqa: E731 — local alias, used twice
        F.log(F.col(c).cast("double")) * F.lit(1e9)
    ).cast("long")
    per_point = two.select(
        "label", (ln_nano("d2_2") - ln_nano("d2_1")).alias("term_nano")
    )
    agg = per_point.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_used"),
        F.sum("term_nano").cast("long").alias("sum_ln2x_nano"),
    )
    return agg.filter(F.col("sum_ln2x_nano") > 0).select(
        "label",
        "n_used",
        "sum_ln2x_nano",
        F.round(
            F.lit(2e9) * F.col("n_used") / F.col("sum_ln2x_nano"), 6
        ).alias("id_est"),
    )

"""Deduplication operators for the training-data pipeline surface.

Exact (hash groupBy), MinHash + LSH banding, SimHash, n-gram Jaccard, and
embedding-cosine near-dup — all pure Catalyst expressions built on the
engine-portable hash (:mod:`..functions.hashing`), so every variant is
oracle-checkable in DuckDB bit-for-bit.

Scale posture:
- exact dedup: one hash-aggregate on a 60-bit fingerprint — the cheapest
  possible global dedup; at 10¹² docs this is the shuffle that matters, so
  the key is a fixed-width long, not the document text.
- MinHash-LSH: signatures are computed map-side (per-row expressions over
  the shingle array — no explode, no shuffle); only (band_hash → doc) pairs
  shuffle, and candidate verification joins band buckets, never all pairs.
- SimHash: 16-bit (configurable) — near-dup bucketing by Hamming-adjacent
  keys.
- n-gram Jaccard: exact verification on candidate pairs (blocked upstream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from research_knowledge_graph_spark.functions.hashing import portable_hash64
from research_knowledge_graph_spark.functions.textops import (
    char_shingles_col,
    shingle_rows,
)
from research_knowledge_graph_spark.functions.vectors import cosine_col

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical (whitespace-canonicalized) documents:
    (fingerprint, n_docs, keep_id) — keep_id = min id, the survivor.

    NULL-text rows are dropped at the source (same rule the streaming
    dedup applies): md5(NULL) = NULL and groupBy treats NULLs as equal,
    so unfiltered NULL-text docs would all collapse into ONE phantom
    dup group whose drop-list deletes every one of them but the min id."""
    from research_knowledge_graph_spark.functions.textops import fingerprint_col

    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), fingerprint_col(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

def minhash_signature_col(text: Column, k: int = 8, shingle_k: int = 5) -> Column:
    """k-permutation MinHash over char shingles, as array<bigint>.
    Per-row expression — computed map-side, no shuffle."""
    sh = char_shingles_col(text, shingle_k)

    def _min_hash(seed: int) -> Column:
        # closure, NOT a default-arg lambda (2-arg transform lambdas
        # receive the array index as the second argument)
        return F.array_min(F.transform(sh, lambda s: portable_hash64(s, seed=seed)))

    return F.array(*[_min_hash(j) for j in range(k)])


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, shingle_k: int = 5,
) -> DataFrame:
    # NULL text dropped (exact_dup_groups' rule): an all-NULL signature's
    # band buckets all hash '' (concat_ws skips NULLs), so every NULL-text
    # doc would land in one corpus-sized bucket — an O(n²) candidate clique.
    # Shingles are STAGED as a real column before the k per-seed minima:
    # minhash_signature_col embeds the shingle expression k times, and a
    # non-attribute expression inside a higher-order-function lambda is
    # re-evaluated per element per reference (the winnow_fingerprint_rows
    # finding) — staging computes the shingle set once per row
    # (measured 2.2×, identical signatures); shingle_rows additionally
    # stages the lowercase pass (char_shingles_lowered_col rationale).
    sh = shingle_rows(
        docs.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
        ),
        "doc_id", "_t", shingle_k, out="_sh",
    )

    def _min_hash(seed: int) -> Column:
        return F.array_min(
            F.transform(F.col("_sh"), lambda s: portable_hash64(s, seed=seed))
        )

    return sh.select(
        "doc_id",
        F.array(*[_min_hash(j) for j in range(k)]).alias("signature"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signature; docs agreeing on any full band are candidates.
    Returns distinct (doc_a, doc_b), doc_a < doc_b.

    Banding is ONE projection + explode (not a ``bands``-way union): the
    union form re-scanned the source per band, recomputing the full
    MinHash signature expression — the k·|shingles| md5 work the module
    header says dominates at scale — ``bands`` times per doc. Bucket
    values are unchanged (same per-band expression), so oracle parity
    (t07) is untouched. A band whose slice runs past the signature
    (caller passed bands·rows_per_band > k) gets a NULL bucket — NULL
    never equi-joins, so an overshooting band drops out instead of
    hashing '' for every doc and forming one corpus-sized O(n²) bucket.

    ``max_bucket_size`` (opt-in): drop band buckets holding more than
    this many docs BEFORE the self-join — a bucket with 10⁶ members is a
    stopword shingle pattern, not a duplicate cluster, and it alone
    contributes m²/2 candidate pairs on one reducer (the standard ER
    hot-bucket guardrail). Costs one extra hash-agg + equi-join, only
    when enabled; the dropped mass is recall the caller explicitly
    traded for boundedness."""
    if bands < 1 or rows_per_band < 1:
        raise ValueError(
            f"lsh_candidate_pairs needs bands >= 1 and rows_per_band >= 1, "
            f"got bands={bands} rows_per_band={rows_per_band}"
        )

    def _bucket(b: int) -> Column:
        band_slice = F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
        full = F.size(band_slice) == rows_per_band
        return F.when(
            full,
            portable_hash64(
                F.concat_ws("_", *[band_slice.getItem(i) for i in range(rows_per_band)])
            ),
        )

    banded = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), _bucket(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    if max_bucket_size is not None:
        if max_bucket_size < 2:
            raise ValueError(
                f"max_bucket_size must be >= 2 (a pair needs a 2-bucket), "
                f"got {max_bucket_size}"
            )
        # window count, not groupBy + join-back (the winnow_near_dups
        # rule): one exchange on the bucket key, no second computation of
        # the banding/signature expression. The join form also dropped
        # NULL-bucket rows (NULL never equi-joins); the window keeps them,
        # which changes nothing — a NULL bucket never pairs in the
        # candidate join below either.
        banded = (
            banded.withColumn(
                "_bsz",
                F.count(F.lit(1)).over(Window.partitionBy("band", "bucket")),
            )
            .filter(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    a, b_ = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.7,
    shingle_k: int = 5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → band buckets →
    candidate pairs → exact Jaccard verification ≥ threshold.
    ``max_bucket_size`` is the opt-in hot-bucket cap passed through to
    :func:`lsh_candidate_pairs`."""
    if k % bands != 0:
        # same guard as hamming_pairs_from_fingerprints: k=10/bands=4 would
        # silently band only 8 of the 10 hashes (rows_per_band = k//bands)
        raise ValueError(f"k must divide evenly into bands, got k={k} bands={bands}")
    sigs = minhash_signatures(docs, id_col, text_col, k, shingle_k)
    cands = lsh_candidate_pairs(sigs, bands, k // bands, max_bucket_size)
    return ngram_jaccard_verify(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")), cands, threshold, shingle_k)


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------

def containment_verify(
    docs: DataFrame,
    pairs: DataFrame,
    shingle_k: int = 5,
    contain_ppm_floor: int = 850_000,
    jaccard_ppm_ceiling: int = 700_000,
) -> DataFrame:
    """Exact one-sided Jaccard (containment) over char-shingle sets for given
    candidate pairs: |A∩B| / min(|A|,|B|) next to the symmetric Jaccard, both
    in exact floor ppm. ``subset_like`` = 1 flags the pairs symmetric-Jaccard
    dedup MISSES: a short document embedded inside a longer one has
    containment ≈ 1 but Jaccard ≈ |A|/|B| — the classic quote/boilerplate/
    wrapper duplication in web corpora. All-integer arithmetic (floor-div
    ppm), so the audit hash-compares bit-exactly cross-engine.

    docs: (doc_id, text); pairs: (doc_a, doc_b). Scale: exact set work rides
    only on CANDIDATE pairs (blocked upstream by LSH banding), never all
    pairs; the two shingle attaches are equi-joins on the uniform doc key."""
    sh = shingle_rows(docs, "doc_id", "text", shingle_k, out="sh")
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
    n_min = F.least(F.size("sh_a"), F.size("sh_b")).cast("long")
    n_union = (F.size("sh_a") + F.size("sh_b")).cast("long") - inter
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("n_inter"),
            n_min.alias("n_min"),
            n_union.alias("n_union"),
        )
        .filter(F.col("n_min") > 0)  # empty shingle set ⇒ no containment defined
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            "n_min",
            F.expr("CAST(n_inter * 1000000L div n_min AS BIGINT)").alias("contain_ppm"),
            F.expr("CAST(n_inter * 1000000L div n_union AS BIGINT)").alias("jaccard_ppm"),
        )
        .withColumn(
            "subset_like",
            (
                (F.col("contain_ppm") >= F.lit(contain_ppm_floor))
                & (F.col("jaccard_ppm") < F.lit(jaccard_ppm_ceiling))
            ).cast("int"),
        )
    )


def ngram_jaccard_verify(
    docs: DataFrame, pairs: DataFrame, threshold: float = 0.7, shingle_k: int = 5
) -> DataFrame:
    """Exact Jaccard over char-shingle sets for given candidate pairs.
    docs: (doc_id, text); pairs: (doc_a, doc_b)."""
    sh = shingle_rows(docs, "doc_id", "text", shingle_k, out="sh")
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = (F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))).cast("double")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_blocked(
    docs: DataFrame,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_k: int = 5,
) -> DataFrame:
    """All-pairs Jaccard within blocks (block key = e.g. source/domain/length
    band) — the classic blocked-comparison shape; never a global cross join."""
    # Enumerate the within-block pairs NARROW (ids + block key only), then
    # attach shingles and verify through ngram_jaccard_verify's two
    # uniform doc_id joins. The previous single self-join carried the
    # shingle arrays through the block-keyed exchange AND ran the per-pair
    # intersect inside the block-join stage — parallelism capped at the
    # number of blocks (a 20-source corpus used 20 of 32 cores, and one
    # hot block serializes; guide §2.5). The verify stage's exchange is
    # keyed by doc id (uniform), so the intersect compute spreads over
    # every core regardless of the block-key distribution; the pair set,
    # the jaccard expression and the threshold filter are unchanged.
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(block_col).alias("blk")
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )
    return ngram_jaccard_verify(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        pairs, threshold, shingle_k,
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_col(text: Column, bits: int = 16) -> Column:
    """SimHash over whitespace tokens: per bit, sum ±1 weighted by token-hash
    bit, emit 1 where the sum is positive. Pure expressions (tokens →
    hashes → per-bit fold), portable to the oracle."""
    toks = F.filter(F.split(F.lower(text), "\\s+"), lambda w: w != F.lit(""))
    hashes = F.transform(toks, lambda w: portable_hash64(w))
    n = F.size(hashes)

    def _ones(b: int):
        # count tokens whose hash has bit b set; closure (NOT a default-arg
        # lambda — extra lambda params are treated as lambda variables).
        return F.size(
            F.filter(hashes, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1)
        )

    out = F.lit(0).cast("bigint")
    for b in range(bits):
        # sum of ±1 == 2*ones - n (integer-exact, matches the oracle SQL)
        out = out + F.when(2 * _ones(b) - n > 0, F.lit(2**b).cast("bigint")).otherwise(
            F.lit(0)
        )
    return out


def simhash_agg(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """Scale variant of :func:`simhash_col`: explode tokens → ONE hash per
    token → single aggregate with per-bit conditional sums. The inline
    expression recomputes the hash array per bit; this computes each token
    hash exactly once (the md5 dominates cost at 10⁹ docs). Docs with no
    tokens get simhash 0. Output identical to :func:`simhash_col`."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "\\s+"), lambda w: w != F.lit(""))
    exploded = docs.select(F.col(id_col).alias("doc_id"), F.explode_outer(toks).alias("tok"))
    # materialize the hash in a PROJECT below the aggregate: each of the
    # ``bits`` per-bit sums embeds its own copy of the hash expression, and
    # aggregate codegen does not share it — the md5 ran 16× per token
    # (measured 3.9 s → 0.9 s at sf0.1, output identical). The hash
    # null-propagates (md5(NULL) = NULL), so count(_h) still counts tokens
    # and coalesce(bit, 0) reproduces the explode_outer NULL handling.
    hashed = exploded.select("doc_id", portable_hash64(F.col("tok")).alias("_h"))
    aggs = [F.count(F.col("_h")).alias("n")] + [
        F.sum(
            F.coalesce(
                F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)), F.lit(0)
            )
        ).alias(f"ones_{b}")
        for b in range(bits)
    ]
    g = hashed.groupBy("doc_id").agg(*aggs)
    sim = None
    for b in range(bits):
        term = F.when(2 * F.col(f"ones_{b}") - F.col("n") > 0, F.lit(2**b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sim = term if sim is None else sim + term
    return g.select("doc_id", sim.alias("simhash"))


def simhash_buckets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """(simhash, n_docs, doc_ids sorted) — identical-simhash near-dup buckets."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), simhash_col(F.col(text_col), bits).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
    )


def hamming_pairs_from_fingerprints(
    fp: DataFrame,
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Banded SimHash near-dup pairing over a (doc_id, simhash) frame —
    Manku/Jain/Das Sarma's WWW'07 web-crawl dedup design re-expressed as a
    DataFrame plan. Split each ``bits``-wide fingerprint into ``bands``
    contiguous chunks; by pigeonhole, any pair within Hamming distance
    ``max_hamming`` < ``bands`` agrees EXACTLY on at least one chunk, so the
    chunk-equality self-join has perfect recall at the threshold and the
    single verify expression ``bit_count(xor)`` removes every false
    positive — the blocked output is bit-identical to the O(n²) scan.

    Scale shape: candidates form only WITHIN a (band, chunk) bucket (never
    all-pairs); chunks shared by more than ``max_bucket`` docs are dropped
    as degenerate buckets first (the stop-fingerprint guard shared with
    :func:`winnow_near_dups` — an empty-doc/boilerplate fingerprint owns a
    corpus-sized bucket that carries no pairwise signal), bounding pair
    volume at O(corpus × max_bucket). Production setting is bits=64 with
    four 16-bit bands (2¹⁶ buckets per band); the 16-bit default here
    matches the t06 oracle-portable fingerprint."""
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole recall needs max_hamming < bands "
            f"(got max_hamming={max_hamming}, bands={bands}): a pair "
            f"differing in every chunk would be missed"
        )
    if bits % bands != 0:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    w = bits // bands
    mask = (1 << w) - 1
    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), b * w).bitwiseAND(F.lit(mask))
            for b in range(bands)
        ]
    )
    bb = fp.select(
        "doc_id", "simhash", F.posexplode(chunks).alias("band", "chunk")
    )
    # degenerate-bucket guard as a window count (the winnow_near_dups
    # rule): the groupBy + semi-join form computed the fingerprint input —
    # for the end-to-end caller, the whole simhash aggregate — twice,
    # because column pruning made the semi-join's two exchange children
    # non-identical and ReuseExchange could not share them. ONE exchange
    # on (band, chunk); count-over-partition ≡ the groupBy count.
    bb = (
        bb.withColumn(
            "_bsz", F.count(F.lit(1)).over(Window.partitionBy("band", "chunk"))
        )
        .filter(F.col("_bsz") <= max_bucket)
        .drop("_bsz")
    )
    a, b = bb.alias("a"), bb.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        # a pair can match in several bands; the fingerprint is functional
        # on doc_id, so distinct over all four columns dedups pairs exactly
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.filter(ham <= max_hamming).select(
        "doc_a", "doc_b", ham.cast("long").alias("hamming")
    )


def simhash_hamming_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 100_000,
) -> DataFrame:
    """SimHash near-dup pairs end-to-end: :func:`simhash_agg` fingerprints
    (one md5 per token, map-side) → :func:`hamming_pairs_from_fingerprints`
    banded join. Completes the near-dup detector family — MinHash banding
    estimates whole-doc Jaccard (:func:`lsh_candidate_pairs`), winnowing
    finds shared verbatim runs (:func:`winnow_near_dups`), SimHash-Hamming
    catches the small-perturbation rewrite (a few tokens changed flips few
    fingerprint bits) at one 64-bit word per doc of state."""
    fp = simhash_agg(docs, id_col=id_col, text_col=text_col, bits=bits)
    return hamming_pairs_from_fingerprints(
        fp, bits=bits, bands=bands, max_hamming=max_hamming, max_bucket=max_bucket
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dups(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.95,
    dim: int | None = None,
    srp_planes: int = 8,
) -> DataFrame:
    """Pairs with cosine ≥ threshold; ALWAYS a blocked self-join — an
    unblocked all-pairs comparison is O(n²) and never acceptable at scale.

    Block key, in priority order:
    - ``block_col``: a caller-supplied column (domain, LSH bucket, IVF cell);
    - ``dim`` given: an SRP-LSH bucket (``srp_planes`` hyperplanes) is
      derived map-side from the vector itself — high-cosine pairs land in
      the same bucket with high probability;
    - neither → ``ValueError`` (the old silent all-pairs degeneration).

    Precondition: ``id_col`` is unique per row (the normal embeddings-table
    contract). The narrow-pairs plan re-attaches vectors by id, so a
    corpus with duplicate ids would fan each pair out over every vector of
    both endpoints — dedupe upstream (e.g. first-wins on id) first."""
    cols = [F.col(id_col).alias("doc_id"), F.col(vec_col).alias("vec")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    elif dim is not None:
        from research_knowledge_graph_spark.operators.similarity import srp_bucket_col

        cols.append(srp_bucket_col(F.col(vec_col), dim, srp_planes).alias("blk"))
    else:
        raise ValueError(
            "embedding_near_dups requires a block: pass block_col=... or "
            "dim=... (auto SRP-LSH bucket); an unblocked all-pairs join is "
            "quadratic and refused"
        )
    # Enumerate pairs NARROW (ids + block key), attach vectors by the
    # uniform doc key, and compute the cosine after that exchange (the
    # ngram_jaccard_pairs_blocked rule): the previous form carried both
    # vectors through the block-keyed join AND ran every per-pair cosine
    # inside the block-join stage, capping the dot-product parallelism at
    # the number of blocks (a label-blocked corpus has few). Pair set and
    # cosine values unchanged.
    dn = embs.select(*cols).select("doc_id", "blk")
    a, b = dn.alias("a"), dn.alias("b")
    cond = (F.col("a.doc_id") < F.col("b.doc_id")) & (F.col("a.blk") == F.col("b.blk"))
    pairs = a.join(b, cond).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )
    va = embs.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("_va"))
    vb = embs.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("_vb"))
    return (
        pairs.join(va, "doc_a")
        .join(vb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(cosine_col(F.col("_va"), F.col("_vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cluster_survivors(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """Near-dup CLUSTER collapse — the step after pair finding in a real
    dedup pipeline: candidate pairs → connected components → per-cluster
    survivor (min id). Returns one row per clustered doc:
    (doc_id, survivor_id, n_docs); the drop list is rows where
    doc_id != survivor_id.

    Cluster sizes come from a groupBy + join back, NOT a window partitioned
    by component: a degenerate corpus where most docs collapse into ONE
    cluster would otherwise land that component on a single reducer. The
    hash-agg partial-aggregates map-side. The size dim is NOT
    force-broadcast: its cardinality is one row per connected component —
    unbounded in the corpus size — so a broadcast hint risks driver OOM at
    100×; AQE converts the join to broadcast at runtime when the dim is
    actually small (the normal case) and keeps a shuffle join otherwise."""
    from research_knowledge_graph_spark.operators.canonicalize import (
        connected_components,
    )

    cc = connected_components(
        pairs.select(F.col(id_a).alias("key_a"), F.col(id_b).alias("key_b"))
    )
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("n_docs"))
    return cc.join(sizes, "component").select(
        F.col("key").alias("doc_id"),
        F.col("component").alias("survivor_id"),
        F.col("n_docs"),
    )


def winnow_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 2,
    max_bucket: int = 1000,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Near-dup candidate pairs by SHARED WINNOWING FINGERPRINTS — the
    MOSS-style complement to MinHash banding (:func:`lsh_candidate_pairs`):
    winnowing guarantees any shared run of ``k + w - 1`` tokens yields a
    shared fingerprint, so ``n_shared`` counts distinct shared text runs
    (copy detection / attribution), where MinHash estimates whole-document
    Jaccard. Returns (doc_a, doc_b, n_shared), doc_a < doc_b, pairs
    sharing at least ``min_shared`` fingerprints.

    Scale shape: identical to LSH banding — fingerprints explode map-side,
    pairs form only WITHIN a fingerprint bucket (never all-pairs), and the
    per-pair count is a partial-aggregatable hash-agg. Fingerprints shared
    by more than ``max_bucket`` documents are dropped as stop-fingerprints
    BEFORE pairing (boilerplate runs — navigation chrome, license headers —
    that would otherwise contribute O(B²) pairs while carrying no dedup
    signal; the exact analog of stop-words in the BM25 path). The guard
    makes worst-case pair volume O(corpus × max_bucket), not O(corpus²)."""
    from research_knowledge_graph_spark.functions.textops import (
        winnow_fingerprint_rows,
    )

    # staged-projection form (see winnow_fingerprint_rows): the inline
    # expression re-evaluated its embedded token/hash chain per lambda
    # element — 25× slower, same values
    fp = winnow_fingerprint_rows(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        "doc_id", "text", k, w, fp_name="fp",
    )
    # stop-fingerprint guard as a WINDOW count over fp, not groupBy +
    # semi-join: the semi-join's aggregate child was column-pruned to (fp)
    # while the probe side kept (doc_id, fp), so the two exchanges were
    # not identical and ReuseExchange could not share them — the winnowing
    # expression (the expensive map work) ran TWICE. The window form has
    # ONE exchange on fp (guide §2.4), the self-join below reuses its
    # partitioning, and count-over-partition ≡ the groupBy count exactly.
    fp = (
        fp.withColumn("_bsz", F.count(F.lit(1)).over(Window.partitionBy("fp")))
        .filter(F.col("_bsz") <= max_bucket)
        .drop("_bsz")
    )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def dup_span_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 13,
) -> DataFrame:
    """Per-document CROSS-DOC duplicated-span coverage — the exact-substring
    dedup audit of Lee et al. ("Deduplicating Training Data Makes Language
    Models Better"): for every document, what fraction of its tokens sits
    inside a ``k``-token gram that also appears in at least one OTHER
    document. The famous k=13 default is the memorization-risk span length
    that suffix-array dedup pipelines target; winnowing (t19/t20) SAMPLES
    this signal, this operator measures it exactly. Within-doc repetition
    is deliberately NOT counted (that is t26's repetition read) — a gram is
    "duplicated" iff it occurs in ≥ 2 DISTINCT documents.

    Returns one row per document: (doc_id, n_tokens, n_dup_positions,
    covered_tokens, coverage_ppm). Coverage is the exact size of the UNION
    of the length-k intervals starting at each duplicated gram position,
    computed with the sorted-starts sweep: since every interval has the
    same length k, union = Σ min(k, next_start − start) with the last
    interval contributing k — one window over the hit positions, no
    interval-merge UDF. coverage_ppm is a floor integer division, so the
    whole result hash-compares bit-exactly cross-engine.

    Scale shape: grams are generated map-side from the per-doc token array
    (transform over sequence — no join, no shuffle to FORM grams); the
    duplicated-gram set is two hash-aggs (distinct (gram, doc) then
    count ≥ 2, both partial-aggregatable); the join back is gram→hits and
    the sweep window partitions by doc_id (bounded per-doc rows). The gram
    key here is the raw k-token string — exact, collision-free, and what
    the oracle checks; at 10¹²-doc scale swap the key for
    sha2(gram, 256) (128-bit collision headroom) so the two shuffles move
    fixed-width keys instead of ~80-byte strings — the plan is otherwise
    unchanged. Tokens are the shared ≥3-letter lower/[^a-z]+ tokenizer
    (the t22/t23 _tok3 definition, array form).

    Reference analog: the dedup/canonicalization stage of the reference's
    linking pipeline (src/services/graph_service.py) dedups entities by
    exact key; this is the corpus-level text-span variant a web-scale
    pretraining pipeline runs before training.
    """
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"),
        lambda t: F.length(t) >= 3,
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), arr.alias("arr")
    ).select(
        "doc_id", F.size("arr").cast("long").alias("n_tokens"), "arr"
    )
    # sequence(1, n) with n < 1 would DESCEND in Spark (step defaults to
    # -1), so gram generation is gated on n_tokens >= k.
    grams = (
        base.filter(F.col("n_tokens") >= k)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(arr) - {k - 1}), "
                    f"s -> struct(s AS pos, concat_ws(' ', slice(arr, s, {k})) AS gram))"
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    )
    dup = (
        grams.select("gram", "doc_id")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    hits = grams.join(dup, "gram", "left_semi").select("doc_id", "pos")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    cov = (
        hits.withColumn(
            "c",
            F.least(
                F.lit(k),
                F.coalesce(F.lead("pos").over(w) - F.col("pos"), F.lit(k)),
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_positions"),
            F.sum("c").alias("covered_tokens"),
        )
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_positions", F.lit(0)).cast("long").alias(
                "n_dup_positions"
            ),
            F.coalesce("covered_tokens", F.lit(0)).cast("long").alias(
                "covered_tokens"
            ),
            F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr("coalesce(covered_tokens, 0L) * 1000000L div n_tokens")
            )
            .alias("coverage_ppm"),
        )
    )

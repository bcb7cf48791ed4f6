"""Corpus-curation operators: quality-floor filtering and PII redaction.

Two standard steps of a web-scale training-data pipeline that compose the
engine's existing primitives:

- :func:`quality_floor_filter` — "drop the bottom decile per source": an
  exact per-stratum percentile threshold (tiny aggregate, one row per
  source) broadcast back against the corpus. The threshold table is
  #sources rows, so the plan is scan → hash-agg (small) → broadcast-join →
  filter; the corpus is scanned twice but never shuffled. Comparisons run
  in 6-decimal space (both the score and the threshold are rounded) so the
  keep/drop decision is reproducible across engines — an unrounded float
  boundary would flip rows between runs of different engines.
- :func:`redact_pii_col` — scrub emails / North-American-style phone
  numbers / IPv4s into typed placeholder tokens. Pure ``regexp_replace``
  chain (map-only, whole-stage codegen); the patterns avoid lookaround so
  the same regex text runs identically under Java regex (Spark) and RE2
  (DuckDB), which is what makes the op oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Patterns shared verbatim with the DuckDB oracle (no lookaround — RE2).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def redact_pii_col(col: Column | str) -> Column:
    """Text with emails/phones/IPv4s replaced by placeholder tokens.
    Order matters: emails first (an email never survives to be half-eaten
    by the IP rule), then phones, then IPs."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def redaction_counts_col(col: Column | str) -> dict[str, Column]:
    """Per-document count of each PII class (how many tokens the redaction
    would replace) — the audit metric curation pipelines track per batch."""
    c = F.col(col) if isinstance(col, str) else col
    out: dict[str, Column] = {}
    applied = c
    for pat, token in PII_PATTERNS:
        name = token.strip("[]").lower()
        out[f"n_{name}"] = F.size(F.regexp_extract_all(applied, F.lit(pat), F.lit(0)))
        # later classes count on the already-redacted text, mirroring the
        # sequential replacement in redact_pii_col
        applied = F.regexp_replace(applied, pat, token)
    return out


def quality_floor_filter(
    df: DataFrame,
    score: Column,
    quantile: float = 0.1,
    strata_col: str = "source",
) -> DataFrame:
    """Drop rows strictly BELOW their stratum's ``quantile`` score — the
    'drop the bottom decile per source' primitive. ``score`` is any
    numeric Column over ``df``'s columns; both it and the exact
    interpolated threshold are rounded to 6 decimals before comparing
    (reproducible boundary). Adds ``score6``.

    Rows TIED with the threshold are KEPT (``>=``, not ``>``): a strict
    comparison wipes a constant-score stratum to zero (its percentile
    equals the only score — e.g. a source of all-empty docs scoring 0.0
    vanishes entirely instead of losing its bottom decile), and ties are
    common once scores round to 6 decimals. A NULL stratum is a stratum
    (``eqNullSafe`` join): its rows are filtered against their own
    threshold, not silently deleted by a null-dropping equi-join."""
    scored = df.withColumn("score6", F.round(score, 6))
    thresholds = scored.groupBy(strata_col).agg(
        F.round(F.percentile("score6", quantile), 6).alias("_floor6")
    ).withColumnRenamed(strata_col, "_stratum")
    return (
        scored.join(
            F.broadcast(thresholds),
            F.col(strata_col).eqNullSafe(F.col("_stratum")),
        )
        .filter(F.col("score6") >= F.col("_floor6"))
        .drop("_floor6", "_stratum")
    )


def source_curation_report(
    docs: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source corpus health report — the dashboard row a web-scale
    ingest keeps per domain/crawl-source when deciding what to keep in a
    training mixture: volume, exact-dup rate, mean quality, token volume,
    and English share.

    Returns one row per source:
    (source, n_docs, n_unique, dup_rate, avg_alpha, total_tokens, en_share).

    Scale: one scan computing the per-doc features (fingerprint, alpha
    ratio, token count, language guess — all pure Catalyst column math,
    map-side) into ONE hash aggregate keyed by source. ``countDistinct``
    keyed by (source, fp) is the only expansion; output is #sources rows.
    At head-domain skew the distinct-count can go through the same
    two-phase salted countDistinct as A2 (functions/salt.py) — not needed
    at the default source cardinality where the single agg's partial
    (map-side) combine already bounds the shuffle to #sources×#partitions
    rows."""
    from research_knowledge_graph_spark.functions.textops import (
        fingerprint_col,
        lang_id_col,
        quality_features_cols,
    )

    q = quality_features_cols(text_col)
    scored = docs.select(
        F.col(source_col).alias("source"),
        fingerprint_col(text_col).alias("fp"),
        q["alpha_ratio"].alias("alpha"),
        q["n_tokens"].alias("n_tokens"),
        lang_id_col(text_col).alias("lang"),
    )
    # dup_rate is over docs WITH a fingerprint: fingerprint(NULL text) is
    # NULL, which count(*) includes but countDistinct excludes — the old
    # 1 - distinct/count(*) form reported every NULL-text doc as a
    # duplicate (and an all-NULL source as dup_rate 1.0). Same md5(NULL)
    # phantom-duplicate class the dedup family drops NULL rows for.
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        F.when(
            F.count("fp") > 0,
            F.round(F.lit(1.0) - F.countDistinct("fp") / F.count("fp"), 6),
        ).otherwise(F.lit(0.0)).alias("dup_rate"),
        # order-invariant mean: double summation order flips the 6th digit
        # across engines/partitionings when the mean lands ~1 ulp from a
        # rounding boundary (the t21 driver-red class, VERDICT r5 #1).
        # Summing exact decimals (cast rounds each double to 18 fractional
        # digits deterministically) makes Spark's pre-round mean the true
        # mean to ~1e-18 regardless of partition order; the oracle SQL is
        # unchanged — DuckDB's avg() lands on the same rounded 6th digit
        # except in the measure-zero case where ITS own accumulation is
        # > 1e-12 off at a boundary. Result identical on all test SFs
        # (oracle-parity pinned); only the order dependence is removed.
        F.round(
            (F.sum(F.col("alpha").cast("decimal(32,18)")) / F.count("alpha"))
            .cast("double"),
            6,
        ).alias("avg_alpha"),
        F.coalesce(F.sum("n_tokens"), F.lit(0).cast("long")).alias("total_tokens"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("en_share"),
    )


def frequent_kgrams(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    top_n: int = 200,
    n_salts: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Duplicated-passage mining: the word k-grams that appear in ≥
    ``min_docs`` DISTINCT documents of the same source — the corpus-level
    contamination / boilerplate / memorization audit every web-scale
    training-data pipeline runs (t19/t20 find near-dup PAIRS; this
    surfaces the shared passages themselves, ranked by reach).

    Returns (source, gram, n_docs), top ``top_n`` by (n_docs DESC,
    source, gram) — (source, gram) is unique after the aggregate, so the
    cut is a total order and fully hash-checkable.

    Scale: tokenize + k-gram windowing is a map-only Catalyst projection
    (lower → whitespace split → slice/array_join per start offset — no
    Python, no shuffle). The distinct-doc count is the textbook hot-key
    aggregation — a true boilerplate gram appears in MOST docs of its
    source, so a plain countDistinct would ship that gram's whole doc-id
    set to one reducer; it runs through
    :func:`~research_knowledge_graph_spark.functions.salt.two_phase_count_distinct`
    (partial distincts per (key, hash(doc_id) mod n_salts) slot, exact by
    slot-disjointness). Final top-n is a TakeOrdered."""
    from research_knowledge_graph_spark.functions.salt import two_phase_count_distinct

    grams = docs.select(
        "doc_id", "source", F.explode(_kgrams_col(text_col, k)).alias("gram")
    )
    counted = two_phase_count_distinct(grams, ["source", "gram"], "doc_id", n_salts)
    return (
        counted.filter(F.col("n_distinct") >= min_docs)
        .select("source", "gram", F.col("n_distinct").cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "source", "gram")
        .limit(top_n)
    )


def _tokens_col(text_col: str):
    """Lowercased whitespace tokens of ``text_col`` — the ONE tokenizer
    shared by every gram/word audit in this module (t24/t25/t26/t27) so the
    token stream can't drift between them. Engine note: Java ``\\s``
    includes vertical tab (\\x0B) while RE2 (DuckDB oracles) ``\\s`` does
    not — identical on real whitespace; a \\x0B-bearing document would
    tokenize differently between operator and oracle (none of the
    deterministic generators emit one; documented, not defended)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), "\\s+"), lambda w: w != F.lit("")
    )


def _kgrams_col(text_col: str, k: int):
    """Array of word k-grams of ``text_col`` (tokens via :func:`_tokens_col`)
    — the ONE copy of the gram windowing shared by :func:`frequent_kgrams`,
    :func:`ngram_novelty`, :func:`repetition_signals` and
    :func:`decontaminate` so the gram stream can't drift between the
    corpus-level and per-doc contamination audits. Pure Catalyst (lower →
    split → slice/array_join per start offset): map-only, no Python.
    Start offsets are 1..len-k+1 (1-based for F.slice); docs shorter than
    k tokens yield an empty array (sequence() would count DOWN on a
    negative span — guarded explicitly)."""
    toks = _tokens_col(text_col)
    starts = F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(starts, lambda i: F.array_join(F.slice(toks, i, k), " "))


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition quality signals — the Gopher-rules family
    ("fraction of most-common word", "duplicate n-gram fraction") that
    web-scale curation thresholds to drop machine-generated / boilerplate
    pages. t25 scores CROSS-doc duplication; this scores INTERNAL
    repetition, the orthogonal axis.

    Returns one row per document with ≥2 tokens (shorter docs have no
    2-grams and are absent; the oracle filters identically):
    (doc_id, n_words, top_word_ppm, n_2grams, dup_2gram_ppm,
    max_2gram_repeat) — all exact integers (the t23/g30 fixed-point
    pattern: ``1e6 * x div total``), so the check is bit-exact.

    - ``top_word_ppm``: occurrences of the doc's most frequent token per
      million tokens (the "most common word fraction" rule).
    - ``dup_2gram_ppm``: repeated 2-gram occurrences per million 2-grams
      (``1e6 * (n - n_distinct) div n`` — a doc that loops one phrase
      scores near 1e6).
    - ``max_2gram_repeat``: occurrence count of the single most repeated
      2-gram (the "how bad is the worst loop" audit column).

    Scale: tokenize + 2-gram windowing is the shared map-only Catalyst
    projection (:func:`_kgrams_col`). Both histograms aggregate on
    composite keys that START with doc_id — per-doc keys, so there is no
    hot key by construction and partial (map-side) combine bounds each
    shuffle to the per-partition distinct count. The final per-doc rollups
    and the doc_id equi-join are ordinary hash ops on a high-cardinality
    uniform key. No Python anywhere."""
    words = docs.select("doc_id", F.explode(_tokens_col(text_col)).alias("word"))
    word_hist = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    per_doc_words = word_hist.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.max("c").cast("long").alias("_top_word_c"),
    )
    grams = docs.select(
        "doc_id", F.explode(_kgrams_col(text_col, 2)).alias("gram")
    )
    gram_hist = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    per_doc_grams = gram_hist.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_2grams"),
        F.count(F.lit(1)).alias("_n_distinct_2grams"),
        F.max("c").cast("long").alias("max_2gram_repeat"),
    )
    return (
        per_doc_words.join(per_doc_grams, "doc_id")
        .select(
            "doc_id",
            "n_words",
            F.expr("(1000000 * _top_word_c) div n_words")
            .cast("long")
            .alias("top_word_ppm"),
            "n_2grams",
            F.expr("(1000000 * (n_2grams - _n_distinct_2grams)) div n_2grams")
            .cast("long")
            .alias("dup_2gram_ppm"),
            "max_2gram_repeat",
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination audit: flag every corpus document that
    shares at least one word ``k``-gram with any document of an evaluation
    ``benchmark`` set — the standard held-out-overlap scrub (GPT-3 appendix
    C shape: n-gram collision against eval sets) a training-data pipeline
    runs before a corpus ships.

    Returns one row per corpus document:
    (doc_id, n_grams, n_hit_grams, contaminated) — distinct k-grams in the
    doc, how many of those occur anywhere in the benchmark, and the boolean
    a mixture builder filters on. Docs shorter than k tokens have
    n_grams = 0 and are clean by definition (they stay in the output —
    an audit must account for every input row).

    Scale & shuffle shape: gram windowing is the shared map-only
    projection (:func:`_kgrams_col`) on both sides. The benchmark gram set
    is deduplicated once; the corpus side joins it on the gram key with a
    LEFT join + hit counting, never a broadcast hint (benchmarks are
    usually tiny — AQE will broadcast them when they actually are — but
    the operator stays correct when "benchmark" is another shard of the
    corpus). A stop-gram duplicates once per containing doc on the corpus
    side (the same posting-list skew as t25's DF attach), which AQE
    skew-join splits; at 10^12 docs you would join on ``xxhash64(gram)``
    to cut the shuffled key bytes ~8× (documented, not done here: the
    oracle's bit-exactness contract favors the collision-free string key
    at test scale)."""
    bench_grams = (
        benchmark.select(F.explode(_kgrams_col(text_col, k)).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corpus_grams = corpus.select(
        "doc_id", F.explode(_kgrams_col(text_col, k)).alias("gram")
    ).distinct()
    hits = corpus_grams.join(bench_grams, "gram", "left").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hit_grams"),
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_hit_grams", F.lit(0)).cast("long").alias("n_hit_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def ngram_novelty(
    docs: DataFrame, k: int = 8, text_col: str = "text"
) -> DataFrame:
    """Per-document cross-doc duplication exposure — for each document, how
    much of its k-gram inventory also appears in at least one OTHER
    document. The per-doc decontamination / memorization-risk audit
    (t24's :func:`frequent_kgrams` surfaces the shared passages
    corpus-wide; this scores each DOCUMENT by how derivative it is — the
    signal a training-data pipeline thresholds to quarantine
    benchmark-contaminated or boilerplate-heavy pages).

    Returns (doc_id, n_grams, n_shared, shared_ppm): distinct k-grams in
    the doc, how many of those occur in ≥2 distinct docs, and the shared
    fraction in exact parts-per-million (``1e6 * n_shared div n_grams`` —
    floor integer division, the t23/g30 fixed-point pattern; no floats).
    Docs with fewer than k tokens have no grams and are absent from the
    output (documented; the oracle filters identically).

    Scale & shuffle shape: gram windowing is the shared map-only
    projection (:func:`_kgrams_col`); per-doc distinct grams is one
    composite-key shuffle (per-doc keys — no hot key by construction).
    After that distinct, each gram's row count IS its distinct-doc count,
    so the document frequency is a plain ``groupBy(gram).count()`` —
    map-side combinable with 8-byte state; no salted countDistinct needed
    (a stop-gram's per-partition rows collapse to one partial count before
    the shuffle). The DF attach is a gram-keyed join of the posting rows
    against the one-row-per-gram count dim — never broadcast (|dim| =
    |gram vocabulary|, unbounded); a stop-gram's posting rows pile onto
    one join partition, which AQE skew-join splits (session-wide). Final
    per-doc rollup is an ordinary hash-agg on doc_id."""
    grams = docs.select(
        "doc_id", F.explode(_kgrams_col(text_col, k)).alias("gram")
    ).distinct()
    df_per_gram = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    return (
        grams.join(df_per_gram, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("n_distinct") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_shared"),
        )
        .withColumn(
            "shared_ppm", F.expr("(1000000 * n_shared) div n_grams").cast("long")
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus snapshot diff — the dataset-versioning primitive a
    training-data pipeline runs between two crawls / two releases of the
    same corpus: which documents were added, removed, changed (same key,
    different content fingerprint), or carried unchanged. The per-row
    status stream feeds incremental re-processing (only added/changed
    rows re-enter extraction — the exact contract of the incremental
    pipeline's delta appends, ``plans/pipeline.py``) and the release
    audit row (counts per status).

    Returns one row per key present in EITHER snapshot:
    (key, status ∈ {added, removed, changed, unchanged}). Content
    identity is the engine-portable 60-bit text fingerprint
    (:func:`~research_knowledge_graph_spark.functions.textops.fingerprint_col`
    — whitespace-normalized, both engines bit-identical), so the status
    column is exact and oracle-checkable.

    Scale: fingerprints are map-side; the only shuffle is ONE full-outer
    equi-join on the high-cardinality uniform key (both sides
    pre-projected to (key, fp) — 16 bytes of payload per row, never the
    text). At 10^12 docs the join partitions by key hash exactly as the
    snapshots should already be bucketed; no skew term (keys are
    unique per side by construction — enforce upstream with t04's exact
    dedup if the source is unkeyed)."""
    from research_knowledge_graph_spark.functions.textops import fingerprint_col

    # presence is tracked with explicit flags, NOT fingerprint nullness — a
    # NULL text fingerprints to NULL, which would masquerade as an absent
    # key; eqNullSafe keeps NULL==NULL reading as unchanged
    o = old.select(
        F.col(key_col).alias("key"),
        fingerprint_col(text_col).alias("old_fp"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col).alias("key"),
        fingerprint_col(text_col).alias("new_fp"),
        F.lit(True).alias("_in_new"),
    )
    return o.join(n, "key", "full_outer").select(
        "key",
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def vocab_overlap(
    docs: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Cross-source VOCABULARY overlap — unigram Jaccard per unordered
    source pair. t28's duplication matrix counts near-duplicate DOCUMENT
    pairs (syndicated articles, mirrors); this measures how much two
    sources write in the same *words* regardless of document identity —
    the register/topic-redundancy diagnostic behind mixture weighting
    (two crawls of the same forum share vocabulary long before they share
    whole documents) and a cheap prior for where t28 is worth running.

    Returns one row per source pair that shares ≥1 token:
    (source_a < source_b, n_shared, vocab_a, vocab_b, jaccard_ppm) with
    jaccard_ppm = ``n_shared·10⁶ div (vocab_a + vocab_b − n_shared)`` —
    non-negative fixed-point division, so Spark ``div`` == DuckDB ``//``
    bit-exactly. Tokens via :func:`_tokens_col` (the ONE shared
    lowercased-whitespace tokenizer of this module). Pairs sharing zero
    vocabulary are absent (inner join) — any pair of real text sources
    shares *something*, and absence itself is the signal.

    Scale: the raw corpus reduces map-side to distinct (source, token) —
    vocabulary cardinality, not token count. The token-keyed self-join's
    per-key fanout is bounded by #sources (a token posts at most once per
    source), so even "the" produces ≤ #sources² pair rows per token — no
    hot key in the corpus-size sense; the pair rollup partial-aggregates
    map-side into ≤ #sources² groups. The sizes dim is #sources rows —
    genuinely bounded, so the final joins are left to AQE (broadcast at
    runtime), no forced hint. Both self-join sides are the same subplan;
    ReuseExchange shares the distinct's shuffle."""
    vocab = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(_tokens_col(text_col)).alias("token"),
        )
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab")
    )
    pairs = (
        vocab.alias("a")
        .join(vocab.alias("b"), "token")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        pairs.join(
            sizes.select(
                F.col("source").alias("source_a"),
                F.col("n_vocab").alias("vocab_a"),
            ),
            "source_a",
        )
        .join(
            sizes.select(
                F.col("source").alias("source_b"),
                F.col("n_vocab").alias("vocab_b"),
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "vocab_a",
            "vocab_b",
            F.expr(
                "CAST(n_shared * 1000000L div (vocab_a + vocab_b - n_shared)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


def length_quality_correlation(
    docs: DataFrame,
    text_col: str = "text",
    len_col: str = "n_chars",
    source_col: str = "source",
) -> DataFrame:
    """Per-source Pearson correlation between document length and the
    alpha-ratio quality score — the "does the quality score just proxy
    length?" audit run before using either signal to filter a training
    mixture (a corr near ±1 means one threshold silently implies the
    other; near 0 means they select different documents).

    Returns one row per source with ≥2 docs and positive variance on
    both measures: (source, n_docs, len_quality_corr). Zero-variance /
    singleton sources are dropped rather than published as NULL — NULL
    measures break order-by-value consumers (and the repo's oracle
    harness sorts rows by value; the v12 no-baseline rule).

    Exactness: :func:`~..graph_queries.degree_assortativity`'s
    six-exact-sums pattern lifted to curation — the quality score is
    first floored to integer MILLI (``alpha_chars·10³ div n_chars`` —
    non-negative, so Spark ``div`` == DuckDB ``//``), then n/Σx/Σy/Σxy/
    Σx²/Σy² accumulate as exact bigints (map-side-combinable,
    partition-order-free) and the float Pearson formula runs ONCE per
    source row. Milli (not ppm) bounds the y side: ``n·Σy² ≤ n²·10⁶``,
    int64-safe to ~3·10⁶ docs·source⁻¹; the x side is corpus-dependent
    (``n·Σx² ≤ n²·max_len²`` — ~10⁵ docs/source at 10⁵-char docs).
    Beyond those, Spark's ANSI mode FAILS LOUDLY on the long overflow
    (it cannot publish a silently wrong corr; DuckDB would promote to
    HUGEINT, so a silent wrap would also hash-diverge) — the 100-TB
    deployment recipe is to pre-aggregate per (source, length-bucket)
    or widen the six sums to decimal(38,0) first. The variance-positive
    filter is an exact integer predicate, identical cross-engine.

    Scale: one map-side-combinable hash-agg to #sources rows; the filter
    and formula run on that bounded frame. No joins, no windows, no
    Python."""
    # the caller's text column is re-aliased to a fixed internal name
    # BEFORE the SQL expression references it: f-string-interpolating an
    # arbitrary column name into F.expr breaks on spaces/reserved words
    # (the bug class t53's charset_audit fix removed)
    projected = docs.select(
        F.col(source_col).alias("source"),
        F.col(len_col).cast("long").alias("x"),
        F.col(text_col).alias("_lqc_text"),
    )
    y_expr = (
        "CAST(CASE WHEN length(_lqc_text) > 0 THEN "
        "length(regexp_replace(_lqc_text, '[^A-Za-z]', '')) * 1000L "
        "div length(_lqc_text) ELSE 0 END AS BIGINT)"
    )
    xy = projected.select("source", "x", F.expr(y_expr).alias("y"))
    s = xy.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double"))
    return (
        s.filter((F.col("n") >= 2) & (varx > 0) & (vary > 0))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.round(num / den, 6).alias("len_quality_corr"),
        )
    )


def vocab_coverage(
    docs: DataFrame, top_n: int = 200, text_col: str = "text"
) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-design read "how much of
    the token stream does a top-N vocabulary cover?": the N most frequent
    tokens ranked with their cumulative corpus share. The elbow of this
    curve is what sizes a vocabulary / stopword list and predicts how an
    OOV policy will behave; read next to t18's per-doc accounting and
    t24's k-gram mining (this is their corpus-level rank-frequency
    profile, the Zipf head made explicit).

    Returns exactly ``top_n`` rows (fewer only if the corpus vocabulary is
    smaller): (rank, token, freq, cum_ppm) on the total order
    (freq DESC, token ASC) — the tie-break makes the top-N boundary and
    every rank deterministic. ``cum_ppm = cum_freq·10⁶ div total_tokens``
    is non-negative fixed point (Spark ``div`` == DuckDB ``//``), so the
    curve is bit-exact cross-engine. Tokens via :func:`_tokens_col` (the
    ONE shared lowercased-whitespace tokenizer of this module).

    Scale: the corpus reduces map-side to (token, freq) — vocabulary
    cardinality; the total-token scalar is a separate map-only pass over
    the per-doc token counts (one row, broadcast). The ordered top-N is a
    TakeOrdered over the vocab frame (per-partition heaps, no full sort),
    and the ONLY window runs on the ≤ top_n result frame — a bounded
    single-partition window by construction, never on corpus- or
    vocab-sized data. No joins beyond the 1-row broadcast, no Python."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    freq = (
        docs.select(F.explode(_tokens_col(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    total = docs.select(
        F.sum(F.size(_tokens_col(text_col)))
        .cast("long")
        .alias("total_tokens")
    )
    top = freq.orderBy(F.desc("freq"), "token").limit(top_n)
    order = Window.orderBy(F.desc("freq"), "token")
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.withColumn("rank", F.row_number().over(order).cast("bigint"))
        .withColumn("cum_freq", F.sum("freq").over(cum))
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "token",
            "freq",
            F.expr("(1000000 * cum_freq) div total_tokens")
            .cast("long")
            .alias("cum_ppm"),
        )
    )


def term_burstiness(
    docs: DataFrame, top_n: int = 100, text_col: str = "text"
) -> DataFrame:
    """Term burstiness profile — the Church/Gale dispersion read that
    separates BOILERPLATE vocabulary (spread thinly and evenly across
    documents, variance-to-mean ≈ or below 1) from TOPICAL vocabulary
    (concentrated in bursts inside the documents that are about it,
    VMR ≫ 1): for each of the top-N corpus terms, the variance-to-mean
    ratio of its per-document count over ALL documents (zeros included),
    in exact floor-ppm fixed point. Curation uses the split both ways:
    low-VMR heads are stopword/boilerplate candidates, high-VMR terms are
    the topical signal quality scoring should not strip.

    VMR over all N docs reduces to integers: mean = S/N, N²·var =
    N·SS − S² (zero-count docs add nothing to SS), so
    ``vmr_ppm = (N·SS − S²)·10⁶ div (N·S)`` — the dividend is
    non-negative by Cauchy–Schwarz, so Spark ``div`` == DuckDB ``//``
    bit-exactly. Overflow: the binding terms are ``S²`` and ``10⁶·N·SS``
    (S = corpus frequency of the term, SS ≤ S·c_max): int64-safe while
    S ≤ 3·10⁹ and N·SS ≤ 9·10¹² — beyond that compute per stratum or
    widen to DECIMAL; ANSI mode fails loudly, never wraps.

    Returns (rank, token, n_docs, freq, sq_freq, vmr_ppm) on the total
    order (freq DESC, token ASC) — deterministic ranks and top-N
    boundary. Tokens via :func:`_tokens_col` (the ONE shared tokenizer).

    Scale: per-(doc, term) counts reduce map-side before the term-keyed
    aggregate; the doc-count scalar is a 1-row broadcast; the ordered
    top-N is a TakeOrdered (per-partition heaps) and the only window runs
    on the ≤ top_n bounded frame. No joins beyond the 1-row broadcast."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    per = (
        docs.select("doc_id", F.explode(_tokens_col(text_col)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    stats = per.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("c").cast("long").alias("freq"),
        F.sum(F.expr("c * c")).cast("long").alias("sq_freq"),
    )
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    top = stats.orderBy(F.desc("freq"), "token").limit(top_n)
    order = Window.orderBy(F.desc("freq"), "token")
    return (
        top.withColumn("rank", F.row_number().over(order).cast("bigint"))
        .crossJoin(F.broadcast(n))
        .select(
            "rank",
            "token",
            "n_docs",
            "freq",
            "sq_freq",
            F.expr(
                "CAST((n_corpus * sq_freq - freq * freq) * 1000000L"
                " div (n_corpus * freq) AS BIGINT)"
            ).alias("vmr_ppm"),
        )
    )


def length_ks_drift(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source Kolmogorov–Smirnov drift of the document-LENGTH
    distribution against the rest of the corpus — the NONPARAMETRIC
    sibling of t42's unigram KL: KL asks "is the vocabulary used
    differently", this asks "did the SHAPE of the length distribution
    move" (the classic extraction-regression signature: a boilerplate
    stripper that starts truncating one domain shifts its whole length
    ECDF long before any vocabulary statistic notices). KS is the right
    tool because it is distribution-free and EXACT in integers: with
    cum_s(v) the source's doc count at length ≤ v and cum_r(v) the
    rest's, the KS statistic max_v |cum_s/n_s − cum_r/n_r| cross-
    multiplies to ``ks_num = max_v |cum_s·n_r − cum_r·n_s|`` — every
    term an exact bigint, the division deferred to one final floor-ppm
    (``ks_ppm = 10⁶·ks_num div (n_s·n_r)``). Both ECDFs only jump at
    observed lengths, so evaluating on the pooled distinct-value spine
    is exact, and the spine must be COMPLETE per source (a source
    missing a value still has an ECDF step there — the v26/v27 real-
    zeros rule). ``ks_at_value`` is the argmax length (ties to the
    smallest — an explicit (d desc, v asc) row_number), the "where do
    the two distributions split" diagnostic.

    Returns (source, n_docs, n_rest, ks_num, ks_ppm, ks_at_value);
    single-source corpora drop out (n_rest = 0, the v12 baseline-less
    rule). NULL-text docs carry no length and are excluded on both
    sides.

    Scale: one (source, v) hash-agg over the corpus (map-side
    combinable); everything downstream runs on the #sources × #distinct-
    lengths spine — bounded by the max document length, not the corpus
    (the v26 spine argument); the per-source cumulative windows and the
    argmax row_number run on that same reduced frame (v23's rule). The
    1-row corpus total is a bounded broadcast. Overflow: 10⁶·ks_num ≤
    10⁶·n_s·n_r binds at n_s·n_r ≈ 9.2·10¹² (e.g. 10⁵ docs in the
    source × 10⁸ in the rest) — ANSI fails loudly beyond; rescale to
    per-mille or sample the ECDF there (t33's documented-bound
    precedent)."""
    per = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(source_col).alias("source"),
        F.length(text_col).cast("long").alias("v"),
    )
    cnt = per.groupBy("source", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c_sv")
    )
    vals = cnt.select("v").distinct()
    srcs = cnt.groupBy("source").agg(F.sum("c_sv").cast("long").alias("n_s"))
    cv = cnt.groupBy("v").agg(F.sum("c_sv").cast("long").alias("c_v"))
    total = cv.agg(F.sum("c_v").cast("long").alias("n_total"))
    spine = srcs.crossJoin(vals)
    j = (
        spine.join(cnt, ["source", "v"], "left")
        .join(cv, "v")
        .select(
            "source",
            "n_s",
            "v",
            F.coalesce(F.col("c_sv"), F.lit(0)).cast("long").alias("c_sv"),
            "c_v",
        )
    )
    w = Window.partitionBy("source").orderBy("v")
    cum = j.select(
        "source",
        "n_s",
        "v",
        F.sum("c_sv").over(w).cast("long").alias("cum_s"),
        F.sum("c_v").over(w).cast("long").alias("cum_all"),
    )
    d = cum.crossJoin(F.broadcast(total)).select(
        "source",
        "n_s",
        "v",
        (F.col("n_total") - F.col("n_s")).cast("long").alias("n_rest"),
        F.abs(
            F.col("cum_s") * (F.col("n_total") - F.col("n_s"))
            - (F.col("cum_all") - F.col("cum_s")) * F.col("n_s")
        )
        .cast("long")
        .alias("d_num"),
    )
    r = Window.partitionBy("source").orderBy(
        F.col("d_num").desc(), F.col("v").asc()
    )
    return (
        d.withColumn("rn", F.row_number().over(r))
        .filter((F.col("rn") == 1) & (F.col("n_rest") > 0))
        .select(
            "source",
            F.col("n_s").alias("n_docs"),
            "n_rest",
            F.col("d_num").alias("ks_num"),
            F.expr("(1000000 * d_num) div (n_s * n_rest)")
            .cast("long")
            .alias("ks_ppm"),
            F.col("v").alias("ks_at_value"),
        )
    )


def charset_audit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source character-class / encoding-health profile — the
    mojibake read a Common-Crawl-scale corpus runs before anything else:
    a source whose U+FFFD (replacement-char) or control-char share is
    non-zero shipped broken transcoding, and a non-ASCII share far off a
    source's language profile flags double-encoded UTF-8 — failure modes
    upstream of every text op (tokenizers and LSH shingles silently
    fragment on them). Complements t02's whitespace/punct quality ratios
    (per-doc, curation-facing) with the per-SOURCE encoding marginal.

    Counts are exact bigints: each class is ``length(s) −
    length(regexp_replace(s, class, ''))`` where every class is an
    explicit ASCII code-point range — the subset of regex both Java
    (Spark) and RE2 (DuckDB) interpret identically; no \\s, \\w or
    POSIX names whose semantics diverge (the documented \\x0B lesson).
    U+FFFD is counted via literal (non-regex) ``replace``. Both engines'
    ``length`` counts Unicode CODE POINTS (Spark ``UTF8String.numChars``,
    DuckDB code-point length), so the counts agree on any plane; shares
    are floor ppm over the source's total chars. Zero-char sources drop
    by the exact predicate (the v12 baseline-less rule — a share over 0
    chars is undefined, and a published NULL breaks the gate's row
    sort).

    Scale: one map-side projection per doc (a handful of single-pass
    regex counts over the already-scanned text column) and ONE bounded
    hash-agg keyed by source — no joins, no windows, no shuffle beyond
    the #sources-sized rollup."""
    t = F.col(text_col)
    n = F.length(t)

    def _cnt(pat: str) -> Column:
        return (n - F.length(F.regexp_replace(t, pat, ""))).cast("long")

    per_doc = docs.filter(t.isNotNull()).select(
        "source",
        n.cast("long").alias("chars"),
        _cnt("[A-Za-z]").alias("letters"),
        _cnt("[0-9]").alias("digits"),
        _cnt("[ \t\n\r]").alias("ws"),
        # ASCII control chars minus the three whitespace ones above
        _cnt("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]").alias("ctl"),
        _cnt("[^\x00-\x7f]").alias("nonascii"),
        (n - F.length(F.replace(t, F.lit("�"), F.lit(""))))
        .cast("long")
        .alias("repl"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("chars").cast("long").alias("n_chars"),
        F.sum("letters").cast("long").alias("n_letters"),
        F.sum("digits").cast("long").alias("n_digits"),
        F.sum("ws").cast("long").alias("n_ws"),
        F.sum("ctl").cast("long").alias("n_control"),
        F.sum("nonascii").cast("long").alias("n_nonascii"),
        F.sum("repl").cast("long").alias("n_replacement"),
    )
    return agg.filter(F.col("n_chars") > 0).select(
        "source",
        "n_docs",
        "n_chars",
        "n_letters",
        "n_digits",
        "n_ws",
        "n_control",
        "n_nonascii",
        "n_replacement",
        F.expr("n_nonascii * 1000000L div n_chars").alias("nonascii_ppm"),
        F.expr("n_control * 1000000L div n_chars").alias("control_ppm"),
        F.expr("n_replacement * 1000000L div n_chars").alias(
            "replacement_ppm"
        ),
    )

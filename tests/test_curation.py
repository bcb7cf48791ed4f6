"""Curation operators: PII redaction vectors and the quality-floor filter
(the sf-scale oracle twins are t14/t15 in tests/test_entry_oracle.py)."""

from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.curation import (
    quality_floor_filter,
    redact_pii_col,
    redaction_counts_col,
)


def test_redact_pii_vectors(spark):
    rows = [
        (1, "mail a.b-c_d@sub.example.org now"),
        (2, "call 555-867-5309 or 555.123.4567"),
        (3, "host 192.168.0.1 and 10.0.255.7"),
        (4, "mix bob@x.io at 10.1.2.3 tel 555-000-1111"),
        (5, "clean text, no pii at all"),
        (6, "not-a-phone 12-345-6789 not-an-ip 1.2.3"),
    ]
    df = spark.createDataFrame(rows, "id int, s string")
    out = {r.id: r.red for r in df.select("id", redact_pii_col("s").alias("red")).collect()}
    assert out[1] == "mail [EMAIL] now"
    assert out[2] == "call [PHONE] or [PHONE]"
    assert out[3] == "host [IP] and [IP]"
    assert out[4] == "mix [EMAIL] at [IP] tel [PHONE]"
    assert out[5] == rows[4][1]  # untouched
    assert out[6] == rows[5][1]  # near-misses survive

    counts = redaction_counts_col("s")
    got = {
        r.id: (r.n_email, r.n_phone, r.n_ip)
        for r in df.select(
            "id", counts["n_email"].alias("n_email"),
            counts["n_phone"].alias("n_phone"), counts["n_ip"].alias("n_ip"),
        ).collect()
    }
    assert got[4] == (1, 1, 1) and got[5] == (0, 0, 0) and got[2] == (0, 2, 0)


def test_quality_floor_filter(spark):
    # scores 0..9 per stratum; p10 of 0..9 = 0.9 → strictly-above keeps 1..9
    df = spark.range(20).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("source"),
        (F.col("id") / 2).cast("int").cast("double").alias("sc"),
    )
    kept = quality_floor_filter(df, F.col("sc"), 0.1, "source")
    per_src = {r.source: r["count"] for r in kept.groupBy("source").count().collect()}
    assert per_src == {"0": 9, "1": 9}  # exactly the floor row dropped
    assert kept.filter(F.col("score6") <= 0.9).count() == 0
    assert "score6" in kept.columns and "_floor6" not in kept.columns


def test_source_curation_report(spark):
    from research_knowledge_graph_spark.operators.curation import (
        source_curation_report,
    )

    docs = spark.createDataFrame(
        [
            # srcA: 3 docs, one exact dup pair (whitespace/case-normalized),
            # all English-markered
            (1, "the and is a test", "srcA"),
            (2, "The  and is a TEST", "srcA"),
            (3, "the quick brown fox and the dog", "srcA"),
            # srcB: 1 doc, no markers of any language -> 'und'
            (4, "zzz qqq", "srcB"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in source_curation_report(docs).collect()}
    a, b = got["srcA"], got["srcB"]
    assert (a.n_docs, a.n_unique) == (3, 2)
    assert a.dup_rate == round(1 - 2 / 3, 6)
    assert a.total_tokens == 5 + 5 + 7
    assert a.en_share == 1.0
    assert (b.n_docs, b.n_unique, b.dup_rate, b.en_share) == (1, 1, 0.0, 0.0)


def test_frequent_kgrams_hand_computed(spark):
    """k=3, min_docs=2: grams shared by >=2 DISTINCT docs of one source
    survive; repeats within one doc count once; short docs contribute
    nothing; sources don't pool."""
    from research_knowledge_graph_spark.operators.curation import frequent_kgrams

    docs = spark.createDataFrame(
        [
            (1, "s", "a b c d"),
            (2, "s", "a b c x"),
            (3, "s", "a b c d"),
            (4, "t", "a b c"),                  # lone doc in source t
            (5, "s", "zz"),                     # shorter than k
            (6, "s", "p q r p q r p q r"),      # same gram 3x, ONE doc
        ],
        "doc_id long, source string, text string",
    )
    got = [
        (r.source, r.gram, r.n_docs)
        for r in frequent_kgrams(docs, k=3, min_docs=2, top_n=10).collect()
    ]
    assert got == [("s", "a b c", 3), ("s", "b c d", 2)]
    # n_salts must not change the exact counts (slot-disjoint partials)
    got1 = [
        (r.source, r.gram, r.n_docs)
        for r in frequent_kgrams(docs, k=3, min_docs=2, top_n=10, n_salts=3).collect()
    ]
    assert got1 == got


def test_ngram_novelty_hand_computed(spark):
    """k=3: shared means the gram occurs in >=2 DISTINCT docs; within-doc
    repeats count once (distinct grams per doc); sub-k docs are absent;
    shared_ppm is exact floor ppm."""
    from research_knowledge_graph_spark.operators.curation import ngram_novelty

    docs = spark.createDataFrame(
        [
            # doc1 grams: {a b c, b c d} — both also in doc2 → 2/2 shared
            (1, "a b c d"),
            # doc2 grams: {a b c, b c d, c d e} — c d e unique → 2/3
            (2, "a b c d e"),
            # doc3: grams all unique to doc3 → 0/3 shared
            (3, "p q r p q r"),  # tokens [p,q,r,p,q,r]
            (4, "zz"),  # shorter than k → absent
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in ngram_novelty(docs, k=3).collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[1].n_grams, rows[1].n_shared, rows[1].shared_ppm) == (2, 2, 1000000)
    assert (rows[2].n_grams, rows[2].n_shared, rows[2].shared_ppm) == (3, 2, 666666)
    # doc3 tokens [p,q,r,p,q,r] → distinct grams {p q r, q r p, r p q}
    # ("p q r" occurs twice but counts once per doc)
    assert (rows[3].n_grams, rows[3].n_shared, rows[3].shared_ppm) == (3, 0, 0)
    # text_col knob matches the module's other audits
    renamed = {
        r.doc_id: r
        for r in ngram_novelty(
            docs.withColumnRenamed("text", "body"), k=3, text_col="body"
        ).collect()
    }
    assert {k: (v.n_grams, v.n_shared, v.shared_ppm) for k, v in rows.items()} == {
        k: (v.n_grams, v.n_shared, v.shared_ppm) for k, v in renamed.items()
    }


def test_repetition_signals_hand_computed(spark):
    """All-integer per-doc repetition metrics; sub-2-token docs absent."""
    from research_knowledge_graph_spark.operators.curation import repetition_signals

    docs = spark.createDataFrame(
        [
            # tokens [a,b,a,b,a]: n_words=5, top word a ×3 → 600000 ppm;
            # 2-grams [a b, b a, a b, b a]: n=4, distinct=2 → dup 500000 ppm,
            # max repeat 2
            (1, "a b A b a"),
            # no repetition at all: [x,y,z] → grams [x y, y z] all unique
            (2, "x y z"),
            # pathological loop: [p,p,p,p] → top word 1e6 ppm;
            # grams [p p]×3 → dup (3-1)/3 → 666666 ppm, max repeat 3
            (3, "p p p p"),
            (4, "solo"),  # 1 token → no 2-grams → absent
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert set(rows) == {1, 2, 3}
    r1 = rows[1]
    assert (r1.n_words, r1.top_word_ppm) == (5, 600000)
    assert (r1.n_2grams, r1.dup_2gram_ppm, r1.max_2gram_repeat) == (4, 500000, 2)
    r2 = rows[2]
    assert (r2.n_words, r2.top_word_ppm) == (3, 333333)
    assert (r2.n_2grams, r2.dup_2gram_ppm, r2.max_2gram_repeat) == (2, 0, 1)
    r3 = rows[3]
    assert (r3.n_words, r3.top_word_ppm) == (4, 1000000)
    assert (r3.n_2grams, r3.dup_2gram_ppm, r3.max_2gram_repeat) == (3, 666666, 3)


def test_decontaminate_hand_computed(spark):
    """k=3 gram overlap vs a benchmark set; short docs clean by definition
    and PRESENT (audit covers every corpus row)."""
    from research_knowledge_graph_spark.operators.curation import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "a b c d"),      # grams {a b c, b c d}: a b c hits → contaminated
            (2, "x y z w"),      # grams {x y z, y z w}: no hits
            (3, "q q"),          # < k tokens → 0 grams, clean
            (4, "b c d e a b c"),  # grams {b c d, c d e, d e a, e a b, a b c}:
            # only "a b c" is in the benchmark → 1 hit
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, "A B C"), (101, "unrelated words here")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in decontaminate(corpus, benchmark, k=3).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert (rows[1].n_grams, rows[1].n_hit_grams, rows[1].contaminated) == (2, 1, True)
    assert (rows[2].n_grams, rows[2].n_hit_grams, rows[2].contaminated) == (2, 0, False)
    assert (rows[3].n_grams, rows[3].n_hit_grams, rows[3].contaminated) == (0, 0, False)
    assert (rows[4].n_grams, rows[4].n_hit_grams, rows[4].contaminated) == (5, 1, True)


def test_snapshot_diff_hand_computed(spark):
    """All four statuses; whitespace-normalized fingerprint means a
    whitespace-only edit reads unchanged."""
    from research_knowledge_graph_spark.operators.curation import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, "delta"), (4, "kept  text")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha beta"), (3, "delta CHANGED"), (4, "kept text"), (5, "brand new")],
        "doc_id long, text string",
    )
    rows = {r.key: r.status for r in snapshot_diff(old, new).collect()}
    assert rows == {
        1: "unchanged",
        2: "removed",
        3: "changed",
        4: "unchanged",  # whitespace-only edit
        5: "added",
    }


def test_snapshot_diff_null_text_is_presence_not_absence(spark):
    """A NULL text means the KEY is still present: NULL->value and
    value->NULL read changed (not added/removed), NULL->NULL unchanged."""
    from research_knowledge_graph_spark.operators.curation import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "now set"), (2, None), (3, None)], "doc_id long, text string"
    )
    rows = {r.key: r.status for r in snapshot_diff(old, new).collect()}
    assert rows == {1: "changed", 2: "changed", 3: "unchanged"}


def test_vocab_overlap_hand_computed(spark):
    """Vocabulary is a per-source SET (repeats within and across docs count
    once); zero-overlap pairs are absent; jaccard_ppm is exact floor."""
    from research_knowledge_graph_spark.operators.curation import vocab_overlap

    docs = spark.createDataFrame(
        [
            (1, "the cat sat", "sA"),
            (2, "the dog", "sA"),
            (3, "The cat runs", "sB"),
            (4, "zzz qqq", "sC"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        (r.source_a, r.source_b): r for r in vocab_overlap(docs).collect()
    }
    # vocab: sA={the,cat,sat,dog}(4)  sB={the,cat,runs}(3)  sC={zzz,qqq}(2)
    assert set(rows) == {("sA", "sB")}  # sC shares nothing -> absent
    r = rows[("sA", "sB")]
    assert (r.n_shared, r.vocab_a, r.vocab_b) == (2, 4, 3)
    assert r.jaccard_ppm == 2_000_000 // 5  # |A∪B| = 4+3-2


def test_length_quality_correlation_numpy_pin(spark):
    """Pearson over (n_chars, floor-milli alpha ratio) matches numpy on a
    hand-built corpus; the singleton source and the zero-variance source
    are dropped (exact integer predicate, no NULL rows published)."""
    import numpy as np

    from research_knowledge_graph_spark.operators.curation import (
        length_quality_correlation,
    )

    rows = [
        # source A: varying length and alpha mix
        (1, "aaaa", "A"),            # alpha 4/4
        (2, "aa 11 bb", "A"),        # alpha 4/8
        (3, "a1 b2 c3 d4 e5 f", "A"),  # alpha 6/16
        # source B: zero variance on BOTH measures -> dropped
        (4, "abcd", "B"),
        (5, "wxyz", "B"),
        # source C: singleton -> dropped
        (6, "hello", "C"),
    ]
    docs = spark.createDataFrame(
        [(i, t, s, len(t)) for i, t, s in rows],
        "doc_id long, text string, source string, n_chars long",
    )
    got = {r.source: r for r in length_quality_correlation(docs).collect()}
    assert set(got) == {"A"}
    xs = [len(t) for _, t, s in rows if s == "A"]
    ys = [sum(c.isalpha() for c in t) * 1000 // len(t) for _, t, s in rows if s == "A"]
    expected = round(float(np.corrcoef(xs, ys)[0, 1]), 6)
    assert got["A"].n_docs == 3
    assert abs(got["A"].len_quality_corr - expected) < 1e-6


def test_term_burstiness_separates_boilerplate_from_topical(spark):
    """t41: a term appearing once in EVERY doc has zero variance (vmr 0);
    a term bursting 5x inside one doc scores VMR = 3.75 (hand-computed
    N·SS − S² arithmetic); ranks follow (freq DESC, token ASC)."""
    import pytest

    from research_knowledge_graph_spark.operators.curation import term_burstiness

    docs = spark.createDataFrame(
        [
            (0, "common topic topic topic topic topic"),
            (1, "common filler"),
            (2, "common filler"),
            (3, "common filler"),
        ],
        "doc_id long, text string",
    )
    got = {r.token: r for r in term_burstiness(docs, top_n=10).collect()}
    # boilerplate: c=1 in all 4 docs -> S=4, SS=4, N=4 -> (16-16)=0
    assert got["common"].vmr_ppm == 0
    assert (got["common"].n_docs, got["common"].freq, got["common"].sq_freq) == (4, 4, 4)
    # topical burst: S=5, SS=25, N=4 -> (100-25)*1e6 // 20 = 3_750_000
    assert got["topic"].vmr_ppm == 3_750_000
    # ranks on (freq DESC, token ASC): topic(5) > common(4) > filler(3)
    assert [r.token for r in sorted(got.values(), key=lambda r: r.rank)] == [
        "topic", "common", "filler",
    ]
    with pytest.raises(ValueError):
        term_burstiness(docs, top_n=0)


def test_length_ks_drift_hand_computed(spark):
    """Two 4-doc sources with lengths {1,2,3,4} vs {3,4,5,6}: pooled-spine
    ECDF deviations 4·|cumA−cumB| peak at 8 over values {2,3,4} → ties
    break to the SMALLEST length (v=2), ks_ppm = 10⁶·8 div 16 = 500000,
    symmetric for both sources; identical twin sources read exactly 0
    with the argmax at the smallest pooled value; a NULL-text doc is
    excluded before counting."""
    from research_knowledge_graph_spark.operators.curation import (
        length_ks_drift,
    )

    docs = spark.createDataFrame(
        [("A", "x" * n) for n in (1, 2, 3, 4)]
        + [("B", "x" * n) for n in (3, 4, 5, 6)]
        + [("A", None)],
        "source string, text string",
    )
    rows = {r.source: r for r in length_ks_drift(docs).collect()}
    assert set(rows) == {"A", "B"}
    for s in ("A", "B"):
        r = rows[s]
        assert (r.n_docs, r.n_rest, r.ks_num, r.ks_ppm, r.ks_at_value) == (
            4, 4, 8, 500_000, 2,
        )
    twins = spark.createDataFrame(
        [("E", "x" * 7), ("E", "x" * 8), ("F", "x" * 7), ("F", "x" * 8)],
        "source string, text string",
    )
    trows = {r.source: r for r in length_ks_drift(twins).collect()}
    assert all(
        (r.ks_num, r.ks_ppm, r.ks_at_value) == (0, 0, 7)
        for r in trows.values()
    )
    # single-source corpus: baseline-less, empty result
    solo = spark.createDataFrame(
        [("Z", "abc")], "source string, text string"
    )
    assert length_ks_drift(solo).count() == 0


def test_quality_floor_constant_stratum_survives(spark):
    """A constant-score stratum's percentile equals its only score; the
    threshold comparison must KEEP ties (>=) — the old strict > silently
    wiped the whole stratum instead of dropping its bottom decile."""
    df = spark.createDataFrame(
        [(i, "flat", 0.5) for i in range(10)] + [(i + 10, "var", float(i)) for i in range(10)],
        "doc_id int, source string, sc double",
    )
    kept = quality_floor_filter(df, F.col("sc"), 0.1, "source")
    per = {r.source: r["count"] for r in kept.groupBy("source").count().collect()}
    assert per["flat"] == 10  # nothing dropped from the constant stratum
    assert per["var"] == 9


def test_quality_floor_null_stratum_is_a_stratum(spark):
    """NULL-source rows join their own threshold via eqNullSafe instead of
    vanishing through a null-dropping equi-join."""
    df = spark.createDataFrame(
        [(1, None, 0.9), (2, None, 0.1), (3, None, 0.5), (4, "s", 0.7)],
        "doc_id int, source string, sc double",
    )
    kept = quality_floor_filter(df, F.col("sc"), 0.5, "source")
    ids = {r.doc_id for r in kept.collect()}
    assert 1 in ids and 3 in ids  # at/above the NULL stratum's median
    assert 2 not in ids           # below it — filtered, not join-dropped
    assert 4 in ids


def test_source_curation_report_null_text_not_phantom_dup(spark):
    """fingerprint(NULL)=NULL: NULL-text docs must not count as
    duplicates (old form: dup_rate 0.5 on 50% NULLs with zero real dups;
    all-NULL source: dup_rate 1.0 and NULL total_tokens)."""
    from research_knowledge_graph_spark.operators.curation import source_curation_report

    rows = (
        [("a", f"unique text {i}") for i in range(4)]
        + [("a", None)] * 4
        + [("b", None)] * 3
    )
    df = spark.createDataFrame(rows, "source string, text string")
    rep = {r.source: r for r in source_curation_report(df).collect()}
    assert rep["a"].n_docs == 8 and rep["a"].n_unique == 4
    assert rep["a"].dup_rate == 0.0  # no real duplicates
    assert rep["b"].dup_rate == 0.0 and rep["b"].total_tokens == 0


def test_length_quality_corr_odd_column_names(spark):
    """Backtick-needing column names must resolve — the y expression no
    longer f-string-interpolates the caller's name into SQL."""
    from research_knowledge_graph_spark.operators.curation import (
        length_quality_correlation,
    )

    df = spark.createDataFrame(
        [("s", len(t), t) for t in ["abc def", "aa1111", "zz zz zz", "b2b2"]],
        ["source", "the len", "doc text"],
    )
    out = length_quality_correlation(
        df, text_col="doc text", len_col="the len"
    ).collect()
    assert len(out) == 1 and out[0].source == "s"

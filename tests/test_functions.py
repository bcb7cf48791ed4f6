"""Function-layer tests: the reference's pinned normalization vectors
(``/root/reference/tests/test_entity_extraction.py:36-61``) plus
expression-vs-Python-twin property checks."""

from __future__ import annotations

import os
import random
import string

from pyspark.sql import functions as F

from research_knowledge_graph_spark.functions.normalize import (
    clamp_confidence_col,
    normalize_label_col,
    normalize_label_py,
)
from research_knowledge_graph_spark.functions.sanitize import (
    sanitize_string_col,
    sanitize_string_py,
)
from research_knowledge_graph_spark.functions.textops import (
    assemble_text_col,
    assemble_text_py,
    chunk_text_py,
    token_count_col,
)

PINNED = {
    "  3d gaussian splatting  ": "3d Gaussian Splatting",
    "PSNR": "PSNR",
    "neural radiance fields": "Neural Radiance Fields",
    "Mip-NeRF 360": "Mip-nerf 360",  # mixed-case word is NOT an acronym
    "3D Gaussian Splatting": "3D Gaussian Splatting",  # "3D" isupper → kept
}


def _run_expr(spark, values, expr_fn):
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    return [r[0] for r in df.select(expr_fn(F.col("v")).alias("o")).collect()]


def test_normalize_label_pinned(spark):
    ins = list(PINNED)
    outs = _run_expr(spark, ins, normalize_label_col)
    for i, o in zip(ins, outs):
        assert o == PINNED[i], f"{i!r} -> {o!r}, want {PINNED[i]!r}"
        assert normalize_label_py(i) == PINNED[i]


def test_normalize_label_property(spark):
    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + "  -._\t\n"
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(300)
    ]
    cases += ["", " ", "\t\n", "A", "a", "AB cd EF-gh 12X"]
    outs = _run_expr(spark, cases, normalize_label_col)
    for i, o in zip(cases, outs):
        assert o == normalize_label_py(i), f"mismatch for {i!r}: {o!r}"


def test_sanitize_string(spark):
    cases = ["a\x00b", "keep\nnew\tline\r", "ctl\x01\x02\x0b\x0c\x0e\x1fx", "plain"]
    outs = _run_expr(spark, cases, sanitize_string_col)
    for i, o in zip(cases, outs):
        assert o == sanitize_string_py(i)
    assert sanitize_string_py("a\x00b\x01c") == "abc"
    assert sanitize_string_py("a\nb\tc\r") == "a\nb\tc\r"


def test_clamp_confidence(spark):
    df = spark.createDataFrame(
        [(1.5,), (-0.2,), (0.7,), (None,)], "c double"
    ).select(clamp_confidence_col("c").alias("o"))
    assert [r.o for r in df.collect()] == [1.0, 0.0, 0.7, 0.5]


def test_assemble_text(spark):
    rows = [
        ("T", "A", "B"),
        ("T", None, "B"),
        (None, None, "B"),
        ("T", "", ""),
    ]
    df = spark.createDataFrame(rows, "title string, abstract string, body string")
    outs = [
        r[0]
        for r in df.select(
            assemble_text_col(F.col("title"), F.col("abstract"), F.col("body")).alias("o")
        ).collect()
    ]
    for (t, a, b), o in zip(rows, outs):
        assert o == assemble_text_py(t, a, b)
    assert outs[0] == "Title: T\n\nAbstract: A\n\nB"


def test_chunk_text_semantics():
    # <= chunk_size: single chunk, verbatim
    assert chunk_text_py("short") == ["short"]
    # boundary rule: break at last '.' past 70% of the window
    text = ("x" * 1800 + ". ") * 5
    chunks = chunk_text_py(text)
    assert len(chunks) > 1
    assert all(len(c) <= 2000 for c in chunks)
    assert chunks[0].endswith(".")
    # overlap: next chunk starts 200 chars before previous end
    joined = "".join(chunks)
    assert len(joined) >= len(text) - 400  # stripped whitespace only


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("  x ",)], ["v"])
    outs = [r[0] for r in df.select(token_count_col("v").alias("o")).collect()]
    assert outs == [3, 0, 1]


# ---------------------------------------------------------------------------
# Winnowing fingerprints (t19)
# ---------------------------------------------------------------------------

def _winnow_py(text: str, k: int = 3, w: int = 4) -> set[int]:
    """Pure-Python twin of winnow_fingerprints_col (same bits)."""
    from research_knowledge_graph_spark.functions.hashing import (
        portable_hash64_py,
    )

    toks = [t for t in __import__("re").split(r"\s+", text.lower()) if t]
    grams = (
        [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if len(toks) >= k
        else [" ".join(toks)]
    )
    hs = [portable_hash64_py(g) for g in grams]
    if len(hs) >= w:
        return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}
    return {min(hs)}


def test_winnow_cross_engine_and_python_twin(spark):
    """Spark, DuckDB SQL rendering, and the Python twin agree bit-for-bit
    on varied inputs including every fallback branch (short text, empty
    text, whitespace soup)."""
    import duckdb

    from research_knowledge_graph_spark.functions.textops import (
        winnow_fingerprints_col,
        winnow_fingerprints_sql,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "short one",
        "x",
        "",
        "  spaced   out\ttabs\nnewlines  mix  ",
        "a b c d",
        "Repeat repeat REPEAT repeat repeat repeat words",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    srows = sorted(
        (r.doc_id, r.fp)
        for r in df.select(
            "doc_id", F.explode(winnow_fingerprints_col("text")).alias("fp")
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") v(doc_id, text)"
    )
    drows = sorted(
        con.sql(
            f"SELECT doc_id, unnest({winnow_fingerprints_sql('text')}) FROM t"
        ).fetchall()
    )
    assert srows == [tuple(r) for r in drows]
    pyrows = sorted(
        (i, fp) for i, t in enumerate(texts) for fp in _winnow_py(t)
    )
    assert srows == pyrows


def test_winnow_shared_run_guarantee(spark):
    """The winnowing invariant: documents sharing a run of >= k+w-1 tokens
    share at least one fingerprint; fully-disjoint vocabularies share
    none."""
    from research_knowledge_graph_spark.functions.textops import (
        winnow_fingerprints_col,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 = k+w-1 tokens
    a = "intro words here " + shared + " tail of doc one"
    b = "completely different prefix " + shared + " other ending text"
    c = "nothing in common with either document at all whatsoever"
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id int, text string"
    )
    rows = df.select(
        "doc_id", F.explode(winnow_fingerprints_col("text")).alias("fp")
    ).collect()
    fps = {i: {r.fp for r in rows if r.doc_id == i} for i in range(3)}
    assert fps[0] & fps[1], "shared 6-token run must share a fingerprint"
    assert not fps[0] & fps[2] and not fps[1] & fps[2]


def test_bigram_nll_python_twin(spark, tmp_path):
    """t40: bit-exact python twin of the fixed-point bigram NLL over a
    planted corpus — fluent repeated transitions score LOW, word-salad
    (same unigrams, shuffled order ⇒ novel transitions) scores HIGH, and a
    doc with <2 kept tokens drops out."""
    import math

    import importlib.util

    entry_path = os.path.join(
        os.path.dirname(__file__), "..", "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    texts = {
        0: "the cat sat on the mat and the cat sat on the mat again",
        1: "mat the sat cat the on mat and cat the on sat",  # salad
        2: "hi",  # <2 kept tokens: no bigrams, drops out
        3: "the cat sat on the mat",
    }
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id int, text string"
    ).write.parquet(f"{sf}/documents.parquet")

    # python twin of the exact arithmetic
    def toks(t):
        import re
        return [w for w in re.split("[^a-z]+", t.lower()) if len(w) >= 3]

    bgs = {i: [f"{a} {b}" for a, b in zip(toks(t), toks(t)[1:])] for i, t in texts.items()}
    bc: dict[str, int] = {}
    for lst in bgs.values():
        for g in lst:
            bc[g] = bc.get(g, 0) + 1
    pc: dict[str, int] = {}
    for g, n in bc.items():
        pc[g.split(" ")[0]] = pc.get(g.split(" ")[0], 0) + n
    def rnd(x):  # round half AWAY from zero, like Spark F.round / DuckDB
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    lnp = {
        g: rnd(math.log(n / pc[g.split(" ")[0]]) * 1e9) for g, n in bc.items()
    }
    want = {
        i: (len(lst), round(-sum(lnp[g] for g in lst) / (len(lst) * 1e9), 6))
        for i, lst in bgs.items()
        if lst
    }

    got = {
        r.doc_id: (r.n_bigrams, r.nll)
        for r in entry.queries()["t40_bigram_nll_quality"](spark, sf).collect()
    }
    assert got == want
    assert 2 not in got  # no-bigram doc dropped
    assert got[1][1] > got[0][1]  # salad transitions are more surprising


def test_source_kl_python_twin(spark, tmp_path):
    """t42: bit-exact python twin of the fixed-point per-source KL drift
    over a planted corpus — a source whose term usage matches the corpus
    blend scores near 0, a vocabulary-skewed source scores strictly
    higher, and a SINGLE-source corpus scores exactly 0.0 (the double
    ratio is exactly 1.0 term by term)."""
    import importlib.util
    import math
    import re

    entry_path = os.path.join(
        os.path.dirname(__file__), "..", "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    def run(rows):
        sf = str(tmp_path / f"kl{len(rows)}")
        os.makedirs(sf, exist_ok=True)
        spark.createDataFrame(
            rows, "doc_id int, text string, source string"
        ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
        return {
            r.source: (r.n_s, r.n_terms, r.kl_nats)
            for r in entry.queries()["t42_source_kl_drift"](spark, sf).collect()
        }

    # single-source corpus: KL is exactly 0.0, no float residue
    got1 = run([(0, "alpha beta beta gamma", "solo"), (1, "alpha gamma", "solo")])
    assert got1 == {"solo": (6, 3, 0.0)}

    # two sources, one skewed: python-int twin of the whole cascade
    rows = [
        (0, "alpha beta gamma delta", "even"),
        (1, "alpha beta gamma delta", "even"),
        (2, "alpha alpha alpha alpha alpha beta", "skew"),
    ]

    def toks(t):
        return [w for w in re.split("[^a-z]+", t.lower()) if len(w) >= 3]

    cst: dict[tuple, int] = {}
    for _, t, s in rows:
        for w in toks(t):
            cst[(s, w)] = cst.get((s, w), 0) + 1
    ct: dict[str, int] = {}
    ns: dict[str, int] = {}
    nt: dict[str, int] = {}
    for (s, w), c in cst.items():
        ct[w] = ct.get(w, 0) + c
        ns[s] = ns.get(s, 0) + c
        nt[s] = nt.get(s, 0) + 1
    n = sum(ct.values())

    def rnd(x):  # round half AWAY from zero, like Spark F.round / DuckDB
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    snano: dict[str, int] = {}
    for (s, w), c in cst.items():
        ln_nano = rnd(
            math.log((float(c) * float(n)) / (float(ns[s]) * float(ct[w]))) * 1e9
        )
        snano[s] = snano.get(s, 0) + c * ln_nano
    want = {
        s: (ns[s], nt[s], round(snano[s] / (ns[s] * 1e9), 6)) for s in ns
    }
    got2 = run(rows)
    assert got2 == want
    assert got2["skew"][2] > got2["even"][2] > 0


def test_rfm_segments_pinned(spark, tmp_path):
    """v23: hand-computed RFM grid over 4 planted users — the champion
    (most recent / most frequent / highest spend) lands exactly 444, the
    churned one-timer exactly 111, cents are exact integers (19.99 →
    1999, no float residue), and recency is anchored to the corpus's
    last active day (the champion's r_days == 0)."""
    import datetime as dt
    import importlib.util

    entry_path = os.path.join(
        os.path.dirname(__file__), "..", "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    def ts(day):
        return dt.datetime(2024, 1, day, 12, 0, 0)

    # user 1: churned one-timer; 2,3 middle; 4 champion (4 events, last
    # day 9 = corpus anchor, biggest spend). Metrics all distinct, so
    # each quartile holds exactly one user: q = rank 1..4.
    rows = [
        (1, ts(1), 10.00),
        (2, ts(3), 19.99), (2, ts(4), 0.01),
        (3, ts(6), 30.00), (3, ts(6), 5.00), (3, ts(7), 5.00),
        (4, ts(2), 25.00), (4, ts(5), 25.00), (4, ts(8), 25.00), (4, ts(9), 25.01),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(u, t, v) for u, t, v in rows],
        "user_id long, ts timestamp, value double",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.user_id: (r.r_days, r.f_events, r.m_cents, r.rfm_code)
        for r in entry.queries()["v23_rfm_segments"](spark, sf).collect()
    }
    assert got == {
        1: (8, 1, 1000, 111),
        2: (5, 2, 2000, 222),
        3: (2, 3, 4000, 333),
        4: (0, 4, 10001, 444),
    }


def test_activity_tail_index_python_twin(spark, tmp_path):
    """v24: bit-exact python twin of the fixed-point Hill estimator over
    planted per-user counts; a type whose tail counts all equal x_min
    (Σ ln = 0, α undefined) drops out, and a type with no user at ≥2
    events never enters."""
    import datetime as dt
    import importlib.util
    import math

    entry_path = os.path.join(
        os.path.dirname(__file__), "..", "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    counts = {  # (event_type, user_id) -> n events
        ("hot", 1): 2, ("hot", 2): 4, ("hot", 3): 8, ("hot", 4): 1,
        ("flat", 1): 2, ("flat", 2): 2,   # Σ ln(x/2) == 0 → dropped
        ("thin", 1): 1, ("thin", 2): 1,   # no tail rows at all
    }
    rows, eid = [], 0
    for (et, u), n in counts.items():
        for _ in range(n):
            rows.append((eid, dt.datetime(2024, 1, 1), u, et, 1.0, "{}"))
            eid += 1
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    tail = [c for (et, _), c in counts.items() if et == "hot" and c >= 2]
    s_nano = sum(rnd(math.log(float(c) / 2.0) * 1e9) for c in tail)
    want = {
        "hot": (
            len(tail),
            s_nano,
            round(1.0 + len(tail) * 1e9 / s_nano, 6),
        )
    }
    got = {
        r.event_type: (r.n_tail, r.sum_ln_nano, r.alpha)
        for r in entry.queries()["v24_activity_tail_index"](spark, sf).collect()
    }
    assert got == want


def test_cusum_changepoint_python_twin(spark, tmp_path):
    """v25: a planted level shift 10→20 maximizes |s_k| at the LAST day of
    the first regime (the CUSUM estimator); |s_k| ties break to the
    earliest day; a constant-volume type (zero variance) drops out; the
    published z is the one double expression from the exact integers."""
    import datetime as dt
    import importlib.util
    import math

    entry_path = os.path.join(
        os.path.dirname(__file__), "..", "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    daily = {  # (event_type, day-of-month) -> n events that day
        "step": {1: 10, 2: 10, 3: 10, 4: 20, 5: 20, 6: 20},
        "tie": {1: 3, 2: 1, 3: 3, 4: 1},   # |s_k| = 4 at days 1 AND 3
        "flat": {1: 5, 2: 5, 3: 5},        # zero variance -> dropped
    }
    rows, eid = [], 0
    for et, per_day in daily.items():
        for d, n in per_day.items():
            for _ in range(n):
                rows.append(
                    (eid, dt.datetime(2024, 1, d, 12, 0), 1, et, 1.0, "{}")
                )
                eid += 1
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")

    def twin(per_day):
        ns = [per_day[d] for d in sorted(per_day)]
        nd, sn, snn = len(ns), sum(ns), sum(n * n for n in ns)
        denom = nd * (nd * snn - sn * sn)
        if denom == 0:
            return None
        best = None
        pref = 0
        for k, (d, n) in enumerate(sorted(per_day.items()), start=1):
            pref += n
            s_abs = abs(nd * pref - k * sn)
            if best is None or s_abs > best[1]:
                best = (d, s_abs)
        return (
            nd,
            dt.date(2024, 1, best[0]),
            best[1],
            denom,
            round(best[1] / math.sqrt(denom), 9),
        )

    want = {
        et: twin(per_day)
        for et, per_day in daily.items()
        if twin(per_day) is not None
    }
    got = {
        r.event_type: (r.nd_days, r.change_day, r.s_abs_max, r.d_denom, r.cusum_z)
        for r in entry.queries()["v25_cusum_changepoint"](spark, sf).collect()
    }
    assert got == want
    assert got["step"][1] == dt.date(2024, 1, 3)   # last day of regime 1
    assert got["tie"][1] == dt.date(2024, 1, 1)    # earliest on the tie


def test_term_zipf_tail_python_twin(spark, tmp_path):
    """t43: bit-exact python twin of the Hill fixed point over planted
    per-(source, term) counts through the shared _tok3 tokenizer: a
    source whose tail counts all equal x_min (Σ ln = 0) drops out, a
    source of hapaxes never enters, sub-3-char tokens never count."""
    import importlib.util
    import math

    entry_path = os.path.join(
        os.path.dirname(__file__), "..", "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    docs = [
        # s1: aaa x2, bbb x4 (cc is sub-3-char: ignored) -> tail [2, 4]
        (0, "aaa aaa bbb bbb cc", "en", "s1", 18),
        (1, "bbb bbb", "en", "s1", 7),
        # s2: all hapaxes -> no tail rows -> absent
        (2, "xxx yyy zzz", "en", "s2", 11),
        # s3: both terms at exactly x_min -> sum_ln_nano = 0 -> dropped
        (3, "ppp ppp qqq qqq", "en", "s3", 15),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    s_nano = rnd(math.log(2.0 / 2.0) * 1e9) + rnd(math.log(4.0 / 2.0) * 1e9)
    want = {"s1": (2, s_nano, round(1.0 + 2 * 1e9 / s_nano, 6))}
    got = {
        r.source: (r.n_tail, r.sum_ln_nano, r.alpha)
        for r in entry.queries()["t43_term_zipf_tail"](spark, sf).collect()
    }
    assert got == want


def test_token_entropy_python_twin(spark, tmp_path):
    """t45: bit-exact python twin of the all-integer entropy — skewed doc
    below ln n, uniform doc exactly at ln n (nano-rounded), sub-3-char
    docs absent."""
    import importlib.util
    import math

    entry_path = os.path.join(
        os.path.dirname(__file__), "..", "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    docs = [
        (0, "aaa aaa aaa bbb ccc", "en", "s1", 19),  # skewed: H < ln 5
        (1, "aaa bbb ccc", "en", "s1", 11),          # uniform: H == ln 3
        (2, "ab cd", "en", "s1", 5),                 # no >=3-char token
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    def twin(counts):
        n = sum(counts)
        s = sum(c * rnd(math.log(c) * 1e9) for c in counts)
        e_nano = rnd(math.log(n) * 1e9) - s // n
        return (n, len(counts), e_nano, round(e_nano / 1e9, 9))

    want = {0: twin([3, 1, 1]), 1: twin([1, 1, 1])}
    got = {
        r.doc_id: (r.n_tokens, r.n_distinct, r.entropy_nano, r.entropy_nats)
        for r in entry.queries()["t45_token_entropy"](spark, sf).collect()
    }
    assert got == want
    assert got[1][2] == rnd(math.log(3) * 1e9)  # uniform doc hits ln n


def test_containment_verify_flags_subset_pairs(spark):
    """containment_verify (t39): a doc that is a strict PREFIX of a longer
    doc has containment exactly 1.0 (every k-shingle of the prefix is a
    substring of the superset doc) while symmetric Jaccard shrinks with the
    length ratio — the subset_like flag fires exactly on that shape, and
    stays off both for unrelated pairs (low containment) and for
    near-identical pairs (high containment BUT high Jaccard too)."""
    from research_knowledge_graph_spark.operators.dedup import containment_verify

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    superset = base + (
        " and then continues with a long unrelated tail about market"
        " structure, weather patterns, shipping manifests and the annual"
        " migration of seabirds across the northern archipelago routes"
    )
    near_ident = base + " today"
    unrelated = "entirely different content discussing quantum error correction"
    docs = spark.createDataFrame(
        [(0, base), (1, superset), (2, unrelated), (3, near_ident)],
        "doc_id int, text string",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "doc_a int, doc_b int"
    )
    out = {
        (r.doc_a, r.doc_b): r
        for r in containment_verify(docs, pairs, shingle_k=4).collect()
    }
    subset = out[(0, 1)]
    assert subset.contain_ppm == 1_000_000  # prefix ⇒ full containment
    assert subset.jaccard_ppm < 700_000  # symmetric Jaccard misses it
    assert subset.subset_like == 1
    assert out[(0, 2)].contain_ppm < 200_000
    assert out[(0, 2)].subset_like == 0
    twin = out[(0, 3)]
    assert twin.contain_ppm >= 850_000 and twin.jaccard_ppm >= 700_000
    assert twin.subset_like == 0  # caught by ordinary Jaccard dedup already
    # exact-integer invariants: ppm values are floor divisions of the counts
    for r in out.values():
        assert r.contain_ppm == r.n_inter * 1_000_000 // r.n_min


def test_winnow_near_dups_guard_and_threshold(spark):
    """winnow_near_dups (t20): near-identical docs pair with high n_shared;
    min_shared filters single-run coincidences; the stop-fingerprint
    guard (max_bucket) removes boilerplate shared by every doc — with it
    set below the corpus size, a fingerprint in ALL docs contributes no
    pairs."""
    from research_knowledge_graph_spark.operators.dedup import winnow_near_dups

    boiler = "standard site navigation header common to every page"
    bodies = [
        "unique first document body talks about alpha beta gamma topics",
        "unique first document body talks about alpha beta gamma topics too",
        "completely unrelated second text on entirely different delta matters",
        "another fully distinct piece covering epsilon zeta subjects only",
    ]
    docs = spark.createDataFrame(
        [(i, f"{boiler} {b}") for i, b in enumerate(bodies)],
        "doc_id int, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_near_dups(docs, min_shared=2, max_bucket=3).collect()
    }
    # only the near-identical pair survives; boilerplate fingerprints are
    # in all 4 docs > max_bucket=3, so unrelated docs share nothing
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] >= 2
    assert all(a < b for a, b in pairs)
    # without the guard, boilerplate alone pairs EVERY doc with every other
    allp = winnow_near_dups(docs, min_shared=2, max_bucket=10_000).count()
    assert allp == 6


def test_transition_entropy_pinned(spark, tmp_path):
    """v29: deterministic states read exactly 0 nano-entropy, a 50/50
    branching state reads exactly round(ln4·1e9) − round(ln2·1e9) =
    693147180 (the nano-ln of 2 up to the two independent roundings),
    and counts/next-type fanouts are exact."""
    import importlib.util

    entry_path = os.path.join(
        os.path.dirname(__file__), "..", "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    rows = []
    # user 1: a,b,a,b,a,b — a only ever goes to b (H_a = 0), b only to a
    seq1 = ["a", "b", "a", "b", "a", "b"]
    # user 2: u,x,u,y,u,x,u,y — u branches 50/50 to x and y (H_u = ln 2)
    seq2 = ["u", "x", "u", "y", "u", "x", "u", "y"]
    eid = 0
    for uid, seq in ((1, seq1), (2, seq2)):
        for i, t in enumerate(seq):
            rows.append((eid, uid, t, f"1970-01-01 00:00:{i:02d}"))
            eid += 1
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        f"{sf}/events.parquet"
    )
    got = {
        r.from_type: r
        for r in entry.queries()["v29_transition_entropy"](spark, sf).collect()
    }
    assert set(got) == {"a", "b", "u", "x", "y"}
    # deterministic states: sum_term and h both exactly 0
    for s, n_out in (("a", 3), ("b", 2), ("x", 2), ("y", 1)):
        r = got[s]
        assert (r.n_out, r.n_next_types, r.sum_term_nano, r.h_nano) == (
            n_out, 1, 0, 0,
        )
    u = got["u"]
    # ln4_nano = round(1.3862943611...e9) = 1386294361;
    # ln2_nano = round(0.6931471805...e9) = 693147181; each of the 4
    # transitions contributes (ln4n − ln2n) = 693147180; div 4 = same
    assert (u.n_out, u.n_next_types) == (4, 2)
    assert u.sum_term_nano == 4 * 693147180
    assert u.h_nano == 693147180


def test_detector_agreement_consistency(spark, tmp_path):
    """t51: the agreement row's set algebra is pinned against the two
    detector frames computed independently on the same corpus (the
    detectors themselves carry their own pinned tests — t07/t19/t20);
    identities n_lsh = n_both + n_lsh_only etc. and the floor-ppm
    pair-set Jaccard are recomputed in python ints; a no-dup corpus
    reads zeros with a NULL ppm."""
    import importlib.util

    entry_path = os.path.join(
        os.path.dirname(__file__), "..", "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    docs = [
        (0, base, "en", "s1", len(base)),
        (1, base, "en", "s1", len(base)),              # exact dup of 0
        (2, base + " extra tail words here", "en", "s1", 1),
        (3, "totally different text with shared block "
            + " ".join(base.split()[:8]), "en", "s2", 1),
        (4, "unrelated words entirely disjoint vocabulary "
            "qqq www eee rrr ttt yyy uuu", "en", "s2", 1),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    from research_knowledge_graph_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        winnow_near_dups,
    )

    d = spark.read.parquet(f"{sf}/documents.parquet")
    lsh = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            minhash_signatures(d, "doc_id", "text", k=8, shingle_k=4),
            bands=4, rows_per_band=2,
        ).collect()
    }
    win = {
        (r.doc_a, r.doc_b)
        for r in winnow_near_dups(d, min_shared=2, max_bucket=1000).collect()
    }
    assert (0, 1) in lsh and (0, 1) in win  # the exact dup: both see it
    row = entry.queries()["t51_detector_agreement"](spark, sf).collect()
    assert len(row) == 1
    r = row[0]
    both = lsh & win
    assert (r.n_lsh, r.n_winnow, r.n_both) == (len(lsh), len(win), len(both))
    assert r.n_lsh_only == len(lsh - win)
    assert r.n_winnow_only == len(win - lsh)
    denom = len(lsh | win)
    assert r.agreement_ppm == (1_000_000 * len(both)) // denom
    # no-dup corpus: zeros, NULL ppm
    sf2 = os.path.join(str(tmp_path), "empty")
    spark.createDataFrame(
        [(0, "one single document", "en", "s1", 19)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf2}/documents.parquet")
    r0 = entry.queries()["t51_detector_agreement"](spark, sf2).collect()[0]
    assert (r0.n_lsh, r0.n_winnow, r0.n_both, r0.agreement_ppm) == (0, 0, 0, None)


# ---------------------------------------------------------------------------
# Long-tail review fixes (qa / dedup / readers / html_text)
# ---------------------------------------------------------------------------


def test_retrieve_context_string_ids_and_vec_id_name(spark):
    """String doc ids must work (the pipeline's det_id hex ids ARE strings):
    the old bigint query sentinel crashed knn's self-match filter with
    CAST_INVALID_INPUT under ANSI. id_col='vec_id' (the embedding surface's
    own convention) must not raise AMBIGUOUS_REFERENCE, and doc_id keeps
    the caller's id type."""
    from research_knowledge_graph_spark.operators.qa import embed_docs, retrieve_context

    docs = spark.createDataFrame(
        [("docA", "neural rendering of splats"),
         ("docB", "supply chain optimization"),
         ("docC", "gaussian splatting speedups")],
        "doc_id string, text string",
    )
    embs = embed_docs(docs)
    got = retrieve_context(spark, embs, "gaussian splatting", k=2)
    rows = got.collect()
    assert len(rows) == 2 and rows[0].rank == 1
    assert {type(r.doc_id) for r in rows} == {str}

    embs2 = embs.withColumnRenamed("doc_id", "vec_id")
    got2 = retrieve_context(spark, embs2, "gaussian splatting", k=1, id_col="vec_id")
    assert got2.count() == 1

    # bigint ids still work (the original test shape)
    docs3 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta")], "doc_id long, text string"
    )
    got3 = retrieve_context(spark, embed_docs(docs3), "alpha beta", k=1)
    assert got3.count() == 1 and isinstance(got3.first().doc_id, int)


def test_exact_dup_groups_null_text_dropped(spark):
    """NULL-text docs must not collapse into one phantom dup group
    (md5(NULL)=NULL and groupBy treats NULLs as equal)."""
    from research_knowledge_graph_spark.operators.dedup import exact_dup_groups

    docs = spark.createDataFrame(
        [("a", "same"), ("b", "same"), ("c", None), ("d", None), ("e", None)],
        "doc_id string, text string",
    )
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1 and groups[0].n_docs == 2 and groups[0].keep_id == "a"


def test_minhash_null_text_dropped_and_band_guards(spark):
    """NULL-text docs must not form an O(n²) LSH clique; k%bands!=0 fails
    fast; an overshooting bands×rows_per_band yields NULL buckets (which
    never join) instead of hashing '' for every doc."""
    import pytest

    from research_knowledge_graph_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_near_dups,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [("a", "the quick brown fox jumps"), ("b", None), ("c", None), ("d", None)],
        "doc_id string, text string",
    )
    pairs = minhash_near_dups(docs, threshold=0.0).collect()
    assert pairs == []  # no NULL-NULL cliques

    with pytest.raises(ValueError, match="divide"):
        minhash_near_dups(docs, k=10, bands=4)
    with pytest.raises(ValueError, match="rows_per_band"):
        lsh_candidate_pairs(minhash_signatures(docs), bands=2, rows_per_band=0)

    # overshoot: 5 bands × 2 rows over an 8-hash signature — band 4's slice
    # is short, its bucket NULL, and the two identical docs still pair via
    # the in-range bands while nothing explodes quadratically
    two = spark.createDataFrame(
        [("x", "identical text body"), ("y", "identical text body"),
         ("z", "something else entirely")],
        "doc_id string, text string",
    )
    sigs = minhash_signatures(two)
    got = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs, bands=5, rows_per_band=2).collect()}
    assert ("x", "y") in got and all(p[0] != "z" and p[1] != "z" for p in got)


def test_lsh_banding_explode_matches_union_form(spark):
    """The one-projection explode banding must produce the exact pair set
    of the old bands-way union (bucket expressions unchanged)."""
    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.functions.hashing import portable_hash64
    from research_knowledge_graph_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(f"d{i}", f"document body number {i % 4} with shared phrasing") for i in range(20)],
        "doc_id string, text string",
    )
    sigs = minhash_signatures(docs).cache()
    got = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs, 4, 2).collect()}

    banded = None  # the pre-review union form, inlined as the reference
    for b in range(4):
        sl = F.slice(F.col("signature"), b * 2 + 1, 2)
        part = sigs.select(
            "doc_id", F.lit(b).alias("band"),
            portable_hash64(F.concat_ws("_", sl.getItem(0), sl.getItem(1))).alias("bucket"),
        )
        banded = part if banded is None else banded.unionByName(part)
    a, b_ = banded.alias("a"), banded.alias("b")
    want = {
        (r.doc_a, r.doc_b)
        for r in a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .collect()
    }
    sigs.unpersist()
    assert got == want and len(got) > 0


def test_assemble_docs_empty_string_falls_through(spark):
    """Present-but-empty text must assemble from title/abstract (the
    reference's falsy-text `or`), matching the assemble_text_py twin."""
    from research_knowledge_graph_spark.sources.readers import assemble_docs_from_papers

    papers = spark.createDataFrame(
        [("", "T1", "A1"), (None, "T2", "A2"), ("kept", "T3", "A3")],
        "text string, title string, abstract string",
    )
    got = {r.title: r.doc_text for r in assemble_docs_from_papers(papers).collect()}
    assert got["T1"].startswith("Title: T1")
    assert got["T2"].startswith("Title: T2")
    assert got["T3"] == "kept"


def test_html_text_uppercase_tags():
    """Upper/mixed-case markup (real Common-Crawl shape): <SCRIPT> bodies
    must not leak into extracted text and <ARTICLE>/<P> must be honored."""
    from research_knowledge_graph_spark.operators.html_text import (
        extract_text_from_html_py,
    )

    page = (b"<html><SCRIPT>var leak=1;</SCRIPT>"
            b"<ARTICLE><P>Real content.</P></ARTICLE></html>")
    out = extract_text_from_html_py(page)
    assert out == "Real content."
    assert "leak" not in out

"""Property tests: the Catalyst expressions must match their Python twins on
adversarial inputs (hypothesis-generated). These guard the byte-identical
normalization requirement against regex/semantic drift between the JVM and
Python string models."""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from research_knowledge_graph_spark.functions.normalize import (
    normalize_label_col,
    normalize_label_py,
)
from research_knowledge_graph_spark.functions.sanitize import (
    sanitize_string_col,
    sanitize_string_py,
)
from research_knowledge_graph_spark.functions.textops import chunk_text_py

# printable ASCII + the control chars the sanitizer targets + whitespace
ALPHABET = string.ascii_letters + string.digits + " .,-_:;!?\t\n\r" + "\x00\x01\x0b\x0c\x1f"


@st.composite
def labels(draw):
    return draw(st.text(alphabet=ALPHABET, min_size=0, max_size=60))


def _batch_check(spark, values, expr_fn, py_fn):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    outs = [r[0] for r in df.select(expr_fn(F.col("v")).alias("o")).collect()]
    for v, o in zip(values, outs):
        assert o == py_fn(v), f"expr {o!r} != twin {py_fn(v)!r} for input {v!r}"


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(labels(), min_size=1, max_size=25))
def test_normalize_expr_matches_twin(spark, vals):
    _batch_check(spark, vals, normalize_label_col, normalize_label_py)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(labels(), min_size=1, max_size=25))
def test_sanitize_expr_matches_twin(spark, vals):
    _batch_check(spark, vals, sanitize_string_col, sanitize_string_py)


@given(st.text(alphabet=string.ascii_lowercase + " .\n", min_size=0, max_size=9000))
@settings(max_examples=50, deadline=None)
def test_chunking_invariants(text):
    chunks = chunk_text_py(text)
    if len(text) <= 2000:
        assert chunks == [text]
        return
    assert all(len(c) <= 2000 for c in chunks)
    # overlap windows must cover the document: stripped concatenation loses
    # at most whitespace
    assert sum(len(c) for c in chunks) >= len(text.replace(" ", "").replace("\n", ""))


@given(st.lists(
    st.text(alphabet=string.ascii_lowercase + " .\n", min_size=0, max_size=9000),
    min_size=1, max_size=8,
))
@settings(max_examples=30, deadline=None)
def test_chunk_count_oracle_matches_twin(texts):
    """t08's recursive-CTE oracle (_chunk_stats_sql) reproduces
    len(chunk_text_py(text)) on adversarial texts — every boundary
    decision (70% rule, final-window tail, sub-overlap tail chunk) walks
    identically in DuckDB and Python. Pins the oracle itself, not just
    the Spark UDF, so an oracle drift can't silently pass the driver."""
    import importlib.util

    import duckdb
    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    con = duckdb.connect()
    docs = pd.DataFrame(
        {"doc_id": [f"d{i}" for i in range(len(texts))], "text": texts}
    )
    con.register("documents", docs)
    got = dict(con.sql(entry._chunk_stats_sql()).fetchall())
    for i, t in enumerate(texts):
        assert got[f"d{i}"] == len(chunk_text_py(t)), (i, len(t))


@given(st.lists(
    st.text(
        alphabet=string.ascii_lowercase
        + "0123456789 .\n\t\x0b\x0c\x1c\x85\xa0  　",
        max_size=300,
    ),
    min_size=1, max_size=8,
))
@settings(max_examples=30, deadline=None)
def test_embed_fingerprint_oracle_matches_twin(texts):
    """e15's md5 oracle reproduces the python hashing-trick embedder
    (normalize=False) on adversarial texts: same tokenization — the
    alphabet deliberately includes the UNICODE whitespace python
    str.split() honors but RE2 \\s does not (\\x0b, \\x1c, \\x85, NBSP,
    em-space, U+2028, ideographic space) — same bucket (little-endian
    first 4 digest bytes mod dim), same sign (5th byte low bit)."""
    import importlib.util

    import duckdb
    import pandas as pd

    from research_knowledge_graph_spark.functions.vectors import embed_text_py

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": [f"d{i}" for i in range(len(texts))], "text": texts}
    ))
    got = {
        r[0]: r[1:]
        for r in con.sql(entry.oracle_sql()["e15_embed_fingerprint"]).fetchall()
    }
    for i, t in enumerate(texts):
        vec = [int(x) for x in embed_text_py(t, dim=32, normalize=False)]
        exp = (
            sum(1 for x in vec if x != 0),
            sum(x * x for x in vec),
            sum(vec),
        )
        assert got[f"d{i}"] == exp, (i, t[:50])


def test_e15_split_class_covers_python_whitespace_exactly():
    """Char-for-char over the BMP: the e15 oracle's RE2 split class fires
    on exactly the code points python str.split() treats as whitespace —
    no unicode-whitespace doc can diverge, no non-whitespace over-splits."""
    import importlib.util

    import duckdb

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    con = duckdb.connect()
    pat = r"[\x09-\x0d\x1c-\x1f \x85\p{Zs}\x{2028}\x{2029}]+"
    assert pat in entry.oracle_sql()["e15_embed_fingerprint"]
    # one vectorized sweep: every BMP code point (incl. controls, excl.
    # surrogates — not encodable) through the split class
    duck_ws = {
        r[0]
        for r in con.execute(
            # surrogates are not encodable; the CASE (not just the WHERE)
            # guards chr() because the optimizer may reorder predicates
            "SELECT cp FROM range(0, 65536) t(cp)"
            " WHERE cp NOT BETWEEN 55296 AND 57343"
            " AND len(regexp_split_to_array('a' || chr(CAST("
            "CASE WHEN cp BETWEEN 55296 AND 57343 THEN 97 ELSE cp END"
            " AS INT)) || 'b', ?)) > 1",
            [pat],
        ).fetchall()
    }
    py_ws = {
        cp
        for cp in range(0x10000)
        if not (0xD800 <= cp <= 0xDFFF) and chr(cp).isspace()
    }
    assert duck_ws == py_ws, sorted(
        hex(c) for c in duck_ws.symmetric_difference(py_ws)
    )


# --- v28/v30 gap-family twins -------------------------------------------
# The per-(user, type) gap frame (operators/sessions.py::_typed_gaps) and
# both consumers must match a pure-python reference on random event sets:
# same (ts, event_id) ordering, same floor-to-seconds rule, same
# fixed-point arithmetic. Timezone cannot leak in: gaps are differences,
# so any fixed session-tz offset cancels.


def _gap_reference(events):
    """events: [(eid, uid, typ, ts_us)] → (burstiness rows, histogram rows)
    computed with python ints exactly as the operators define them."""
    from collections import defaultdict

    seqs = defaultdict(list)
    for eid, uid, typ, us in events:
        seqs[(uid, typ)].append((us, eid))
    per_type = defaultdict(list)  # typ -> [(uid, gap_s)]
    for (uid, typ), es in seqs.items():
        es.sort()
        for prev, cur in zip(es, es[1:]):
            per_type[typ].append((uid, (cur[0] - prev[0]) // 1_000_000))
    burst, hist = {}, {}
    for typ, rows in per_type.items():
        gs = [g for _, g in rows]
        n, s, q = len(gs), sum(gs), sum(g * g for g in gs)
        if q > 0:
            b = 1.0 - (2 * float(s) * float(s)) / (float(n) * float(q))
            burst[typ] = (len({u for u, _ in rows}), n, s, q, s // n, b)
        buckets = defaultdict(list)
        for g in gs:
            buckets[0 if g == 0 else g.bit_length()].append(g)
        hist[typ] = {
            bkt: (len(v), min(v), max(v), 1_000_000 * len(v) // n)
            for bkt, v in buckets.items()
        }
    return burst, hist


@st.composite
def event_sets(draw):
    n = draw(st.integers(min_value=2, max_value=25))
    out = []
    for eid in range(n):
        uid = draw(st.integers(min_value=1, max_value=3))
        typ = draw(st.sampled_from(["a", "b"]))
        us = draw(st.integers(min_value=0, max_value=20_000_000_000))
        out.append((eid, uid, typ, us))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(event_sets())
def test_gap_family_python_twin(spark, events):
    import datetime as dt

    from research_knowledge_graph_spark.operators.sessions import (
        burstiness_profile,
        gap_histogram,
    )

    epoch = dt.datetime(1970, 1, 1)
    rows = [
        (eid, uid, typ, epoch + dt.timedelta(microseconds=us))
        for eid, uid, typ, us in events
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    ref_burst, ref_hist = _gap_reference(events)
    got_burst = {
        r.event_type: (
            r.n_sequences, r.n_gaps, r.sum_gap_s, r.sum_gap2_s,
            r.mean_gap_s, r.burstiness,
        )
        for r in burstiness_profile(ev).collect()
    }
    assert got_burst == ref_burst
    got_hist = {}
    for r in gap_histogram(ev).collect():
        got_hist.setdefault(r.event_type, {})[r.bucket] = (
            r.n_gaps, r.min_gap_s, r.max_gap_s, r.share_ppm,
        )
    assert got_hist == ref_hist


# ---------------------------------------------------------------------------
# id_to_bin / bin_to_id / bin_id_lt (the blocking-path id codec)
# ---------------------------------------------------------------------------

_HEX32 = st.text(alphabet="0123456789abcdef", min_size=32, max_size=32)
# id shapes that exercise every codec branch: exact lowercase hex, uppercase/
# mixed-case hex (must take the raw path), near-hex lengths, arbitrary text
# including '|', separators, and non-BMP code points
_ANY_ID = st.one_of(
    _HEX32,
    st.text(alphabet="0123456789abcdefABCDEF", min_size=30, max_size=34),
    st.text(min_size=0, max_size=40).filter(lambda s: "\x00" not in s),
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_ANY_ID, min_size=2, max_size=30, unique=True))
def test_id_codec_roundtrip_and_order_twin(spark, ids):
    """Random id shapes: (1) bin_to_id(id_to_bin(x)) == x byte-exact;
    (2) encoded values stay pairwise-distinct (alias-freedom);
    (3) bin_id_lt == python '<' on the source strings for EVERY pair —
    including cross-tag pairs, where the raw binary order would lie."""
    from research_knowledge_graph_spark.functions.hashing import (
        bin_id_lt,
        bin_to_id,
        id_to_bin,
    )

    df = spark.createDataFrame([(v,) for v in ids], "v string")
    got = df.select(
        "v",
        bin_to_id(id_to_bin("v")).alias("rt"),
        id_to_bin("v").alias("b"),
    ).collect()
    assert all(r.v == r.rt for r in got), [(r.v, r.rt) for r in got if r.v != r.rt]
    assert len({bytes(r.b) for r in got}) == len(ids)

    # all ordered pairs in one Spark pass vs python string comparison
    a = df.select(F.col("v").alias("x"))
    b = df.select(F.col("v").alias("y"))
    pairs = a.crossJoin(b).select(
        "x", "y", bin_id_lt(id_to_bin("x"), id_to_bin("y")).alias("lt")
    )
    for r in pairs.collect():
        assert r.lt == (r.x < r.y), (r.x, r.y, r.lt)


def test_id_codec_trailing_newline_hex_not_dropped(spark):
    """ADVICE r5: Java regex '$' matches before a trailing newline, so an
    id of exactly 32 hex chars + '\\n' used to take the unhex branch,
    unhex returned NULL and the row silently vanished from every
    posting/pair join. With \\A/\\z anchors it must take the raw-UTF-8 tag
    branch and round-trip byte-identically."""
    from research_knowledge_graph_spark.functions.hashing import (
        bin_to_id,
        id_to_bin,
    )

    tricky = "ab" * 16 + "\n"
    df = spark.createDataFrame([(tricky,), ("ab" * 16,)], "v string")
    got = {r.v: (r.rt, bytes(r.b)) for r in df.select(
        "v", bin_to_id(id_to_bin("v")).alias("rt"), id_to_bin("v").alias("b")
    ).collect()}
    assert got[tricky][0] == tricky
    assert got[tricky][1][0] == 1  # raw tag, not packed-hex
    assert got["ab" * 16][1][0] == 0  # clean hex still packs

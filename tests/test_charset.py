"""t53 charset audit: python-int twin over planted exotic strings.

Covers the classes the ASCII sf testdata can't exercise: CJK + emoji
(supplementary plane — both engines count CODE POINTS, so 🎉 is one
char), U+FFFD replacement chars, ASCII control chars (with \\t/\\n/\\r
counted as whitespace, NOT control), the zero-char-source drop, and the
floor-ppm shares.
"""

from __future__ import annotations

from research_knowledge_graph_spark.operators.curation import charset_audit

_DOCS = [
    # (doc_id, text, source)
    (1, "Hello, World 42!\n", "a"),
    (2, "café 中文 \U0001f389", "a"),  # café 中文 🎉
    (3, "bad��byte\x00\x01ok\ttab", "b"),
    (4, "", "c"),  # zero chars: source c must DROP
    (5, None, "d"),  # NULL text: excluded; source d absent
]


def _classify(s: str):
    out = dict(chars=len(s), letters=0, digits=0, ws=0, ctl=0,
               nonascii=0, repl=0)
    for ch in s:
        o = ord(ch)
        if ("a" <= ch <= "z") or ("A" <= ch <= "Z"):
            out["letters"] += 1
        if "0" <= ch <= "9":
            out["digits"] += 1
        if ch in " \t\n\r":
            out["ws"] += 1
        if o <= 0x08 or o in (0x0B, 0x0C) or 0x0E <= o <= 0x1F or o == 0x7F:
            out["ctl"] += 1
        if o > 0x7F:
            out["nonascii"] += 1
        if o == 0xFFFD:
            out["repl"] += 1
    return out


def test_charset_audit_twin(spark):
    df = spark.createDataFrame(
        _DOCS, "doc_id long, text string, source string"
    )
    got = {r["source"]: r.asDict() for r in charset_audit(df).collect()}
    assert set(got) == {"a", "b"}, "zero-char c and NULL-text d must drop"
    for src in ("a", "b"):
        texts = [t for _, t, s in _DOCS if s == src and t]
        exp = {k: sum(_classify(t)[k] for t in texts)
               for k in _classify("x")}
        r = got[src]
        assert r["n_docs"] == len(texts)
        assert r["n_chars"] == exp["chars"]
        assert r["n_letters"] == exp["letters"]
        assert r["n_digits"] == exp["digits"]
        assert r["n_ws"] == exp["ws"]
        assert r["n_control"] == exp["ctl"]
        assert r["n_nonascii"] == exp["nonascii"]
        assert r["n_replacement"] == exp["repl"]
        assert r["nonascii_ppm"] == exp["nonascii"] * 1_000_000 // exp["chars"]
        assert r["control_ppm"] == exp["ctl"] * 1_000_000 // exp["chars"]
        assert (
            r["replacement_ppm"] == exp["repl"] * 1_000_000 // exp["chars"]
        )
    # the supplementary-plane char counted as ONE code point: doc 2 is
    # exactly 9 code points (c a f é ␠ 中 文 ␠ 🎉) — a UTF-16 engine
    # counting units would read 10
    assert got["a"]["n_chars"] == len("Hello, World 42!\n") + 9


# --- hypothesis twin: random multilingual text vs the python classifier ---

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# exercises every class boundary: ASCII letters/digits, the three
# whitespace chars, controls (incl. \x0b/\x0c/\x7f), U+FFFD, Latin-1,
# CJK, and a supplementary-plane emoji
_ALPHABET = (
    "aZq09 \t\n\r\x00\x07\x0b\x0c\x1f\x7f�é中\U0001f389.,-"
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=_ALPHABET, min_size=0, max_size=40),
            st.sampled_from(["s1", "s2", "s3"]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_charset_audit_hypothesis_twin(spark, docs):
    rows = [(i, t, s) for i, (t, s) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r.asDict() for r in charset_audit(df).collect()}
    # python twin, per source, with the zero-char drop
    exp = {}
    for _, t, s in rows:
        c = _classify(t)
        e = exp.setdefault(s, dict(n_docs=0, **{k: 0 for k in c}))
        e["n_docs"] += 1
        for k, v in c.items():
            e[k] += v
    exp = {s: e for s, e in exp.items() if e["chars"] > 0}
    assert set(got) == set(exp)
    for s, e in exp.items():
        r = got[s]
        assert r["n_docs"] == e["n_docs"]
        assert r["n_chars"] == e["chars"]
        assert r["n_letters"] == e["letters"]
        assert r["n_digits"] == e["digits"]
        assert r["n_ws"] == e["ws"]
        assert r["n_control"] == e["ctl"]
        assert r["n_nonascii"] == e["nonascii"]
        assert r["n_replacement"] == e["repl"]
        assert r["nonascii_ppm"] == e["nonascii"] * 1_000_000 // e["chars"]
        assert r["control_ppm"] == e["ctl"] * 1_000_000 // e["chars"]
        assert r["replacement_ppm"] == e["repl"] * 1_000_000 // e["chars"]

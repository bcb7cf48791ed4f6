"""t47 duplicated-span coverage: python-twin pins on a planted corpus.

Pins the four semantic rules of operators/dedup.py::dup_span_coverage:
cross-doc grams mark both docs, overlapping intervals union (not sum),
within-doc-only repetition does NOT count, and sub-k docs emit a zero row.
"""

from __future__ import annotations

from research_knowledge_graph_spark.operators.dedup import dup_span_coverage

K = 13


def _tok(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z]+", text.lower()) if len(t) >= 3]


def _twin(docs: dict[int, str], k: int = K) -> dict[int, tuple]:
    """Pure-python reference: exact interval union over duplicated grams."""
    arrs = {d: _tok(t) for d, t in docs.items()}
    grams: dict[tuple, set] = {}
    starts: dict[int, list[int]] = {d: [] for d in docs}
    per_doc = {
        d: [tuple(a[i : i + k]) for i in range(len(a) - k + 1)]
        for d, a in arrs.items()
    }
    for d, gs in per_doc.items():
        for g in gs:
            grams.setdefault(g, set()).add(d)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    for d, gs in per_doc.items():
        starts[d] = [i for i, g in enumerate(gs) if g in dup]
    out = {}
    for d, a in arrs.items():
        covered: set = set()
        for s in starts[d]:
            covered.update(range(s, s + k))
        n = len(a)
        c = len(covered)
        out[d] = (
            n,
            len(starts[d]),
            c,
            0 if n == 0 else c * 1_000_000 // n,
        )
    return out


# 15-token run shared by docs 1 and 2 (differing tails so the docs are not
# full duplicates); doc 3 repeats a 13-gram twice WITHIN itself only;
# doc 4 is shorter than k.
_RUN = " ".join(f"run{c}word" for c in "abcdefghijklmno")
_INNER = " ".join(f"rep{c}word" for c in "abcdefghijklm")
_DOCS = {
    1: _RUN + " tailone tailtwo tailthree",
    2: "headone headtwo " + _RUN + " other ending words",
    3: _INNER + " separator " + _INNER,
    4: "just five little tokens here",
}


def test_dup_span_twin_matches_spark(spark):
    df = spark.createDataFrame(
        [(d, t) for d, t in _DOCS.items()], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_dup_positions"],
            r["covered_tokens"],
            r["coverage_ppm"],
        )
        for r in dup_span_coverage(df).collect()
    }
    assert got == _twin(_DOCS)
    # cross-doc run: 3 overlapping starts union to exactly 15 tokens,
    # NOT 3*13=39 — the sweep unions, it does not sum
    assert got[1][2] == 15 and got[2][2] == 15
    # within-doc-only repetition contributes nothing (t26's job, not t47's)
    assert got[3] == (27, 0, 0, 0)
    # sub-k doc still emits a row, all-zero coverage
    assert got[4][0] < K and got[4][1:] == (0, 0, 0)


def test_dup_span_floor_ppm(spark):
    # doc 1: 18 tokens, 15 covered -> floor(15e6/18) = 833333 exactly
    df = spark.createDataFrame(
        [(d, t) for d, t in _DOCS.items()], ["doc_id", "text"]
    )
    row = {
        r["doc_id"]: r["coverage_ppm"]
        for r in dup_span_coverage(df).collect()
    }
    assert row[1] == 15 * 1_000_000 // 18

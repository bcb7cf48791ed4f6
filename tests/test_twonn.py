"""e21 TwoNN intrinsic dimension: hand-computed pin on a planted corpus.

Block 7: four collinear points whose exact 1st/2nd squared distances are
hand-derived; the expected nano sum is computed with the SAME
round-half-away-from-zero both engines use (values here are never .5
anyway: ln of a bigint * 1e9). Block 8: an exact duplicate pair — both
dup points drop by the d2_1 = 0 rule while the rest of the block still
contributes. Block 9: two points only (no 2nd neighbor) — absent.
"""

from __future__ import annotations

import math

from research_knowledge_graph_spark.operators.similarity import (
    intrinsic_dimension_twonn,
)


def _ln_nano(d2: int) -> int:
    v = math.log(d2) * 1e9
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def test_twonn_planted(spark):
    # block 7 x-coords: 0, 1, 3, 7  (micro scale: d2 units are 1e12·Δx²)
    # NN pairs (d2_1, d2_2): p0:(1,9) p1:(1,4) p2:(4,9) p3:(16,36) ×1e12
    pts7 = {0: 0.0, 1: 1.0, 2: 3.0, 3: 7.0}
    u = 10**12
    expect7 = sum(
        _ln_nano(b * u) - _ln_nano(a * u)
        for a, b in [(1, 9), (1, 4), (4, 9), (16, 36)]
    )
    # block 8: dup pair at x=0 (both drop: d2_1 = 0), plus 1, 3, 7 —
    # p12's two nearest are BOTH coincident dups at d2 = 1 → its term is
    # exactly 0 (a tie, not a drop: d2_1 > 0); p13: (4, 9); p14:
    # (16, 36); only the two dups themselves drop (d2_1 = 0)
    rows = [(i, [x], 7) for i, x in pts7.items()]
    rows += [(10, [0.0], 8), (11, [0.0], 8), (12, [1.0], 8),
             (13, [3.0], 8), (14, [7.0], 8)]
    rows += [(20, [0.0], 9), (21, [5.0], 9)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["label"]: r for r in intrinsic_dimension_twonn(df).collect()}
    assert set(out) == {7, 8}, "2-point block 9 must be absent"
    assert out[7]["n_used"] == 4
    assert out[7]["sum_ln2x_nano"] == expect7
    assert out[7]["id_est"] == round(2e9 * 4 / expect7, 6)
    # block 8: dups dropped, 3 survivors with the hand-derived NN pairs
    expect8 = sum(
        _ln_nano(b * u) - _ln_nano(a * u)
        for a, b in [(1, 1), (4, 9), (16, 36)]
    )
    assert out[8]["n_used"] == 3
    assert out[8]["sum_ln2x_nano"] == expect8


def test_twonn_all_ties_block_drops(spark):
    # equilateral-ish: every point's two NNs tie exactly → every term 0
    # → Σ = 0 → the block drops (the estimate diverges)
    rows = [(0, [0.0], 1), (1, [2.0], 1), (2, [4.0], 1)]
    # p0: d2 to p1 = 4, p2 = 16 → term > 0; need true tie instead:
    # three points where each one's 1st/2nd NN distances are EQUAL —
    # p at -1 and +1 around each… simplest: 4 points on a square in 2-D
    rows = [
        (0, [0.0, 0.0], 1),
        (1, [1.0, 0.0], 1),
        (2, [0.0, 1.0], 1),
        (3, [1.0, 1.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    # every point's two nearest are the two adjacent corners at d2 = 1e12
    # each → every term_nano = 0 → sum = 0 → block absent
    assert intrinsic_dimension_twonn(df).collect() == []


def test_twonn_multi_block_membership(spark):
    # multi-probe LSH assigns one vector to several buckets: vec 0 sits
    # in BOTH blocks, with different neighbors in each — it must get an
    # independent rank-2 list per block (a window keyed on a_id alone
    # would keep only the two globally-smallest d2 and corrupt/drop it)
    u = 10**12
    rows = [
        # block 1: x = 0, 1, 3, 7 → vec 0's (d2_1, d2_2) = (1, 9)·u
        (0, [0.0], 1), (1, [1.0], 1), (2, [3.0], 1), (3, [7.0], 1),
        # block 2: vec 0 again at x=0, neighbors at 10, 30 →
        # vec 0's (d2_1, d2_2) = (100, 900)·u
        (0, [0.0], 2), (11, [10.0], 2), (12, [30.0], 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["label"]: r for r in intrinsic_dimension_twonn(df).collect()}
    assert set(out) == {1, 2}
    # block 1: p0:(1,9) p1:(1,4) p2:(4,9) p3:(16,36)
    exp1 = sum(_ln_nano(b * u) - _ln_nano(a * u)
               for a, b in [(1, 9), (1, 4), (4, 9), (16, 36)])
    # block 2: p0:(100,900) p11:(100,400) p12:(400,900)
    exp2 = sum(_ln_nano(b * u) - _ln_nano(a * u)
               for a, b in [(100, 900), (100, 400), (400, 900)])
    assert out[1]["n_used"] == 4 and out[1]["sum_ln2x_nano"] == exp1
    assert out[2]["n_used"] == 3 and out[2]["sum_ln2x_nano"] == exp2


# --- hypothesis twin: random integer-coordinate blocks vs a pure-python
# reference of the full cascade (micro fixed point, exact d2, (d2, b_id)
# rank order, dup/no-2nd/zero-sum drops, nano-ln terms) ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _twonn_ref(rows):
    """rows: (vec_id, [int coords], label) with unique (vec_id, label)."""
    blocks = {}
    for i, v, lab in rows:
        blocks.setdefault(lab, []).append((i, [int(x) * 10**6 for x in v]))
    out = {}
    for lab, pts in blocks.items():
        terms = []
        for i, vi in pts:
            ds = sorted(
                (sum((a - b) ** 2 for a, b in zip(vi, vj)), j)
                for j, vj in pts
                if j != i
            )
            if len(ds) < 2 or ds[0][0] == 0:
                continue
            terms.append(_ln_nano(ds[1][0]) - _ln_nano(ds[0][0]))
        s = sum(terms)
        if terms and s > 0:
            out[lab] = (len(terms), s)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.lists(
                st.integers(min_value=-8, max_value=8),
                min_size=2,
                max_size=2,
            ),
            st.sampled_from([1, 2]),
        ),
        min_size=1,
        max_size=14,
    )
)
def test_twonn_hypothesis_twin(spark, pts):
    # small integer coords in 2-D: duplicates (dup-drop), exact ties
    # (zero-sum blocks) and tiny blocks (no-2nd-neighbor) all arise
    # naturally; micro fixed point is exact on integers
    rows = [
        (i, [float(x) for x in v], lab) for i, (v, lab) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["label"]: (r["n_used"], r["sum_ln2x_nano"])
        for r in intrinsic_dimension_twonn(df).collect()
    }
    exp = _twonn_ref([(i, v, lab) for i, (v, lab) in enumerate(pts)])
    assert got == exp

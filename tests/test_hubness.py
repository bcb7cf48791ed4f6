"""e20 hubness audit: hand-computed pin on a planted 1-D corpus.

Five collinear points, k=1: v1 is the hub of the left cluster, v3 the
anti-hub (inbound 0), and v0's exact distance TIE between v1 and v4
(both at distance 1) must break to the LOWER id (the (d2, id) total
order) — the rule that makes ranks engine-exact.
"""

from __future__ import annotations

from research_knowledge_graph_spark.operators.similarity import hubness_audit

# x-coords: v0=0, v1=1, v2=2.5, v3=10, v4=-1 (one label block)
_PTS = {0: 0.0, 1: 1.0, 2: 2.5, 3: 10.0, 4: -1.0}
# nearest (k=1): v0->v1 (tie with v4 breaks low), v1->v0, v2->v1,
# v3->v2, v4->v0  =>  inbound: v0:2, v1:2, v2:1, v3:0, v4:0
_EXPECT = {0: 2, 1: 2, 2: 1, 3: 0, 4: 0}


def test_hubness_planted(spark):
    df = spark.createDataFrame(
        [(i, [x], 7) for i, x in _PTS.items()],
        "vec_id long, embedding array<float>, label int",
    )
    out = hubness_audit(df, k=1).collect()
    got = {r["vec_id"]: r["n_inbound"] for r in out}
    assert got == _EXPECT
    rows = {r["vec_id"]: r for r in out}
    # every row carries the block size and the floor-ppm ratio
    assert all(r["n_block"] == 5 for r in out)
    assert rows[0]["inbound_ppm_of_k"] == 2 * 1_000_000 // 1
    assert rows[3]["inbound_ppm_of_k"] == 0

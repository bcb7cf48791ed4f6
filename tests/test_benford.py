"""v26 Benford audit: python-twin pin on a planted value column.

Pins: digit comes from the CENTS integer head (19.99 -> 1999 -> digit 1,
not from the dollar part), sub-cent values drop (cents 0), missing digits
still materialize on the spine with their expected share feeding TVD, and
the floor-ppm / floor-half TVD arithmetic.
"""

from __future__ import annotations

import importlib.util

_BENFORD = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry___benford", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _away_from_zero(x: float) -> int:
    """Both engines round half AWAY FROM ZERO (Spark HALF_UP, DuckDB
    round()); python's round() is banker's — don't use it in the twin."""
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _twin(values: list[float]) -> dict[int, tuple]:
    counts = {d: 0 for d in range(1, 10)}
    for v in values:
        cents = abs(_away_from_zero(v * 100))
        if cents > 0:
            counts[int(str(cents)[0])] += 1
    n = sum(counts.values())
    obs = {d: c * 1_000_000 // n for d, c in counts.items()}
    tvd = sum(abs(obs[d] - _BENFORD[d]) for d in range(1, 10)) // 2
    return {
        d: (counts[d], obs[d], _BENFORD[d], obs[d] - _BENFORD[d], tvd)
        for d in range(1, 10)
    }


def test_benford_twin(spark, tmp_path):
    import datetime as dt

    # digits: 1.00->1, 19.99->1 (cents head, not dollar head), 0.02->2,
    # 0.004 -> cents 0 -> dropped; -2.50 -> |cents| 250 -> 2 (Benford on
    # magnitude: refunds count); digits 3..9 absent but must appear
    values = [1.00, 19.99, 0.02, 0.004, 150.00, -2.50]
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "typea", v, "{}")
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    d = str(tmp_path / "sf")
    import os

    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    m = _load_entry()
    out = m.queries()["v26_benford_audit"](spark, d)
    got = {
        r["digit"]: (
            r["n_events"], r["obs_ppm"], r["benford_ppm"], r["dev_ppm"],
            r["tvd_ppm"],
        )
        for r in out.collect()
    }
    exp = _twin(values)
    assert got == exp
    # all nine digits materialize even though only 1/2 occur
    assert set(got) == set(range(1, 10))
    # 19.99 under digit 1 (cents head); -2.50 under digit 2 (magnitude)
    assert got[1][0] == 3 and got[2][0] == 2

"""v27 diurnal autocorrelation: python-twin pin on planted hourly series.

Pins: a perfectly 24h-periodic series scores acf24 == 1.0 exactly (the
num == var_x == var_y integer identity), and a missing hour is a REAL
ZERO on the spine (without zero-fill the constant series would be
zero-variance and silently dropped / misaligned).
"""

from __future__ import annotations

import importlib.util
import math


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry___acf", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _twin(hour_counts: dict[int, int]) -> tuple:
    h0, h1 = min(hour_counts), max(hour_counts)
    x = [hour_counts.get(h, 0) for h in range(h0, h1 + 1)]
    pairs = [(x[t], x[t + 24]) for t in range(len(x) - 24)]
    n = len(pairs)
    sx = sum(a for a, _ in pairs)
    sy = sum(b for _, b in pairs)
    sxy = sum(a * b for a, b in pairs)
    sxx = sum(a * a for a, _ in pairs)
    syy = sum(b * b for _, b in pairs)
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return (n, num, vx, vy, round(num / math.sqrt(vx * vy), 9))


def test_diurnal_autocorr_planted(spark, tmp_path):
    import datetime as dt
    import os

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # type "per": hours 0..71, 2 events when h%24==0 else 1 -> exact period 24
    per_counts = {h: (2 if h % 24 == 0 else 1) for h in range(72)}
    for h, c in per_counts.items():
        for _ in range(c):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=1), 1,
                         "per", 1.0, "{}"))
            eid += 1
    # type "gap": hours 0..49 one event each EXCEPT hours 5 and 30
    # (one real zero on each side of the lag so neither side is constant)
    gap_counts = {h: 1 for h in range(50) if h not in (5, 30)}
    for h in gap_counts:
        rows.append((eid, base + dt.timedelta(hours=h, minutes=2), 2,
                     "gap", 1.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    m = _load_entry()
    out = {
        r["event_type"]: (
            r["n_pairs"], r["acf_num"], r["var_x"], r["var_y"], r["acf24"]
        )
        for r in m.queries()["v27_diurnal_autocorr"](spark, d).collect()
    }
    assert out["per"] == _twin(per_counts)
    assert out["per"][4] == 1.0  # exact periodicity -> exactly 1.0
    # zero-fill: without it the gap series is constant (zero variance,
    # dropped); with it the type survives and matches the twin
    assert "gap" in out and out["gap"] == _twin({**gap_counts, 5: 0, 30: 0})

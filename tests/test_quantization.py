"""Int8 quantization audit (e16) — exact python-int twin + error bound."""

from __future__ import annotations

import importlib.util

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def entry():
    return _load_entry()


def _round_half_up(x: float) -> int:
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def test_python_twin(spark, entry):
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    want = {}
    for vid, v in vecs.items():
        xm = [_round_half_up(float(x) * 1e6) for x in v]
        max_abs = max(abs(c) for c in xm)
        m0 = max(max_abs, 1)
        errs = [
            127 * abs(c) - ((abs(c) * 254 + m0) // (2 * m0)) * m0 for c in xm
        ]
        want[vid] = (
            max_abs,
            len(xm),
            sum(e * e for e in errs),
            max(abs(e) for e in errs),
        )
    got = {
        r["vec_id"]: (
            r["max_abs_micro"], r["n_dims"], r["sq_err"], r["max_abs_err"]
        )
        for r in entry.queries()["e16_quantization_audit"](
            spark, SF_DIR
        ).collect()
    }
    assert got == want


def test_error_bound(spark, entry):
    """Round-half-up quantization error is at most half a level:
    |127·|x| − q·m0| ≤ m0/2 (so 2·max_abs_err ≤ m0 ≤ max_abs_micro + 1)."""
    rows = entry.queries()["e16_quantization_audit"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        m0 = max(r["max_abs_micro"], 1)
        assert 2 * r["max_abs_err"] <= m0

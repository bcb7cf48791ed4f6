"""Function-layer tests: the reference's pinned normalization vectors
(``/root/reference/tests/test_entity_extraction.py:36-61``) plus
expression-vs-Python-twin property checks."""

from __future__ import annotations

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

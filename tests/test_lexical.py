"""t48 lexical complexity: hand-computed pin on a planted doc.

Pins the vowel-group rule (maximal [aeiou]+ runs), the >=3-group FOG
complex-word rule, the vowel-less-token zero, and the floor-ppm ratios.
"""

from __future__ import annotations

import importlib.util


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry___lex", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_lexical_planted(spark, tmp_path):
    import os

    # customer -> u|o|e = 3 groups (complex); queue -> ueue = 1 group;
    # rhythms -> 0 groups; via -> ia = 1 group; xx dropped (len<3)
    text = "customer queue rhythms via xx"
    df = spark.createDataFrame(
        [(1, text, "en", "srcx", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    m = _load_entry()
    rows = m.queries()["t48_lexical_complexity"](spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_tokens"] == 4          # xx filtered by the >=3-char rule
    assert r["n_syllables"] == 3 + 1 + 0 + 1
    assert r["n_complex"] == 1         # only customer has >= 3 groups
    assert r["syll_per_token_ppm"] == 5 * 1_000_000 // 4
    assert r["complex_ppm"] == 1 * 1_000_000 // 4


def test_vocab_growth_planted(spark, tmp_path):
    import math
    import os

    # source "a": aaa x3, bbb x2, ccc x1, ddd x1 -> N=7, V=4, hapax=2, dis=1
    # source "b": one token only -> dropped by the N >= 2 rule
    rows = [
        (1, "aaa aaa aaa bbb bbb ccc ddd", "en", "a", 27),
        (2, "solo", "en", "b", 4),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    m = _load_entry()
    out = {r["source"]: r for r in m.queries()["t49_vocab_growth"](spark, d).collect()}
    assert set(out) == {"a"}  # N=1 source dropped
    r = out["a"]
    assert (r["n_tokens"], r["v_types"], r["hapax_count"], r["dis_count"]) == (7, 4, 2, 1)
    assert r["ttr_ppm"] == 4 * 1_000_000 // 7
    assert r["hapax_ppm"] == 2 * 1_000_000 // 4
    ln_v = round(math.log(4) * 1e9)
    ln_n = round(math.log(7) * 1e9)
    assert (r["ln_v_nano"], r["ln_n_nano"]) == (ln_v, ln_n)
    assert r["heaps_beta"] == round(ln_v / ln_n, 9)

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

"""URL canonicalization / url-level dedup (operators/web.py): pinned
canonicalization vectors, latest-crawl-wins survivor semantics, the
schemeless-NULL contract, and the domain-skew report arithmetic.
The sf-scale cross-engine twin is entry t54 in tests/test_entry_oracle.py."""

import datetime

from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.web import (
    canonical_url_col,
    domain_col,
    domain_skew_report,
    url_dedup,
    with_canonical_url,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i int, u string")
    return [
        r.c
        for r in df.select("i", canonical_url_col("u").alias("c")).orderBy("i").collect()
    ]


def test_canonical_url_vectors(spark):
    got = _canon(
        spark,
        [
            # case + www + default port + fragment + trailing slash
            "HTTPS://WWW.Example.COM:443/A/b//#frag",
            # tracking params dropped, survivors sorted, empty parts dropped
            "https://example.com/A/b?utm_source=feed&b=2&&a=1",
            # http default port; non-default port kept
            "http://example.com:80/x",
            "http://example.com:8080/x",
            # all params tracking -> no '?'
            "https://example.com/p?utm_campaign=x&gclid=1&fbclid=2",
            # 'ref' dropped bare and with value; 'refresh' kept (prefix != param)
            "https://example.com/p?ref&ref=abc&refresh=1",
            # root URL: trailing slash stripped to bare authority
            "https://example.com/",
            # whitespace trimmed; scheme case folded
            "  HtTp://Example.com/y  ",
            # userinfo is case-SENSITIVE (RFC 3986): preserved byte-for-byte
            # while the host still folds; www-/port-strip work past the @
            "https://Alice@Example.COM/p",
            "https://user:Pw@WWW.Example.com:443/p",
        ],
    )
    assert got == [
        "https://example.com/A/b",
        "https://example.com/A/b?a=1&b=2",
        "http://example.com/x",
        "http://example.com:8080/x",
        "https://example.com/p",
        "https://example.com/p?refresh=1",
        "https://example.com",
        "http://example.com/y",
        "https://Alice@example.com/p",
        "https://user:Pw@example.com/p",
    ]


def test_canonical_url_schemeless_is_null(spark):
    got = _canon(spark, ["example.com/x", "//example.com/x", "", "not a url"])
    assert got == [None, None, None, None]


def test_url_dedup_latest_crawl_wins(spark):
    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    t1 = datetime.datetime(2026, 1, 2, 0, 0, 0)
    rows = [
        # three spellings of ONE canonical url across two crawl times:
        # latest ts wins; within the tied latest ts the greater spelled url
        ("https://www.a.com/p?b=2&a=1", t0, "old"),
        ("https://a.com/p/?a=1&b=2&utm_source=x", t1, "new-1"),
        ("HTTPS://A.com:443/p?a=1&b=2", t1, "new-2"),
        # a second canonical url, single row
        ("https://b.com/q", t0, "only"),
        # schemeless row dropped
        ("b.com/q", t1, "junk"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    out = {r.canonical_url: r for r in url_dedup(df).collect()}
    assert set(out) == {"https://a.com/p?a=1&b=2", "https://b.com/q"}
    a = out["https://a.com/p?a=1&b=2"]
    assert a.n_crawls == 3
    assert a.text == "new-1"  # t1 ties break on the spelled url: 'https://a...' > 'HTTPS...'
    assert a.warc_ts == t1
    b = out["https://b.com/q"]
    assert b.n_crawls == 1 and b.text == "only"
    # schema = input + canonical_url + n_crawls
    assert url_dedup(df).columns == ["url", "warc_ts", "text", "canonical_url", "n_crawls"]


def test_url_dedup_rejects_reserved_columns(spark):
    import datetime as dt

    import pytest

    df = spark.createDataFrame(
        [("https://a.com/p", dt.datetime(2026, 1, 1), "x")],
        "url string, warc_ts timestamp, canonical_url string",
    )
    with pytest.raises(ValueError, match="canonical_url"):
        url_dedup(df)


def test_url_dedup_on_synthetic_pages(spark):
    from research_knowledge_graph_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, n_docs=200)
    out = url_dedup(pages)
    # synthetic corpus has unique urls -> dedup is the identity on rows
    assert out.count() == pages.count()
    assert out.agg(F.max("n_crawls")).first()[0] == 1
    # and every canonical url is non-null with a scheme
    assert out.where(~F.col("canonical_url").startswith("https://")).count() == 0


def test_domain_skew_report(spark):
    rows = (
        [("https://big.com/p%d" % i,) for i in range(8)]
        + [("https://www.big.com:443/q%d" % i,) for i in range(4)]  # same domain
        + [("https://mid.com/p%d" % i,) for i in range(3)]
        + [("https://tail.com/p",)]
    )
    df = spark.createDataFrame(rows, "url string")
    rep = domain_skew_report(df, top_n=2).collect()
    assert [(r.domain, r.n_pages) for r in rep] == [("big.com", 12), ("mid.com", 3)]
    assert rep[0].share_ppm == 12 * 1_000_000 // 16
    hhi = (12 * 12 + 3 * 3 + 1 * 1) * 1_000_000 // (16 * 16)
    assert rep[0].corpus_hhi_ppm == hhi and rep[1].corpus_hhi_ppm == hhi
    assert domain_col(F.lit("https://WWW.X.io:8443/a")) is not None
    one = df.select(domain_col("url").alias("d")).where(F.col("d") == "big.com")
    assert one.count() == 12


def test_pipeline_dedup_urls_recrawl_noise_is_invisible(spark, tmp_path):
    """E2E: with dedup_urls=True, a corpus polluted by OLDER recrawls of
    the same pages under messy URL spellings (scheme/host case, www.,
    tracking params, trailing slash) produces the exact same graph as the
    clean corpus — the front-door dedup drops the noise before stage 1."""
    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.plans.pipeline import run_pipeline
    from research_knowledge_graph_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 60)
    noise = pages.select(
        F.concat(
            F.lit("HTTPS://www."), F.expr("substring(url, 9)"), F.lit("/?utm_source=feed")
        ).alias("url"),
        (F.col("warc_ts") - F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
        F.encode(F.lit("<html><body><p>spam spam spam</p></body></html>"), "utf-8").alias("html"),
        F.lit("spam spam spam").alias("text"),
        F.col("lang"),
    )
    noisy = pages.unionByName(noise)

    clean = run_pipeline(spark, pages, str(tmp_path / "clean"), mode="heuristic")
    dedup = run_pipeline(
        spark, noisy, str(tmp_path / "dedup"), mode="heuristic", dedup_urls=True
    )
    def cmp(df):
        # MAP columns can't go through set ops — render them as sorted
        # entry arrays (deterministic) before the except-all comparison
        return df.select(
            *[
                F.to_json(F.array_sort(F.map_entries(c))).alias(c)
                if t.startswith("map<")
                else F.col(c)
                for c, t in df.dtypes
            ]
        )

    for a, b in ((clean.nodes, dedup.nodes), (clean.edges, dedup.edges)):
        a, b = cmp(a), cmp(b)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_streaming_url_dedup_suppresses_recrawls(spark, tmp_path):
    """Streaming twin of url_dedup: keyed by url_fingerprint_col, a
    re-crawl of the same canonical URL is suppressed across drains even
    when its CONTENT changed (content-keyed dedup would emit it) and
    whatever messy spelling it arrives under. First-seen-wins — the
    streaming semantic; batch url_dedup is the latest-crawl-wins twin."""
    from research_knowledge_graph_spark.operators.web import url_fingerprint_col
    from research_knowledge_graph_spark.sources.pages import PAGES_SCHEMA, synthesize_pages
    from research_knowledge_graph_spark.streaming.stateful_dedup import run_streaming_dedup

    inp, out, ckpt = (str(tmp_path / d) for d in ["in", "out", "ck"])
    base = synthesize_pages(spark, 20).select("url", "warc_ts", "html", "text", "lang")
    base.write.mode("append").parquet(inp)
    run_streaming_dedup(
        spark, inp, out, ckpt, PAGES_SCHEMA,
        fingerprint=url_fingerprint_col("url"), keep_all=True,
    )
    first = spark.read.parquet(out)
    assert first.count() == 20
    # keep_all carries the FULL pages schema through (+ fingerprint) — the
    # deduped stream must be consumable by the pages-shaped pipeline
    assert set(first.columns) == {"url", "warc_ts", "html", "text", "lang", "fingerprint"}

    # drop 2: 10 recrawls under messy spellings with NEW content, + 5 new
    # pages, + 2 schemeless junk rows (dropped, never emitted)
    recrawl = (
        synthesize_pages(spark, 10)
        .select("url", "warc_ts", "html", "text", "lang")
        .withColumn(
            "url",
            F.concat(F.lit("HTTPS://www."), F.expr("substring(url, 9)"), F.lit("/?utm_source=x")),
        )
        .withColumn("text", F.concat(F.lit("CHANGED "), F.col("text")))
    )
    fresh = (
        synthesize_pages(spark, 25)
        .filter(F.col("url").rlike("/(2[0-4])$"))
        .select("url", "warc_ts", "html", "text", "lang")
    )
    t0 = datetime.datetime(2026, 1, 1)
    junk = spark.createDataFrame(
        [("no-scheme/x", t0, b"<html></html>", "junk", "en"),
         ("", t0, b"<html></html>", "junk2", "en")],
        PAGES_SCHEMA,
    )
    recrawl.unionByName(fresh).unionByName(junk).write.mode("append").parquet(inp)

    run_streaming_dedup(
        spark, inp, out, ckpt, PAGES_SCHEMA,
        fingerprint=url_fingerprint_col("url"), keep_all=True,
    )
    res = spark.read.parquet(out)
    assert res.count() == 25  # +5 new; 10 recrawls + 2 junk suppressed
    assert res.where(F.col("text").startswith("CHANGED")).count() == 0

    # ...and the deduped stream output actually feeds the batch pipeline
    from research_knowledge_graph_spark.plans.pipeline import run_pipeline

    graph = run_pipeline(
        spark,
        res.select("url", "warc_ts", "html", "text", "lang"),
        str(tmp_path / "kg"),
        mode="heuristic",
    )
    assert graph.nodes.filter(F.col("node_type") == "paper").count() == 25


def test_dedup_urls_is_part_of_checkpoint_identity(spark, tmp_path):
    """Toggling dedup_urls on the SAME workdir/run_fingerprint must not
    reuse stages committed under the other setting — it changes what
    stage 1 reads, so it is part of checkpoint identity."""
    from research_knowledge_graph_spark.plans.pipeline import run_pipeline
    from research_knowledge_graph_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 20)
    noise = pages.select(
        F.concat(F.lit("HTTPS://www."), F.expr("substring(url, 9)"), F.lit("/?gclid=1")).alias("url"),
        (F.col("warc_ts") - F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
        "html", "text", "lang",
    )
    noisy = pages.unionByName(noise)
    wd = str(tmp_path / "kg")

    r1 = run_pipeline(spark, noisy, wd, mode="heuristic")
    assert r1.nodes.filter(F.col("node_type") == "paper").count() == 40

    # same workdir, same run_fingerprint, dedup now ON: stale committed
    # stages (40-paper docs table) must NOT satisfy this run
    r2 = run_pipeline(spark, noisy, wd, mode="heuristic", dedup_urls=True)
    assert r2.nodes.filter(F.col("node_type") == "paper").count() == 20


def test_noindex_detection_and_drop(spark):
    from research_knowledge_graph_spark.operators.web import drop_noindex, noindex_col

    rows = [
        (1, b'<html><head><meta name="robots" content="noindex,nofollow"></head><body>x</body></html>'),
        (2, b'<HTML><META NAME=ROBOTS CONTENT="NOINDEX"></HTML>'),  # case + bare attrs
        (3, b'<meta content="noindex" name="robots">'),  # reversed attr order
        (4, b'<meta name="robots" content="index,follow"><p>fine</p>'),
        (5, b'<meta name="viewport" content="noindex-lookalike">'),  # wrong meta name
        (6, b'<p>plain page, no meta at all</p>'),
        (7, b'\xff\xfe broken bytes <meta name="robots" content="noindex">'),  # still detected
        (8, None),  # NULL html -> kept
    ]
    df = spark.createDataFrame(rows, "id int, html binary")
    flags = {r.id: r.f for r in df.select("id", noindex_col("html").alias("f")).collect()}
    assert flags == {1: True, 2: True, 3: True, 4: False, 5: False, 6: False, 7: True, 8: False}
    assert sorted(r.id for r in drop_noindex(df).collect()) == [4, 5, 6, 8]


def test_canonical_url_idempotent_hypothesis(spark):
    """Property: canonicalization is IDEMPOTENT — canon(canon(u)) ==
    canon(u) for every url shape (a canonical form that re-canonicalizes
    differently would make url_dedup's key unstable across re-ingests of
    an already-deduped corpus). Random urls are assembled from scheme /
    userinfo / host-case / www / port / path-slashes / param-set (incl.
    tracking + empties + duplicates) / fragment parts; schemeless strings
    must stay NULL-stable."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @st.composite
    def urls(draw):
        scheme = draw(st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp", ""]))
        user = draw(st.sampled_from(["", "Alice@", "u:P%40w@", "a@b@"]))
        host = draw(st.sampled_from(["Example.COM", "www.site.io", "WWW.X.Y", "a-b.c"]))
        port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
        path = draw(st.sampled_from(["", "/", "/A/b", "/A/b/", "/x//", "/%7Ea"]))
        params = draw(
            st.lists(
                st.sampled_from(
                    ["a=1", "b=2", "B=2", "utm_source=x", "gclid", "ref=z", "", "a=1"]
                ),
                max_size=5,
            )
        )
        frag = draw(st.sampled_from(["", "#f", "#/x?y=1"]))
        q = "?" + "&".join(params) if params else ""
        prefix = f"{scheme}://" if scheme else ""
        return f"{prefix}{user}{host}{port}{path}{q}{frag}"

    @settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(urls(), min_size=1, max_size=40))
    def check(batch):
        df = spark.createDataFrame([(i, u) for i, u in enumerate(batch)], "i int, u string")
        once = df.select("i", canonical_url_col("u").alias("c1"))
        twice = once.select(
            "i", "c1", canonical_url_col(F.col("c1")).alias("c2")
        ).collect()
        for r in twice:
            assert r.c2 == r.c1, (batch[r.i], r.c1, r.c2)

    check()

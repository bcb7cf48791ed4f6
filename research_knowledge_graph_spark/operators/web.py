"""Web-ingest front-door operators: URL canonicalization and URL-level dedup.

A Common-Crawl-style corpus (the pipeline's input table — ``pages(url,
warc_ts, html, text, lang)``) carries the same logical page under many
spellings of its URL (scheme/host case, ``www.`` prefix, default ports,
tracking parameters, query-parameter order, fragments, trailing slashes)
and under many crawl timestamps. The standard front door of a web-scale
ingest is therefore:

- :func:`canonical_url_col` — a pure-Catalyst (regex + array builtins,
  zero UDF, map-only / whole-stage-codegen) canonical form of a URL.
  The rule set is the common-crawler consensus subset: lowercase scheme
  and host, strip a leading ``www.``, strip default ports (``:80`` for
  http, ``:443`` for https), drop the fragment, drop tracking query
  parameters (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``, ``mc_cid``,
  ``mc_eid``, ``ref``, ``igshid``), sort the surviving query parameters,
  and strip trailing slashes from the path. Percent-encoding case and
  path-segment dot-resolution are intentionally NOT touched (both need a
  spec-complete parser; a partial rewrite aliases distinct URLs, which is
  worse for dedup than missing an alias). A string with no ``scheme://``
  is not a fetchable web URL — canonical form is NULL and the caller
  filters (pinned in tests).
- :func:`url_dedup` — latest-crawl-wins dedup on the canonical URL: one
  hash-agg (``max_by`` over a ``(warc_ts, url)`` ordering struct — total
  order, so the survivor is deterministic under any partitioning; no
  window, no sort). At 10^12 rows this is the exact shape Spark's
  map-side partial aggregation wants: the combiner collapses each
  canonical URL's recrawls inside every input partition before the one
  shuffle on ``canonical_url``.

Every regex below avoids lookaround so the identical pattern text runs
under both Java regex (Spark) and RE2 (DuckDB) — what makes the op
oracle-checkable (entry t54).

Reference parity note: the reference ingests a directory of files and
never sees recrawls (research_ingest.py walks local paths); this module is
part of the Common-Crawl scale-up surface, not a ported operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared verbatim with the DuckDB oracle (entry t54) and the unit tests.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|igshid)(=|$)"
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^?#]*\?([^#]*)"


def canonical_url_col(col: Column | str) -> Column:
    """Canonical form of a URL column (NULL when there is no ``scheme://``).

    Pure column algebra: four anchored ``regexp_extract`` parses (scheme /
    authority / path / query), host + port normalization with string
    builtins, and the query rewrite as ``split → filter → array_sort →
    array_join``. No shuffle, no Python.
    """
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    raw_auth = F.regexp_extract(u, _AUTHORITY_RE, 1)
    # userinfo (…@, up to the LAST @) is case-SENSITIVE per RFC 3986 —
    # preserved byte-for-byte; only the host:port part case-folds, and the
    # www-/port-strip rules apply to it (not to a host hiding behind an @)
    userinfo = F.regexp_extract(raw_auth, r"^(.*@)", 1)
    hostport = F.lower(F.regexp_extract(raw_auth, r"([^@]*)$", 1))
    # strip leading www. then the scheme's default port
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), r"/+$", "")
    query = F.regexp_extract(u, _QUERY_RE, 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        userinfo,
        host,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", canon).otherwise(F.lit(None).cast("string"))


def with_canonical_url(
    pages: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """``pages`` with a ``canonical_url`` column attached (map-only)."""
    return pages.withColumn(out_col, canonical_url_col(url_col))


def url_dedup(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Latest-crawl-wins URL dedup: one surviving row per canonical URL.

    Survivor = the row with the greatest ``(ts_col, url_col)`` — a total
    order over recrawls of one canonical URL (two crawls of the same
    *spelled* URL in one corpus carry distinct timestamps upstream; equal
    ``(ts, url)`` pairs are byte-identical recrawl rows, so either is the
    same survivor). Rows whose URL has no canonical form (no scheme) are
    dropped — they are not fetchable web pages. Output schema = input
    schema + ``canonical_url`` + ``n_crawls`` (how many rows collapsed).

    ONE shuffle (the hash-agg on ``canonical_url``) with map-side partial
    aggregation; no window function, so no per-group sort.
    """
    cols = pages.columns
    for reserved in ("canonical_url", "n_crawls"):
        if reserved in cols:
            # withColumn would silently REPLACE the caller's column and the
            # output select would then emit a duplicate name (ambiguous for
            # every downstream reference) — refuse instead
            raise ValueError(
                f"url_dedup adds a {reserved!r} column; drop or rename the "
                f"input's existing {reserved!r} first"
            )
    tagged = with_canonical_url(pages, url_col).filter(
        F.col("canonical_url").isNotNull()
    )
    payload = F.struct(*[F.col(c) for c in cols])
    order_key = F.struct(F.col(ts_col), F.col(url_col))
    agg = tagged.groupBy("canonical_url").agg(
        F.max_by(payload, order_key).alias("_row"),
        F.count(F.lit(1)).alias("n_crawls"),
    )
    return agg.select(
        *[F.col(f"_row.{c}").alias(c) for c in cols],
        F.col("canonical_url"),
        F.col("n_crawls"),
    )


def domain_col(col: Column | str) -> Column:
    """Registrable-host column for a URL (canonical host, no port) — the
    grouping key for head-domain skew reports and per-domain quotas."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    raw_auth = F.regexp_extract(u, _AUTHORITY_RE, 1)
    hostport = F.lower(F.regexp_extract(raw_auth, r"([^@]*)$", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.regexp_replace(host, r":[0-9]+$", "")
    return F.when(host != "", host).otherwise(F.lit(None).cast("string"))


def domain_skew_report(
    pages: DataFrame, url_col: str = "url", top_n: int = 20
) -> DataFrame:
    """Head-domain skew audit: per-domain page share for the ``top_n``
    domains plus the corpus Herfindahl index (sum of squared shares,
    ppm) — the number that says whether url-hash salting is needed
    before the per-domain stages. Two tiny aggs over one scan; the
    per-domain table is #domains rows (small), the final top-N a
    TakeOrdered."""
    per_domain = (
        pages.select(domain_col(url_col).alias("domain"))
        .where(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    # exact integer ppm via the repo's `div` idiom — in DECIMAL(38,0):
    # a head domain of n pages contributes n² to the HHI numerator, and
    # bigint n²·10⁶ overflows at n ≈ 3·10⁶ (one mid-size domain of a real
    # crawl); double division would also drift past 2^53
    dec = "CAST(n_pages AS DECIMAL(38,0))"
    total = per_domain.agg(
        F.sum("n_pages").alias("_total"),
        F.expr(
            f"CAST((sum({dec} * {dec}) * 1000000) div "
            f"(sum({dec}) * sum({dec})) AS BIGINT)"
        ).alias("_hhi_ppm"),
    )
    return (
        per_domain.crossJoin(F.broadcast(total))
        .select(
            "domain",
            "n_pages",
            F.expr(
                "CAST((CAST(n_pages AS DECIMAL(38,0)) * 1000000) div "
                "CAST(_total AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("share_ppm"),
            F.col("_hhi_ppm").alias("corpus_hhi_ppm"),
        )
        .orderBy(F.desc("n_pages"), "domain")
        .limit(top_n)
    )


def url_fingerprint_col(col: Column | str = "url") -> Column:
    """64-bit portable hash of the canonical URL (NULL when the URL has no
    canonical form) — the dedup key for crawl-stream URL dedup: pass as
    ``fingerprint=`` to ``streaming/stateful_dedup.py::dedup_stream`` to
    suppress re-crawls of the same page first-seen-wins, whatever spelling
    they arrive under."""
    from research_knowledge_graph_spark.functions.hashing import portable_hash64

    return portable_hash64(canonical_url_col(col))


# robots-meta regex: matched against the DECODED html head. Lookaround-free
# and anchored on the tag so Java regex and RE2 agree; attribute order is
# handled by the two alternates (name-then-content / content-then-name).
_NOINDEX_RE = (
    r"(?is)<meta[^>]*?(?:"
    r"name\s*=\s*[\"']?robots[\"']?[^>]*?content\s*=\s*[\"'][^\"'>]*?noindex"
    r"|"
    r"content\s*=\s*[\"'][^\"'>]*?noindex[^\"'>]*?[\"'][^>]*?name\s*=\s*[\"']?robots"
    r")"
)


def noindex_col(html_col: Column | str = "html") -> Column:
    """TRUE when the page's ``<meta name="robots">`` carries ``noindex`` —
    the pages a crawl-derived training corpus must drop (the publisher
    opted out of indexing). Map-only: binary html reinterpreted as a
    string via CAST — NOT ANSI ``decode``, which THROWS on any invalid
    UTF-8 byte and a crawl corpus always has some; the cast passes bytes
    through unvalidated and the ASCII markup the regex matches is
    unaffected — then one case-insensitive regex; both attribute orders
    matched. NULL html → FALSE (nothing to opt out with)."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return F.coalesce(c.cast("string").rlike(_NOINDEX_RE), F.lit(False))


def drop_noindex(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """``pages`` minus rows whose html opts out via robots ``noindex`` —
    the polite-crawler filter applied right after the URL front door,
    before any text extraction cost is paid."""
    return pages.filter(~noindex_col(html_col))

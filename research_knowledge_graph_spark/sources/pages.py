"""Deterministic synthetic Common-Crawl-style page corpus.

Produces the exact pipeline input shape (per BASELINE.json ``input_hint``):

    pages(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Properties engineered in:

- **Head-domain skew**: domain popularity is Zipf-like — the first few domains
  own a large share of urls — to exercise salted repartitioning and AQE
  skew-join handling, which the north rule names as the key risk.
- **Zipf entity vocabulary**: pages mention concepts/methods/datasets/metrics
  drawn with Zipf weights, so the shared-entity blocking join (reference
  ``graph_service.py:167-316``) sees hot blocking keys.
- **Plantable triples**: relation sentences follow fixed templates the
  heuristic extractor recovers exactly, giving a ground-truth triple set for
  P/R scoring at any scale.
- **Byte-identical text invariant**: ``html`` wraps ``text`` in a fixed
  template (nav/footer boilerplate around an ``<article>``); the stage-1
  extraction UDF must reproduce ``text`` from ``html`` byte-for-byte.

Generation is distributed and partition-independent: content is derived from
the row id via seeded per-row RNG inside ``mapInPandas``, so any partitioning
(and any cluster size) yields the same corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

N_DOMAINS = 50  # fixed: head-domain skew must persist at every corpus size
N_CONCEPTS = 40
N_METHODS = 30
N_DATASETS = 20
N_METRICS = 10

# Base vocabularies; ``vocab_scale`` multiplies each size so entity
# cardinality grows with the corpus (real web vocabularies do), keeping the
# blocking join realistic: Zipf head entities stay hot (skew exercise) while
# the tail grows.
_CONCEPT = "Neural Concept {i}".format
_METHOD = "Method Alpha {i}".format
_DATASET = "Benchmark Set {i}".format
_METRIC = "METRIC{i}".format  # ALL-CAPS → acronym-preserved by normalization

_DOMAINS = [f"site{i:03d}.example.org" for i in range(N_DOMAINS)]


def default_vocab_scale(n_docs: int) -> int:
    return max(1, n_docs // 200)

_FILLER = (
    "the quick analysis shows that large scale web data processing requires "
    "careful attention to partitioning and shuffle behavior in distributed "
    "systems while maintaining deterministic output for reproducibility"
).split()

HTML_TEMPLATE = (
    "<html><head><title>{title}</title><meta charset=\"utf-8\"></head><body>"
    "<nav><a href=\"/home\">Home</a> | <a href=\"/about\">About</a> | "
    "<a href=\"/contact\">Contact</a></nav>"
    "<div class=\"ads\">SUBSCRIBE NOW!!! Best deals today</div>"
    "<article>{body}</article>"
    "<footer>Copyright 2024 {domain}. All rights reserved. "
    "Privacy Policy. Terms of Service.</footer></body></html>"
)


def _zipf_idx(rng: np.random.RandomState, n: int, a: float = 1.3) -> int:
    """Bounded Zipf sample in [0, n)."""
    while True:
        v = rng.zipf(a)
        if v <= n:
            return int(v - 1)


def _gen_doc(doc_id: int, vocab_scale: int = 1) -> dict:
    """Deterministic page content + the triples planted in it (single source
    of truth: page text and ground-truth triples cannot drift apart)."""
    rng = np.random.RandomState(doc_id % (2**31 - 1) + 7)
    domain = _DOMAINS[_zipf_idx(rng, N_DOMAINS)]
    url = f"https://{domain}/articles/{doc_id}"

    concept = _CONCEPT(i=_zipf_idx(rng, N_CONCEPTS * vocab_scale))
    concept2 = _CONCEPT(i=_zipf_idx(rng, N_CONCEPTS * vocab_scale))
    method = _METHOD(i=_zipf_idx(rng, N_METHODS * vocab_scale))
    method2 = _METHOD(i=_zipf_idx(rng, N_METHODS * vocab_scale))
    dataset = _DATASET(i=_zipf_idx(rng, N_DATASETS * vocab_scale))
    metric = _METRIC(i=_zipf_idx(rng, N_METRICS * vocab_scale))

    title = f"Study {doc_id}: {concept} via {method}"

    # ~1.5 KB of body filler: realistic page weight so benchmark compute
    # (regex extraction, hashing, shuffles) dominates per-task overhead
    filler = " ".join(rng.choice(_FILLER, size=200))
    sents = [
        f"This work introduces {method}.",
        f"We study {concept} in depth.",
        f"The approach uses {concept2} as a building block.",
        f"We evaluate on the {dataset} dataset.",
        f"Results are reported using {metric}.",
    ]
    triples = [
        (title, "INTRODUCES", method),
        (title, "USES_CONCEPT", concept),
        (title, "USES_CONCEPT", concept2),
        (title, "EVALUATES_ON", dataset),
        (title, "EVALUATES_WITH", metric),
    ]
    if method2 != method and rng.rand() < 0.6:
        sents.append(f"{method} improves on {method2}.")
        triples.append((method, "IMPROVES_ON", method2))
    if rng.rand() < 0.4:
        sents.append(f"{method} is compared with {method2}.")
        triples.append((method, "COMPARES_WITH", method2))

    paragraphs = [title, " ".join(sents), filler.capitalize() + "."]
    body = "\n\n".join(paragraphs)
    mentioned_methods = {method} | (
        {method2} if any(p in ("IMPROVES_ON", "COMPARES_WITH") for _, p, _ in triples) else set()
    )
    entities = {
        "concept": sorted({concept, concept2}),
        "method": sorted(mentioned_methods),
        "dataset": [dataset],
        "metric": [metric],
    }
    return {
        "url": url,
        "domain": domain,
        "title": title,
        "body": body,
        "lang": "en",
        "triples": triples,
        "entities": entities,
    }


def _make_page(doc_id: int, vocab_scale: int = 1) -> tuple[str, str, str, str]:
    d = _gen_doc(doc_id, vocab_scale)
    return d["url"], d["title"], d["body"], d["lang"]


def _render_html(title: str, body: str, domain: str) -> str:
    paras = "".join(f"<p>{p}</p>" for p in body.split("\n\n"))
    return HTML_TEMPLATE.format(title=title, body=paras, domain=domain)


def synthesize_pages(
    spark: SparkSession,
    n_docs: int,
    partitions: int | None = None,
    vocab_scale: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` pages.

    ``vocab_scale`` defaults to 1 for small corpora (stable unit-test
    fixtures); pass ``default_vocab_scale(n_docs)`` for scale benchmarks."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    vs = 1 if vocab_scale is None else vocab_scale
    base = spark.range(0, n_docs, numPartitions=parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                url, title, body, lang = _make_page(int(doc_id), vs)
                domain = url.split("/")[2]
                html = _render_html(title, body, domain).encode("utf-8")
                # ~45-minute stride per doc id → event time spans hours even
                # for small corpora (watermark/window tests need real spread)
                ts = pd.Timestamp("2024-01-01", tz="UTC") + pd.Timedelta(
                    seconds=(int(doc_id) * 2711) % 31_536_000
                )
                rows.append((url, ts, html, body, lang))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return base.mapInPandas(gen, PAGES_SCHEMA)


def write_pages(spark: SparkSession, n_docs: int, path: str) -> None:
    synthesize_pages(spark, n_docs).write.mode("overwrite").parquet(path)


def planted_triples_py(doc_id: int, vocab_scale: int = 1) -> list[tuple[str, str, str, str]]:
    """Ground-truth (url, subj, pred, obj) planted in page ``doc_id`` — the
    oracle the heuristic extractor is P/R-scored against in tests."""
    d = _gen_doc(doc_id, vocab_scale)
    return [(d["url"], s, p, o) for s, p, o in d["triples"]]

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

N_DOMAINS = 50
N_CONCEPTS = 40
N_METHODS = 30
N_DATASETS = 20
N_METRICS = 10

_CONCEPTS = [f"Neural Concept {i}" for i in range(N_CONCEPTS)]
_METHODS = [f"Method Alpha {i}" for i in range(N_METHODS)]
_DATASETS = [f"Benchmark Set {i}" for i in range(N_DATASETS)]
_METRICS = [f"METRIC{i}" for i in range(N_METRICS)]  # ALL-CAPS → acronym-preserved

_DOMAINS = [f"site{i:03d}.example.org" for i in range(N_DOMAINS)]

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


def _gen_doc(doc_id: int) -> dict:
    """Deterministic page content + the triples planted in it (single source
    of truth: page text and ground-truth triples cannot drift apart)."""
    rng = np.random.RandomState(doc_id % (2**31 - 1) + 7)
    domain = _DOMAINS[_zipf_idx(rng, N_DOMAINS)]
    url = f"https://{domain}/articles/{doc_id}"

    concept = _CONCEPTS[_zipf_idx(rng, N_CONCEPTS)]
    concept2 = _CONCEPTS[_zipf_idx(rng, N_CONCEPTS)]
    method = _METHODS[_zipf_idx(rng, N_METHODS)]
    method2 = _METHODS[_zipf_idx(rng, N_METHODS)]
    dataset = _DATASETS[_zipf_idx(rng, N_DATASETS)]
    metric = _METRICS[_zipf_idx(rng, N_METRICS)]

    title = f"Study {doc_id}: {concept} via {method}"

    filler = " ".join(rng.choice(_FILLER, size=30))
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


def _make_page(doc_id: int) -> tuple[str, str, str, str]:
    d = _gen_doc(doc_id)
    return d["url"], d["title"], d["body"], d["lang"]


def _render_html(title: str, body: str, domain: str) -> str:
    paras = "".join(f"<p>{p}</p>" for p in body.split("\n\n"))
    return HTML_TEMPLATE.format(title=title, body=paras, domain=domain)


def synthesize_pages(
    spark: SparkSession, n_docs: int, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` pages."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    base = spark.range(0, n_docs, numPartitions=parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                url, title, body, lang = _make_page(int(doc_id))
                domain = url.split("/")[2]
                html = _render_html(title, body, domain).encode("utf-8")
                ts = pd.Timestamp("2024-01-01", tz="UTC") + pd.Timedelta(
                    seconds=int(doc_id) % 31_536_000
                )
                rows.append((url, ts, html, body, lang))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return base.mapInPandas(gen, PAGES_SCHEMA)


def write_pages(spark: SparkSession, n_docs: int, path: str) -> None:
    synthesize_pages(spark, n_docs).write.mode("overwrite").parquet(path)


def planted_triples_py(doc_id: int) -> list[tuple[str, str, str, str]]:
    """Ground-truth (url, subj, pred, obj) planted in page ``doc_id`` — the
    oracle the heuristic extractor is P/R-scored against in tests."""
    d = _gen_doc(doc_id)
    return [(d["url"], s, p, o) for s, p, o in d["triples"]]

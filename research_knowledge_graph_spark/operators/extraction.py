"""Stage 2 — mention + (subj, pred, obj) triple extraction.

Reimplements the reference's entity-extraction stage
(``src/agents/entity_extraction_agent.py``) Spark-first, in two modes:

- **fixture**: the reference's deterministic DEBUG path
  (``entity_extraction_agent.py:184-314``): every document yields the same 6
  entities + 3 relationships (the INTRODUCES relationship's subject is the
  document title). This is the P/R≥0.95-scored surface. Implemented as a
  *pure Catalyst* literal-array explode — zero Python, zero shuffle; the
  fixture rows are constants broadcast into the plan.

- **heuristic**: a rule-based OpenIE-style extractor over free text
  (replaces the LLM call ``_extract_with_llm`` at
  ``entity_extraction_agent.py:42-182``): sentence-template regexes pull
  (subj, pred, obj) triples + typed mentions. Pure ``regexp_extract_all``
  expressions — JVM-side, whole-stage-codegen, linear in text size, and
  exactly replicable in the DuckDB oracle.

Output schemas
--------------
mentions: url, seq, entity_type, label, description, properties (map<str,str>,
          values JSON-encoded)
triples:  url, subj, pred, obj, confidence, rationale, evidence_span
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Reference DEBUG fixture (entity_extraction_agent.py:184-314), re-encoded as
# plain data. Properties hold JSON-encoded values (nested dicts/lists kept
# verbatim), matching how the reference ships them to JSONB.
# ---------------------------------------------------------------------------

_J = json.dumps

FIXTURE_ENTITIES: list[tuple[str, str, str, dict]] = [
    # (entity_type, label, description, properties) in reference arrival order:
    # concepts, methods, datasets, metrics, authors (empty), tasks (dropped).
    (
        "concept",
        "3D Gaussian Splatting",
        "A method for novel view synthesis using 3D Gaussian primitives",
        {},
    ),
    (
        "concept",
        "Neural Rendering",
        "Rendering techniques using neural networks",
        {},
    ),
    (
        "method",
        "Gaussian Splatting Algorithm",
        "Algorithm for rendering 3D scenes using Gaussian primitives",
        {
            "algorithm_type": "neural rendering",
            "key_components": ["3D Gaussian primitives", "splatting", "differentiable rasterization"],
            "parameters": {"learning_rate": 0.001, "densification_interval": 100},
            "computational_complexity": "O(n) where n is number of Gaussians",
            "implementation_details": "Uses CUDA for efficient rasterization",
            "hardware_requirements": "NVIDIA GPU with CUDA support, 24GB VRAM",
            "software_dependencies": ["PyTorch", "CUDA toolkit", "OpenGL"],
            "code_availability": "https://github.com/graphdeco-inria/gaussian-splatting",
            "training_details": {"epochs": 30000, "batch_size": 1, "optimizer": "Adam"},
            "inference_details": "Real-time rendering at 60 FPS",
            "advantages": "High-quality rendering with real-time performance",
            "limitations": "Requires significant GPU memory",
        },
    ),
    (
        "dataset",
        "Mip-NeRF 360",
        "Dataset for novel view synthesis evaluation",
        {
            "dataset_type": "3D scenes",
            "size": "9 scenes",
            "domain": "computer vision",
            "usage": "evaluation",
            "download_link": "https://jonbarron.info/mipnerf360/",
        },
    ),
    (
        "metric",
        "PSNR",
        "Peak Signal-to-Noise Ratio for image quality evaluation",
        {
            "metric_type": "quality",
            "reported_values": {"Mip-NeRF 360": {"mean": 27.21, "std": 0.5}, "Tanks and Temples": {"mean": 26.54, "std": 0.3}},
            "baseline_values": {"NeRF": 25.78, "Mip-NeRF": 26.52},
            "units": "dB",
            "experimental_setup": "Novel view synthesis task, evaluated on held-out test views",
            "hardware_used": "NVIDIA RTX 3090",
            "evaluation_protocol": "Standard train/test split, 8:2 ratio",
            "comparison_methods": ["NeRF", "Mip-NeRF", "Plenoxels"],
            "significance": "Statistically significant improvement (p < 0.01)",
        },
    ),
    (
        "metric",
        "SSIM",
        "Structural Similarity Index for image quality evaluation",
        {
            "metric_type": "quality",
            "reported_values": {"Mip-NeRF 360": {"mean": 0.815, "std": 0.02}},
            "baseline_values": {"NeRF": 0.792, "Mip-NeRF": 0.81},
            "units": "score (0-1)",
            "experimental_setup": "Novel view synthesis task, evaluated on held-out test views",
            "hardware_used": "NVIDIA RTX 3090",
            "evaluation_protocol": "Standard train/test split, 8:2 ratio",
            "comparison_methods": ["NeRF", "Mip-NeRF", "Plenoxels"],
        },
    ),
]

# (from_label_or_None_for_title, pred, to_label, confidence, rationale, evidence)
FIXTURE_RELATIONSHIPS: list[tuple[str | None, str, str, float, str, str]] = [
    (
        None,  # reference uses `title or "Paper"` (entity_extraction_agent.py:291)
        "INTRODUCES",
        "3D Gaussian Splatting",
        0.9,
        "Paper introduces the 3D Gaussian Splatting method",
        "Introduction and Methodology sections",
    ),
    (
        "Gaussian Splatting Algorithm",
        "EVALUATES_ON",
        "Mip-NeRF 360",
        0.85,
        "Method is evaluated on the Mip-NeRF 360 dataset",
        "Experiments section",
    ),
    (
        "Gaussian Splatting Algorithm",
        "EVALUATES_WITH",
        "PSNR",
        0.9,
        "Method is evaluated using PSNR metric",
        "Results section",
    ),
]


def _props_map(props: dict) -> Column:
    """map<string,string> literal with JSON-encoded values."""
    if not props:
        return F.create_map().cast("map<string,string>")
    kv = []
    for k, v in props.items():
        kv.append(F.lit(k))
        kv.append(F.lit(v if isinstance(v, str) else _J(v)))
    return F.create_map(*kv)


def extract_mentions_fixture(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Fixture-mode mention stream: constant rows per doc, via literal-array
    explode (no UDF, no shuffle; Catalyst folds the constants)."""
    ents = F.array(
        *[
            F.struct(
                F.lit(i).alias("seq"),
                F.lit(et).alias("entity_type"),
                F.lit(lbl).alias("label"),
                F.lit(desc).alias("description"),
                _props_map(props).alias("properties"),
            )
            for i, (et, lbl, desc, props) in enumerate(FIXTURE_ENTITIES)
        ]
    )
    return (
        docs.select(F.col(url_col).alias("url"), F.explode(ents).alias("e"))
        .select("url", "e.seq", "e.entity_type", "e.label", "e.description", "e.properties")
    )


def extract_triples_fixture(
    docs: DataFrame, url_col: str = "url", title_col: str = "title"
) -> DataFrame:
    """Fixture-mode triple stream. The INTRODUCES subject is the document
    title (``title or "Paper"``), the other endpoints are fixture labels."""
    rels = F.array(
        *[
            F.struct(
                (
                    F.coalesce(F.col(title_col), F.lit("Paper"))
                    if frm is None
                    else F.lit(frm)
                ).alias("subj"),
                F.lit(pred).alias("pred"),
                F.lit(to).alias("obj"),
                F.lit(conf).alias("confidence"),
                F.lit(rat).alias("rationale"),
                F.lit(ev).alias("evidence_span"),
                F.lit(i).cast("int").alias("seq"),  # arrival order
            )
            for i, (frm, pred, to, conf, rat, ev) in enumerate(FIXTURE_RELATIONSHIPS)
        ]
    )
    return (
        docs.select(F.col(url_col).alias("url"), F.explode(rels).alias("r"))
        .select("url", "r.subj", "r.pred", "r.obj", "r.confidence", "r.rationale", "r.evidence_span", "r.seq")
    )


# ---------------------------------------------------------------------------
# Heuristic (rule-based OpenIE-style) extraction — pure regexp expressions.
# Each template: (pattern, n_groups, pred, subj_is_title, subj_type, obj_type)
# ---------------------------------------------------------------------------

HEURISTIC_TEMPLATES: list[dict] = [
    {"pat": r"This (?:work|paper) introduces ([^.\n]+)\.", "pred": "INTRODUCES",
     "title_subj": True, "obj_type": "method", "conf": 0.9},
    {"pat": r"We study ([^.\n]+) in depth\.", "pred": "USES_CONCEPT",
     "title_subj": True, "obj_type": "concept", "conf": 0.8},
    {"pat": r"The approach uses ([^.\n]+) as a building block\.", "pred": "USES_CONCEPT",
     "title_subj": True, "obj_type": "concept", "conf": 0.8},
    {"pat": r"We evaluate on the ([^.\n]+) dataset\.", "pred": "EVALUATES_ON",
     "title_subj": True, "obj_type": "dataset", "conf": 0.85},
    {"pat": r"Results are reported using ([^.\n]+)\.", "pred": "EVALUATES_WITH",
     "title_subj": True, "obj_type": "metric", "conf": 0.9},
    {"pat": r"([A-Z][A-Za-z0-9 ]*?) improves on ([A-Z][A-Za-z0-9 ]*?)\.", "pred": "IMPROVES_ON",
     "title_subj": False, "subj_type": "method", "obj_type": "method", "conf": 0.8},
    {"pat": r"([A-Z][A-Za-z0-9 ]*?) is compared with ([A-Z][A-Za-z0-9 ]*?)\.", "pred": "COMPARES_WITH",
     "title_subj": False, "subj_type": "method", "obj_type": "method", "conf": 0.75},
    # generic patterns for free-form text (not planted by the synthetic
    # corpus — covered by their own unit tests)
    {"pat": r"([A-Z][A-Za-z0-9 ]*?) is based on ([A-Z][A-Za-z0-9 ]*?)\.", "pred": "USES_CONCEPT",
     "title_subj": False, "subj_type": "method", "obj_type": "concept", "conf": 0.7},
    {"pat": r"[Ww]e use the ([^.\n]+?) algorithm\.", "pred": "USES_CONCEPT",
     "title_subj": True, "obj_type": "method", "conf": 0.7},
    {"pat": r"trained on the ([^.\n]+?) dataset", "pred": "USES_DATASET",
     "title_subj": True, "obj_type": "dataset", "conf": 0.8},
    {"pat": r"measured by ([A-Z][A-Za-z0-9 ]*?)\.", "pred": "EVALUATES_WITH",
     "title_subj": True, "obj_type": "metric", "conf": 0.8},
]


def title_col_from_text(text: Column) -> Column:
    """Document title = first line of extracted text."""
    return F.regexp_extract(text, r"^([^\n]*)", 1)


def extract_triples_heuristic(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Rule-based triple extraction as ONE scan: every template contributes
    an array of candidate structs, the arrays concat, one explode emits the
    triple stream. Map-only (no shuffle, no UDF); output stays partitioned
    like the input — at 100 TB this stage is a single codegen'd pass.

    (A union-of-branches formulation would scan the input once per template
    — 7× the IO for identical output.)
    """
    text = F.col(text_col)
    title = title_col_from_text(text)

    def _mk(subj, pred, obj, conf, seq):
        return F.struct(
            subj.alias("subj"),
            F.lit(pred).alias("pred"),
            obj.alias("obj"),
            F.lit(float(conf)).alias("confidence"),
            F.lit(f"matched template: {pred.lower()}").alias("rationale"),
            F.lit("body").alias("evidence_span"),
            seq.cast("int").alias("seq"),
        )

    # seq numbers triples in (template, match) order — the within-doc
    # arrival order (the reference inserts triples sequentially and first
    # insert wins). Two templates can emit the SAME (subj, pred, obj) with
    # different confidences; without this ordinal the downstream first-wins
    # min_by tie is nondeterministic and breaks bit-identical re-runs.
    def _title_subj_arr(ti: int, t: dict):
        objs = F.regexp_extract_all(text, F.lit(t["pat"]), 1)
        return F.transform(
            objs,
            lambda o, i: _mk(title, t["pred"], o, t["conf"], F.lit(ti * 100_000) + i),
        )

    def _pair_arr(ti: int, t: dict):
        pairs = F.arrays_zip(
            F.regexp_extract_all(text, F.lit(t["pat"]), 1).alias("s"),
            F.regexp_extract_all(text, F.lit(t["pat"]), 2).alias("o"),
        )
        return F.transform(
            pairs,
            lambda p, i: _mk(p["s"], t["pred"], p["o"], t["conf"], F.lit(ti * 100_000) + i),
        )

    arrays = [
        _title_subj_arr(ti, t) if t["title_subj"] else _pair_arr(ti, t)
        for ti, t in enumerate(HEURISTIC_TEMPLATES)
    ]

    return (
        docs.select(F.col(url_col).alias("url"), F.explode(F.concat(*arrays)).alias("r"))
        .select("url", "r.subj", "r.pred", "r.obj", "r.confidence", "r.rationale", "r.evidence_span", "r.seq")
        .filter((F.col("subj") != "") & (F.col("obj") != ""))
    )


def extract_mentions_heuristic(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Typed mention stream implied by the same templates, as ONE scan +
    one explode (see :func:`extract_triples_heuristic`). ``seq`` numbers
    mentions in (template, group, match) order — the stable "arrival order"
    for first-wins dedup downstream."""
    text = F.col(text_col)

    def _group_arr(t: dict, ti: int, gi: int, etype: str):
        arr = F.regexp_extract_all(text, F.lit(t["pat"]), gi)
        branch = ti * 10 + gi
        # 2-arg transform lambda receives (element, index) — used here
        # deliberately to derive the within-doc arrival position.
        return F.transform(
            arr,
            lambda lbl, pos: F.struct(
                (F.lit(branch) * 1000 + pos).alias("seq"),
                F.lit(etype).alias("entity_type"),
                lbl.alias("label"),
            ),
        )

    arrays = []
    for ti, t in enumerate(HEURISTIC_TEMPLATES):
        groups = (
            [(1, t.get("subj_type")), (2, t.get("obj_type"))]
            if not t["title_subj"]
            else [(1, t["obj_type"])]
        )
        for gi, etype in groups:
            if etype is not None:
                arrays.append(_group_arr(t, ti, gi, etype))

    return (
        docs.select(F.col(url_col).alias("url"), F.explode(F.concat(*arrays)).alias("m"))
        .select(
            "url",
            F.col("m.seq").cast("int").alias("seq"),
            "m.entity_type",
            "m.label",
            F.lit(None).cast("string").alias("description"),
            F.create_map().cast("map<string,string>").alias("properties"),
        )
        .filter(F.col("label") != "")
    )


# ---------------------------------------------------------------------------
# Metadata extraction (L1 analog, paper_ingestion_agent.py:103-185) —
# deterministic heuristics instead of the LLM; pure expressions.
# ---------------------------------------------------------------------------

def extract_metadata(docs: DataFrame, url_col: str = "url", text_col: str = "text") -> DataFrame:
    text = F.col(text_col)
    return docs.select(
        F.col(url_col).alias("url"),
        title_col_from_text(text).alias("title"),
        # second paragraph as the abstract proxy
        F.coalesce(F.split(text, "\n\n").getItem(1), F.lit("")).alias("abstract"),
        # ANSI mode: '' cast to int throws — null out non-matches first
        F.nullif(F.regexp_extract(text, r"\b(19|20)\d{2}\b", 0), F.lit("")).cast("int").alias("year"),
        F.length(text).alias("n_chars"),
    )

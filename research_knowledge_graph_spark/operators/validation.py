"""Stage 3 — validation & normalization of the extraction stream.

Reimplements ``ValidationAgent`` (``src/agents/validation_agent.py``) as
shuffle-minimal DataFrame aggregations:

- P5 blank-label filter (``validation_agent.py:62-63``)
- F3 label normalization (``:96-119``) via the Catalyst expression
- A1 case-insensitive per-document dedup with **first-wins** semantics
  (``:56-94``): first arrival keeps its normalized label; description is the
  first non-null among duplicates; properties merge with per-key LAST
  occurrence winning (Python ``dict.update`` order).
- P6 relationship validation (``:121-142``): drop triples missing an
  endpoint or predicate; clamp confidence to [0,1], default 0.5.

"Arrival order" is the explicit ``seq`` column carried from extraction —
required for deterministic first-wins in a distributed setting.

Scale notes: one hash-aggregate per stream, keyed by
(url, entity_type, dedup_key) — co-partitioned with every later per-document
stage, partial aggregation map-side. No windows (a window over the same key
would add a sort per partition for no benefit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from research_knowledge_graph_spark.functions.normalize import (
    clamp_confidence_col,
    normalize_label_col,
)
from research_knowledge_graph_spark.functions.sanitize import sanitize_string_col


def validate_mentions(mentions: DataFrame) -> DataFrame:
    """mentions(url, seq, entity_type, label, description, properties)
    → same schema, normalized + deduped per (url, entity_type, lower(label))."""
    # blank-label drop matches the reference's `not label.strip()`
    # (validation_agent.py): python strip() removes \t\n\r\x0b\x0c too,
    # while F.trim strips ONLY spaces — a "\t" label would survive trim,
    # normalize to "" and emit a phantom empty-label entity
    m = mentions.filter(
        F.col("label").isNotNull()
        & (F.regexp_replace(F.col("label"), r"\s", "") != "")
    ).withColumn("norm_label", normalize_label_col(F.col("label")))

    grouped = (
        m.groupBy("url", "entity_type", F.lower(F.col("norm_label")).alias("dedup_key"))
        .agg(
            F.min("seq").alias("seq"),
            F.min_by("norm_label", "seq").alias("label"),
            # first NON-EMPTY description in arrival order: min over
            # (seq, description) structs, null/empty rows skipped by min —
            # native codegen'd struct ordering, no lambda comparator.
            # Empty string is skipped like NULL: the reference's guard is
            # falsiness ('if entity.description and not
            # existing.description', validation_agent.py) — an "" stored
            # first must not beat a later real description
            F.min(
                F.when(
                    F.col("description").isNotNull()
                    & (F.col("description") != ""),
                    F.struct("seq", "description"),
                )
            ).alias("_d"),
            # properties in arrival order: maps aren't orderable, so collect
            # (seq, entries-array) structs — arrays of string structs ARE —
            # and let the native sort_array order by seq.
            # coalesce to empty entries: one NULL properties map otherwise
            # poisons the whole fold (map_concat(acc, NULL) = NULL) and the
            # entity silently loses every duplicate's properties
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("seq"),
                        F.coalesce(
                            F.map_entries("properties"),
                            F.array().cast("array<struct<key:string,value:string>>"),
                        ).alias("entries"),
                    )
                )
            ).alias("_props"),
        )
    )
    first_desc = F.col("_d")["description"]
    # fold in arrival order; LAST_WIN map_concat = Python dict.update
    merged_props = F.aggregate(
        F.col("_props"),
        F.create_map().cast("map<string,string>"),
        lambda acc, p: F.map_concat(acc, F.map_from_entries(p["entries"])),
    )
    return grouped.select(
        "url",
        "seq",
        "entity_type",
        "label",
        sanitize_string_col(first_desc).alias("description"),
        F.transform_values(merged_props, lambda _, v: sanitize_string_col(v)).alias(
            "properties"
        ),
    )


def validate_triples(triples: DataFrame) -> DataFrame:
    """raw triples → validated: endpoints + predicate required, confidence
    clamped with 0.5 default (reference ``validation_agent.py:121-142``)."""
    return triples.filter(
        F.col("subj").isNotNull()
        & (F.col("subj") != "")
        & F.col("obj").isNotNull()
        & (F.col("obj") != "")
        & F.col("pred").isNotNull()
        & (F.col("pred") != "")
    ).withColumn("confidence", clamp_confidence_col("confidence"))

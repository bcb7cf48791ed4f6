"""Custom stateful streaming operator: cross-batch exact dedup.

A continuously-ingested corpus must not re-emit documents whose fingerprint
was already seen in ANY earlier micro-batch. That is per-key state across
triggers — Structured Streaming's ``applyInPandasWithState``:

- stream is grouped by fingerprint bucket (bounded key cardinality —
  state scales with bucket count × seen-fingerprint set, not row count);
- each group's state holds the set of fingerprints already emitted;
- new rows whose fingerprint is in state are dropped; survivors are emitted
  and their fingerprints added to state.

``dropDuplicates`` on a stream keeps per-row state with a watermark; this
operator demonstrates the *custom* stateful surface (arbitrary per-group
state logic, Arrow-batched) the reference lacks entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from research_knowledge_graph_spark.functions.textops import fingerprint_col

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("fingerprint", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.LongType()))]
)


def _dedup_group(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    for pdf in batches:
        fresh = pdf[~pdf["fingerprint"].isin(seen)]
        # also dedup within the batch, first occurrence wins
        fresh = fresh.drop_duplicates(subset=["fingerprint"], keep="first")
        if len(fresh):
            seen.update(int(f) for f in fresh["fingerprint"])
            yield fresh[["url", "text", "fingerprint"]]
    state.update((sorted(seen),))


def dedup_stream(stream: DataFrame, n_buckets: int = 64) -> DataFrame:
    """stream(url, text, …) → first-seen rows only, across all triggers.

    Keys state by fingerprint bucket so each group's state stays small and
    the shuffle is uniform (fingerprints are uniform hashes — no skew)."""
    with_fp = stream.select(
        "url", "text", fingerprint_col("text").alias("fingerprint")
    ).withColumn("bucket", F.pmod(F.col("fingerprint"), F.lit(n_buckets)))
    return (
        with_fp.groupBy("bucket")
        .applyInPandasWithState(
            _dedup_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_streaming_dedup(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str, schema
) -> None:
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 16).parquet(input_dir)
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

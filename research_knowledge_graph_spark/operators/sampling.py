"""Deterministic sampling operators for training-data curation.

A 100-TB corpus is never trained on wholesale: curation pipelines mix
sources at explicit rates ("2 epochs of wiki, 0.3 of common-crawl") and
cap head sources. Random sampling (``df.sample``) is wrong for that job —
it is irreproducible across retries/re-runs, and per-task RNG makes
lineage meaningless. Both operators here are **pure functions of the row
key** via the engine-portable 60-bit hash
(:func:`..functions.hashing.portable_hash64`), so:

- a re-run (or a retried task) selects the *same* rows — sampling is
  idempotent, resumable, and oracle-checkable in DuckDB bit-for-bit;
- changing the rate from 5% to 10% *grows* the sample monotonically
  (hash < 0.05·M ⊂ hash < 0.10·M) — incremental top-ups don't reshuffle
  the previously-selected set;
- the ``seed`` decorrelates independent sampling decisions over the same
  keys (train/validation splits, repeated trials).

Scale shapes:
- :func:`stratified_sample` is a broadcast-join + filter — **map-only, no
  shuffle**: the rate table is tiny (#strata rows), the hash is computed
  per-row and the filter is pushed into the scan's codegen stage.
- :func:`quota_sample` needs exact per-stratum counts, so it is one
  window over (stratum, hash) — a single shuffle whose key is the
  stratum. Head-stratum skew is bounded: rank() stops mattering past k,
  and for pathological strata the stratified (rate) variant is the
  escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from research_knowledge_graph_spark.functions.guards import (
    guard_columns as _guard_columns,
)
from research_knowledge_graph_spark.functions.hashing import portable_hash64

# denominator for rate arithmetic: rates are exact multiples of 1e-6
_M = 1_000_000


def sample_bucket_col(id_col, seed: int = 0):
    """The row's sampling bucket in [0, 1e6): ``portable_hash64(id) % 1e6``.
    Deterministic, engine-portable (same bits in DuckDB — see
    ``portable_hash64_sql``)."""
    return F.pmod(portable_hash64(id_col, seed=seed), F.lit(_M))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with per-stratum probability ``rates[stratum]``,
    deterministically: row survives iff ``hash(id) % 1e6 < rate·1e6``.

    ``rates`` maps stratum value → rate in [0, 1]; strata absent from the
    map get ``default_rate`` (0.0 = drop unknown sources, the safe
    curation default). The rate table is broadcast (#strata rows);
    the plan is scan → broadcast-hash-join → filter, no shuffle."""
    from pyspark.sql.types import LongType, StructField, StructType

    _guard_columns(df, {"_rate_ppm"}, "stratified_sample input")
    rate_rows = [(k, int(round(v * _M))) for k, v in rates.items()]
    # the strata column keeps the input's dtype (an int source id must not
    # rely on implicit string casts in the join — ANSI mode would reject it)
    rate_df = df.sparkSession.createDataFrame(
        rate_rows,
        StructType(
            [
                StructField(strata_col, df.schema[strata_col].dataType),
                StructField("_rate_ppm", LongType()),
            ]
        ),
    )
    joined = df.join(F.broadcast(rate_df), strata_col, "left").withColumn(
        "_rate_ppm",
        F.coalesce(F.col("_rate_ppm"), F.lit(int(round(default_rate * _M)))),
    )
    return joined.filter(
        sample_bucket_col(id_col, seed) < F.col("_rate_ppm")
    ).drop("_rate_ppm")


def quota_sample(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by hash
    order — a deterministic uniform draw without replacement (hash order
    is independent of the data's physical or logical order). Adds ``pick``
    (1-based rank within the stratum). One shuffle keyed by the stratum.

    Skew note: ``row_number`` still sorts each stratum on one reducer; a
    head stratum bounds that task at its full size even though only ``n``
    rows survive. For pathological strata use :func:`stratified_sample`
    (rate ≈ n/|stratum|, map-only) as the escape hatch."""
    _guard_columns(df, {"pick"}, "quota_sample input")
    # NULL ids have no hash bucket and would sort FIRST (NULLS FIRST
    # default), deterministically winning every pick regardless of seed —
    # while stratified_sample drops the same rows. Drop them here too so
    # the three samplers agree on what a row without identity means.
    df = df.filter(F.col(id_col).isNotNull())
    w = Window.partitionBy(strata_col).orderBy(
        sample_bucket_col(id_col, seed), F.col(id_col)
    )
    return (
        df.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= n_per_stratum)
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    weight_col,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Per-stratum sampling against a TOKEN budget rather than a row
    count — the unit training-data mixtures are actually specified in
    ("50B tokens of web, 5B of code"). Walk each stratum in hash order and
    keep rows while the running total of ``weight_col`` (a Column, e.g.
    ``F.size(tokens_col("text"))``) stays ≤ ``budget_tokens``; the first
    row that would cross the budget, and everything after it, is dropped.

    Deterministic for the same reasons as the other samplers (pure
    function of the key), and monotone in the budget: raising it only
    appends rows to the sample. Adds ``cum_tokens`` (running total
    including the row). One shuffle keyed by the stratum; the running sum
    is a single window pass over (stratum, hash) — a head stratum
    serializes on one reducer (same bound and same rate-variant escape
    hatch as :func:`quota_sample`)."""
    _guard_columns(df, {"cum_tokens"}, "token_budget_sample input")
    # same NULL-id rule as quota_sample; additionally a NULL weight would
    # ride FREE (F.sum skips NULL, cum_tokens unchanged) — a row whose
    # token mass is unknown cannot be budgeted, so it is dropped too
    df = df.filter(F.col(id_col).isNotNull() & weight_col.isNotNull())
    w = (
        Window.partitionBy(strata_col)
        .orderBy(sample_bucket_col(id_col, seed), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_tokens", F.sum(weight_col).over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
    )


def mixture_rates(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Mixture-rebalancing plan — the per-source sampling rates that level
    the corpus to a UNIFORM token mixture: the step between auditing the
    composition (t32's rollup) and drawing the training set
    (:func:`stratified_sample` consumes exactly these rates). For each
    source: its doc/token mass, its current token share, and
    ``rate_ppm = min(10⁶, target_tokens div n_tokens in ppm)`` where the
    target is an equal split of the corpus's total tokens — head sources
    are downsampled toward the target, tail sources keep everything
    (rates cap at 1.0; upsampling/epoch-weighting is the caller's rate
    multiplication).

    Returns one row per source: (source, n_docs, n_tokens, share_ppm,
    rate_ppm, expected_tokens). All arithmetic exact bigints with
    non-negative floor division (Spark ``div`` == DuckDB ``//``);
    a zero-token source gets rate 10⁶ via a greatest(…,1) guard instead
    of a divide-by-zero. Exactness bound (the t33 rule): the ppm
    scalings bind at ~9·10¹² total tokens — past that Spark's ANSI mode
    fails loudly (DuckDB promotes to HUGEINT); the 100-TB recipe is to
    widen the three products to decimal(38,0).

    Scale: ONE map-side-combinable hash-agg reduces the corpus to
    #sources rows; the total/target scalar is a second agg over that
    bounded frame, broadcast back as a 1-row dim. No windows, no Python,
    the corpus is scanned once."""
    from research_knowledge_graph_spark.functions.textops import token_count_col

    # coalesce: token_count(NULL text) is NULL and F.sum skips it, so an
    # all-NULL source published NULL n_tokens/share_ppm/expected_tokens —
    # against the exact-bigints contract. 0 tokens is the true mass; the
    # rate_ppm=10⁶ such a source then gets is deliberate (keeping its
    # docs costs zero tokens; expected_tokens stays 0).
    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum(token_count_col(text_col)), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("(1000000 * n_tokens) div greatest(total_tokens, 1L)")
            .cast("long")
            .alias("share_ppm"),
            F.expr(
                "least(1000000L, (1000000 * (total_tokens div n_sources))"
                " div greatest(n_tokens, 1L))"
            )
            .cast("long")
            .alias("rate_ppm"),
        )
        .withColumn(
            "expected_tokens",
            F.expr("(n_tokens * rate_ppm) div 1000000").cast("long"),
        )
    )

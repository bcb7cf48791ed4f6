"""IVF (inverted-file) approximate nearest neighbor over embedding columns.

The second ANN scale path next to SRP-LSH (:mod:`.similarity`): k-means
cells as the coarse quantizer — the structure behind FAISS-style IVF
indexes, expressed with Spark MLlib + DataFrame ops:

1. **train**: k-means (fixed seed → deterministic) over a sample;
2. **index**: assign every vector to its nearest centroid (map-only);
   persist as a cell-keyed table — the "inverted file";
3. **query**: route each query to its ``nprobe`` nearest cells (driver-side
   math on the tiny centroid set), exact cosine rerank ONLY within those
   cells (an equi-join on cell id instead of a full cross join).

At 10⁹ vectors with √n cells and nprobe≈10, the rerank touches ~10/√n of
the data per query.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from research_knowledge_graph_spark.functions.vectors import cosine_col


def train_centroids(
    embs: DataFrame, k: int, vec_col: str = "embedding", seed: int = 42,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """k-means centroids (deterministic seed). MLlib KMeans over a sample —
    training cost is independent of corpus size."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    df = embs.select(array_to_vector(F.col(vec_col)).alias("features"))
    if sample_fraction:
        df = df.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=k, seed=seed, maxIter=20).fit(df)
    # clusterCenters() yields numpy arrays (or ml Vectors, version-dependent)
    return [np.asarray(c).tolist() for c in model.clusterCenters()]


def _cell_dists_col(vec_col: str, centroids: list[list[float]]):
    """array<struct<d,cell>> of squared L2 distance to every (literal)
    centroid — the shared map-only routing expression. No UDF, no shuffle."""
    cents = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids
    ])
    return F.transform(
        cents,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(F.col(vec_col), c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("d"),
            i.alias("cell"),
        ),
    )


def assign_cells(
    embs: DataFrame, centroids: list[list[float]],
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Map-only cell assignment: argmin over the (broadcast-literal) centroid
    array via a single expression — no UDF, no shuffle."""
    return embs.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        F.array_min(_cell_dists_col(vec_col, centroids))["cell"].alias("cell"),
    )


def route_queries(
    queries: DataFrame, centroids: list[list[float]], nprobe: int,
    query_id_col: str = "query_id", query_vec_col: str = "query_vec",
) -> DataFrame:
    """nprobe routing as a Catalyst expression: distance array → sort →
    slice(nprobe) → explode. One map-only pass — works for a query TABLE of
    any size (nothing is collected to the driver). Struct sort orders by
    (d, cell), so ties break deterministically on cell id."""
    if nprobe < 1:
        # slice(..., 1, 0) silently explodes to ZERO rows — every kNN
        # query would return empty, indistinguishable from "no neighbors"
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    top = F.slice(
        F.array_sort(_cell_dists_col(query_vec_col, centroids)), 1, nprobe
    )
    return queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
        F.explode(top).alias("_dc"),
    ).select("query_id", "qv", F.col("_dc.cell").alias("cell"))


def _exact_rerank(q_df: DataFrame, indexed: DataFrame, k: int) -> DataFrame:
    """Shared exact-rerank tail of both IVF paths (inline and persisted):
    cell equi-join → self-match filter → cosine → multi-probe dedup by max
    → per-query rank window → round. ONE home so a tie/rounding-policy fix
    can never land on one path and miss the other."""
    scored = (
        q_df
        .join(indexed, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", "vec_id",
            F.round(cosine_col(F.col("qv"), F.col("vec")), 9).alias("_s9"),
        )
        # a vector can appear via multiple probed cells → dedup
        .groupBy("query_id", "vec_id").agg(F.max("_s9").alias("_s9"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_s9"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round(F.col("_s9"), 6).alias("cosine"))
    )


def _fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file through Hadoop's FileSystem API so the index
    path may be ANY URI Spark can host (hdfs://, s3a://, file://, bare
    local) — builtin open() only understands local paths, and failing
    AFTER the expensive vectors write would strand an index with no
    centroids (the _stream_id bug class)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _fs_read_text(spark: SparkSession, path: str) -> str:
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(jpath)
    try:
        return bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        ).decode("utf-8")
    finally:
        stream.close()


def knn_ivf(
    spark: SparkSession,
    embs: DataFrame,
    queries: DataFrame,
    k_cells: int = 16,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: list[list[float]] | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF top-k: cell-routed exact rerank. Routing is a map-only Catalyst
    expression on BOTH sides (:func:`route_queries` / :func:`assign_cells`)
    — query sets of any size work; nothing touches the driver.

    ``broadcast_queries=True`` (default) broadcasts the routed query side —
    right for point-query workloads. Set ``False`` for a large query table:
    both sides then shuffle on ``cell`` (with AQE skew splitting for hot
    cells)."""
    if centroids is None:
        centroids = train_centroids(embs, k_cells, vec_col)

    indexed = assign_cells(embs, centroids, id_col, vec_col)
    q_df = route_queries(queries, centroids, nprobe, query_id_col, query_vec_col)
    if broadcast_queries:
        q_df = F.broadcast(q_df)
    return _exact_rerank(q_df, indexed, k)


# ---------------------------------------------------------------------------
# Persisted IVF index: cell-partitioned layout + dynamic partition pruning
# ---------------------------------------------------------------------------

def build_ivf_index(
    embs: DataFrame,
    path: str,
    k_cells: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Materialize the inverted file: vectors written hive-partitioned by
    cell id (`path/cell=N/...`), centroids saved alongside. At 10⁹ vectors
    the payoff is at READ time: a query probing nprobe of k_cells touches
    only those directories — the scan prunes (k_cells-nprobe)/k_cells of
    the bytes before any filter runs."""
    import json as _json
    import os as _os

    centroids = train_centroids(embs, k_cells, vec_col, seed, sample_fraction)
    assign_cells(embs, centroids, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(_os.path.join(path, "vectors"))
    _fs_write_text(
        embs.sparkSession,
        _os.path.join(path, "centroids.json"),
        _json.dumps(centroids),
    )
    return centroids


def knn_ivf_indexed(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int = 4,
    k: int = 10,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Top-k against a persisted IVF index. The probed cells arrive as a
    LITERAL IN-filter on the partition column (collected from the routed
    query side only when it is small, else the join relies on dynamic
    partition pruning), so the parquet scan reads only probed directories."""
    import json as _json
    import os as _os

    centroids = _json.loads(
        _fs_read_text(spark, _os.path.join(path, "centroids.json"))
    )
    indexed = spark.read.parquet(_os.path.join(path, "vectors"))
    q_df = route_queries(queries, centroids, nprobe, query_id_col, query_vec_col)
    return _exact_rerank(F.broadcast(q_df), indexed, k)

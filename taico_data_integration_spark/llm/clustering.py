"""Lloyd's k-means over an embedding column.

Iterative algorithm: assignment is a pure Column expression (argmin squared
L2 against k centroid literals — k*dim multiply-adds per row, JVM codegen);
the update step is one posexplode + groupBy (cluster, dim) mean, collected
to the driver (k x dim doubles — tiny) to become the next iteration's
literals. Each iteration = one scan + one small shuffle; nothing about the
corpus ever reaches the driver. Non-SQL-expressible (iterative), so the
query-gate exposure is rows-only; tests verify cluster recovery instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)), F.lit(0.0), lambda acc, x: acc + x
    )


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, cluster, sq_dist): nearest centroid per vector, ties to the
    lower cluster id (struct ordering)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = F.array(
        *[
            F.struct(_sq_dist(v, c).alias("d"), F.lit(i).cast("bigint").alias("cid"))
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_min(scored)
    return df.select(
        F.col(id_col), best["cid"].alias("cluster"), F.round(best["d"], 6).alias("sq_dist")
    )


def _update_centroids(
    df: DataFrame,
    assign: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    quantize: float | None = None,
) -> list[list[float]]:
    joined = df.join(assign.select(id_col, "cluster"), id_col)
    exploded = joined.select("cluster", F.posexplode(vec_col).alias("dim", "v"))
    if quantize:
        # Engine-reproducible mean: floor-quantize each component to an
        # integer, sum exactly (integer addition is order-independent, unlike
        # float summation across partitions), divide once in IEEE double.
        # Any engine that mirrors floor/sum/divide gets bit-identical
        # centroids — this is what makes the k-means query oracle-checkable.
        dims = (
            exploded.groupBy("cluster", "dim")
            .agg(
                F.sum(
                    F.floor(F.col("v").cast("double") * F.lit(float(quantize))).cast("bigint")
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        cells = {(r.cluster, r.dim): r.s / (r.n * float(quantize)) for r in dims}
    else:
        dims = (
            exploded.groupBy("cluster", "dim")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        cells = {(r.cluster, r.dim): r.m for r in dims}
    by_cluster: dict[int, dict[int, float]] = {}
    for (cl, dim), m in cells.items():
        by_cluster.setdefault(cl, {})[dim] = m
    out = []
    for i in range(k):
        d = by_cluster.get(i)
        if not d:
            out.append(None)  # empty cluster: keep previous centroid
            continue
        out.append([d[j] for j in range(len(d))])
    return out


def kmeans(
    df: DataFrame,
    k: int,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: float | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Returns (assignment DataFrame, final centroids). Initial centroids =
    first k vectors by id (deterministic; k-means++ would slot in here).

    With ``quantize`` set (e.g. 1e7), the centroid update uses exact
    integer sums of floor-quantized components instead of float avg, making
    every run bit-reproducible across engines and partitionings — the full
    Lloyd iteration can then be replayed in SQL as a correctness oracle."""
    seed_rows = df.orderBy(id_col).limit(k).collect()
    centroids = [[float(x) for x in r[vec_col]] for r in seed_rows]
    for _ in range(iterations):
        assign = assign_clusters(df, centroids, id_col, vec_col)
        updated = _update_centroids(df, assign, k, id_col, vec_col, quantize)
        centroids = [u if u is not None else centroids[i] for i, u in enumerate(updated)]
    return assign_clusters(df, centroids, id_col, vec_col), centroids

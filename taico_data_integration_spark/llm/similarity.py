"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: deterministic double-precision dot products via
  JVM higher-order functions (no UDF) — the correctness baseline.
- LSH-bucketed variant (random-hyperplane signs, fixed seed): the scale path.
  At 100 TB the bucket equi-join replaces the query×corpus cross join; the
  brute-force path is kept for small query sets (broadcast the queries, one
  pass over the corpus).
"""

from __future__ import annotations

import math
import random  # noqa: F401  (random_hyperplanes)

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision — bit-reproducible
    across engines that fold left-to-right (matches DuckDB's
    list_dot_product exactly, incl. the 0.0 accumulator seed).

    Negative result, measured at sf0.1 (200k pairs x 64 dims): unrolling
    the fold into a chained `0.0 + a[0]*b[0] + ...` expression — whether
    over the raw array or a pre-cast one — runs ~3x SLOWER than this HOF
    fold (5.4s vs 1.8s): the 128-getItem chain blows past JIT/codegen
    method limits and falls back to interpreted evaluation. The HOF fold
    stays. The vectorized escape for genuinely heavier math is
    cosine_pandas_udf (Arrow + numpy), at the cost of fold-order parity."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    return df.withColumn("__vec_d", _to_double(F.col(vec_col))).withColumn(out, l2_norm(F.col("__vec_d")))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per query vector. The query side is broadcast
    (small); the corpus is scanned once. Returns
    (query_id, neighbor_id, cosine, rank)."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("__vec_d").alias("q_vec"), F.col("norm").alias("q_norm")
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("__vec_d").alias("c_vec"), F.col("norm").alias("c_norm")
    )
    sim = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_raw", dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_raw").desc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_raw", 6).alias("cosine"), "rank")
    )


def cosine_pandas_udf():
    """Arrow-batched cosine — the vectorized Python escape hatch for when
    the similarity math outgrows Column expressions (e.g. calling into a
    real ANN library). ~10-100x faster than row-at-a-time Python UDFs; the
    JVM `dot`/`l2_norm` path above is still preferred when expressible."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(a, b):
        out = np.empty(len(a))
        for i, (x, y) in enumerate(zip(a, b)):
            xv = np.asarray(x, dtype=np.float64)
            yv = np.asarray(y, dtype=np.float64)
            denom = np.sqrt(xv @ xv) * np.sqrt(yv @ yv)
            out[i] = (xv @ yv) / denom if denom else float("nan")
        return pd.Series(out)

    # `from __future__ import annotations` stringifies inline hints, which
    # pyspark's UDF-type inference rejects; attach real type objects.
    _cos.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf("double")(_cos)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure-python RNG, fixed seed)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket_ids(df: DataFrame, dim: int, n_planes: int = 8, id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """Sign-LSH bucket key per vector: concat of sign bits against fixed
    hyperplanes. Vectors in the same bucket are ANN candidates."""
    planes = random_hyperplanes(dim, n_planes, seed)
    v = _to_double(F.col(vec_col))
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(x) for x in p])
        bits.append(F.when(dot(v, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select(F.col(id_col), F.concat(*bits).alias("bucket"))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """ANN top-k restricted to same-LSH-bucket candidates: bucket equi-join
    instead of cross join. Recall < 1.0 by construction; raise n_planes /
    multi-probe for tighter buckets at scale."""
    cb = lsh_bucket_ids(corpus, dim, n_planes, id_col, vec_col, seed)
    qb = lsh_bucket_ids(queries, dim, n_planes, id_col, vec_col, seed)
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("__vec_d").alias("c_vec"), F.col("norm").alias("c_norm")
    ).join(cb.select(F.col(id_col).alias("neighbor_id"), "bucket"), "neighbor_id")
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("__vec_d").alias("q_vec"), F.col("norm").alias("q_norm")
    ).join(qb.select(F.col(id_col).alias("query_id"), "bucket"), "query_id")
    sim = (
        c.join(q, "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_raw", dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_raw").desc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_raw", 6).alias("cosine"), "rank")
    )


def _centroid_scores(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Array of (cosine-vs-centroid, centroid_id) structs; struct ordering
    makes array_max/array_sort pick by score then id — pure Column math."""
    entries = []
    for cid, c in centroids:
        norm = math.sqrt(sum(x * x for x in c)) or 1.0
        plane = F.array(*[F.lit(x / norm) for x in c])
        entries.append(F.struct(dot(vec, plane).alias("score"), F.lit(cid).alias("cid")))
    return F.array(*entries)


def ivf_centroids_from_sample(df: DataFrame, n_lists: int, id_col: str = "vec_id", vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: the first n_lists vectors by id act as
    centroids (a k-means iteration could refine; assignment stays the same
    shape). Driver-side collect is O(n_lists * dim) — tiny."""
    rows = df.orderBy(id_col).limit(n_lists).collect()
    return [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(rows)]


#: Above this list count ivf_assign switches from inlined centroid
#: literals to a broadcast centroids DataFrame: the literal plan is
#: O(n_lists x dim) EXPRESSION NODES (measured: n_lists=1024 x dim=256 is
#: a multi-MB plan whose Catalyst analysis dominates wall-clock before a
#: single row is read), while the join plan is constant-size and carries
#: the centroids as broadcast DATA. Both paths share math, fold order and
#: tie-breaking — pinned by a parity test.
IVF_ASSIGN_LITERAL_MAX = 64


def ivf_assignment_dispersion(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    literal_max: int | None = None,
) -> float | None:
    """Mean ``1 - cosine(vector, nearest centroid)`` over ``df`` — the
    assignment-TIGHTNESS statistic the IVF drift watchdog tracks
    (round 12, VERDICT r11 #3). A batch whose embedding distribution
    drifted away from the quantizer assigns loosely (dispersion rises),
    which silently degrades recall long before any staleness error can
    fire. One aggregate over the batch, O(batch x n_lists) compute,
    nothing written. Same two physical strategies as :func:`ivf_assign`
    (inlined literals vs broadcast join); zero-norm vectors are skipped
    (cosine undefined). None for an empty frame."""
    cap = IVF_ASSIGN_LITERAL_MAX if literal_max is None else literal_max
    d = with_norm(df, vec_col).where(F.col("norm") > 0.0)
    if len(centroids) <= cap:
        best = (
            F.array_max(_centroid_scores(F.col("__vec_d"), centroids))["score"]
            / F.col("norm")
        )
        row = d.select(F.avg(F.lit(1.0) - best).alias("disp")).first()
    else:
        spark = df.sparkSession
        rows = []
        for cid, c in centroids:
            norm = math.sqrt(sum(x * x for x in c)) or 1.0
            rows.append((cid, [x / norm for x in c]))
        cents = spark.createDataFrame(rows, "cid int, __c array<double>")
        row = (
            d.select(F.col("__vec_d"), F.col("norm"))
            .withColumn("__rowid", F.monotonically_increasing_id())
            .crossJoin(F.broadcast(cents))
            .groupBy("__rowid", "norm")
            .agg(F.max(dot(F.col("__vec_d"), F.col("__c"))).alias("__best"))
            .select(
                F.avg(F.lit(1.0) - F.col("__best") / F.col("norm")).alias("disp")
            )
            .first()
        )
    return None if row is None or row["disp"] is None else float(row["disp"])


def ivf_assign(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    literal_max: int | None = None,
) -> DataFrame:
    """Assign each vector to its nprobe nearest coarse centroids (by cosine).
    nprobe=1 partitions the corpus; queries use nprobe>1 to widen recall.

    Physical strategy is picked by quantizer size (``literal_max``
    defaults to :data:`IVF_ASSIGN_LITERAL_MAX`): small quantizers inline
    the normalized centroids as plan literals (one projection, no
    shuffle — fastest when the plan stays small); larger ones broadcast a
    centroids DataFrame and take a data-sized join + window top-nprobe,
    keeping plan size and Catalyst analysis time CONSTANT in n_lists
    (VERDICT r8 #5 — at realistic scale, thousands of lists x 768 dims,
    the literal plan itself becomes megabytes). Same scores (identical
    normalized values, same left-to-right fold) and same tie-break
    (score desc, then cid desc) on both paths."""
    v = _to_double(F.col(vec_col))
    cap = IVF_ASSIGN_LITERAL_MAX if literal_max is None else literal_max
    if len(centroids) <= cap:
        scored = F.reverse(F.array_sort(_centroid_scores(v, centroids)))
        top = F.slice(scored, 1, nprobe)
        return df.select(
            F.col(id_col), F.explode(F.transform(top, lambda s: s["cid"])).alias("list_id")
        )
    spark = df.sparkSession
    rows = []
    for cid, c in centroids:
        norm = math.sqrt(sum(x * x for x in c)) or 1.0
        rows.append((cid, [x / norm for x in c]))
    cents = spark.createDataFrame(rows, "cid int, __c array<double>")
    # window over a per-ROW key, not id_col: with duplicate ids the literal
    # path emits nprobe lists per input row, so the broadcast path must too
    # (ADVICE r9 — a row_number partitioned by id_col interleaves duplicate
    # ids and emits nprobe per DISTINCT id)
    scored = (
        df.select(F.col(id_col), v.alias("__v"))
        .withColumn("__rowid", F.monotonically_increasing_id())
        .crossJoin(F.broadcast(cents))  # broadcast nested-loop: (vec, centroid) pairs — the centroids side is n_lists rows, always broadcast
        .select(F.col(id_col), F.col("__rowid"), F.col("cid"), dot(F.col("__v"), F.col("__c")).alias("__score"))
    )
    w = Window.partitionBy("__rowid").orderBy(F.col("__score").desc(), F.col("cid").desc())
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= nprobe)
        .select(F.col(id_col), F.col("cid").alias("list_id"))
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iterations: int = 0,
) -> DataFrame:
    """IVF-style ANN: corpus vectors live in their nearest-centroid list;
    each query probes its `nprobe` nearest lists and scores only those
    vectors — a list-id equi-join replaces the query x corpus cross join.
    Recall < 1.0 by construction (approximate), tunable via nprobe/n_lists.
    With `refine_iterations` > 0 the coarse quantizer is refined by Lloyd
    iterations (llm.clustering.kmeans) — balanced lists = better recall per
    probe; the distributed assignment shape is unchanged.
    """
    index, centroids = ivf_index(
        corpus,
        n_lists=n_lists,
        id_col=id_col,
        vec_col=vec_col,
        refine_iterations=refine_iterations,
    )
    return ivf_search(
        index, centroids, queries, k=k, nprobe=nprobe, id_col=id_col, vec_col=vec_col
    )


def ivf_index(
    corpus: DataFrame,
    n_lists: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iterations: int = 0,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Build-ONCE half of the IVF pipeline: ``(index_df, centroids)`` where
    ``index_df`` is (neighbor_id, c_vec array<double>, c_norm, list_id) —
    every per-corpus-vector computation (double cast, norm, centroid
    assignment) done exactly once. PERSIST it (e.g. ``TableStore.write(...,
    partition_by=["list_id"])``) and serve any number of query batches via
    :func:`ivf_search` without re-scanning or re-assigning the corpus:
    measured at 1-5M vectors / 100 queries, the per-call corpus assignment
    pass is what kept cosine_topk_ivf near brute-force wall-clock
    (SCALE.md round 8) — build-once is what makes IVF pay at serving time,
    and a list_id-partitioned layout lets each probe read only
    nprobe/n_lists of the files (partition pruning, pinned in tests).
    ``centroids`` is O(n_lists x dim) — store it as JSON next to the
    table."""
    if refine_iterations > 0:
        from .clustering import kmeans

        _, cents = kmeans(
            corpus, n_lists, iterations=refine_iterations, id_col=id_col, vec_col=vec_col
        )
        centroids = list(enumerate(cents))
    else:
        centroids = ivf_centroids_from_sample(corpus, n_lists, id_col, vec_col)
    c_assign = ivf_assign(corpus, centroids, id_col, vec_col, nprobe=1)
    index = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("__vec_d").alias("c_vec"),
        F.col("norm").alias("c_norm"),
    ).join(c_assign.select(F.col(id_col).alias("neighbor_id"), "list_id"), "neighbor_id")
    return index, centroids


def ivf_search(
    index: DataFrame,
    centroids: list[tuple[int, list[float]]],
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe-MANY half: top-k over a prebuilt :func:`ivf_index` (or its
    columns read back from storage). Only the QUERY batch is assigned to
    centroids here; the corpus side arrives pre-assigned, so a store
    partitioned by list_id scans just the probed lists. Same results as
    :func:`cosine_topk_ivf` with the same centroids — pinned by test."""
    q_assign = ivf_assign(queries, centroids, id_col, vec_col, nprobe=nprobe)
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("__vec_d").alias("q_vec"), F.col("norm").alias("q_norm")
    ).join(q_assign.select(F.col(id_col).alias("query_id"), "list_id"), "query_id")
    sim = (
        index.join(q, "list_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_raw", dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_raw").desc(), F.col("neighbor_id"))
    return (
        sim.select("query_id", "neighbor_id", "cosine_raw").distinct()
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_raw", 6).alias("cosine"), "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    min_cosine: float,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. With `block_col`, the join is
    an equi-join on the block (e.g. cluster label or LSH bucket) — the scale
    path; without, a full self-join (small corpora only)."""
    n = with_norm(df, vec_col)
    cols = [F.col(id_col), F.col("__vec_d"), F.col("norm")] + (
        [F.col(block_col)] if block_col else []
    )
    base = n.select(*cols)
    a = base.toDF(*[f"a_{c}" for c in base.columns])
    b = base.toDF(*[f"b_{c}" for c in base.columns])
    if block_col:
        joined = a.join(b, F.col(f"a_{block_col}") == F.col(f"b_{block_col}"))
    else:
        joined = a.crossJoin(b)
    return (
        joined.where(F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
        .withColumn(
            "cosine_raw",
            dot(F.col("a___vec_d"), F.col("b___vec_d")) / (F.col("a_norm") * F.col("b_norm")),
        )
        .where(F.col("cosine_raw") >= min_cosine)
        .select(
            F.col(f"a_{id_col}").alias("vec_a"),
            F.col(f"b_{id_col}").alias("vec_b"),
            F.round("cosine_raw", 6).alias("cosine"),
        )
    )


def embedding_neardup_pairs_blas(
    df: DataFrame,
    min_cosine: float,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk: int = 1024,
) -> DataFrame:
    """BLAS-backed twin of :func:`embedding_neardup_pairs` — the throughput
    path for wide blocks. Same pair contract: all pairs (vec_a < vec_b)
    within a block with cosine >= min_cosine, cosine rounded HALF_UP to 6
    places. One schema difference vs the HOF variant: THIS variant casts ids
    to bigint (the Arrow batch needs one concrete integer type), while
    :func:`embedding_neardup_pairs` preserves the source id type — callers
    swapping variants on a non-bigint id column will see that drift.

    Instead of one interpreted fold per pair (the HOF `dot` is exact-parity
    with DuckDB but evaluates element-at-a-time), each block is shipped to
    the executor as ONE Arrow batch and scored as a chunked gram matrix
    (X_chunk @ X.T) in numpy — SIMD/BLAS, ~10x the per-pair throughput
    measured at sf10 (BENCH_NOTES_r05.md). Memory per task is
    O(chunk * block_rows) doubles plus the block itself; the blocking key is
    what bounds block_rows, exactly as in the Column variant.

    Parity caveat (why the ORACLE-CHECKED registry entry keeps the HOF
    fold): numpy's pairwise summation can differ from a sequential fold in
    the last ulp, so a cosine sitting exactly on a rounding or threshold
    boundary may flip. Rounding itself is exact-parity with Spark's round()
    — HALF_UP over the shortest-decimal repr via Decimal(repr(x)), not
    binary-double arithmetic (ADVICE r5) — so any residual divergence comes
    only from the summation-order ulp. Tests pin exact pair-set/value
    agreement on the fixture corpus and the bound |Δcosine| <= 1e-12
    before rounding."""
    import numpy as np
    import pandas as pd
    from decimal import Decimal, ROUND_HALF_UP

    _SIX = Decimal("0.000001")

    out_schema = "vec_a bigint, vec_b bigint, cosine double"

    def score_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        ids = pdf["__id"].to_numpy(dtype=np.int64)
        X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__vec"]])
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": np.int64, "vec_b": np.int64, "cosine": np.float64}
            )
        norms = np.sqrt((X * X).sum(axis=1))
        outs = []
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            cos = (X[lo:hi] @ X.T) / np.outer(norms[lo:hi], norms)
            # strict upper triangle BY ID (not position): identical to the
            # HOF variant's a_id < b_id predicate, so duplicate ids emit no
            # self-pairs here either (ADVICE r5)
            rows, cols = np.nonzero(
                (cos >= min_cosine) & (ids[None, :] > ids[lo:hi][:, None])
            )
            if len(rows):
                # HALF_UP to 6 places over the shortest-decimal repr — the
                # exact algorithm of Spark's round() (BigDecimal.valueOf) and
                # DuckDB's round(); plain *1e6 floor rounding of the binary
                # double can differ by 1e-6 on .xxxxxx5-boundary values
                # (ADVICE r5). Only threshold-passing pairs pay this loop.
                c = np.fromiter(
                    (
                        # float(v) first: numpy>=2 reprs scalars as
                        # 'np.float64(x)', which Decimal rejects
                        float(Decimal(repr(float(v))).quantize(_SIX, rounding=ROUND_HALF_UP))
                        for v in cos[rows, cols]
                    ),
                    dtype=np.float64,
                    count=len(rows),
                )
                outs.append(
                    pd.DataFrame(
                        {"vec_a": ids[rows + lo], "vec_b": ids[cols], "cosine": c}
                    )
                )
        if not outs:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": np.int64, "vec_b": np.int64, "cosine": np.float64}
            )
        return pd.concat(outs, ignore_index=True)

    base = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).cast("bigint").alias("__id"),
        _to_double(F.col(vec_col)).alias("__vec"),
    )
    return base.groupBy("__blk").applyInPandas(score_block, out_schema)

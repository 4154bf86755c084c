"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk_bruteforce``: exact top-k neighbors; the correctness
  baseline. Dot products via ``zip_with`` + ``aggregate`` (JVM-side).
  The small query side is broadcast so the big corpus never shuffles.
- ``lsh_bucket_topk``: the scale path — random-hyperplane (sign) LSH buckets
  the corpus; candidates only form inside matching buckets. Hyperplanes are
  deterministic literals (seeded LCG) so results are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..core.barrier import shared_barrier


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# Integer-exact scoring contract (shared with the DuckDB oracles): vectors
# scale to round(x·10^6) longs, dots/norms are exact integer sums, the final
# cosine divides identical doubles — bit-identical across engines. Embedding
# values are O(1), so products are < 2^40 and 64-dim sums < 2^46: exact in
# long AND in float64 (numpy kernels stay usable).
INT_SCALE = 1_000_000


def int_scaled(vec: Column, scale: int = INT_SCALE) -> Column:
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * scale).cast("long")
    )


def int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def int_cosine(a: Column, b: Column) -> Column:
    return int_dot(a, b).cast("double") / (
        F.sqrt(int_dot(a, a).cast("double")) * F.sqrt(int_dot(b, b).cast("double"))
    )


def quantize(x: float, scale: int = INT_SCALE) -> int:
    """Half-up (away from zero) scaling for plan constants (hyperplanes,
    centroids). Constants are quantized ONCE in Python and injected as
    literals into both the Spark plan and the oracle SQL, so the rounding
    mode only needs to be self-consistent."""
    import math

    v = x * scale
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Plan shape: broadcast(queries) × corpus → per-pair cosine → window top-k.
    One shuffle (the window on query_id); corpus scan stays pruned to
    (id, vector).
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cv"))
    scored = q.join(c, F.col("query_id") != F.col("corpus_id"), "inner").select(
        "query_id",
        "corpus_id",
        cosine(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def rerank_exact(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    metric: str = "l2",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    integer_scaled: bool = False,
) -> DataFrame:
    """Two-stage retrieval, stage 2 (the standard FAISS usage pattern):
    join an ANN shortlist (``candidates``: query_id, corpus_id — e.g.
    ``pq_topk(..., k=50)``) back to the FULL vectors and re-rank by exact
    distance, keeping the true top-``k`` per query. Coded (PQ) distances
    produce a good shortlist but misorder near-ties — within tight
    clusters quantization error exceeds the neighbor gaps — so ADC
    shortlist → exact re-rank is how the compressed tiers reach high
    recall (measured in SCALE.md's clustered ladder).

    Scale shape: candidate volume is queries × k′ rows, so both joins and
    the window are tiny next to stage 1; the corpus join is a key lookup
    (broadcast the candidate set on a cluster). Exact math stays JVM-side
    (``zip_with``/``aggregate``), no Python round trip.

    ``integer_scaled=True`` (L2 only) computes d² on the same
    ``int_scaled`` grid the ANN family quantizes to, yielding a BIGINT
    score that is bit-reproducible across engines — the oracle-checkable
    mode (float-sum d² is exact too, but its cross-engine summation order
    is not pinned).
    """
    if metric not in ("l2", "cosine"):
        raise ValueError(metric)
    cand = candidates.select("query_id", "corpus_id").distinct()
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cv"))
    if integer_scaled:
        if metric != "l2":
            raise ValueError("integer_scaled rerank supports metric='l2' only")
        q = q.withColumn("qv", int_scaled(F.col("qv")))
        c = c.withColumn("cv", int_scaled(F.col("cv")))
    # candidates x query-vectors is queries x k' rows — broadcast it into
    # the corpus join so the (huge) corpus side never shuffles
    j = F.broadcast(cand.join(q, "query_id")).join(c, "corpus_id")
    if metric == "l2":
        d2 = F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long") if integer_scaled else F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = j.select("query_id", "corpus_id", d2.alias("d2"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("d2").asc(), F.col("corpus_id").asc()
        )
        score_col = "d2"
    else:
        scored = j.select(
            "query_id", "corpus_id", cosine(F.col("qv"), F.col("cv")).alias("cosine")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("corpus_id").asc()
        )
        score_col = "cosine"
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", score_col, "rank")
    )


def _assert_bounded(df: DataFrame, max_rows: int, what: str) -> None:
    """Fail fast when a documented-small DataFrame is about to be
    materialized on the driver beyond its contract: a cheap
    ``limit(max_rows+1)`` count — one extra row is enough to prove the
    violation — instead of letting ``collect()`` OOM the driver with an
    opaque heap error."""
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"{what} exceeds its driver-side bound of {max_rows} rows; "
            "use the distributed variant (cosine_pairs_blockdist / a "
            "bucketed pipeline) or raise max_rows explicitly"
        )


def cosine_pairs_blockwise(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    scale: int = 1_000_000,
    max_rows: int = 100_000,
) -> DataFrame:
    """Exact all-pairs cosine (id_a < id_b, cosine ≥ threshold) via
    block-broadcast numpy matmul.

    Vectors are scaled to integers (``round(x·scale)``) so dot products are
    exact integer sums — deterministic and engine-portable (same contract as
    the SQL oracle). The corpus matrix rides to every partition (n×dim ints —
    KBs-to-MBs for real corpora), each partition matmuls its block against
    it: O(n²·dim) flops in BLAS instead of interpreted per-pair expression
    trees (measured 40× on 2000×64).

    NOTE: this variant materializes the corpus on the driver — use it only
    as the in-bucket kernel for pre-bucketed slices; ``max_rows`` enforces
    that contract (fail-fast instead of a driver OOM). The default
    all-pairs path is :func:`cosine_pairs_blockdist` (same output, fully
    distributed).
    """
    _assert_bounded(df, max_rows, "cosine_pairs_blockwise corpus")
    from pyspark.sql import types as T_

    from ._vectorized import make_cosine_pairs_mapper

    scaled = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("long")
        ).alias("iv"),
    )
    rows = scaled.collect()
    ids = [r[id_col] for r in rows]
    matrix = [r["iv"] for r in rows]
    mapper = make_cosine_pairs_mapper(ids, matrix, threshold, id_col)
    out_schema = T_.StructType(
        [
            T_.StructField("id_a", T_.LongType()),
            T_.StructField("id_b", T_.LongType()),
            T_.StructField("cosine", T_.DoubleType()),
        ]
    )
    return scaled.mapInPandas(mapper, schema=out_schema)


def cosine_pairs_blockdist(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    scale: int = INT_SCALE,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine (id_a < id_b, cosine ≥ threshold), fully
    distributed — the scale path that replaces
    :func:`cosine_pairs_blockwise`'s driver-side collect.

    Classic block-pair decomposition: rows hash into ``n_blocks`` blocks;
    each row is replicated to the ``n_blocks`` unordered block-pair groups
    it participates in; ``applyInPandas`` runs the exact numpy kernel inside
    each group (cross pairs for (bi, bj), upper triangle for (bi, bi)), so
    every qualifying pair is emitted exactly once and nothing ever touches
    the driver. Cost: ``n_blocks``× data replication through one shuffle and
    B(B+1)/2 independent tasks — size ``n_blocks`` so a block pair
    (~2n/B rows × dim) fits an executor; the n² work itself is inherent to
    the exact operator (the approximate path is LSH/IVF bucketing).

    Same integer-exactness contract as the blockwise kernel: scaled longs,
    float64 matmul exact below 2^53, cosine bit-identical to the SQL oracle.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T_

    scaled = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("long")
        ).alias("iv"),
        # hash, not id % B: structured id spaces (all-even ids, strided
        # ranges) would leave blocks empty and skew the block-pair groups
        F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(n_blocks))
        .cast("int")
        .alias("_b"),
    )
    replicated = scaled.select(
        "id",
        "iv",
        "_b",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("_c"),
    ).select(
        "id",
        "iv",
        "_b",
        F.least("_b", "_c").alias("bi"),
        F.greatest("_b", "_c").alias("bj"),
    )

    out_schema = T_.StructType(
        [
            T_.StructField("id_a", T_.LongType()),
            T_.StructField("id_b", T_.LongType()),
            T_.StructField("cosine", T_.DoubleType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        bi = int(pdf["bi"].iloc[0])
        bj = int(pdf["bj"].iloc[0])
        ids = pdf["id"].to_numpy(dtype=np.int64)
        m = np.array([np.asarray(v, dtype=np.float64) for v in pdf["iv"]])
        norms = np.sqrt((m * m).sum(axis=1))
        if bi == bj:
            cos = (m @ m.T) / (norms[:, None] * norms[None, :])
            ka, kb = np.where((ids[:, None] < ids[None, :]) & (cos >= threshold))
            return pd.DataFrame(
                {"id_a": ids[ka], "id_b": ids[kb], "cosine": cos[ka, kb]}
            )
        blk = pdf["_b"].to_numpy()
        xi = np.where(blk == bi)[0]
        yi = np.where(blk == bj)[0]
        if len(xi) == 0 or len(yi) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        cos = (m[xi] @ m[yi].T) / (norms[xi][:, None] * norms[yi][None, :])
        kx, ky = np.where(cos >= threshold)
        a, b = ids[xi][kx], ids[yi][ky]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cos[kx, ky]})

    return replicated.groupBy("bi", "bj").applyInPandas(kernel, schema=out_schema)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim (LCG; no RNG
    state shared with anything else)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
            row.append(state / float(1 << 62) - 1.0)
        planes.append(row)
    return planes


def lsh_signature(iv: Column, planes_int: list[list[int]]) -> Column:
    """Sign-LSH bucket id over the integer-scaled vector: bit i = 1 iff
    iv · plane_i > 0 in exact long arithmetic. The sign test never depends
    on float summation order, so any engine recomputes the same bucket."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes_int):
        plane = F.array(*[F.lit(int(x)).cast("long") for x in p])
        bit = F.when(
            int_dot(iv, plane) > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(bit)
    return sig


def training_sample(
    corpus: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
):
    """The bounded deterministic trainer sample as a float64 ndarray: the
    4096 corpus vectors with the smallest ids. ONE collect shared by every
    quantizer a query trains — the coarse-centroid and PQ-codebook trainers
    each collected this identical sample themselves, costing one extra
    full sort-limit pass over the corpus per query (guide §1.2: don't
    compute things twice; §5: keep driver pulls bounded — this one is
    capped at 4096 rows regardless of corpus size)."""
    import numpy as np

    sample = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(4096)
        .collect()
    )
    return np.array([np.asarray(r["v"], dtype=np.float64) for r in sample])


def ivf_centroids(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 3,
    sample=None,
) -> list[list[float]]:
    """Coarse quantizer for IVF: deterministic k-means (Lloyd) on a driver-
    side sample. Seeding is content-deterministic — the ``n_cells`` corpus
    vectors with the smallest ids — so repeated builds agree. The sample is
    bounded (4096 rows) regardless of corpus size; assignment quality only
    needs centroids to roughly tile the space. ``sample`` (from
    :func:`training_sample`) lets callers share one collect across
    quantizers."""
    x = training_sample(corpus, vec_col, id_col) if sample is None else sample
    return lloyd_centroids(x, n_cells, iters)


def lloyd_centroids(x, n_cells: int, iters: int = 3) -> list[list[float]]:
    """Deterministic Lloyd iterations over a float64 sample matrix. Shared
    verbatim by the Spark training path and the oracle-SQL builder so both
    produce bit-identical centroids from the same rows."""
    cents = x[:n_cells].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [[float(v) for v in row] for row in cents]


def _nearest_cell(iv: Column, cents_int: list[list[int]]) -> Column:
    """Index of the closest centroid by exact integer squared-L2 over the
    scaled vector (ties → lowest cell index). Arrow-batched numpy argmin —
    an unrolled per-cell Column expression would run O(cells) interpreted
    higher-order functions per row and ship O(cells × dim) literals in
    every task binary (see _vectorized docstring)."""
    from ._vectorized import make_nearest_cell_udf

    return make_nearest_cell_udf(cents_int)(iv)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are assigned to their nearest
    coarse-quantizer cell; each query scores the corpus vectors in its
    ``n_probe`` nearest cells (probing more cells raises recall at linear
    candidate cost; the corpus is still assigned to exactly ONE cell).

    The cell assignment is the partition key: at 100 TB the corpus is
    written partitioned/bucketed by cell so a query's probes touch
    ``n_probe`` cells' files. Candidate volume ≈ n_probe · corpus/n_cells
    per query.
    """
    cents = centroids if centroids is not None else ivf_centroids(
        corpus, dim, n_cells, vec_col, id_col
    )
    cents_int = [[quantize(x) for x in row] for row in cents]
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), int_scaled(F.col(vec_col)).alias("civ")
    ).withColumn("cell", _nearest_cell(F.col("civ"), cents_int))
    if n_probe <= 1:
        q = queries.select(
            F.col(id_col).alias("query_id"), int_scaled(F.col(vec_col)).alias("qiv")
        ).withColumn("cell", _nearest_cell(F.col("qiv"), cents_int))
    else:
        from ._vectorized import make_probe_cells_udf

        q = (
            queries.select(
                F.col(id_col).alias("query_id"), int_scaled(F.col(vec_col)).alias("qiv")
            )
            .withColumn(
                "cell",
                F.explode(
                    make_probe_cells_udf(cents_int, n_probe)(F.col("qiv"))
                ),
            )
        )
    scored = (
        F.broadcast(q)
        .join(c, "cell", "inner")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            int_cosine(F.col("qiv"), F.col("civ")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# persisted IVF index. ivf_topk trains and assigns per run — right for
# benchmarks, wrong for serving: at 100 TB you build the index ONCE
# (centroids + cell-partitioned assignments as txlog tables), append new
# vectors by assigning them with the FROZEN centroids (no retrain — the
# FAISS IndexIVF add() contract), and each search reads only the probed
# cells' partitions. Versioned via txlog: snapshot-isolated readers,
# time travel across index generations.


def ivf_build_index(
    spark,
    corpus: DataFrame,
    path: str,
    dim: int,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 3,
) -> None:
    """Build a persisted IVF index at ``path``: ``<path>/centroids`` (one
    row per cell) and ``<path>/cells`` (corpus ids + int-scaled vectors,
    hive-partitioned by cell so a probe reads only its cells' files)."""
    from ..sources.txlog import tx_write

    cents = ivf_centroids(corpus, dim, n_cells, vec_col, id_col, iters)
    cents_df = spark.createDataFrame(
        [(i, row) for i, row in enumerate(cents)], "cell int, centroid array<double>"
    )
    tx_write(spark, cents_df, f"{path}/centroids", mode="overwrite")
    tx_write(
        spark,
        _assign_cells(corpus, cents, vec_col, id_col),
        f"{path}/cells",
        partition_by=["cell"],
        mode="overwrite",
    )


def _assign_cells(vectors: DataFrame, cents, vec_col, id_col) -> DataFrame:
    cents_int = [[quantize(x) for x in row] for row in cents]
    return (
        vectors.select(
            F.col(id_col).alias("vec_id"), int_scaled(F.col(vec_col)).alias("iv")
        )
        .withColumn("cell", _nearest_cell(F.col("iv"), cents_int))
    )


def _load_centroids(spark, path: str) -> list[list[float]]:
    from ..sources.txlog import tx_read

    rows = tx_read(spark, f"{path}/centroids").collect()  # n_cells rows
    return [list(r["centroid"]) for r in sorted(rows, key=lambda r: r["cell"])]


def ivf_append_index(
    spark,
    new_vectors: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Append vectors to a persisted IVF index WITHOUT retraining: assign
    with the frozen centroids and tx-append to the cells table (one atomic
    version; only the touched cells' partitions gain files). Centroid
    drift under heavy appends is handled the standard way — rebuild the
    index generation, which txlog makes an atomic overwrite."""
    from ..sources.txlog import tx_write

    cents = _load_centroids(spark, path)
    tx_write(
        spark,
        _assign_cells(new_vectors, cents, vec_col, id_col),
        f"{path}/cells",
        partition_by=["cell"],
        mode="append",
    )


def ivf_search_index(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 5,
    n_probe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Search a persisted IVF index: same scoring as :func:`ivf_topk`
    (exact integer cosine within probed cells) but the corpus side comes
    from the index's cell table, pre-filtered to the union of probed
    cells — with hive-partitioning by cell, files of unprobed cells are
    never read. Query fan-out stays query-side (explode over probes);
    the index moves nothing."""
    from ..sources.txlog import tx_read

    cents = _load_centroids(spark, path)
    cents_int = [[quantize(x) for x in row] for row in cents]
    if n_probe <= 1:
        q = queries.select(
            F.col(id_col).alias("query_id"), int_scaled(F.col(vec_col)).alias("qiv")
        ).withColumn("cell", _nearest_cell(F.col("qiv"), cents_int))
    else:
        from ._vectorized import make_probe_cells_udf

        q = queries.select(
            F.col(id_col).alias("query_id"), int_scaled(F.col(vec_col)).alias("qiv")
        ).withColumn(
            "cell",
            F.explode(make_probe_cells_udf(cents_int, n_probe)(F.col("qiv"))),
        )
    q = q.transform(shared_barrier)  # probe set read twice below
    probed = sorted(r["cell"] for r in q.select("cell").distinct().collect())
    c = tx_read(spark, f"{path}/cells").filter(F.col("cell").isin(probed))
    scored = (
        F.broadcast(q)
        .join(c, "cell", "inner")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("corpus_id"),
            int_cosine(F.col("qiv"), F.col("iv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket are
    scored. 2^n_planes buckets → candidate set ≈ corpus / 2^n_planes; the
    bucket join shuffles on the bucket id only. Recall is tunable via
    ``n_planes`` (fewer planes → bigger buckets → higher recall/cost)."""
    planes = _hyperplanes(dim, n_planes, seed)
    planes_int = [[quantize(x) for x in row] for row in planes]
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        int_scaled(F.col(vec_col)).alias("civ"),
    ).withColumn("bucket", lsh_signature(F.col("civ"), planes_int))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        int_scaled(F.col(vec_col)).alias("qiv"),
    ).withColumn("bucket", lsh_signature(F.col("qiv"), planes_int))
    scored = (
        F.broadcast(q)
        .join(c, "bucket", "inner")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            int_cosine(F.col("qiv"), F.col("civ")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def lsh_multitable_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Multi-table sign-LSH — the production recall fix for the single-table
    variant: L independent hash tables (plane sets seeded ``seed + t``);
    a candidate only needs to collide with the query in ONE table, so
    recall goes from p to 1−(1−p)^L at L× candidate cost (the classic
    Indyk–Motwani amplification; what FAISS/Annoy ship as multi-table /
    forest).

    Plan shape: ONE corpus scan — every table's bucket id is computed in
    the same projection and exploded to (table, bucket) join keys, so the
    L tables cost one broadcast hash join on the composite key instead of
    L scan+join rounds (at 100 TB: one pass over the corpus, not L).
    Then one distinct shuffle on the (query, candidate) pair (the vector
    pair rides along — identical copies, so distinct stays exact) and the
    score + rank. Candidate volume ≈ L · corpus/2^planes per query; the
    corpus is never shuffled on anything but (table, bucket)."""
    from ._vectorized import make_multitable_lsh_udf

    tables = [
        [[quantize(x) for x in row] for row in _hyperplanes(dim, n_planes, seed + t)]
        for t in range(n_tables)
    ]
    buckets_udf = make_multitable_lsh_udf(tables)

    def with_table_buckets(df, idname, vname):
        # all L bucket ids in one Arrow matmul kernel, then posexplode to
        # (table, bucket) join keys — bit-identical to lsh_signature per
        # table (exact integer sign tests), L× cheaper than the HOF form
        return df.select(
            idname, vname, F.posexplode(buckets_udf(F.col(vname))).alias("t", "b")
        )

    cs = with_table_buckets(
        corpus.select(
            F.col(id_col).alias("corpus_id"),
            int_scaled(F.col(vec_col)).alias("civ"),
        ),
        "corpus_id",
        "civ",
    )
    qs = with_table_buckets(
        queries.select(
            F.col(id_col).alias("query_id"),
            int_scaled(F.col(vec_col)).alias("qiv"),
        ),
        "query_id",
        "qiv",
    )
    pairs = (
        F.broadcast(qs)
        .join(cs, ["t", "b"], "inner")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select("query_id", "corpus_id", "qiv", "civ")
    )
    scored = pairs.distinct().select(
        "query_id",
        "corpus_id",
        int_cosine(F.col("qiv"), F.col("civ")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) — the compressed-ANN tier (Jégou et al.,
# "Product quantization for nearest neighbor search", TPAMI 2011).


def pq_codebooks_from_sample(x, n_sub: int, k: int, iters: int = 3):
    """Per-subspace codebooks via the same deterministic Lloyd trainer the
    IVF quantizer uses, over a float64 sample matrix. Shared verbatim by
    the Spark path and the oracle builder so both derive bit-identical
    (quantized) codebooks."""
    dim = x.shape[1]
    sub = dim // n_sub
    return [
        lloyd_centroids(x[:, s * sub : (s + 1) * sub], k, iters)
        for s in range(n_sub)
    ]


def pq_codebooks(
    corpus: DataFrame,
    dim: int,
    n_sub: int = 4,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample=None,
) -> list:
    """Train PQ codebooks on the bounded first-4096-by-id sample (same
    sampling contract as :func:`ivf_centroids`; pass ``sample`` to share
    one :func:`training_sample` collect across quantizers)."""
    x = training_sample(corpus, vec_col, id_col) if sample is None else sample
    return pq_codebooks_from_sample(x, n_sub, k)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_sub: int = 4,
    n_cent: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: list | None = None,
    max_queries: int = 100_000,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance (ADC): corpus vectors
    compress to ``n_sub`` codebook codes (dim·4 bytes → n_sub bytes — the
    memory tier below IVF), queries score every corpus row via per-subspace
    lookup tables instead of full d²  — n_sub table hits per pair instead
    of ``dim`` multiplies.

    Scale shape: queries + codebooks ride in the Arrow-UDF closure
    (KBs); the corpus streams through mapInPandas ONCE, each batch emits
    only its per-query top-k candidates (not n·q pairs), and the global
    window ranks candidate rows bounded by batches·queries·k. All
    arithmetic is integer-exact (quantized centroids, scaled vectors), so
    ranks are engine-reproducible and the DuckDB oracle rebuilds identical
    scores."""
    import numpy as np
    import pandas as pd

    _assert_bounded(queries, max_queries, "pq_topk query side")
    cbs = codebooks if codebooks is not None else pq_codebooks(
        corpus, dim, n_sub, n_cent, vec_col, id_col
    )
    cbs_int = np.array(
        [[[quantize(v) for v in row] for row in cb] for cb in cbs], dtype=np.int64
    )  # (n_sub, n_cent, sub_dim)
    sub = dim // n_sub

    qrows = (
        queries.select(
            F.col(id_col).alias("query_id"), int_scaled(F.col(vec_col)).alias("qiv")
        )
        .collect()
    )
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["qiv"] for r in qrows], dtype=np.int64)  # (nq, dim)

    # per-query per-subspace LUT: lut[qi, s, j] = d²(q_sub, cent_sj)
    lut = np.empty((len(qids), n_sub, cbs_int.shape[1]), dtype=np.int64)
    for s in range(n_sub):
        qs = qmat[:, s * sub : (s + 1) * sub]  # (nq, sub)
        diff = qs[:, None, :] - cbs_int[s][None, :, :]  # (nq, K, sub)
        lut[:, s, :] = (diff * diff).sum(axis=2)

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = np.array([np.asarray(v, dtype=np.int64) for v in pdf["civ"]])
            ids = pdf["corpus_id"].to_numpy()
            codes = np.empty((n, n_sub), dtype=np.int64)
            for s in range(n_sub):
                xs = X[:, s * sub : (s + 1) * sub]
                diff = xs[:, None, :] - cbs_int[s][None, :, :]
                codes[:, s] = (diff * diff).sum(axis=2).argmin(axis=1)
            # adc[qi, i] = Σ_s lut[qi, s, codes[i, s]]
            adc = np.zeros((len(qids), n), dtype=np.int64)
            for s in range(n_sub):
                adc += lut[:, s, :][:, codes[:, s]]
            out_q, out_c, out_d = [], [], []
            for qi in range(len(qids)):
                d = adc[qi]
                cand = np.flatnonzero(ids != qids[qi])
                # batch-local top-k under the GLOBAL order (d², id) — a
                # plain argpartition breaks d² ties arbitrarily and could
                # drop the id the global rank keeps
                order = cand[np.lexsort((ids[cand], d[cand]))[:k]]
                for i in order:
                    out_q.append(qids[qi])
                    out_c.append(ids[i])
                    out_d.append(d[i])
            yield pd.DataFrame(
                {"query_id": out_q, "corpus_id": out_c, "d2": out_d}
            )

    c = corpus.select(
        F.col(id_col).cast("long").alias("corpus_id"),
        int_scaled(F.col(vec_col)).alias("civ"),
    )
    scored = c.mapInPandas(score, schema="query_id long, corpus_id long, d2 long")
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "d2", "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 8,
    n_sub: int = 16,
    n_cent: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ: coarse quantizer shortlists candidates (the query's cell),
    PQ/ADC ranks within — the production ANN composition (FAISS IVFPQ
    family; this is the NON-residual variant: codes quantize the full
    vector, not the cell residual — simpler and integer-exact, so the
    oracle can rebuild identical scores).

    Scale shape: the corpus is assigned to exactly one cell (its partition
    key on disk) and carries n_sub-byte codes; a query touches
    corpus/n_cells candidates and scores them with LUT adds. Candidate
    generation is the IVF broadcast-join; scoring is a vectorized
    Arrow UDF over (query vector, candidate codes)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    x = training_sample(corpus, vec_col, id_col)
    cents = ivf_centroids(corpus, dim, n_cells, vec_col, id_col, sample=x)
    cents_int = [[quantize(v) for v in row] for row in cents]
    cbs = pq_codebooks(corpus, dim, n_sub, n_cent, vec_col, id_col, sample=x)
    cbs_int = np.array(
        [[[quantize(v) for v in row] for row in cb] for cb in cbs], dtype=np.int64
    )
    sub = dim // n_sub

    def make_codes_udf():
        @pandas_udf("array<int>")
        def codes_of(vs):
            if len(vs) == 0:
                return pd.Series([], dtype=object)
            X = np.array([np.asarray(v, dtype=np.int64) for v in vs])
            out = np.empty((len(X), n_sub), dtype=np.int32)
            for s in range(n_sub):
                xs = X[:, s * sub : (s + 1) * sub]
                diff = xs[:, None, :] - cbs_int[s][None, :, :]
                out[:, s] = (diff * diff).sum(axis=2).argmin(axis=1)
            return pd.Series(list(out))

        return codes_of

    def make_adc_udf():
        @pandas_udf("long")
        def adc(qivs, codes):
            if len(qivs) == 0:
                return pd.Series([], dtype="int64")
            Q = np.array([np.asarray(v, dtype=np.int64) for v in qivs])
            C = np.array([np.asarray(c, dtype=np.int64) for c in codes])
            total = np.zeros(len(Q), dtype=np.int64)
            for s in range(n_sub):
                qs = Q[:, s * sub : (s + 1) * sub]
                cent = cbs_int[s][C[:, s]]  # (n, sub)
                d = qs - cent
                total += (d * d).sum(axis=1)
            return pd.Series(total)

        return adc

    c = corpus.select(
        F.col(id_col).cast("long").alias("corpus_id"),
        int_scaled(F.col(vec_col)).alias("civ"),
    )
    c = c.withColumn("cell", _nearest_cell(F.col("civ"), cents_int)).withColumn(
        "codes", make_codes_udf()(F.col("civ"))
    )
    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        int_scaled(F.col(vec_col)).alias("qiv"),
    ).withColumn("cell", _nearest_cell(F.col("qiv"), cents_int))

    scored = (
        F.broadcast(q)
        .join(c, "cell", "inner")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            make_adc_udf()(F.col("qiv"), F.col("codes")).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "d2", "rank")
    )


def residual_codebooks_from_sample(
    x, cents_int: list[list[int]], n_sub: int, n_cent: int, iters: int = 3
) -> list:
    """Train PQ codebooks in RESIDUAL space (FAISS IVFPQ default): each
    sample vector is quantized to the shared integer grid, assigned to its
    nearest coarse centroid by exact integer L2, and the integer residual
    ``v_int − centroid_int`` feeds the per-subspace Lloyd trainer. Output
    codebooks are rounded to integers (scale 1 — residuals already live on
    the scaled grid). Shared verbatim by the Spark path and the oracle-SQL
    builder so both derive bit-identical codebooks from the same rows."""
    import numpy as np

    xi = np.array([[quantize(v) for v in row] for row in x], dtype=np.int64)
    ci = np.array(cents_int, dtype=np.int64)
    d2 = ((xi[:, None, :] - ci[None, :, :]) ** 2).sum(axis=2)
    resid = (xi - ci[d2.argmin(axis=1)]).astype(np.float64)
    cbs = pq_codebooks_from_sample(resid, n_sub, n_cent, iters)
    return [[[quantize(v, 1) for v in row] for row in cb] for cb in cbs]


def _train_residual_quantizers(
    corpus: DataFrame,
    dim: int,
    n_cells: int,
    n_sub: int,
    n_cent: int,
    vec_col: str,
    id_col: str,
):
    """Coarse centroids (int grid) + residual PQ codebooks from the SAME
    bounded deterministic sample — shared by the in-memory
    :func:`ivf_pq_residual_topk`, the persisted-index builder, and the
    oracle builder, so all three derive bit-identical quantizers."""
    import numpy as np

    x = training_sample(corpus, vec_col, id_col)
    cents = ivf_centroids(corpus, dim, n_cells, vec_col, id_col, sample=x)
    cents_int_l = [[quantize(v) for v in row] for row in cents]
    rcb_int = np.array(
        residual_codebooks_from_sample(x, cents_int_l, n_sub, n_cent),
        dtype=np.int64,
    )
    return cents_int_l, rcb_int


def _residual_codes_udf(cents_int_l, rcb_int, n_sub: int, sub: int):
    """Arrow UDF: residual PQ codes of (vector, cell) batches."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cents_int = np.array(cents_int_l, dtype=np.int64)
    rcb = np.asarray(rcb_int, dtype=np.int64)

    @pandas_udf("array<int>")
    def codes_of(vs, cells):
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        X = np.array([np.asarray(v, dtype=np.int64) for v in vs])
        R = X - cents_int[cells.to_numpy()]
        out = np.empty((len(X), n_sub), dtype=np.int32)
        for s in range(n_sub):
            xs = R[:, s * sub : (s + 1) * sub]
            diff = xs[:, None, :] - rcb[s][None, :, :]
            out[:, s] = (diff * diff).sum(axis=2).argmin(axis=1)
        return pd.Series(list(out))

    return codes_of


def _residual_adc_udf(cents_int_l, rcb_int, n_sub: int, sub: int):
    """Arrow UDF: integer ADC distance of (query vector, cell, codes)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cents_int = np.array(cents_int_l, dtype=np.int64)
    rcb = np.asarray(rcb_int, dtype=np.int64)

    @pandas_udf("long")
    def adc(qivs, cells, codes):
        if len(qivs) == 0:
            return pd.Series([], dtype="int64")
        Q = np.array([np.asarray(v, dtype=np.int64) for v in qivs])
        QR = Q - cents_int[cells.to_numpy()]
        C = np.array([np.asarray(c, dtype=np.int64) for c in codes])
        total = np.zeros(len(Q), dtype=np.int64)
        for s in range(n_sub):
            qs = QR[:, s * sub : (s + 1) * sub]
            cent = rcb[s][C[:, s]]
            d = qs - cent
            total += (d * d).sum(axis=1)
        return pd.Series(total)

    return adc


def ivf_pq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 8,
    n_sub: int = 16,
    n_cent: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — codes quantize ``v − centroid(cell)``
    rather than the full vector, so each codebook only has to cover the
    spread *within* a cell instead of the whole space (the accuracy step
    that makes FAISS's IVFPQ its production default over the non-residual
    variant in :func:`ivf_pq_topk`).

    Exactness contract: all arithmetic is integer (scaled grid), so the
    DuckDB oracle retrains both quantizers from the same sample and
    reproduces every ADC distance bit-for-bit. The query residual is taken
    against the *probed* cell's centroid — with the equal-cell candidate
    join this is the query's own cell, which keeps the SQL twin a plain
    self-join.

    Scale shape: identical to :func:`ivf_pq_topk` — cell is the corpus
    partition key, candidates ≈ corpus/n_cells per query, codes are n_sub
    small ints per row, vectorized ADC in Arrow batches. The two trainer
    samples are bounded (4096 rows) regardless of corpus size."""
    cents_int_l, rcb_int = _train_residual_quantizers(
        corpus, dim, n_cells, n_sub, n_cent, vec_col, id_col
    )
    sub = dim // n_sub
    make_codes_udf = lambda: _residual_codes_udf(  # noqa: E731
        cents_int_l, rcb_int, n_sub, sub
    )
    make_adc_udf = lambda: _residual_adc_udf(  # noqa: E731
        cents_int_l, rcb_int, n_sub, sub
    )

    c = corpus.select(
        F.col(id_col).cast("long").alias("corpus_id"),
        int_scaled(F.col(vec_col)).alias("civ"),
    )
    c = c.withColumn("cell", _nearest_cell(F.col("civ"), cents_int_l)).withColumn(
        "codes", make_codes_udf()(F.col("civ"), F.col("cell"))
    )
    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        int_scaled(F.col(vec_col)).alias("qiv"),
    ).withColumn("cell", _nearest_cell(F.col("qiv"), cents_int_l))

    scored = (
        F.broadcast(q)
        .join(c, "cell", "inner")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            make_adc_udf()(F.col("qiv"), F.col("cell"), F.col("codes")).alias("d2"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "d2", "rank")
    )


# --------------------------------------------------------------------------
# Persisted IVF-PQ index: the 100 TB tier below the raw-vector IVF index.
# The cells table stores n_sub-byte PQ CODES instead of dim x 8-byte raw
# vectors (16x+ smaller scans at dim=64/n_sub=16), hive-partitioned by
# cell so a probe's file reads prune to its cells. Optional raw side table
# for exact re-rank (reference semantics: FAISS IVFPQ + refine).


def ivf_pq_build_index(
    spark,
    corpus: DataFrame,
    path: str,
    dim: int,
    n_cells: int = 8,
    n_sub: int = 16,
    n_cent: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    store_raw: bool = False,
) -> None:
    """Build a persisted IVF-PQ index at ``path``:

    - ``<path>/centroids`` — coarse cells on the integer grid;
    - ``<path>/codebooks`` — residual PQ codebooks (integer, scale 1);
    - ``<path>/codes`` — (vec_id, codes) hive-partitioned by cell: the
      ONLY table a search scans, n_sub small ints per vector;
    - ``<path>/raw`` (``store_raw=True``) — int-scaled full vectors for
      the optional exact re-rank stage.

    Quantizers train on the same bounded deterministic sample as
    :func:`ivf_pq_residual_topk`, so a search of this index reproduces its
    results bit-for-bit (the oracle-equivalence contract)."""
    from ..sources.txlog import tx_write

    cents_int_l, rcb_int = _train_residual_quantizers(
        corpus, dim, n_cells, n_sub, n_cent, vec_col, id_col
    )
    sub = dim // n_sub
    cents_df = spark.createDataFrame(
        [(i, [int(v) for v in row]) for i, row in enumerate(cents_int_l)],
        "cell int, centroid array<long>",
    )
    tx_write(spark, cents_df, f"{path}/centroids", mode="overwrite")
    cb_rows = [
        (s, j, [int(v) for v in rcb_int[s][j]])
        for s in range(n_sub)
        for j in range(len(rcb_int[s]))
    ]
    tx_write(
        spark,
        spark.createDataFrame(cb_rows, "sub int, code int, vec array<long>"),
        f"{path}/codebooks",
        mode="overwrite",
    )
    encoded = _encode_pq(corpus, cents_int_l, rcb_int, n_sub, sub, vec_col, id_col)
    tx_write(
        spark,
        encoded.select("vec_id", "cell", "codes"),
        f"{path}/codes",
        partition_by=["cell"],
        mode="overwrite",
    )
    if store_raw:
        tx_write(
            spark,
            encoded.select("vec_id", "iv"),
            f"{path}/raw",
            mode="overwrite",
        )


def _encode_pq(
    vectors: DataFrame, cents_int_l, rcb_int, n_sub, sub, vec_col, id_col
) -> DataFrame:
    return (
        vectors.select(
            F.col(id_col).cast("long").alias("vec_id"),
            int_scaled(F.col(vec_col)).alias("iv"),
        )
        .withColumn("cell", _nearest_cell(F.col("iv"), cents_int_l))
        .withColumn(
            "codes",
            _residual_codes_udf(cents_int_l, rcb_int, n_sub, sub)(
                F.col("iv"), F.col("cell")
            ),
        )
    )


def _load_pq_index_meta(spark, path: str):
    """(cents_int_l, rcb_int ndarray, n_sub, sub) from the index tables —
    driver-side, KBs."""
    import numpy as np

    from ..sources.txlog import tx_read

    cents_rows = tx_read(spark, f"{path}/centroids").collect()
    cents_int_l = [
        [int(v) for v in r["centroid"]]
        for r in sorted(cents_rows, key=lambda r: r["cell"])
    ]
    cb_rows = tx_read(spark, f"{path}/codebooks").collect()
    n_sub = 1 + max(r["sub"] for r in cb_rows)
    n_cent = 1 + max(r["code"] for r in cb_rows)
    by = {(r["sub"], r["code"]): [int(v) for v in r["vec"]] for r in cb_rows}
    rcb_int = np.array(
        [[by[(s, j)] for j in range(n_cent)] for s in range(n_sub)],
        dtype=np.int64,
    )
    sub = len(cents_int_l[0]) // n_sub
    return cents_int_l, rcb_int, n_sub, sub


def ivf_pq_append_index(
    spark,
    new_vectors: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Append vectors WITHOUT retraining: encode with the frozen
    quantizers, tx-append to the codes table (and the raw side table when
    the index has one) — only the touched cells' partitions gain files.
    Quantizer drift under heavy appends → rebuild the index generation
    (an atomic overwrite, like :func:`ivf_append_index`)."""
    from ..sources.txlog import is_txlog_table, tx_write

    cents_int_l, rcb_int, n_sub, sub = _load_pq_index_meta(spark, path)
    encoded = _encode_pq(
        new_vectors, cents_int_l, rcb_int, n_sub, sub, vec_col, id_col
    )
    tx_write(
        spark,
        encoded.select("vec_id", "cell", "codes"),
        f"{path}/codes",
        partition_by=["cell"],
        mode="append",
    )
    if is_txlog_table(spark, f"{path}/raw"):
        tx_write(
            spark, encoded.select("vec_id", "iv"), f"{path}/raw", mode="append"
        )


def ivf_pq_search_index(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 5,
    n_probe: int = 1,
    rerank: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Search a persisted IVF-PQ index: probe the query's ``n_probe``
    nearest cells, score candidates by integer ADC over the stored CODES
    (the scan touches n_sub bytes per candidate, never raw vectors, and
    unprobed cells' files are never read thanks to the hive partitioning).
    At ``n_probe=1`` with quantizers trained from the same corpus this
    returns exactly what :func:`ivf_pq_residual_topk` returns — the
    persisted form changes no results.

    ``rerank=k'`` adds the refine stage: ADC shortlists ``k'`` candidates
    per query, then exact integer-grid L2 against the ``raw`` side table
    re-ranks to the final top-``k`` (requires ``store_raw=True`` at build;
    output column is ``d2`` of the EXACT distance)."""
    from ..sources.txlog import is_txlog_table, tx_read

    cents_int_l, rcb_int, n_sub, sub = _load_pq_index_meta(spark, path)
    if n_probe <= 1:
        q = queries.select(
            F.col(id_col).cast("long").alias("query_id"),
            int_scaled(F.col(vec_col)).alias("qiv"),
        ).withColumn("cell", _nearest_cell(F.col("qiv"), cents_int_l))
    else:
        from ._vectorized import make_probe_cells_udf

        q = queries.select(
            F.col(id_col).cast("long").alias("query_id"),
            int_scaled(F.col(vec_col)).alias("qiv"),
        ).withColumn(
            "cell",
            F.explode(make_probe_cells_udf(cents_int_l, n_probe)(F.col("qiv"))),
        )
    q = q.transform(shared_barrier)  # probe set read twice below
    probed = sorted(r["cell"] for r in q.select("cell").distinct().collect())
    c = tx_read(spark, f"{path}/codes").filter(F.col("cell").isin(probed))
    shortlist_k = rerank if rerank else k
    scored = (
        F.broadcast(q)
        .join(c, "cell", "inner")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("corpus_id"),
            _residual_adc_udf(cents_int_l, rcb_int, n_sub, sub)(
                F.col("qiv"), F.col("cell"), F.col("codes")
            ).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("corpus_id").asc()
    )
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= shortlist_k)
        .select("query_id", "corpus_id", "d2", "rank")
    )
    if not rerank:
        return top
    if not is_txlog_table(spark, f"{path}/raw"):
        raise ValueError(
            f"rerank requested but {path} was built without store_raw=True"
        )
    raw = tx_read(spark, f"{path}/raw").select(
        F.col("vec_id"), F.col("iv").alias("embedding")
    )
    rq = queries.select(
        F.col(id_col).cast("long").alias(id_col),
        int_scaled(F.col(vec_col)).alias("embedding"),
    )
    # vectors already live on the int grid — rerank WITHOUT re-scaling
    return rerank_exact(
        top.select("query_id", "corpus_id"), raw, rq, k=k,
        metric="l2", integer_scaled=False,
    ).withColumnRenamed("dist", "d2")

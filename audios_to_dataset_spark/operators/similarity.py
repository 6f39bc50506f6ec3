"""Similarity search over embedding columns (array<float>).

Brute-force cosine with HOFs (`zip_with` dot product — JVM-side, codegen'd)
as the exact baseline, plus a random-hyperplane LSH bucketing as the scale
path: at 100 TB you never do the O(N·Q) brute force; you bucket by sign
hashes (equi-join shuffle on the bucket key) and only score within buckets.

All double math accumulates left-to-right in float64 so the DuckDB oracle
(list_transform + list_sum with double casts) reproduces it bit-for-bit;
results are rounded before any threshold/ordering so cross-engine float
noise (≤1 ulp) cannot flip a comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..plans._util import sround


def _spread_small_scan(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism floor (optimization guide §2.5, input
    skew): a single-file fixture parquet plans ONE scan split, so every
    downstream per-row computation — bucket-bit hashing, candidate
    generation, interpreted HOF dot products — serializes on one core
    of a 32-core host (r12 profiling: q_knn_graph's candidate stage ran
    1.4 s single-task, its scoring stage 8.9 s of executor time on 6
    AQE-coalesced tasks). When the planned scan parallelism is already
    >= the cluster's defaultParallelism (any real corpus: splits >>
    cores), this is a NO-OP and adds no shuffle — the repartition only
    fires for scans narrower than the cluster, where the shuffled frame
    is by construction tiny."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover — exotic frames; spread anyway
        return df.repartition(p)
    return df.repartition(p) if n < p else df


def _shuffle_width(df: DataFrame) -> int:
    """Partition count for explicit candidate repartitions (r13, VERDICT
    r12 item 7): read ``spark.sql.shuffle.partitions`` — the knob a real
    deployment sizes to the cluster (2-3× total cores via
    spark-defaults) — instead of pinning ``defaultParallelism``, so the
    candidate exchanges follow the production shuffle width rather than
    the local core count. Locally the session sets both to
    $SPARK_GRAFT_CPUS, so bench numbers are unchanged by construction.
    """
    try:
        return int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):  # "auto" or unset on exotic builds
        return df.sparkSession.sparkContext.defaultParallelism


def _dot(a: Column, b: Column) -> Column:
    """Left-to-right double dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_vs_query(
    df: DataFrame,
    query_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 3,
) -> DataFrame:
    """Cosine similarity of every vector against one query vector.

    The 1-row query side is cross-joined broadcast — no shuffle of the big
    side at all; the scan streams through a codegen'd projection.
    """
    q = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("query_vec")
    )
    cos = _dot(F.col(vec_col), F.col("query_vec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("query_vec"))
    )
    return (
        df.crossJoin(F.broadcast(q))
        .select(id_col, sround(cos, decimals).alias("cos_sim"))
    )


def topk_vs_query(
    df: DataFrame,
    k: int = 20,
    query_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 3,
) -> DataFrame:
    """Top-k nearest by cosine — ordered on the *rounded* score with an id
    tie-break so the cutoff is engine-independent. Spark plans the
    orderBy+limit as TakeOrderedAndProject (per-partition top-k, no global
    sort shuffle)."""
    scored = cosine_vs_query(df, query_id, id_col, vec_col, decimals)
    return scored.orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    ).limit(k)


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """Embedding near-duplicate pairs: all pairs with rounded cosine ≥
    threshold. Brute-force O(N²) — correct baseline; use
    :func:`lsh_bucketed_neardup_pairs` at scale."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", sround(cos, decimals))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def _bucket_bits(planes: list[list[float]], vec_col: str) -> Column:
    """Sign-bit string of the vector's dot products with the planes.

    The plane family is ONE ``array<array<double>>`` literal and the
    per-plane sign bit is computed inside a single ``transform`` lambda,
    joined with ``array_join`` — not a per-plane chain of Python-built
    ``concat(when(dot(...)))`` columns. Two costs motivated this (r12
    profiling of q_knn_graph: stage walls summed to <2 s while the
    query took 6-18 s):

    - build cost: every ``F.aggregate``/``F.zip_with`` lambda is dozens
      of py4j round trips; 8-12 tables x 4-12 planes made each
      multitable_buckets call 3.3-4.1 s of driver-side construction.
      This form is 1 literal + 3 lambdas per table (~0.02 s).
    - analysis cost: per-plane expressions (or per-element literal
      casts) put thousands of nodes in the tree, and Spark re-analyzes
      the accumulated plan on every downstream DataFrame op. This form
      is ~12 nodes per table.

    Per plane the evaluated expression is the identical
    ``CASE WHEN aggregate(zip_with(v, plane, x*y), 0.0, +) >= 0`` —
    '1'/'0' strings are never NULL, so ``array_join(transform(...))``
    concatenates exactly what the old per-plane ``concat`` did: every
    bucket value is bit-unchanged (pinned by
    tests/test_similarity_ops.py::test_bucket_bits_formulation).

    The matrix literal travels as ONE json string (classic-mode
    ``F.lit(list)`` decomposes into per-element py4j literals — the
    cost this rewrite removes) and ``from_json`` over a foldable
    argument is constant-folded by the optimizer into a plain
    ``array<array<double>>`` Literal before execution, so nothing is
    parsed per row. json.dumps emits repr() doubles (shortest
    round-trip) and Spark's Jackson path parses correctly rounded, so
    the folded values are bit-identical to ``F.lit`` doubles —
    verified element-wise against lit() including subnormals/-0.0
    (r12, 2057 values, 0 mismatches)."""
    import json as _json

    mat = (
        "from_json('"
        + _json.dumps([[float(p) for p in plane] for plane in planes])
        + "', 'array<array<double>>')"
    )
    return F.expr(
        f"array_join(transform({mat}, p -> CASE WHEN "
        f"aggregate(zip_with(`{vec_col}`, p, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
        "(acc, v) -> acc + v) >= 0 THEN '1' ELSE '0' END), '')"
    )


def multitable_buckets(
    df: DataFrame,
    tables: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """('id', 'bucket') rows for EVERY hash table in ONE scan: each input
    row computes its |tables| bucket keys ('<table>:<sign bits>') and
    explodes them. Row-set identical to unioning per-table single-scan
    bucket projections, but the vector table — the
    100 TB side — is read once instead of |tables| times, and the plan
    is a single Generate inside codegen instead of a |tables|-way Union
    of scans."""
    entries = [
        F.concat(F.lit(f"{t}:"), _bucket_bits(planes, vec_col))
        for t, planes in enumerate(tables)
    ]
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(*entries)).alias("bucket"),
    )


def ivf_assignments(
    df: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: (centroids, assignments).

    Default centroids are the ``n_centroids`` lowest-id vectors —
    deterministic, no RNG, good enough as a coarse partitioner. The pick
    is ``orderBy(id).limit(n)`` — Spark plans TakeOrderedAndProject
    (per-partition top-k, never a global single-partition sort) — and
    the centroid's own id doubles as ``centroid_id`` (id order = rank
    order, so every tie-break downstream sorts identically), so no
    window function touches the vector table at all. Pass ``centroids``
    (a (centroid_id, centroid_vec) frame, e.g. from
    :func:`kmeans_centroids`) to swap in a trained quantizer. Each
    vector is assigned to its max-cosine centroid via a broadcast cross
    join + argmax — the big side streams once, no shuffle.
    NULL-id / NULL-vector rows are dropped at entry: Spark sorts NULL
    ids FIRST, so one dirty row would otherwise become a NULL centroid
    whose NULL cosines poison every assignment (--nulls sweep).
    """
    df = df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
    if centroids is None:
        centroids = (
            df.select(
                F.col(id_col).alias("centroid_id"),
                F.col(vec_col).alias("centroid_vec"),
            )
            .orderBy("centroid_id")
            .limit(n_centroids)
        )
    cos = _dot(F.col(vec_col), F.col("centroid_vec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("centroid_vec"))
    )
    # assignment ordering uses the stable-rounded cosine so the argmax is
    # engine-reproducible (ties then break on centroid_id)
    scored = df.crossJoin(F.broadcast(centroids)).select(
        id_col,
        vec_col,
        "centroid_id",
        sround(cos, 6).alias("_ccos"),
    )
    pick = Window.partitionBy(id_col).orderBy(
        F.col("_ccos").desc(), "centroid_id"
    )
    assignments = (
        scored.withColumn("_pick", F.row_number().over(pick))
        .filter(F.col("_pick") == 1)
        .select(id_col, vec_col, "centroid_id")
    )
    return centroids, assignments


def ivf_topk_vs_query(
    df: DataFrame,
    k: int = 20,
    query_id: int = 0,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 3,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` centroid lists nearest
    the query, score within them. At scale the assignment table is
    partitioned by centroid_id, so a query touches nprobe/n_centroids of
    the data instead of all of it. ``centroids`` swaps in a trained
    coarse quantizer (e.g. :func:`kmeans_centroids`)."""
    centroids, assignments = ivf_assignments(
        df, n_centroids, id_col, vec_col, centroids=centroids
    )
    q = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("query_vec")
    )
    ccos = _dot(F.col("centroid_vec"), F.col("query_vec")) / (
        _norm(F.col("centroid_vec")) * _norm(F.col("query_vec"))
    )
    probe = (
        centroids.crossJoin(F.broadcast(q))
        .select("centroid_id", sround(ccos, 6).alias("_qc"))
        .orderBy(F.col("_qc").desc(), "centroid_id")
        .limit(nprobe)
        .select("centroid_id")
    )
    candidates = assignments.join(F.broadcast(probe), "centroid_id")
    cos = _dot(F.col(vec_col), F.col("query_vec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("query_vec"))
    )
    return (
        candidates.crossJoin(F.broadcast(q))
        .select(id_col, sround(cos, decimals).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_topk_vs_query(
    df: DataFrame,
    tables: list[list[list[float]]],
    k: int = 20,
    query_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 3,
) -> DataFrame:
    """Approximate top-k vs one query via hyperplane-LSH buckets.

    Candidates = vectors colliding with the query in ANY hash table;
    they alone are scored exactly, then top-k on the rounded score with
    an id tie-break. At scale this probes |tables| buckets instead of
    the full table — the candidate fetch is an equi-join on the bucket
    key against a handful of broadcast query buckets, and only the
    candidate rows' vectors ever move.
    """
    bucketed = multitable_buckets(df, tables, id_col, vec_col)
    qb = bucketed.filter(F.col("id") == query_id).select("bucket")
    cand_ids = (
        bucketed.join(F.broadcast(qb), "bucket")
        .select("id")
        .distinct()
    )
    cand = df.join(
        cand_ids.withColumnRenamed("id", id_col), id_col
    )
    q = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("query_vec")
    )
    cos = _dot(F.col(vec_col), F.col("query_vec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("query_vec"))
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .select(id_col, sround(cos, decimals).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def multiprobe_topk_vs_query(
    df: DataFrame,
    tables: list[list[list[float]]],
    k: int = 20,
    query_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 3,
) -> DataFrame:
    """Multi-probe LSH ANN (the method of Lv et al. 2007, public
    literature): in each hash table, probe the query's own bucket PLUS
    every bucket at Hamming distance 1 (each sign bit flipped once) —
    1 + n_planes probes per table instead of 1. Near-miss neighbors that
    landed one hyperplane away become candidates without adding hash
    tables, so recall rises at the same indexing cost; candidates are
    still re-scored exactly (precision stays 1).

    Scale shape: identical to the single-probe path — the probe set is a
    handful of broadcast bucket keys ((1 + n_planes) × n_tables rows),
    candidates arrive via ONE equi-join on the bucket key, and only
    candidate vectors are ever scored. The bit-flip probe generation is
    pure string ops inside codegen on a tables-sized frame.
    """
    n_planes = len(tables[0])
    bucketed = multitable_buckets(df, tables, id_col, vec_col)
    qb = bucketed.filter(F.col("id") == query_id).select("bucket")
    # j = 0 keeps the exact bucket; j >= 1 flips sign bit j. The bucket
    # string is "<table>:<bits>", so flips splice the bits part only.
    probes = (
        qb.withColumn(
            "j", F.explode(F.sequence(F.lit(0), F.lit(n_planes)))
        )
        .select(
            F.expr(
                "if(j = 0, bucket,"
                " concat(substring_index(bucket, ':', 1), ':',"
                "        substring(substring_index(bucket, ':', -1),"
                "                  1, j - 1),"
                "        if(substring(substring_index(bucket, ':', -1),"
                "                     j, 1) = '1', '0', '1'),"
                "        substring(substring_index(bucket, ':', -1),"
                f"                  j + 1, {n_planes})))"
            ).alias("bucket")
        )
        .distinct()
    )
    cand_ids = (
        bucketed.join(F.broadcast(probes), "bucket").select("id").distinct()
    )
    cand = df.join(cand_ids.withColumnRenamed("id", id_col), id_col)
    q = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("query_vec")
    )
    cos = _dot(F.col(vec_col), F.col("query_vec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("query_vec"))
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .select(id_col, sround(cos, decimals).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _kmeans_assign(
    df: DataFrame, cents: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Assign every vector to its max-rounded-cosine centroid (broadcast
    the k centroids (cid, cvec), argmax per vector — the big side streams,
    one narrow window per id)."""
    cos = _dot(F.col(vec_col), F.col("cvec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("cvec"))
    )
    scored = df.select(id_col, vec_col).crossJoin(
        F.broadcast(cents)
    ).select(
        id_col, vec_col, "cid", sround(cos, 6).alias("_c6")
    )
    pick = Window.partitionBy(id_col).orderBy(
        F.col("_c6").desc(), "cid"
    )
    return (
        scored.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "cid")
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seeded KMeans → the final k centroids (cid, cvec).

    Init: the ``k`` lowest-id vectors (TakeOrderedAndProject, no RNG).
    Each iteration: (1) argmax-rounded-cosine assignment against the
    broadcast centroids; (2) recompute centroids as the per-dimension
    *decimal* mean of their members (posexplode → groupBy(cid, pos) —
    one uniform shuffle on (k × dim) keys — then reassembled in pos
    order). Every arithmetic step is engine-reproducible, so a DuckDB
    oracle replays the identical iteration.
    """
    from ..plans._util import DEC

    # Unindexable rows (NULL id or NULL vector) must not reach training:
    # the seed is orderBy(id).limit(k) and Spark sorts NULLs FIRST, so a
    # single NULL-id row would become a seed and a NULL-vector seed
    # NULLs every distance — one dirty row in 100 TB would empty the
    # whole clustering (found by the --nulls sweep).
    df = df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
    cents = (
        df.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
        )
        .orderBy("cid")
        .limit(k)
    )
    prev = None
    for _ in range(iters):
        a = _kmeans_assign(df, cents, id_col, vec_col)
        flat = a.select(
            "cid", F.posexplode(F.col(vec_col)).alias("pos", "val")
        )
        means = flat.groupBy("cid", "pos").agg(
            (
                F.sum(F.col("val").cast("double").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        cents = (
            means.groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("_pm")
            )
            .select(
                "cid", F.transform("_pm", lambda s: s["m"]).alias("cvec")
            )
            # k rows — cache so each reuse (assignment + next recompute)
            # doesn't replay the whole iteration lineage
            .cache()
        )
        # drop the previous iteration's dead cache entry (caller owns the
        # final frame), mirroring pq_codebooks
        if prev is not None:
            prev.unpersist()
        prev = cents
    return cents


def kmeans_assignments(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seeded KMeans on cosine similarity → (id, cid): the
    assignment of every vector against :func:`kmeans_centroids`'s final
    centroids. At 100 TB: per-iteration cost is one broadcast + one
    (cid, pos) shuffle; centroids (k×dim doubles) stay driver-small.
    NULL-id / NULL-vector rows are dropped (see kmeans_centroids)."""
    df = df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
    cents = kmeans_centroids(df, k, iters, id_col, vec_col)
    return _kmeans_assign(df, cents, id_col, vec_col).select(id_col, "cid")


def pq_subvectors(
    df: DataFrame,
    m: int,
    subdim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, s, sub): every vector exploded into its ``m`` contiguous
    ``subdim``-wide subvectors — ONE scan of the vector table feeds all
    subspaces (the per-subspace-loop alternative rescans the 100 TB side
    m times per kmeans iteration)."""
    parts = [
        F.struct(
            F.lit(s).cast("int").alias("s"),
            F.slice(F.col(vec_col), s * subdim + 1, subdim).alias("sub"),
        )
        for s in range(m)
    ]
    return df.select(
        F.col(id_col), F.explode(F.array(*parts)).alias("_p")
    ).select(id_col, F.col("_p.s").alias("s"), F.col("_p.sub").alias("sub"))


def _pq_assign(
    sub: DataFrame, cents: DataFrame, id_col: str
) -> DataFrame:
    """Per-subspace centroid assignment: broadcast the (s, cid, cvec)
    codebooks, equi-join on the subspace, argmax rounded cosine with a
    cid tie-break — the grouped twin of :func:`_kmeans_assign` (identical
    arithmetic per subspace, so the same SQL replay applies)."""
    cos = _dot(F.col("sub"), F.col("cvec")) / (
        _norm(F.col("sub")) * _norm(F.col("cvec"))
    )
    scored = sub.join(F.broadcast(cents), "s").select(
        id_col, "s", "sub", "cid", sround(cos, 6).alias("_c6")
    )
    pick = Window.partitionBy(id_col, "s").orderBy(
        F.col("_c6").desc(), "cid"
    )
    return (
        scored.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(id_col, "s", "sub", "cid")
    )


def pq_codebooks(
    df: DataFrame,
    m: int,
    subdim: int,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(s, cid, cvec) codebooks for all ``m`` PQ subspaces, trained as
    ONE grouped seeded kmeans: the subvector table (id, s, sub) carries
    every subspace, each iteration is a single broadcast assignment plus
    a single (s, cid, pos) decimal-mean shuffle — m codebooks for the
    per-iteration cost of one. Seeds are the k lowest ids (identical
    across subspaces), matching :func:`kmeans_centroids`'s init, so the
    arithmetic per subspace equals the independent-loop formulation and
    the same DuckDB replay oracle applies."""
    from ..plans._util import DEC

    # same dirty-row discipline as kmeans_centroids: NULL ids/vectors
    # can't seed or train (Spark sorts NULL ids first in the seed scan)
    df = df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
    sub = pq_subvectors(df, m, subdim, id_col, vec_col)
    seed_ids = df.select(id_col).orderBy(id_col).limit(k)
    cents = sub.join(F.broadcast(seed_ids), id_col).select(
        "s", F.col(id_col).alias("cid"), F.col("sub").alias("cvec")
    )
    prev = None
    for _ in range(iters):
        a = _pq_assign(sub, cents, id_col)
        flat = a.select(
            "s", "cid", F.posexplode(F.col("sub")).alias("pos", "val")
        )
        means = flat.groupBy("s", "cid", "pos").agg(
            (
                F.sum(F.col("val").cast("double").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        cents = (
            means.groupBy("s", "cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("_pm")
            )
            .select(
                "s",
                "cid",
                F.transform("_pm", lambda x: x["m"]).alias("cvec"),
            )
            # m×k rows — cache so the next assignment and recompute don't
            # replay the whole iteration lineage
            .cache()
        )
        # the previous iteration's cached centroids are dead once the new
        # ones exist; unpersist so repeated PQ queries don't accumulate
        # cache entries for the app lifetime (caller owns the final frame)
        if prev is not None:
            prev.unpersist()
        prev = cents
    return cents


def pq_codes(
    df: DataFrame,
    m: int,
    subdim: int,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization (Jégou, Douze & Schmid 2011, public
    literature): split each vector into ``m`` contiguous ``subdim``-wide
    subvectors, train a seeded-kmeans codebook per subspace (same
    deterministic cosine kmeans as :func:`kmeans_centroids`, so the
    DuckDB oracle replays it), and emit each vector's code word — the
    centroid id — per subspace. m codes of log2(k) bits replace
    m×subdim floats: THE memory-compression path that lets a 100 TB
    embedding corpus serve ANN from RAM (codebooks are k×subdim doubles,
    broadcast; distances against codes become m table lookups).

    Scale shape: all subspaces train and assign through the grouped
    subvector table (:func:`pq_codebooks`) — one scan + one (id, s)
    window per assignment, one (s, cid, pos) shuffle per recompute,
    regardless of m; the final per-vector code row is a pivot-free
    max(CASE) aggregate keyed on the id. NULL-id / NULL-vector rows are
    dropped (see kmeans_centroids — they cannot be coded)."""
    df = df.filter(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
    sub = pq_subvectors(df, m, subdim, id_col, vec_col)
    cents = pq_codebooks(df, m, subdim, k, iters, id_col, vec_col)
    a = _pq_assign(sub, cents, id_col).select(id_col, "s", "cid")
    return a.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("s") == s, F.col("cid"))).alias(f"code_{s}")
            for s in range(m)
        ]
    )


def lsh_bucketed_neardup_pairs(
    df: DataFrame,
    tables: list[list[list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """Approximate near-dup pairs: score only within LSH buckets.

    ``tables`` is a list of hash tables, each a list of hyperplanes; a
    pair is a candidate if it collides in ANY table (recall ≈
    1 − (1 − p^b)^T for per-plane agreement p). Candidates are re-scored
    exactly, so precision is 1 — only recall is approximate.

    The self-join shuffles on (table, bucket) keys — uniform by
    construction; at 1000 executors each bucket's pairs generate locally
    post-shuffle. Candidate dedup moves only (id_a, id_b) pairs — the
    heavy vector payloads are joined back *after* the distinct, so the
    dedup shuffle is ids, not vectors. Tune: more planes/table → smaller
    buckets (cheaper, lower recall); more tables → higher recall
    (linearly more hashing)."""
    # r12 optimization: spread the slim scan (no-op at scale) and pin
    # the candidate partitioning before the distinct so the per-pair
    # scoring stage runs at cluster parallelism instead of the 1-6
    # partitions AQE's byte heuristic left it (guide §2.4/§2.5; same
    # rationale as knn_graph above). r13 (VERDICT r12 item 7): key the
    # exchange on the FULL pair (id_a, id_b) — one ultra-hot id_a now
    # spreads across every task instead of landing in one (id_b varies),
    # the distinct's ClusteredDistribution is satisfied exactly, and the
    # width follows spark.sql.shuffle.partitions (cluster-sized in
    # production) instead of the local core count.
    base = _spread_small_scan(df.select(id_col, vec_col))
    sc_p = _shuffle_width(df)
    bucketed = multitable_buckets(base, tables, id_col, vec_col)
    a = bucketed.select(F.col("id").alias("id_a"), "bucket")
    b = bucketed.select(F.col("id").alias("id_b"), "bucket")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .repartition(sc_p, "id_a", "id_b")
        .distinct()
    )
    # Norms are per-VECTOR, not per-pair: computing them on the N-row
    # join side instead of inside the C >> N candidate projection cuts
    # the interpreted per-pair work from 3 array folds to 1 (guide
    # §1.2 step 2). norm(v) evaluated on the same array yields the
    # identical double, so cos_sim is bit-unchanged and the DuckDB
    # oracle needs no edit.
    vn = base.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    va = vn.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    vb = vn.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos_sim", sround(cos, decimals))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def knn_graph(
    df: DataFrame,
    tables: list[list[list[float]]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 3,
) -> DataFrame:
    """Approximate k-NN graph — the index-construction primitive under
    HNSW/IVF-graph ANN serving: for EVERY vector, its top-k neighbors
    among LSH bucket-mates (exact re-score inside buckets, so precision
    is 1 within the candidate set; recall grows with tables).

    Scale shape: bucket self-join on uniform (table, bucket) keys, a
    distinct on directed id pairs (ids only — vectors join back after),
    then a row_number window PARTITIONED BY source id. No global sort,
    no all-pairs anywhere."""
    from pyspark.sql import Window

    # r12 optimization (guide §2.4/§2.5): spread the slim (id, vec)
    # scan so bucket hashing + candidate generation parallelize on
    # single-file fixtures (no-op at scale, see _spread_small_scan),
    # and pin the candidate frame's partitioning BEFORE the distinct:
    # AQE's byte-based coalescing collapsed the post-distinct scoring
    # stage to ~6 partitions (bytes are tiny, per-row interpreted dot
    # cost is not). r13 (VERDICT r12 item 7): key the exchange on the
    # FULL (src, dst) pair — one ultra-hot src spreads across every
    # task in the expensive scoring stage instead of serializing in one
    # (dst varies), the distinct's ClusteredDistribution is satisfied
    # exactly, and the width follows spark.sql.shuffle.partitions
    # (cluster-sized in production). The per-src rank window re-adds
    # its own planner Exchange on src, but it moves only the slim
    # (src, dst, cos_sim) rows and AQE manages it; the hot-src sort is
    # inherent to row_number-per-src, not to scoring.
    base = _spread_small_scan(df.select(id_col, vec_col))
    sc_p = _shuffle_width(df)
    bucketed = multitable_buckets(base, tables, id_col, vec_col)
    a = bucketed.select(F.col("id").alias("src"), "bucket")
    b = bucketed.select(F.col("id").alias("dst"), "bucket")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .repartition(sc_p, "src", "dst")
        .distinct()
    )
    # Pre-normalize to unit vectors ONCE per vector (N rows), so the
    # per-candidate work is a single dot product instead of dot + two
    # norms — 3 interpreted array aggregates down to 1 on the C >> N
    # candidate rows (measured 2× on the scoring stage at sf0.1). The
    # DuckDB oracle normalizes with the identical per-element division,
    # so rounded scores stay bit-equal. Zero-norm vectors have no
    # defined cosine and are dropped here rather than crashing the job
    # with DIVIDE_BY_ZERO under ANSI mode (one dirty row in 100 TB
    # must not kill the build; found by the candidate-budget
    # hypothesis test).
    un = (
        base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))
        .withColumn("_n", _norm(F.col("_v")))
        .filter(F.col("_n") > 0)
        .select(
            "id",
            F.transform(
                "_v", lambda x: x.cast("double") / F.col("_n")
            ).alias("u"),
        )
    )
    va = un.select(F.col("id").alias("src"), F.col("u").alias("ua"))
    vb = un.select(F.col("id").alias("dst"), F.col("u").alias("ub"))
    cos = _dot(F.col("ua"), F.col("ub"))
    w = Window.partitionBy("src").orderBy(
        F.col("cos_sim").desc(), "dst"
    )
    return (
        cand.join(va, "src")
        .join(vb, "dst")
        .withColumn("cos_sim", sround(cos, decimals))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "cos_sim", "rank")
    )


def hard_negatives(
    df: DataFrame,
    tables: list[list[list[float]]],
    labels: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 3,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every
    labelled anchor, the top-k HIGHEST-cosine bucket-mates with a
    DIFFERENT label — the near-misses a metric-learning loss needs.
    Same LSH candidate generation as :func:`knn_graph`; the label
    filter runs BEFORE the per-anchor rank (a post-rank filter would
    lose negatives hiding beyond rank k among same-label neighbors).

    ``labels`` is an (id, label) frame; NULL-label rows drop out as
    both anchors and candidates. Scale shape: identical to knn_graph
    (bucket equi-join + per-anchor window) plus two label hash joins
    on the candidate frame.
    """
    from pyspark.sql import Window

    # r12 optimization (guide §2.4/§2.5): spread the slim (id, vec)
    # scan and pin the candidate frame's partitioning BEFORE the
    # distinct so scoring runs at full width. r13 (VERDICT r12 item 7):
    # keyed on the FULL (src, dst) pair at shuffle.partitions width —
    # hot-src-safe, cluster-sized; see the knn_graph comment above.
    base = _spread_small_scan(df.select(id_col, vec_col))
    sc_p = _shuffle_width(df)
    bucketed = multitable_buckets(base, tables, id_col, vec_col)
    a = bucketed.select(F.col("id").alias("src"), "bucket")
    b = bucketed.select(F.col("id").alias("dst"), "bucket")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .repartition(sc_p, "src", "dst")
        .distinct()
    )
    la = labels.select(
        F.col("id").alias("src"), F.col("label").alias("src_label")
    )
    lb = labels.select(
        F.col("id").alias("dst"), F.col("label").alias("dst_label")
    )
    neg = (
        cand.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("src_label") != F.col("dst_label"))
    )
    un = (
        base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))
        .withColumn("_n", _norm(F.col("_v")))
        .filter(F.col("_n") > 0)
        .select(
            "id",
            F.transform(
                "_v", lambda x: x.cast("double") / F.col("_n")
            ).alias("u"),
        )
    )
    va = un.select(F.col("id").alias("src"), F.col("u").alias("ua"))
    vb = un.select(F.col("id").alias("dst"), F.col("u").alias("ub"))
    cos = _dot(F.col("ua"), F.col("ub"))
    w = Window.partitionBy("src").orderBy(
        F.col("cos_sim").desc(), "dst"
    )
    return (
        neg.join(va, "src")
        .join(vb, "dst")
        .withColumn("cos_sim", sround(cos, decimals))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "src", "src_label", "dst", "dst_label", "cos_sim", "rank"
        )
    )


def lsh_topk_batch(
    df: DataFrame,
    tables: list[list[list[float]]],
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 3,
) -> DataFrame:
    """Batch ANN: approximate top-k for MANY query vectors at once.

    The realistic serving/backfill shape (one query at a time wastes a
    full pass per query): all queries' buckets broadcast, candidates
    arrive via ONE equi-join on the bucket key, exact scores only for
    (query, candidate) collisions, then a per-query window top-k. Cost
    at scale: one pass over the vector table for bucketing + a shuffle
    of candidate rows — independent of the number of queries until the
    query side outgrows the broadcast threshold.
    """
    from pyspark.sql import Window

    bucketed = multitable_buckets(df, tables, id_col, vec_col)
    ids = [F.lit(q) for q in query_ids]
    qb = (
        bucketed.filter(F.col("id").isin(*ids))
        .select(F.col("id").alias("qid"), "bucket")
    )
    cand = (
        bucketed.join(F.broadcast(qb), "bucket")
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "id")
        .distinct()
    )
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    qv = df.filter(F.col(id_col).isin(*ids)).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    cos = _dot(F.col("vec"), F.col("qvec")) / (
        _norm(F.col("vec")) * _norm(F.col("qvec"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("id")
    )
    return (
        cand.join(v, "id")
        .join(F.broadcast(qv), "qid")
        .select("qid", "id", sround(cos, decimals).alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").cast("bigint").alias("query_id"),
            F.col("id").cast("bigint").alias("neighbor_id"),
            "cos_sim",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def cluster_bucketed_neardup_pairs(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """SemDeDup-style semantic near-dup (cluster-bucketed; the method of
    Abbas et al. 2023, "SemDeDup", public literature): bucket every
    vector by its seeded-KMeans cluster, then score cosine pairs only
    WITHIN clusters. The complement of LSH bucketing: clusters follow
    the data's own density (near-dups co-cluster by construction), and
    per-cluster candidate count is (N/k)² — at scale you raise k with N
    (k ~ N/target_cluster_size) and the train step stays one broadcast
    + one (cid, pos) shuffle per iteration. Exact re-score inside
    buckets, so precision is 1; recall misses only pairs split across
    cluster boundaries."""
    assign = kmeans_assignments(df, k, iters, id_col, vec_col)
    left = df.join(assign, id_col).select(
        "cid", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    right = df.join(assign, id_col).select(
        "cid", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        left.join(right, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", sround(cos, decimals))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def semantic_dedup_decisions(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """The SemDeDup ENDGAME on top of :func:`cluster_bucketed_neardup_pairs`:
    one row per vector with the keep/drop decision. A vector is dropped
    when some LOWER-id cluster-mate scores >= threshold (min-id survivor,
    the same deterministic rule as exact_dedup_groups); ``max_lower_cos``
    reports the strongest such mate (-1.0 when none qualifies).

    KMeans assignments are computed ONCE and cached — they feed both
    sides of the pair join and the final decision frame. Scale shape is
    unchanged from the pair search: per-cluster (N/k)^2 candidates with
    k raised alongside N, then an (id) groupBy and a left join."""
    assign = kmeans_assignments(df, k, iters, id_col, vec_col).cache()
    left = df.join(assign, id_col).select(
        "cid", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    right = df.join(assign, id_col).select(
        "cid", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    drops = (
        left.join(right, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", sround(cos, decimals))
        .filter(F.col("cos_sim") >= threshold)
        .groupBy("id_b")
        .agg(F.max("cos_sim").alias("max_lower_cos"))
    )
    return assign.join(
        drops, assign[id_col] == drops["id_b"], "left"
    ).select(
        id_col,
        "cid",
        F.coalesce("max_lower_cos", F.lit(-1.0)).alias("max_lower_cos"),
        F.when(F.col("id_b").isNull(), 1).otherwise(0).alias("keep"),
    )


def dbscan_clusters(
    df: DataFrame,
    tables: list[list[list[float]]],
    threshold: float,
    min_pts: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
    max_iter: int = 20,
) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. KDD'96) over an
    embedding column, with the eps-neighborhood realized as the
    LSH-bucketed cosine near-dup pair graph.

    Semantics (on the candidate graph): a point is **core** when its
    eps-neighborhood — itself plus neighbors with rounded cosine >=
    ``threshold`` — has at least ``min_pts`` members; clusters are the
    connected components of the core-core neighbor graph (labelled by
    min core id); a non-core point adjacent to >= 1 core point is a
    **border** member of its minimum-labelled core neighbor's cluster;
    everything else is **noise** (NULL cluster_id).

    Approximate in exactly the sense of every bucketed pair-finder in
    this module: neighborhoods are computed within deterministic LSH
    candidates (precision 1, recall < 1), and the oracle replays the
    identical buckets — so the check is exact even though the clustering
    is approximate relative to all-pairs DBSCAN.

    Scale shape: the pair search is the bucket equi-join
    (:func:`lsh_bucketed_neardup_pairs` — no cross join), degrees are
    one groupBy on node ids, core/border splits are semi/anti joins,
    and the component loop shuffles only (id, label) pairs with
    loop-invariant frames checkpointed inside
    :func:`~..operators.graph.connected_components`. At 1000 executors
    nothing here materializes more than the candidate pairs, which the
    plane count keeps ~linear in N (see the scale-smoke's
    log2(N)-bucket dial).
    """
    from .graph import connected_components

    # the pair graph feeds degrees, the core-edge subgraph, the border
    # join AND every component iteration — checkpoint it ONCE so the
    # LSH bucket join + re-score never re-executes inside the loop
    # (localCheckpoint over cache: loop lineage must be CUT, not merely
    # cached, or the 20-iteration plan growth dominates; see
    # operators/dedup.py:473 for the ContextCleaner rationale)
    pairs = (
        lsh_bucketed_neardup_pairs(
            df, tables, threshold, id_col, vec_col, decimals
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    und = pairs.unionByName(
        pairs.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
        )
    ).select(F.col("id_a").alias("id"), F.col("id_b").alias("nb"))

    deg = und.groupBy("id").agg(F.count("*").alias("n_nb"))
    core = deg.filter(F.col("n_nb") + 1 >= min_pts).select("id")

    core_edges = (
        pairs.join(core.select(F.col("id").alias("id_a")), "id_a", "semi")
        .join(core.select(F.col("id").alias("id_b")), "id_b", "semi")
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    core_lab = connected_components(
        core, core_edges, max_iter=max_iter
    ).select("id", "cluster_id")

    border = (
        und.join(core, "id", "left_anti")
        .join(
            core_lab.select(
                F.col("id").alias("nb"),
                F.col("cluster_id").alias("nb_cluster"),
            ),
            "nb",
        )
        .groupBy("id")
        .agg(F.min("nb_cluster").alias("cluster_id"))
    )
    labeled = core_lab.withColumn("role", F.lit("core")).unionByName(
        border.withColumn("role", F.lit("border"))
    )
    # the pair graph can never label NULL-id / NULL-vector rows (NULL
    # comparisons drop them before any candidate forms), so the noise
    # leg must exclude them too or the --nulls sweep diverges
    all_ids = df.filter(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(F.col(id_col).alias("id"))
    noise = all_ids.join(labeled, "id", "left_anti").select(
        "id",
        F.lit(None).cast("bigint").alias("cluster_id"),
        F.lit("noise").alias("role"),
    )
    return labeled.unionByName(noise)

"""Similarity search over the ``embeddings`` table (LLM-pipeline
operators: exact cosine top-k, LSH-bucketed approximate variant).

Spark-first: the exact path is a broadcast nested-loop join with the
cosine computed by JVM higher-order functions (zip_with + aggregate —
no Python in the hot loop); ranking is a per-query window over the
broadcast-joined scores. The approximate path buckets vectors by
random-hyperplane sign bits (one Arrow-batched numpy projection pass),
then only scores candidates sharing a probed bucket — the 100 TB path,
where the bucket column becomes the partition/pruning key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# dot/norms as JVM higher-order functions, all-double (matches the
# DuckDB oracle's list_cosine_similarity on ::DOUBLE[] inputs)
_COS_SQL = (
    "aggregate(zip_with(qe, embedding, (x, y) -> cast(x as double) * cast(y as double)), "
    "0D, (acc, v) -> acc + v) / "
    "(sqrt(aggregate(qe, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double))) * "
    "sqrt(aggregate(embedding, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double))))"
)


def _ranked(joined: DataFrame, k: int, hi: float | None = None) -> DataFrame:
    # rank on the 6-dp-rounded similarity (absorbs cross-engine ulp
    # differences in the float fold), tie-broken by vec_id; ``hi``
    # (hard_negatives' band bound) filters sim_r >= hi candidates out
    # BEFORE the ranking window
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim_r"), F.asc("vec_id")
    )
    scored = joined.withColumn("sim_r", F.round(F.expr(_COS_SQL), 6))
    if hi is not None:
        scored = scored.filter(F.col("sim_r") < hi)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim_r")
    )


def _query_join(
    emb: DataFrame, n_queries: int, predicate: str | None = None
) -> DataFrame:
    """The filter-then-search candidate frame every exact lane shares:
    first ``n_queries`` vectors broadcast as queries against the
    (optionally predicate-filtered) candidate table, self excluded.
    Queries come from the UNFILTERED table — a query needn't satisfy
    its own filter."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    cand = emb if predicate is None else emb.filter(F.expr(predicate))
    return (
        cand.select("vec_id", "embedding")
        .join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
    )


def cosine_topk(
    emb: DataFrame, n_queries: int = 8, k: int = 10,
    predicate: str | None = None,
) -> DataFrame:
    """EXACT brute-force cosine top-k: the first ``n_queries`` vectors
    query the full table (self excluded). Output
    (query_id, rank, vec_id, sim_r).

    ``predicate`` (optional) is the vector-DB metadata filter (FAISS
    IDSelector / Milvus expr / pgvector WHERE): only candidates
    matching the SQL expression are eligible, while query vectors come
    from the unfiltered table (a query needn't satisfy its own filter).
    PRE-filtering (filter-then-search) keeps the result exact at any
    selectivity — post-filtering silently returns < k under selective
    predicates — and the predicate pushes into the candidate Parquet
    scan (row-group pruning). Composes with the IVF/PQ lanes the same
    way — filter the codes/list scan before ADC."""
    return _ranked(_query_join(emb, n_queries, predicate), k)


def cosine_topk_where(
    emb: DataFrame, predicate: str, n_queries: int = 8, k: int = 10
) -> DataFrame:
    """Metadata-filtered exact ANN — see :func:`cosine_topk`'s
    ``predicate`` parameter (this name is the contract surface)."""
    return cosine_topk(emb, n_queries=n_queries, k=k, predicate=predicate)


def lsh_buckets(
    emb: DataFrame, planes: int = 4, tables: int = 16, seed: int = 42
) -> DataFrame:
    """(vec_id, table, bucket): random-hyperplane sign-bit bucket per
    vector per hash table — ONE Arrow-batched numpy matmul pass emits
    all L tables (multi-table LSH: recall compounds as 1-(1-s^p)^L
    while candidates stay ~L * N / 2^p for random pairs). Embeddings
    deliberately do NOT ride along: duplicating the vector per table
    multiplied the kernel output (and any downstream shuffle) by L —
    consumers re-join the single-copy ``emb`` table when they need the
    vectors."""
    import numpy as np
    import pandas as pd

    def assign(batches):
        P = None
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.stack(pdf["embedding"].to_numpy())
            if P is None:
                rng = np.random.default_rng(seed)
                P = rng.standard_normal((tables * planes, E.shape[1]))
            bits = (E @ P.T) > 0  # (n, tables*planes)
            n = len(pdf)
            weights = (1 << np.arange(planes)).astype(np.int64)
            buckets = (
                bits.reshape(n, tables, planes) * weights[None, None, :]
            ).sum(axis=2).astype(np.int32)
            out = pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), tables),
                    "table": np.tile(np.arange(tables, dtype=np.int32), n),
                    "bucket": buckets.reshape(-1),
                }
            )
            yield out

    return emb.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, table int, bucket int"
    )


def cosine_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.45,
    planes: int = 4,
    tables: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup-family variant of
    similarity search): candidate pairs collide in >= 1 of L hash tables,
    then every candidate's exact cosine is computed and thresholded —
    precision is exact, and the table count is sized so recall misses are
    negligible at the pinned threshold (P(miss) = (1-p^4)^64 where p is
    the sign-agreement rate; at real dup thresholds >= 0.9 far fewer
    tables suffice — the fixture's vectors are random, so the pinned
    threshold sits at the hard end of the spectrum).
    Output (vec_a, vec_b, sim_r) with vec_a < vec_b."""
    from .neardup import _bucket_pairs

    b = lsh_buckets(emb, planes, tables, seed)
    # groupBy + in-bucket expansion, not a self-join: the bucket kernel
    # subtree is computed ONCE and shuffled once (see neardup._bucket_pairs)
    cand = (
        _bucket_pairs(b, ["table", "bucket"], "vec_id")
        .select(F.col("a").alias("vec_a"), F.col("b").alias("vec_b"))
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("qe"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("sim_r", F.round(F.expr(_COS_SQL), 6))
        .filter(F.col("sim_r") >= threshold)
        .select("vec_a", "vec_b", "sim_r")
    )


MAX_PARTIAL_ROWS = 1 << 20  # codebook/centroid training reduces: rows
# ∝ (arrow batches × k), NEVER ∝ vectors — the bound makes the 100-TB
# contract explicit and turns a future regression (collecting anything
# corpus-sized here) into a loud error instead of a driver OOM


def bounded_collect(df: DataFrame, bound: int, what: str) -> list:
    """``collect()`` with an enforced row cap: the plan is limited to
    ``bound + 1`` rows BEFORE anything reaches the driver (CollectLimit,
    no full materialization), and exceeding the bound raises. Use for
    every driver-side reduce that is codebook/centroid/query-sized by
    design."""
    rows = df.limit(bound + 1).collect()
    if len(rows) > bound:
        raise RuntimeError(
            f"{what}: driver collect exceeded its {bound}-row bound; "
            "this path must stay codebook/centroid-sized — repartition "
            "the input or add an intermediate combine"
        )
    return rows


def train_ivf_centroids(
    emb: DataFrame, n_centroids: int = 16, iters: int = 5
):
    """Spherical k-means coarse quantizer for IVF: returns a
    (n_centroids, dim) float64 numpy array of unit-norm centroids.

    Distributed Lloyd iterations, Spark-shaped: per iteration ONE
    Arrow-batched pass emits per-batch partial sums (cid, count,
    vector-sum) — K*P tiny rows — which the driver reduces in sorted
    order and renormalizes. Init is the ``n_centroids`` lowest-vec_id
    vectors (deterministic, no RNG). Centroids are rounded per iteration
    so borderline assignments don't flip on float reduce order; the
    serving path's correctness never depends on centroid bits (any
    assignment is a valid partition of the vectors)."""
    import numpy as np

    init_rows = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(n_centroids)
        .collect()
    )
    C = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in init_rows])
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    dim = C.shape[1]
    for _ in range(iters):
        Cb = C

        def partials(batches):
            import pandas as pd

            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                Xn = X / np.maximum(
                    np.linalg.norm(X, axis=1, keepdims=True), 1e-12
                )
                cid = np.argmax(Xn @ Cb.T, axis=1)
                rows = {"cid": [], "n": [], "vsum": []}
                for c in np.unique(cid):
                    m = cid == c
                    rows["cid"].append(int(c))
                    rows["n"].append(int(m.sum()))
                    rows["vsum"].append(Xn[m].sum(axis=0).tolist())
                yield pd.DataFrame(rows)

        got = bounded_collect(
            emb.select("embedding").mapInPandas(
                partials, schema="cid int, n long, vsum array<double>"
            ),
            MAX_PARTIAL_ROWS,
            "train_ivf_centroids partial sums",
        )
        sums = np.zeros((n_centroids, dim))
        counts = np.zeros(n_centroids, dtype=np.int64)
        for r in sorted(got, key=lambda r: (r["cid"], r["n"], tuple(r["vsum"]))):
            sums[r["cid"]] += np.asarray(r["vsum"])
            counts[r["cid"]] += r["n"]
        nz = counts > 0
        C = C.copy()
        C[nz] = sums[nz] / np.maximum(
            np.linalg.norm(sums[nz], axis=1, keepdims=True), 1e-12
        )
        C = np.round(C, 9)
    return C


def ivf_assign(emb: DataFrame, centroids) -> DataFrame:
    """(vec_id, cid): nearest-centroid assignment, one Arrow-batched
    matmul pass. At scale ``cid`` is the IVF partition key — the
    embeddings table is written ``partitionBy(cid)`` and a query probing
    ``nprobe`` lists prunes every other partition at the parquet scan."""
    import numpy as np

    Cb = centroids

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cid": np.argmax(Xn @ Cb.T, axis=1).astype(np.int32),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, cid int"
    )


def ivf_ann_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int | None = None,
    iters: int = 5,
) -> DataFrame:
    """IVF cosine top-k: score only vectors whose centroid is among the
    query's ``nprobe`` nearest centroids. Same output schema as
    :func:`cosine_topk`.

    ``nprobe = n_centroids`` (the default) probes every inverted list;
    since the assignment covers each vector exactly once, that is
    EXACTLY brute force — the driver-contract oracle row runs this
    configuration against the same DuckDB brute-force SQL as the exact
    operator, validating the train/assign/probe machinery end-to-end.
    Pruned recall (nprobe << n_centroids) is pytest-gated
    (tests/test_pipeline_ops.py), as is candidate pruning."""
    import numpy as np

    C = train_ivf_centroids(emb, n_centroids, iters)
    assign = ivf_assign(emb, C)
    if nprobe is None:
        nprobe = n_centroids
    nprobe = min(nprobe, n_centroids)

    qrows = bounded_collect(
        emb.filter(F.col("vec_id") < n_queries).select("vec_id", "embedding"),
        n_queries,
        "ivf_ann_topk query vectors",
    )
    probes = {"query_id": [], "cid": []}
    for r in qrows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        qv /= max(float(np.linalg.norm(qv)), 1e-12)
        top = np.argsort(-(C @ qv), kind="stable")[:nprobe]
        probes["query_id"].extend([int(r["vec_id"])] * nprobe)
        probes["cid"].extend(int(c) for c in top)
    spark = emb.sparkSession
    probe_df = spark.createDataFrame(
        list(zip(probes["query_id"], probes["cid"])), schema="query_id long, cid int"
    )

    cand = (
        assign.join(F.broadcast(probe_df), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    qe = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    joined = (
        cand.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qe), "query_id")
    )
    return _ranked(joined, k)


def ivf_write(
    emb: DataFrame, root: str, n_centroids: int = 16, iters: int = 5
):
    """Materialize an IVF index: the embeddings table written
    ``partitionBy(cid)`` (one directory per inverted list) plus the
    centroid matrix as JSON. At 100 TB this is the layout that makes a
    probe read ``nprobe/K`` of the bytes: the cid filter prunes whole
    partitions at the parquet scan (plan-gated in
    tests/test_pipeline_ops.py). Returns the centroid array."""
    import json as _json
    import os

    C = train_ivf_centroids(emb, n_centroids, iters)
    a = ivf_assign(emb, C)
    (
        emb.join(a, "vec_id")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(os.path.join(root, "vectors"))
    )
    with open(os.path.join(root, "centroids.json"), "w") as f:
        _json.dump([[float(x) for x in row] for row in C], f)
    return C


def ivf_read_topk(
    spark, root: str, n_queries: int = 8, k: int = 10, nprobe: int | None = None
) -> DataFrame:
    """Serve ANN from a materialized IVF index: probe the query's
    ``nprobe`` nearest centroid partitions ONLY — the cid predicate
    reaches the scan as a partition filter, so unprobed lists cost zero
    IO. Full probe equals brute force (same identity as
    :func:`ivf_ann_topk`)."""
    import json as _json
    import os

    import numpy as np

    with open(os.path.join(root, "centroids.json")) as f:
        C = np.asarray(_json.load(f))
    vecs = spark.read.parquet(os.path.join(root, "vectors"))
    if nprobe is None:
        nprobe = C.shape[0]
    nprobe = min(nprobe, C.shape[0])

    qrows = bounded_collect(
        vecs.filter(F.col("vec_id") < n_queries).select("vec_id", "embedding"),
        n_queries,
        "ivf_read_topk query vectors",
    )
    pairs = []
    for r in qrows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        qv /= max(float(np.linalg.norm(qv)), 1e-12)
        for c in np.argsort(-(C @ qv), kind="stable")[:nprobe]:
            pairs.append((int(r["vec_id"]), int(c)))
    probe_df = spark.createDataFrame(pairs, schema="query_id long, cid int")
    probed_cids = sorted({c for _, c in pairs})

    # the isin predicate is what prunes partitions at the scan; the
    # per-query probe membership is then the (broadcast) join
    cand = (
        vecs.filter(F.col("cid").isin(probed_cids))
        .join(F.broadcast(probe_df), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    qe = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return _ranked(cand.join(F.broadcast(qe), "query_id"), k)


def sq_train(emb: DataFrame):
    """Scalar-quantizer training: per-dimension (min, max) of the
    L2-NORMALIZED vectors — cosine similarity only sees directions, so
    the quantization grid lives on the unit sphere. ONE Arrow-batched
    pass emits a (mn, mx) row per batch (dim-sized each); the driver
    reduce is over batch-count rows, never vector-count. Returns
    (mn, mx) float64 arrays of length dim."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {"mn": [Xn.min(axis=0).tolist()], "mx": [Xn.max(axis=0).tolist()]}
            )

    rows = bounded_collect(
        emb.select("embedding").mapInPandas(
            partials, schema="mn array<double>, mx array<double>"
        ),
        MAX_PARTIAL_ROWS,
        "sq_train per-batch extrema",
    )
    if not rows:
        raise ValueError("sq_train: empty embeddings table")
    mn = np.min(np.stack([np.asarray(r["mn"]) for r in rows]), axis=0)
    mx = np.max(np.stack([np.asarray(r["mx"]) for r in rows]), axis=0)
    return mn, mx


def sq_encode(emb: DataFrame, mn, mx) -> DataFrame:
    """(vec_id, code binary): each normalized vector quantized to one
    uint8 per dimension on the trained per-dim grid —
    ``code = round(255 * (x - mn) / (mx - mn))`` — and packed into a
    single contiguous ``binary`` cell. This is the bandwidth story: a
    float32 corpus scans 4·dim bytes per vector, the code table scans
    dim (8× vs the float64 oracle representation); at 100 TB the code
    table IS the hot scan set and the float table is only touched for
    the top-C rescore."""
    import numpy as np
    import pandas as pd

    mn64 = np.asarray(mn, dtype=np.float64)
    span = np.maximum(np.asarray(mx, dtype=np.float64) - mn64, 1e-12)

    def encode(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            q = np.clip(np.rint(255.0 * (Xn - mn64) / span), 0, 255).astype(
                np.uint8
            )
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "code": [row.tobytes() for row in q],
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        encode, schema="vec_id long, code binary"
    )


def sq_ann_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    rescore: int | None = None,
) -> DataFrame:
    """int8 scalar-quantized ANN (the Lucene/FAISS ``SQ8`` lane):
    approximate scores from a uint8-code scan pick the top-``rescore``
    candidates per query, then ONLY those are exactly re-ranked from
    the float table. Same output schema as :func:`cosine_topk`.

    ``rescore = None`` (the default) rescores EVERY vector — since the
    exact pass then ranks the full candidate set, the result is exactly
    brute force regardless of quantization error, and the driver-
    contract oracle row runs this configuration against the brute-force
    SQL (the train/encode/scan machinery must still produce a complete,
    well-formed candidate set to pass — same identity as IVF's full
    probe). Pruned recall (rescore << N) is pytest-gated.

    Scale shape: the code scan emits at most ``rescore`` rows per query
    PER ARROW BATCH (per-batch top-C trim), the global cut is a window
    over those partials, and the float table is touched through a
    ``rescore``-row-per-query join — never a full second scan."""
    import numpy as np
    import pandas as pd

    mn, mx = sq_train(emb)
    codes = sq_encode(emb, mn, mx)

    qrows = bounded_collect(
        emb.filter(F.col("vec_id") < n_queries).select("vec_id", "embedding"),
        n_queries,
        "sq_ann_topk query vectors",
    )
    if not qrows:
        return emb.sparkSession.createDataFrame(
            [], schema="query_id long, rank int, vec_id long, sim_r double"
        )
    Q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qids = np.asarray([int(r["vec_id"]) for r in qrows])
    span = np.maximum(np.asarray(mx) - np.asarray(mn), 1e-12)
    # dequantized dot = sum_d (code*span/255 + mn) * q_d
    #                 = (codes @ (q*span))/255 + mn·q   — one uint8 GEMM
    W = (Q * span[None, :]).T  # (dim, n_q)
    bias = Q @ np.asarray(mn)  # (n_q,)
    cap = int(rescore) if rescore is not None else (1 << 62)

    def scan(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in pdf["code"]]
            ).astype(np.float64)
            scores = (C @ W) / 255.0 + bias[None, :]  # (n, n_q)
            ids = pdf["vec_id"].to_numpy()
            out_q, out_v, out_s = [], [], []
            for j in range(scores.shape[1]):
                s = scores[:, j]
                keep = ids != qids[j]  # self never a candidate
                idx = np.nonzero(keep)[0]
                if idx.size > cap:
                    part = np.argpartition(-s[idx], cap - 1)[:cap]
                    idx = idx[part]
                out_q.extend([int(qids[j])] * idx.size)
                out_v.extend(int(v) for v in ids[idx])
                out_s.extend(float(x) for x in s[idx])
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_v, "ascore": out_s}
            )

    partial = codes.mapInPandas(
        scan, schema="query_id long, vec_id long, ascore double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("ascore"), F.asc("vec_id")
    )
    cand = (
        partial.withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= cap)
        .select("query_id", "vec_id")
    )
    qe = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    joined = (
        cand.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qe), "query_id")
    )
    return _ranked(joined, k)


def lsh_ann_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    planes: int = 4,
    tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: score ONLY vectors that collide with
    the query in at least one of the L hash tables. Same output schema
    as :func:`cosine_topk`; recall@k >= 0.9 is gated in
    tests/test_pipeline_ops.py at the sandbox SF."""
    b = lsh_buckets(emb, planes, tables, seed)
    # bucket ONLY the query vectors for the probe side (bucket
    # assignment is per-vector with a pinned seed, so this equals
    # filtering the full bucket table) — the full kernel subtree is
    # evaluated once, not once per join side
    q = lsh_buckets(
        emb.filter(F.col("vec_id") < n_queries), planes, tables, seed
    ).select(F.col("vec_id").alias("query_id"), "table", "bucket")
    cand = (
        b.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()  # a pair may collide in several tables
    )
    qe = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    joined = (
        cand.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qe), "query_id")
    )
    return _ranked(joined, k)


def maxsim_topk(
    emb: DataFrame,
    vecs_per_doc: int = 5,
    n_queries: int = 4,
    k: int = 10,
) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia,
    SIGIR 2020): documents and queries are BAGS of token vectors and

        score(q, d) = sum over query tokens of
                      max over d's tokens of cos(query_token, doc_token)

    — the MaxSim operator. This is the serving shape of every
    multi-vector retriever (ColBERT/ColBERTv2/PLAID, and ES 8.x
    ``rank_vectors``/late-interaction scoring): richer than single-dense
    kNN because each query token independently finds its best-matching
    doc token, but unlike cross-encoders it stays a pure dot-product
    plan an engine can execute.

    Multi-vector fixture: the flat ``embeddings`` table is grouped into
    documents in contiguous blocks of ``vecs_per_doc`` (doc_id =
    vec_id DIV v) — the layout a real multi-vector store uses (a doc's
    token vectors co-located, which at 100 TB makes per-doc max a
    partition-local fold). The first ``n_queries`` DOCS act as queries
    (each contributes its ``v`` token vectors); a query's own doc is
    excluded from its candidates.

    Scale shape: the query bag is request-sized (n_queries * v rows)
    and broadcast, so the doc-token table is read ONCE map-side with no
    shuffle of vectors; the only shuffles carry (query_id, qtok, doc_id,
    max) partial rows — two chained hash aggs with map-side combine,
    both keyed by bounded-cardinality keys (n_q * n_docs), then a
    per-query top-k window over n_docs rows. With an IVF layout the
    candidate read prunes to the probed lists per query token (the
    PLAID pipeline) — composition with ivf_assign is the documented
    scale path, not a different operator.

    Cross-engine exactness: each per-(query-token, doc) max cosine is
    rounded to 6 dp and lifted to INTEGER micro-units BEFORE the
    per-doc sum, so the ranking key is a BIGINT sum — exact and
    summation-order-independent, immune to the float-sum ulp-straddle
    hazard ROUND_NOTES documents for float-scored ranked lanes
    (addition of longs is associative; partitioning cannot move the
    result). Output: (query_id, rank, doc_id, score_u6) with score_u6
    the MaxSim score in 1e-6 units."""
    if vecs_per_doc < 1 or n_queries < 1 or k < 1:
        raise ValueError("vecs_per_doc, n_queries and k must be >= 1")
    d, qt = _token_blocks(emb, vecs_per_doc, n_queries)
    pairs = d.join(F.broadcast(qt)).filter(
        F.col("doc_id") != F.col("query_id")
    )
    return _maxsim_rank(pairs, k)


def _doc_of(vecs_per_doc: int):
    """The multi-vector layout contract: contiguous vec_id blocks of
    ``vecs_per_doc`` form a document (doc_id = vec_id DIV v)."""
    return F.expr(f"CAST(vec_id DIV {int(vecs_per_doc)} AS BIGINT)")


def _token_blocks(
    emb: DataFrame, vecs_per_doc: int, n_queries: int
) -> tuple[DataFrame, DataFrame]:
    """The MaxSim lanes' shared frames under the ``_doc_of`` layout:
    the first ``n_queries`` docs' token vectors form the query bag.
    Returns (doc tokens, query tokens)."""
    d = emb.select(
        _doc_of(vecs_per_doc).alias("doc_id"), "vec_id", "embedding"
    )
    qt = d.filter(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"),
        F.col("vec_id").alias("qtok"),
        F.col("embedding").alias("qe"),
    )
    return d, qt


def _maxsim_rank(pairs: DataFrame, k: int) -> DataFrame:
    """Shared MaxSim scoring tail: (doc_id, vec_id, embedding) x
    (query_id, qtok, qe) pair rows -> per-(query-token, doc) max of the
    6dp-rounded cosine -> exact BIGINT micro-unit per-doc sum ->
    per-query top-k."""
    per_tok = (
        pairs.withColumn("c_r", F.round(F.expr(_COS_SQL), 6))
        .groupBy("query_id", "qtok", "doc_id")
        .agg(F.max("c_r").alias("m"))
    )
    per_doc = per_tok.groupBy("query_id", "doc_id").agg(
        F.sum(F.round(F.col("m") * 1e6, 0).cast("long")).alias("score_u6")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_u6"), F.asc("doc_id")
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_u6")
    )


def maxsim_ivf_topk(
    emb: DataFrame,
    vecs_per_doc: int = 5,
    n_queries: int = 4,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int | None = None,
    iters: int = 5,
) -> DataFrame:
    """IVF-pruned MaxSim — the PLAID serving pipeline (Santhanam et al.
    2022) done relationally: doc TOKEN vectors are bucketed by the IVF
    coarse quantizer, each QUERY token probes its ``nprobe`` nearest
    lists, and only documents with at least one token in a probed list
    are exactly MaxSim-scored. At 100 TB the token table is written
    ``partitionBy(cid)`` so the candidate read prunes at the parquet
    scan (same layout contract as ``ivf_write``); candidate-doc
    discovery touches only the (vec_id, cid) assignment — m bytes/row,
    never the vectors.

    Saturation device (the driver-oracle configuration): ``nprobe`` of
    ``None`` (or >= n_centroids) probes every list, making the
    candidate set every document — provably identical to
    :func:`maxsim_topk`, so the exact brute-force oracle checks the
    train / assign / probe / candidate-join machinery end to end.
    Pruned recall and the candidate-pruning telemetry are pytest-gated
    (tests/test_maxsim.py). Output (query_id, rank, doc_id, score_u6),
    identical schema to :func:`maxsim_topk`."""
    import numpy as np

    if vecs_per_doc < 1 or n_queries < 1 or k < 1:
        raise ValueError("vecs_per_doc, n_queries and k must be >= 1")
    if nprobe is None:
        nprobe = n_centroids
    if nprobe < 1:
        raise ValueError("nprobe must be >= 1")
    spark = emb.sparkSession
    C = train_ivf_centroids(emb, n_centroids=n_centroids, iters=iters)
    d, qt = _token_blocks(emb, vecs_per_doc, n_queries)
    # query bag: request-sized by definition (n_queries * v rows)
    qrows = bounded_collect(
        d.filter(F.col("doc_id") < n_queries),
        n_queries * vecs_per_doc,
        "maxsim_ivf query bag",
    )
    Q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    sims = Qn @ C.T
    nb = min(int(nprobe), C.shape[0])
    probes = {
        (int(r["doc_id"]), int(c))
        for r, srow in zip(qrows, sims)
        for c in np.argsort(-srow, kind="stable")[:nb]
    }
    probe_df = spark.createDataFrame(
        sorted(probes), "query_id long, cid int"
    )
    # candidate docs: >= 1 token in a probed list of that query — the
    # join touches only (vec_id, cid) scalar rows, never vectors
    assigned = ivf_assign(emb, C).withColumn(
        "doc_id", _doc_of(vecs_per_doc)
    )
    cand = (
        assigned.join(F.broadcast(probe_df), "cid")
        .filter(F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id")
        .distinct()
    )
    pairs = d.join(cand, "doc_id").join(F.broadcast(qt), "query_id")
    return _maxsim_rank(pairs, k)


def hard_negatives(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    hi: float = 0.95,
    predicate: str | None = None,
) -> DataFrame:
    """Contrastive hard-negative mining — the band-pass similarity
    selection embedding-training pipelines run (DPR, Karpukhin et al.
    2020; SimCSE-style contrastive fine-tuning): for each query vector,
    the top-``k`` MOST similar candidates whose similarity is still
    BELOW ``hi`` — negatives must be hard (high cosine, near the
    decision boundary) but must not be positives or near-duplicates
    (``sim_r >= hi`` is the same near-dup band SemDeDup prunes, so the
    two operators compose: dedup removes the band, this mines just
    under it).

    The threshold applies to the 6-dp-rounded similarity (the engine's
    cross-engine-stable comparison key throughout the ANN lanes), so
    band membership is replayable. ``predicate`` optionally pre-filters
    candidates (same filter-then-search contract as
    :func:`cosine_topk_where`). Scale shape: identical to
    :func:`cosine_topk` — broadcast query side, map-side scoring, the
    band filter fuses into the scan stage before the per-query top-k
    window; with an IVF layout the candidate read prunes to probed
    lists first. Output (query_id, rank, vec_id, sim_r).

    ``hi`` may slightly exceed 1.0 (up to 1 + 1e-6): the band excludes
    sim_r >= hi, and 6-dp-rounded similarities reach exactly 1.0, so
    hi = 1.0 still excludes perfect matches — pass hi = 1.000001 to
    express "no exclusion band" (ADVICE r5)."""
    if not (0.0 < hi <= 1.000001):
        raise ValueError("hi must be in (0, 1 + 1e-6]")
    if n_queries < 1 or k < 1:
        raise ValueError("n_queries and k must be >= 1")
    return _ranked(_query_join(emb, n_queries, predicate), k, hi=hi)


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.45,
    n_clusters: int = 16,
    iters: int = 5,
    max_bucket: int = 10_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering the embedding space, computing
    pairwise cosine ONLY within clusters, connecting >=threshold pairs
    into duplicate groups, and keeping one representative per group
    (lowest vec_id — the dedup_first/dup_groups house convention; the
    paper's low-centroid-similarity keeper is a one-line swap of the
    keep rule). Output (vec_id, cluster_id, keep), cluster_id = min
    vec_id of the semantic group, ordered.

    ``n_clusters=1`` is the saturated regime: every pair is
    within-cluster, so the result is EXACT all-pairs semantic dedup —
    the full-value oracle anchor (the same trick as the saturated-
    codebook PQ oracle). At scale the cluster id is the partition key
    (the IVF layout), within-cluster pair generation is the chunked
    ``_bucket_pairs`` lane (exactness survives over-full clusters),
    and the quadratic work is bounded by the cluster size the k-means
    chose — the paper's entire point: O(n²/k) instead of O(n²), with
    misses only across cluster boundaries.

    Components come from ``neardup.dup_groups`` (distributed min-label
    propagation + pointer jumping — no driver union-find)."""
    from .neardup import _bucket_pairs, dup_groups

    if n_clusters < 1:
        raise ValueError("n_clusters must be >= 1")
    C = train_ivf_centroids(emb, n_centroids=n_clusters, iters=iters)
    asg = ivf_assign(emb, C)
    cand = _bucket_pairs(
        emb.select("vec_id").join(asg, "vec_id"),
        ["cid"],
        "vec_id",
        max_bucket=max_bucket,
        over_cap="chunk",
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("qe"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding"))
    pairs = (
        cand.select(F.col("a").alias("vec_a"), F.col("b").alias("vec_b"))
        .join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("sim_r", F.round(F.expr(_COS_SQL), 6))
        .filter(F.col("sim_r") >= threshold)
        .select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    )
    groups = dup_groups(emb.select(F.col("vec_id").alias("doc_id")), pairs)
    return groups.select(
        F.col("doc_id").alias("vec_id"), "cluster_id", "keep"
    ).orderBy("vec_id")


def semantic_decontaminate(
    emb: DataFrame, bench_predicate: str, threshold: float = 0.35
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    counterpart of ``curation.decontaminate``'s n-gram overlap: a
    candidate document is contaminated when its embedding's cosine
    similarity to ANY held-out benchmark vector reaches ``threshold``
    (paraphrased eval leakage that exact n-gram overlap misses; the
    standard second screen next to the lexical one). ``bench_predicate``
    selects the benchmark rows out of the embeddings table; candidates
    are everything else. Output per candidate: (vec_id, max_sim_r,
    contaminated) — max similarity kept so the threshold is auditable
    and tunable offline.

    Scale shape: the benchmark set BROADCASTS (eval suites are small by
    construction — the same broadcast-the-contaminant posture as the
    n-gram stage) and the candidate side streams map-only through one
    JVM cosine fold per (candidate, bench) pair + ONE vec_id-keyed max
    aggregation; the corpus-sized side never shuffles by anything but
    its own id. Exact — no LSH recall question inside a correctness
    screen; the IVF/PQ lanes remain the fallback if the benchmark side
    ever stops being broadcastable."""
    bench = emb.filter(F.expr(bench_predicate)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    cand = emb.filter(~F.expr(bench_predicate)).select("vec_id", "embedding")
    sims = cand.join(F.broadcast(bench)).withColumn(
        "sim", F.expr(_COS_SQL)
    )
    return (
        sims.groupBy("vec_id")
        .agg(F.round(F.max("sim"), 6).alias("max_sim_r"))
        .select(
            "vec_id",
            "max_sim_r",
            (F.col("max_sim_r") >= threshold).cast("int").alias("contaminated"),
        )
    )

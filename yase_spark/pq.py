"""Product-quantized (PQ) similarity search over the ``embeddings``
table — the memory-compression scale path for ANN.

Why this exists at 100 TB: a 10^10-vector corpus of 768-dim float32
embeddings is ~30 TB of vector payload; brute-force cosine must stream
all of it per query batch. PQ splits each (unit-normalized) vector
into ``m`` subspaces and stores only the nearest-centroid CODE per
subspace (m bytes at ks<=256) — a 100-400x compression — and serves
queries by Asymmetric Distance Computation (ADC): per query, an
(m x ks) table of subspace inner products is computed ONCE driver-side
(tiny), broadcast, and the compressed codes are scanned with pure
numpy table lookups. The scan is memory-bandwidth-bound over the
COMPRESSED bytes; composed with the IVF layout (similarity.ivf_write's
``partitionBy(cid)``) the parquet scan prunes to the probed lists and
the cost is sublinear in the corpus. An exact re-rank (``refine``)
fetches only the top candidates' full vectors — k rows per query, not
the corpus.

Determinism: centroid init is the ks lowest-vec_id subvectors (no
RNG), Lloyd partial sums are reduced in sorted order and rounded per
iteration, and every ranking tie-breaks on vec_id.

Exactness identity (the oracle hook, mirroring IVF's full-probe ==
brute-force): with a SATURATED codebook (ks >= n distinct subvectors)
Lloyd is a fixed point of the init — every subvector IS a centroid, PQ
reconstruction is lossless, and ADC scores equal exact cosine. The
driver-contract row ``ann_pq_topk`` runs that configuration against
the same DuckDB brute-force SQL as the exact operator, validating
train/encode/ADC/rank end-to-end; compressed-regime recall and the
refine contract are pytest-gated (tests/test_pq.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import MAX_PARTIAL_ROWS, bounded_collect


def _norm_rows(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    ks: int = 16,
    iters: int = 5,
    col: str = "embedding",
    normalize: bool = True,
) -> np.ndarray:
    """(m, ks, dim/m) float64 codebooks via per-subspace k-means over
    the (optionally unit-normalized) vectors in ``col``.

    Spark shape: all ``m`` subspaces train in the SAME distributed
    pass — each Lloyd iteration is ONE Arrow-batched job emitting
    (sub, cid, n, subvector-sum) partials (m*ks*P tiny rows), reduced
    driver-side in sorted order. Init: the ks lowest-vec_id vectors'
    subvectors (deterministic).

    ``normalize=False`` trains on the raw vectors — the IVF-PQ path
    uses it for RESIDUALS (x_n - c_coarse), which must not be re-scaled."""
    dim = len(emb.select(col).first()[col])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    init_rows = (
        emb.select("vec_id", col).orderBy("vec_id").limit(ks).collect()
    )
    X0 = np.stack([np.asarray(r[col], dtype=np.float64) for r in init_rows])
    if normalize:
        X0 = _norm_rows(X0)
    # ks may exceed the corpus (tiny tests): pad by repeating the last
    C = np.stack(
        [X0[np.minimum(np.arange(ks), len(X0) - 1), s * dsub : (s + 1) * dsub]
         for s in range(m)]
    )  # (m, ks, dsub)

    for _ in range(iters):
        Cb = C

        def partials(batches):
            import pandas as pd

            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.stack(pdf[col].to_numpy()).astype(np.float64)
                if normalize:
                    X = _norm_rows(X)
                rows = {"sub": [], "cid": [], "n": [], "vsum": []}
                for s in range(m):
                    Xs = X[:, s * dsub : (s + 1) * dsub]
                    # nearest centroid by L2 == argmax(2<x,c> - |c|^2)
                    d2 = (
                        -2.0 * (Xs @ Cb[s].T)
                        + (Cb[s] ** 2).sum(axis=1)[None, :]
                    )
                    cid = np.argmin(d2, axis=1)
                    for c in np.unique(cid):
                        msk = cid == c
                        rows["sub"].append(s)
                        rows["cid"].append(int(c))
                        rows["n"].append(int(msk.sum()))
                        rows["vsum"].append(Xs[msk].sum(axis=0).tolist())
                yield pd.DataFrame(rows)

        got = bounded_collect(
            emb.select(col).mapInPandas(
                partials, schema="sub int, cid int, n long, vsum array<double>"
            ),
            MAX_PARTIAL_ROWS,
            "train_pq_codebooks partial sums",
        )
        sums = np.zeros((m, ks, dsub))
        counts = np.zeros((m, ks), dtype=np.int64)
        for r in sorted(got, key=lambda r: (r["sub"], r["cid"], r["n"], tuple(r["vsum"]))):
            sums[r["sub"], r["cid"]] += np.asarray(r["vsum"])
            counts[r["sub"], r["cid"]] += r["n"]
        C = C.copy()
        nz = counts > 0
        C[nz] = sums[nz] / counts[nz][:, None]
        C = np.round(C, 9)
    return C


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    col: str = "embedding",
    normalize: bool = True,
    keep: tuple = (),
) -> DataFrame:
    """(vec_id, *keep, codes array<int>): nearest subspace centroid per
    block, one Arrow-batched pass. ``codes`` is the m-byte compressed
    payload (int here; a production sink packs it to m uint8/uint16).
    ``keep`` passes extra columns through unchanged (IVF-PQ keeps the
    coarse list id ``cid`` beside the codes)."""
    Cb = codebooks
    m, ks, dsub = Cb.shape

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[col].to_numpy()).astype(np.float64)
            if normalize:
                X = _norm_rows(X)
            codes = np.empty((len(X), m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                d2 = -2.0 * (Xs @ Cb[s].T) + (Cb[s] ** 2).sum(axis=1)[None, :]
                codes[:, s] = np.argmin(d2, axis=1)
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for c in keep:
                out[c] = pdf[c].to_numpy()
            out["codes"] = list(codes)
            yield pd.DataFrame(out)

    keep_schema = "".join(f", {c} int" for c in keep)
    return emb.select("vec_id", *keep, col).mapInPandas(
        enc, schema=f"vec_id long{keep_schema}, codes array<int>"
    )


def pq_ann_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    iters: int = 5,
    refine: int = 0,
) -> DataFrame:
    """PQ/ADC cosine top-k, same output schema as similarity.cosine_topk:
    (query_id, rank, vec_id, sim_r).

    ``refine=0`` ranks by the ADC approximation (sim_r is the ADC
    score, 6 dp). ``refine=R>0`` re-ranks the top k+R ADC candidates by
    EXACT cosine (a k+R-row join per query against the full vectors)
    and reports exact sims — the standard two-stage serving shape.

    Scan shape: the ADC pass reads ONLY (vec_id, codes); each Arrow
    batch scores all queries with two numpy take/sum chains (no Python
    per-row work). Per-query LUTs are (m x ks) doubles — broadcast as a
    closure constant."""
    C = train_pq_codebooks(emb, m=m, ks=ks, iters=iters)
    codes = pq_encode(emb, C)
    mq, ksq, dsub = C.shape

    qrows = bounded_collect(
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .orderBy("vec_id"),
        n_queries,
        "pq query vectors",
    )
    qids = np.array([int(r["vec_id"]) for r in qrows], dtype=np.int64)
    Q = _norm_rows(
        np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    )
    # LUT[q, s, c] = <q_s, C[s, c]>  — ADC inner product table
    LUT = np.einsum("qsd,scd->qsc", Q.reshape(len(Q), mq, dsub), C)

    def adc(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy()
            Cd = np.stack(pdf["codes"].to_numpy())  # (B, m)
            # scores[q, b] = sum_s LUT[q, s, Cd[b, s]]
            take = LUT[:, np.arange(mq)[None, :], Cd]  # (Q, B, m)
            scores = take.sum(axis=2)
            out = {
                "query_id": np.repeat(qids, len(ids)),
                "vec_id": np.tile(ids, len(qids)),
                "asim": scores.reshape(-1),
            }
            yield pd.DataFrame(out)

    scored = (
        codes.mapInPandas(adc, schema="query_id long, vec_id long, asim double")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    return _rank_and_refine(scored, emb, n_queries, k, refine)


def _rank_and_refine(
    scored: DataFrame, emb: DataFrame, n_queries: int, k: int, refine: int
) -> DataFrame:
    """Shared serving tail for the PQ lanes: rank the ADC scores
    (rounded 6 dp, vec_id tiebreak); with ``refine=R>0`` re-rank the
    top k+R candidates by EXACT cosine — a k+R-row join per query
    against the full vectors, the only place uncompressed payload is
    touched."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("asim_r"), F.asc("vec_id")
    )
    take_n = k + refine if refine > 0 else k
    cand = (
        scored.withColumn("asim_r", F.round("asim", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= take_n)
    )
    if refine == 0:
        return cand.select(
            "query_id", "rank", "vec_id", F.col("asim_r").alias("sim_r")
        )
    from .similarity import _COS_SQL

    qe = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    joined = (
        cand.select("query_id", "vec_id")
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qe), "query_id")
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim_r"), F.asc("vec_id"))
    return (
        joined.withColumn("sim_r", F.round(F.expr(_COS_SQL), 6))
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim_r")
    )


def ivf_residuals(emb: DataFrame, coarse: np.ndarray) -> DataFrame:
    """(vec_id, cid, resid): coarse assignment + residual
    ``x_n - c_cid`` in one Arrow-batched pass (no join — the
    assignment and the subtraction share the matmul)."""
    Cb = coarse

    def res(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            X = _norm_rows(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            )
            cid = np.argmax(X @ Cb.T, axis=1)
            R = X - Cb[cid]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cid": cid.astype(np.int32),
                    "resid": list(R),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        res, schema="vec_id long, cid int, resid array<double>"
    )


def ivf_pq_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int | None = None,
    m: int = 8,
    ks: int = 16,
    coarse_iters: int = 3,
    iters: int = 5,
    refine: int = 0,
) -> DataFrame:
    """IVF-PQ cosine top-k — the canonical billion-scale ANN serving
    shape (FAISS IVFPQ): a coarse spherical-k-means quantizer prunes to
    ``nprobe`` inverted lists, and within the probed lists only m-byte
    PQ codes of the RESIDUAL ``x_n - c_coarse`` are scanned.
    ``<q, x_n> = <q, c_cid> + <q, r>``: the first term is one tiny
    (n_queries x n_centroids) driver matrix, the second is the ADC LUT
    lookup over the residual codebooks — both broadcast as closure
    constants, so the scan touches compressed bytes only. At 100 TB the
    codes table is written ``partitionBy(cid)`` (similarity.ivf_write's
    layout) and the probe prunes partitions at the parquet scan; here
    the cid membership is a broadcast join against the probe list.

    Output schema matches :func:`similarity.cosine_topk`.

    Exactness identity (the oracle hook): ``nprobe = n_centroids``
    probes every list (IVF == brute force) and a SATURATED residual
    codebook (ks >= n) reconstructs residuals losslessly, so
    ADC == exact cosine; with ``refine`` the reported sims are exact.
    The driver row ``ann_ivf_pq_topk`` runs that configuration against
    the brute-force SQL oracle; the compressed/pruned regime is
    pytest-gated (tests/test_pq.py)."""
    from .similarity import train_ivf_centroids

    C = train_ivf_centroids(emb, n_centroids, coarse_iters)
    resid = ivf_residuals(emb, C)
    cb = train_pq_codebooks(resid, m=m, ks=ks, iters=iters, col="resid",
                            normalize=False)
    codes = pq_encode(resid, cb, col="resid", normalize=False, keep=("cid",))
    mq, ksq, dsub = cb.shape
    if nprobe is None:
        nprobe = n_centroids
    nprobe = min(nprobe, n_centroids)

    qrows = bounded_collect(
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .orderBy("vec_id"),
        n_queries,
        "pq query vectors",
    )
    qids = np.array([int(r["vec_id"]) for r in qrows], dtype=np.int64)
    Q = _norm_rows(
        np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    )
    OFF = Q @ C.T  # (Q, K): the <q, c_cid> term
    LUT = np.einsum("qsd,scd->qsc", Q.reshape(len(Q), mq, dsub), cb)
    qpos = {int(q): i for i, q in enumerate(qids)}

    pairs = [
        (int(q), int(c))
        for i, q in enumerate(qids)
        for c in np.argsort(-OFF[i], kind="stable")[:nprobe]
    ]
    spark = emb.sparkSession
    probe_df = spark.createDataFrame(pairs, schema="query_id long, cid int")

    joined = codes.join(F.broadcast(probe_df), "cid").filter(
        F.col("vec_id") != F.col("query_id")
    )

    def adc(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            qi = np.array([qpos[q] for q in pdf["query_id"]], dtype=np.int64)
            Cd = np.stack(pdf["codes"].to_numpy())  # (B, m)
            take = LUT[qi[:, None], np.arange(mq)[None, :], Cd]  # (B, m)
            asim = take.sum(axis=1) + OFF[qi, pdf["cid"].to_numpy()]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "asim": asim,
                }
            )

    scored = joined.select("query_id", "vec_id", "cid", "codes").mapInPandas(
        adc, schema="query_id long, vec_id long, asim double"
    )
    return _rank_and_refine(scored, emb, n_queries, k, refine)


def ivfpq_write(
    emb: DataFrame,
    root: str,
    n_centroids: int = 16,
    m: int = 8,
    ks: int = 16,
    coarse_iters: int = 3,
    iters: int = 5,
):
    """Materialize an IVF-PQ index: the CODES table written
    ``partitionBy(cid)`` (one directory per inverted list, holding only
    vec_id + m-byte codes — the full vectors stay in the source table,
    touched only by the re-rank) plus centroids and residual codebooks
    as JSON. This is the at-rest layout that makes a probe read
    ``nprobe/K`` of the COMPRESSED bytes: the cid filter prunes whole
    partitions at the parquet scan (plan-gated in tests/test_pq.py).
    Returns (coarse_centroids, codebooks)."""
    import json as _json
    import os

    from .similarity import train_ivf_centroids

    C = train_ivf_centroids(emb, n_centroids, coarse_iters)
    resid = ivf_residuals(emb, C)
    cb = train_pq_codebooks(
        resid, m=m, ks=ks, iters=iters, col="resid", normalize=False
    )
    codes = pq_encode(resid, cb, col="resid", normalize=False, keep=("cid",))
    codes.write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(root, "codes")
    )
    with open(os.path.join(root, "centroids.json"), "w") as f:
        _json.dump([[float(x) for x in row] for row in C], f)
    with open(os.path.join(root, "codebooks.json"), "w") as f:
        _json.dump(
            [[[float(x) for x in c] for c in sub] for sub in cb], f
        )
    return C, cb


def ivfpq_read_topk(
    spark,
    emb: DataFrame,
    root: str,
    n_queries: int = 8,
    k: int = 10,
    nprobe: int | None = None,
    refine: int = 0,
) -> DataFrame:
    """Serve ANN from a materialized IVF-PQ index: probe the queries'
    ``nprobe`` nearest lists ONLY — the cid predicate reaches the codes
    scan as a partition filter, so unprobed lists cost zero IO, and the
    scanned bytes are the m-byte codes, not vectors. ``emb`` is the
    source vector table, used for the query vectors and (with
    ``refine``) the exact re-rank slice. Full probe + saturated
    codebook equals brute force (same identity as ``ivf_pq_topk``)."""
    import json as _json
    import os

    with open(os.path.join(root, "centroids.json")) as f:
        C = np.asarray(_json.load(f))
    with open(os.path.join(root, "codebooks.json")) as f:
        cb = np.asarray(_json.load(f))
    codes = spark.read.parquet(os.path.join(root, "codes"))
    mq, ksq, dsub = cb.shape
    K = C.shape[0]
    if nprobe is None:
        nprobe = K
    nprobe = min(nprobe, K)

    qrows = bounded_collect(
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .orderBy("vec_id"),
        n_queries,
        "pq query vectors",
    )
    qids = np.array([int(r["vec_id"]) for r in qrows], dtype=np.int64)
    Q = _norm_rows(
        np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    )
    OFF = Q @ C.T
    LUT = np.einsum("qsd,scd->qsc", Q.reshape(len(Q), mq, dsub), cb)
    qpos = {int(q): i for i, q in enumerate(qids)}
    pairs = [
        (int(q), int(c))
        for i, q in enumerate(qids)
        for c in np.argsort(-OFF[i], kind="stable")[:nprobe]
    ]
    probe_df = spark.createDataFrame(pairs, schema="query_id long, cid int")
    probed = sorted({c for _, c in pairs})

    # the isin predicate prunes partitions at the scan; per-query probe
    # membership is the broadcast join
    joined = (
        codes.filter(F.col("cid").isin(probed))
        .join(F.broadcast(probe_df), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
    )

    def adc(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            qi = np.array([qpos[q] for q in pdf["query_id"]], dtype=np.int64)
            Cd = np.stack(pdf["codes"].to_numpy())
            take = LUT[qi[:, None], np.arange(mq)[None, :], Cd]
            asim = take.sum(axis=1) + OFF[qi, pdf["cid"].to_numpy()]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "asim": asim,
                }
            )

    scored = joined.select("query_id", "vec_id", "cid", "codes").mapInPandas(
        adc, schema="query_id long, vec_id long, asim double"
    )
    return _rank_and_refine(scored, emb, n_queries, k, refine)

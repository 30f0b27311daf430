"""Mergeable-sketch analytics (sketches.py): HLL cardinality,
Misra-Gries + exact-pass heavy hitters, KMV bottom-k.

Gates: the HLL register math is replayed bit-for-bit by DuckDB over
the SAME generated SQL (bucket/rho/bit-length ladder) and the estimate
lands within the theoretical error band of the exact count; the
heavy-hitter output is LITERALLY every term with freq > phi*n (set
equality vs an exact groupBy, on a skewed corpus where the candidate
sketch genuinely evicts); the MG fold obeys the count >= true - n/k
guarantee on an adversarial stream; KMV rows equal the SQL bottom-k,
merge-of-parts equals sketch-of-whole, and the estimator lands within
its error band.
"""

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from yase_spark.sketches import (
    H_BITS,
    HLL_P,
    _bits_sql,
    _mg_fold,
    heavy_hitters,
    hll_cardinality,
    hll_register_sql,
    kmv_bottomk,
    kmv_estimate,
)


def test_bits_sql_exact(spark):
    vals = [0, 1, 2, 3, 4, 7, 8, 255, 256, (1 << 51) - 1, 1 << 51]
    sdf = spark.createDataFrame([(v,) for v in vals], "w long")
    got = {
        r["w"]: r["b"]
        for r in sdf.select("w", F.expr(_bits_sql("w", 52)).alias("b")).collect()
    }
    con = duckdb.connect()
    dk = dict(
        con.execute(
            f"SELECT w, {_bits_sql('w', 52)} FROM (SELECT unnest(?) AS w)",
            [vals],
        ).fetchall()
    )
    for v in vals:
        want = v.bit_length()
        assert got[v] == want, v
        assert dk[v] == want, v


def test_hll_registers_cross_engine(spark):
    """The (bucket, max rho) register table is identical in Spark and
    DuckDB — the property that makes the estimate full-oracle."""
    words = [f"w{i}" for i in range(500)]
    sdf = spark.createDataFrame([(w,) for w in words], "v string")
    bucket, rho = hll_register_sql("v")
    got = sorted(
        (r["b"], r["m"])
        for r in sdf.select(
            F.expr(bucket).alias("b"), F.expr(rho).alias("r")
        ).groupBy("b").agg(F.max("r").alias("m")).collect()
    )
    dbucket, drho = hll_register_sql("v", dialect="duckdb")
    con = duckdb.connect()
    dk = sorted(
        con.execute(
            f"SELECT {dbucket} AS b, max({drho}) FROM "
            "(SELECT unnest(?) AS v) GROUP BY 1",
            [words],
        ).fetchall()
    )
    assert got == [(int(b), int(m)) for b, m in dk]
    # rho stays inside its field width
    assert all(1 <= m <= (H_BITS - HLL_P + 1) for _b, m in got)
    assert all(0 <= b < (1 << HLL_P) for b, _m in got)


@pytest.mark.parametrize("n_distinct", [40, 2000])
def test_hll_estimate_error_band(spark, n_distinct):
    rows = [(i % n_distinct, f"val{i % n_distinct}") for i in range(3 * n_distinct)]
    sdf = spark.createDataFrame(rows, "g long, v string").withColumn(
        "grp", F.lit("all")
    )
    out = hll_cardinality(sdf, "grp", "v").collect()
    assert len(out) == 1
    est = out[0]["est_r"]
    # 256 registers: standard error ~6.5%; 5 sigma is a safe gate
    assert abs(est - n_distinct) <= max(5 * 0.065 * n_distinct, 10), est


def test_mg_fold_guarantee():
    rng = random.Random(5)
    stream = (
        ["hot"] * 400 + ["warm"] * 150
        + [f"noise{rng.randrange(500)}" for _ in range(450)]
    )
    rng.shuffle(stream)
    k = 20
    counts: dict = {}
    # fold in uneven chunks to exercise the weighted reduction
    i = 0
    while i < len(stream):
        j = min(len(stream), i + rng.randrange(1, 97))
        chunk = stream[i:j]
        items = sorted(set(chunk))
        _mg_fold(counts, items, [chunk.count(x) for x in items], k)
        i = j
    assert len(counts) <= k
    n = len(stream)
    true = {"hot": 400, "warm": 150}
    for t, c in true.items():
        if c > n / k:
            assert t in counts, t
            assert counts[t] >= c - n / k  # the MG undercount bound
            assert counts[t] <= c


def test_heavy_hitters_exact_on_skew(spark):
    # vocabulary far larger than 1/phi so MG genuinely evicts; two
    # planted heavies
    rng = random.Random(11)
    docs = []
    for d in range(60):
        toks = (
            ["hot"] * 30 + ["warm"] * 12
            + [f"n{rng.randrange(3000)}" for _ in range(60)]
        )
        rng.shuffle(toks)
        docs.append((d, " ".join(toks)))
    sdf = spark.createDataFrame(docs, "doc_id long, text string").repartition(8)
    phi = 0.05
    got = [(r["term"], r["cnt"]) for r in heavy_hitters(sdf, "[^a-z0-9]+", phi).collect()]
    # exact replay
    toks = [t for _d, txt in docs for t in txt.split()]
    n = len(toks)
    from collections import Counter

    cnt = Counter(toks)
    want = sorted(
        ((t, c) for t, c in cnt.items() if c > phi * n),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert got == want
    assert [t for t, _c in got] == ["hot", "warm"]
    with pytest.raises(ValueError):
        heavy_hitters(sdf, "[^a-z0-9]+", 0.0)


def test_kmv_bottomk_and_merge(spark):
    docs = spark.createDataFrame(
        [(i, f"k{i}") for i in range(1000)], "doc_id long, key string"
    )
    k = 32
    got = kmv_bottomk(docs, "key", k=k).collect()
    assert len(got) == k
    assert [r["rank"] for r in got] == list(range(1, k + 1))
    hs = [r["h"] for r in got]
    assert hs == sorted(hs)
    # oracle: SQL bottom-k over the same md5-60 hash
    con = duckdb.connect()
    want = con.execute(
        "SELECT key, cast(concat('0x', substring(md5(key), 1, 15)) as bigint) h "
        "FROM (SELECT 'k' || cast(unnest(range(1000)) as varchar) AS key) "
        "ORDER BY h LIMIT 32"
    ).fetchall()
    assert [(r["key"], r["h"]) for r in got] == [(a, int(b)) for a, b in want]
    # mergeability: bottom-k of two halves' sketches == whole sketch
    a = kmv_bottomk(docs.filter("doc_id % 2 = 0"), "key", k=k).collect()
    b = kmv_bottomk(docs.filter("doc_id % 2 = 1"), "key", k=k).collect()
    merged = sorted([r["h"] for r in a] + [r["h"] for r in b])[:k]
    assert merged == hs
    # estimator error band: KMV with k=32 has rel err ~1/sqrt(k-2)
    est = kmv_estimate(got, k)
    assert abs(est - 1000) <= 5 * 1000 / math.sqrt(k - 2)
    # under-k sketch is exact
    few = kmv_bottomk(docs.filter("doc_id < 5"), "key", k=k).collect()
    assert kmv_estimate(few, k) == 5.0


def test_sampled_percentiles(spark):
    import hashlib

    rows = [(i, "g" + str(i % 2), float((i * 37) % 1000)) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, grp string, v double")
    from yase_spark.sketches import sampled_percentiles

    k = 64
    got = {
        (r["grp"], r["p"]): (r["value"], r["sample_n"])
        for r in sampled_percentiles(
            docs, "grp", "v", [0.5, 0.9], k=k
        ).collect()
    }
    # python replay: same md5-60 bottom-k sample, same rank pick
    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    import math as _m

    for g in ("g0", "g1"):
        vals = [(h60(str(i)), v) for i, gg, v in rows if gg == g]
        vals.sort()
        samp = sorted((v, h) for h, v in vals[:k])
        n = len(samp)
        for p in (0.5, 0.9):
            want = samp[max(1, _m.ceil(p * n)) - 1][0]
            assert got[(g, p)] == (want, n), (g, p)
            # sample quantile within ~5/sqrt(k) of the true quantile
            true_sorted = sorted(v for _h, v in vals)
            t = true_sorted[max(1, _m.ceil(p * len(true_sorted))) - 1]
            assert abs(want - t) <= 5.0 / (k ** 0.5) * 1000
    # k >= group size degenerates to the exact discrete percentile
    exact = {
        (r["grp"], r["p"]): r["value"]
        for r in sampled_percentiles(
            docs, "grp", "v", [0.5], k=10_000
        ).collect()
    }
    for g in ("g0", "g1"):
        vs = sorted(v for _i, gg, v in rows if gg == g)
        assert exact[(g, 0.5)] == vs[max(1, _m.ceil(0.5 * len(vs))) - 1]
    import pytest as _pt

    with _pt.raises(ValueError):
        sampled_percentiles(docs, "grp", "v", [1.5])
    with _pt.raises(ValueError):
        sampled_percentiles(docs, "grp", "v", [0.5], k=0)

"""Near-duplicate detection over the ``documents`` table (LLM-pipeline
operators: exact n-gram Jaccard, MinHash+LSH banding, SimHash).

Spark-first design:

* shingling / hashing / banding are JVM column expressions (codegen) —
  the only Python kernel is the MinHash signature fold (Arrow-batched
  numpy, one pass per batch);
* candidate generation NEVER does all-pairs: exact Jaccard joins on the
  shingle (inverted-index join), MinHash joins on (band, signature), and
  SimHash joins on 15-bit bands (pigeonhole-exact for hamming <= 3);
* every candidate pair is then verified exactly, so results equal the
  brute-force definition (probabilistic recall only for MinHash, whose
  banding parameters are pinned to make misses vanishingly rare —
  P(miss) = (1-j)^128 < 2e-6 at j >= 0.1).

At 10^12-doc scale the exact shingle join is the component to swap out
(common shingles explode the join); MinHash/LSH and SimHash banding are
the scale paths — their shuffle keys are (band, hash) with bounded
bucket sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WORD_RE = "[A-Za-z0-9_]+"


def doc_words(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.expr(f"regexp_extract_all(text, '{WORD_RE}', 0)").alias("w")
    )


def doc_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, sh: array<string>) — distinct k-word shingles."""
    return doc_words(docs).select(
        "doc_id",
        F.when(
            F.size("w") >= k,
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, size(w)-{k}), "
                    f"i -> concat_ws(' ', slice(w, i+1, {k})))"
                )
            ),
        ).otherwise(F.expr("array()")).alias("sh"),
    )


def _verify_pairs(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard for candidate (doc_a, doc_b) pairs via array
    intersection on the shingle sets (JVM)."""
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb"))
    return (
        cand.join(a, "doc_a").join(b, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jaccard",
            F.col("inter") * 1.0 / (F.size("sa") + F.size("sb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.1) -> DataFrame:
    """EXACT near-dup pairs: k-shingle Jaccard >= threshold.

    Inverted-index join on the shingle (pairs only where sets overlap),
    then count-based Jaccard. Exact and oracle-checkable; the scale
    limitation (hot shingles) is what minhash_lsh_pairs addresses.
    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    sh = doc_shingles(docs, k)
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    sizes = sh.select("doc_id", F.size("sh").alias("n"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), "s")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("inter") * 1.0 / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame, k: int = 3, num_perm: int = 128, seed: int = 42
) -> DataFrame:
    """(doc_id, band, sig) rows: MinHash signature per permutation.

    Shingle base hashes are computed JVM-side (xxhash64); the per-doc
    min-fold over permutations is one Arrow-batched numpy kernel
    (outer xor + splitmix finalizer + column min) — no per-row Python.
    """
    import numpy as np
    import pandas as pd

    hashed = doc_shingles(docs, k).select(
        "doc_id", F.expr("transform(sh, s -> xxhash64(s))").alias("hs")
    )

    def mix64(x: np.ndarray) -> np.ndarray:
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    seeds = mix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(seed * 2 + 1))

    def sig(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out_doc, out_band, out_sig = [], [], []
            for doc_id, hs in zip(pdf["doc_id"], pdf["hs"]):
                if hs is None or len(hs) == 0:
                    continue
                h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                s = mix64(h[:, None] ^ seeds[None, :]).min(axis=0)
                out_doc.append(np.full(num_perm, doc_id, dtype=np.int64))
                out_band.append(np.arange(num_perm, dtype=np.int32))
                out_sig.append(s.astype(np.int64))
            if out_doc:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(out_doc),
                        "band": np.concatenate(out_band),
                        "sig": np.concatenate(out_sig),
                    }
                )

    return hashed.mapInPandas(sig, schema="doc_id long, band int, sig long")


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.1,
    num_perm: int = 128,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MinHash+LSH banding (rows-per-band = 1,
    128 bands), exact-verified: candidates are pairs agreeing on ANY
    band signature; every candidate's true Jaccard is then computed and
    thresholded, so precision is exact and recall misses require all
    128 independent minhashes to differ (P < 2e-6 at j = threshold).
    Output schema identical to :func:`jaccard_pairs`."""
    sigs = minhash_signatures(docs, k, num_perm, seed)
    cand = (
        sigs.alias("a")
        .join(sigs.alias("b"), ["band", "sig"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return _verify_pairs(cand, doc_shingles(docs, k), threshold)


# ----------------------------------------------------------------- simhash
# 60-bit simhash from the md5-based word hash (cast of the first 15 hex
# chars — the SAME expression is available in DuckDB, giving cross-engine
# hash parity for the oracle).
H60_SQL = "cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint)"


def simhash_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): tf-weighted 60-bit simhash over words.

    One hash-aggregation with 60 sum expressions (one per bit counter)
    instead of a 60x bit-position row explode: each input row folds into
    the per-doc partial aggregate map-side, so shuffle volume is one row
    per doc regardless of bit width — the explode variant shuffled 60
    rows per (doc, term). Same results; stays in whole-stage codegen."""
    tok = (
        doc_words(docs)
        .select("doc_id", F.explode("w").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.expr(H60_SQL.format(col="t")))
    )
    counters = tok.groupBy("doc_id").agg(
        *[
            F.sum(F.expr(f"tf * (((h >> {j}) & 1) * 2 - 1)")).alias(f"s{j}")
            for j in range(60)
        ]
    )
    bit_terms = " + ".join(
        f"(case when s{j} > 0 then shiftleft(cast(1 as bigint), {j}) else 0L end)"
        for j in range(60)
    )
    return counters.select("doc_id", F.expr(bit_terms).alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs with simhash hamming distance <= max_hamming, found via
    4-band pigeonhole (15-bit bands of the 60-bit hash): any pair within
    hamming 3 agrees exactly on >= 1 band, so banding is EXACT here, not
    probabilistic. Output (doc_a, doc_b, hamming)."""
    assert max_hamming <= 3, "4-band pigeonhole is exact only for hamming <= 3"
    sims = simhash_docs(docs)
    bands = sims.select(
        "doc_id", "simhash",
        F.explode(F.expr("sequence(0, 3)")).alias("b"),
    ).withColumn("band_val", F.expr("(simhash >> (b * 15)) & 32767"))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["b", "band_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(sa ^ sb)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )

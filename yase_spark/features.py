"""ML feature export from the inverted index.

``tfidf_vectors`` turns the index back into the sparse doc-term matrix
a downstream trainer consumes — (doc_id, term, tfidf) rows, equivalent
to re-tokenizing the corpus but computed FROM THE INDEX: the postings
already hold (doc, tf, dl) per term, so the export never touches
content (at 100 TB the index is ~1-2 % of the corpus bytes) and
inherits the index's dedup/tombstone semantics for free.

Weighting: the classic raw-count formulation ``tf * ln(n_docs / df)``
(df > 0 for every indexed term, so the log is total). Swap-in point
for l2-normalized or sublinear-tf variants is the single expression in
the select.

Scale shape: ONE map-only decode pass over the segment rows (the same
mapInPandas shape as the cluster contribution lane) joined to the
dictionary-sized per-term df table with an explicit broadcast — no
corpus-sized shuffle anywhere; the per-term df aggregation shuffles
only (term, df) pairs. Output order is unspecified (it is a feature
TABLE, not a ranking).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .codec import decode_postings


def tfidf_vectors(reader) -> DataFrame:
    """Sparse TF-IDF doc-term matrix (doc_id, term, tfidf_r) from an
    ``IndexReader``'s segments — tombstoned docs excluded, tfidf
    rounded to 6 dp (the cross-engine comparison convention)."""
    segs = reader._segments.select("term", "df", "n", "payload")
    n_docs = reader.n_docs
    bdel = (
        reader.spark.sparkContext.broadcast(reader._deleted)
        if reader._deleted is not None
        else None
    )

    def explode(batches):
        import pandas as pd

        for pdf in batches:
            terms, docs, tfs_l = [], [], []
            for r in pdf.itertuples():
                ids, tfs, _dls = decode_postings(bytes(r.payload), int(r.n))
                if bdel is not None:
                    keep = ~np.isin(ids, bdel.value, assume_unique=True)
                    ids, tfs = ids[keep], tfs[keep]
                terms.append(np.full(ids.size, r.term, dtype=object))
                docs.append(ids)
                tfs_l.append(tfs.astype(np.int64))
            if terms:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(terms),
                        "doc_id": np.concatenate(docs),
                        "tf": np.concatenate(tfs_l),
                    }
                )

    tf = segs.mapInPandas(explode, schema="term string, doc_id long, tf long")
    # segment rows carry the TERM-GLOBAL df duplicated per shard row
    # (postings.py:378), so any-value aggregation recovers it — a
    # dictionary-sized agg
    dfs = segs.groupBy("term").agg(F.max("df").alias("t_df"))
    return tf.join(F.broadcast(dfs), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("t_df")), 6
        ).alias("tfidf_r"),
    )


def sparse_vector_topk(
    docs, query_weights: dict[str, float], k: int = 15,
    split: str = "[^a-z0-9]+",
):
    """ES ``sparse_vector`` query (the learned-sparse / ELSER serving
    shape, 8.15+): both sides are term->weight maps and the score is
    their dot product. The engine-checkable deterministic core derives
    the DOCUMENT weights from the corpus itself — ``w_d(t) =
    ln(1 + tf(t, d))`` (the classic sublinear tf, an explicit
    expression any SQL engine replays) — and takes the QUERY weights
    as given (in ES they come from the text-expansion model; weights
    are data, not code, so the serving topology is identical).

    Scale shape: the query map is request-sized and broadcast; the
    corpus token stream reduces to (doc, term in query) tf rows —
    at 100 TB this is a bucket-pruned postings fetch, cost ∝ the
    matched terms' lists, never a corpus scan — then ONE doc-keyed
    weighted sum and a TakeOrderedAndProject cap. Exactly the BM25
    contribution lane with a different per-term expression, which is
    the point: learned-sparse serving reuses the inverted-index
    machinery (that is why ES ships it on Lucene).

    Output: (rank, doc_id, score_r) — score DESC, doc_id ASC, rounded
    at the contract boundary."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    if not query_weights:
        raise ValueError("query_weights must be non-empty")
    from functools import reduce as _reduce

    spark = docs.sparkSession
    items = sorted((t, float(w)) for t, w in query_weights.items())
    # exact BIGINT ranking key on both lanes: each per-term product (a
    # deterministic scalar over an exact integer tf) is rounded to 6dp
    # and lifted to integer micro-units BEFORE the per-doc sum —
    # integer addition is associative, so the ranking is invariant
    # under partial-agg merge order, evaluation lane, and engine (same
    # device as similarity.maxsim_topk; the float-sum ulp-straddle
    # class cannot occur here). A zero tf contributes round(qw*ln(1))
    # = 0 exactly, so summing over ALL query terms (map-side lane)
    # equals summing over matched terms only (join lane).
    if len(items) <= 16:
        # request-sized query map: per-term tf is a MAP-SIDE array
        # count over the doc's token array — no shuffle at all before
        # the TakeOrdered cap (O(|q|·tokens) per doc; the join lane
        # below stays the shape for large learned-sparse expansions,
        # where one token pass + a matched-row shuffle beats |q|
        # array scans)
        warr = F.filter(F.split(F.lower("text"), split), lambda x: x != "")
        base = docs.select("doc_id", warr.alias("w"))

        def _eq(term):
            # single-arg closure: a two-parameter lambda (even with a
            # default) is treated by PySpark as an (element, index)
            # function and would bind the index over the term
            lit = F.lit(term)
            return lambda x: x == lit

        tfs = [F.size(F.filter(F.col("w"), _eq(t))) for t, _ in items]
        contribs = [
            F.round(
                F.lit(qwv) * F.log(F.lit(1.0) + tf.cast("double")) * 1e6, 0
            ).cast("long")
            for (_, qwv), tf in zip(items, tfs)
        ]
        matched = _reduce(
            lambda a, b: a + b, [(tf >= 1).cast("int") for tf in tfs]
        )
        scored = (
            base.select(
                "doc_id",
                _reduce(lambda a, b: a + b, contribs).alias("score_u6"),
                matched.alias("_m"),
            )
            .filter(F.col("_m") >= 1)
            .select("doc_id", "score_u6")
        )
    else:
        qw = spark.createDataFrame(items, "term string, qw double")
        tf = (
            docs.select(
                "doc_id", F.explode(F.split(F.lower("text"), split)).alias("term")
            )
            .filter(F.col("term") != "")
            .join(F.broadcast(qw), "term")
            .groupBy("doc_id", "term", "qw")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        scored = tf.groupBy("doc_id").agg(
            F.sum(
                F.round(
                    F.col("qw")
                    * F.log(F.lit(1.0) + F.col("tf").cast("double"))
                    * 1e6,
                    0,
                ).cast("long")
            ).alias("score_u6")
        )
    w = Window.orderBy(F.desc("score_u6"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("score_u6"), F.asc("doc_id"))
        .limit(int(k))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "rank",
            "doc_id",
            F.round(F.col("score_u6") / 1e6, 6).alias("score_r"),
        )
    )

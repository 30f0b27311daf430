"""Term co-occurrence mining: related terms for a seed (query-expansion
candidates) and corpus-wide collocations (PMI-ranked adjacent bigrams).

Lucene/Elastic analogue: the ``significant_terms`` aggregation (a
foreground doc set scored against the background corpus) and shingle
collocation mining. Both operators are deterministic and one-shuffle:

* ``related_terms(docs, seed, dictionary=None)`` — doc-level PMI of
  every term against ``seed``: pmi = ln(c_xy * N / (c_x * c_seed))
  over DISTINCT-per-doc terms. The foreground set (docs containing
  ``seed``) has df(seed) rows — at 100 TB the doc-id list comes out of
  the inverted index, the corpus join is a semi-join on doc_id, and
  the background df column comes from the published ``dictionary``
  table instead of a second corpus pass (pass it via ``dictionary``;
  recomputed from ``docs`` only when absent). Every count is an exact
  integer; only the final pmi is floating (rounded by callers).
* ``collocations(docs)`` — adjacent-bigram PMI over the filtered token
  stream (the same empty-dropped positions the phrase index stores):
  pmi = ln((c_ab/T) / ((c_a/U) * (c_b/U))), c_ab bigram count, T total
  bigrams, c_* unigram occurrences, U total tokens. One
  explode+groupBy per granularity, all map-side-combinable; the
  ranking shuffle moves only the surviving (bigram, count) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPLIT = "[^a-z0-9]+"


def _rank_top(scored: DataFrame, order, k: int, cols: list[str]) -> DataFrame:
    """Global top-k with a rank column, shuffle-safely: the cap runs as
    TakeOrderedAndProject (per-partition heaps, no global sort), and the
    single-partition ranking window only ever sees the k survivors."""
    from pyspark.sql import Window

    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(*cols)


def related_terms(
    docs: DataFrame,
    seed: str,
    dictionary: DataFrame | None = None,
    k: int = 20,
    min_pair: int = 2,
) -> DataFrame:
    """Top-``k`` terms by doc-level PMI with ``seed``.

    Output: (rank, term, c_xy, df, pmi_r) — c_xy docs containing both,
    df docs containing the term, pmi_r = round(pmi, 5). The seed never
    reports itself; ties rank by pmi DESC, term ASC. ``dictionary`` is
    an optional (term, df) background table (the index's published
    dictionary) that replaces the background aggregation.

    Shape: per-doc distinct happens MAP-SIDE (array_distinct before the
    explode — the r5 corpus-wide ``.distinct()`` paid a full token
    shuffle, and its subtree was re-evaluated for the seed-doc probe
    and the seed count on top of the pair join, three shuffles of the
    same stream); the seed-doc set is a map-only array_contains filter.
    """
    from .aggs import distinct_tokens

    warr = distinct_tokens(SPLIT)
    toks = docs.select("doc_id", F.explode(warr).alias("term"))
    seed_docs = docs.select("doc_id", warr.alias("w")).filter(
        F.array_contains("w", seed)
    ).select("doc_id")
    pairs = (
        toks.join(seed_docs, "doc_id")
        .filter(F.col("term") != seed)
        .groupBy("term")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= min_pair)
    )
    bg = (
        dictionary
        if dictionary is not None
        else toks.groupBy("term").agg(F.count("*").alias("df"))
    )
    totals = docs.agg(F.count("*").alias("n_docs"))
    seed_df = seed_docs.agg(F.count("*").alias("c_seed"))
    scored = (
        pairs.join(bg, "term")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(seed_df))
        .select(
            "term",
            "c_xy",
            "df",
            F.round(
                F.log(F.col("c_xy") * F.col("n_docs") / (F.col("df") * F.col("c_seed"))),
                5,
            ).alias("pmi_r"),
        )
    )
    return _rank_top(
        scored, [F.desc("pmi_r"), F.asc("term")], k,
        ["rank", "term", "c_xy", "df", "pmi_r"],
    )


def collocations(docs: DataFrame, k: int = 20, min_count: int = 3) -> DataFrame:
    """Top-``k`` adjacent bigrams by PMI over the filtered token stream.

    Output: (rank, bigram, c_ab, pmi_r); bigram is "a b". Bigrams span
    the empty-filtered stream (so "x, y" and "x y" collocate the same
    way the phrase index sees them) and never cross doc boundaries.
    """
    w = F.split(F.lower("text"), SPLIT)
    toks = docs.select(F.filter(w, lambda t: t != "").alias("w"))
    # adjacent pairs via arrays_zip of two shifted slices — the lambda
    # touches only its own variable (an index-the-array lambda gets the
    # tokenizer inlined into per-element evaluation under the pushed
    # explode filter: see neardup.doc_shingle_hashes); explode_outer
    # keeps the inferred filter from building the gram array twice
    # greatest(size-1, 0): slice() THROWS on a negative length, so
    # empty/one-token docs must clamp to an empty slice (they emit no
    # bigram either way — the r5 index lambda's out-of-range NULLs
    # never survived the unigram joins)
    grams = toks.select(
        F.explode_outer(
            F.expr(
                "transform(arrays_zip("
                "slice(w, 1, greatest(size(w) - 1, 0)), "
                "slice(w, 2, greatest(size(w) - 1, 0))), "
                "t -> concat(t.`0`, ' ', t.`1`))"
            )
        ).alias("bigram")
    ).filter(F.col("bigram").isNotNull())
    uni = (
        toks.select(F.explode("w").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    big = (
        grams.groupBy("bigram")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    totals = (
        toks.agg(
            F.sum(F.size("w")).alias("u_tokens"),
            F.sum(F.greatest(F.size("w") - 1, F.lit(0))).alias("t_bigrams"),
        )
    )
    a = uni.select(F.col("term").alias("ta"), F.col("c").alias("c_a"))
    b = uni.select(F.col("term").alias("tb"), F.col("c").alias("c_b"))
    scored = (
        big.withColumn("ta", F.split("bigram", " ")[0])
        .withColumn("tb", F.split("bigram", " ")[1])
        .join(a, "ta")
        .join(b, "tb")
        .crossJoin(F.broadcast(totals))
        .select(
            "bigram",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("t_bigrams"))
                    / ((F.col("c_a") / F.col("u_tokens")) * (F.col("c_b") / F.col("u_tokens")))
                ),
                5,
            ).alias("pmi_r"),
        )
    )
    return _rank_top(
        scored, [F.desc("pmi_r"), F.asc("bigram")], k,
        ["rank", "bigram", "c_ab", "pmi_r"],
    )


def significant_terms(
    docs: DataFrame, predicate: str, k: int = 20, min_fg_df: int = 2
) -> DataFrame:
    """Elasticsearch ``significant_terms``: terms OVERREPRESENTED in a
    metadata slice (the foreground, ``docs WHERE predicate``) relative
    to the whole corpus, JLH-scored::

        score = (fg% - bg%) * (fg% / bg%)
        fg%   = fg_df / n_fg        bg% = df / n_docs

    (ES's background includes the foreground — same convention here.)
    Output: (rank, term, fg_df, df, score_r) with score rounded to 6
    and the (score DESC, term ASC) tie-break; terms below ``min_fg_df``
    foreground docs or at/below background rate are dropped (noise and
    negatively-associated terms are not "significant").

    Scale shape: ONE pass over the distinct-per-doc token stream with a
    conditional aggregate — fg_df and df come out of the same
    map-side-combinable groupBy, so adding the slice costs nothing over
    a plain df aggregation; the two scalar totals are broadcast. The
    ranking cap is TakeOrderedAndProject (per-partition heaps).
    """
    tallies, totals = _sig_tallies(docs, predicate)
    return _sig_rank(tallies, totals, k, min_fg_df)


def significant_text(
    docs: DataFrame, fg_ids: DataFrame, k: int = 20, min_fg_df: int = 2
) -> DataFrame:
    """ES ``significant_text``: ``significant_terms`` with the
    foreground defined by a QUERY's match set (a doc_id frame — the
    ``search_df`` output) instead of a metadata predicate — "what words
    distinguish the documents this query matches". Same JLH scoring,
    ordering, and output shape as ``significant_terms``.

    Scale shape: the foreground flag attaches with ONE doc_id-keyed
    left join (match sets are doc_id frames, never collected), then the
    identical one-pass conditional aggregate — fg_df and df still come
    out of the same map-side-combinable groupBy."""
    flagged = (
        docs.select("doc_id", "text")
        .join(
            fg_ids.select("doc_id").distinct().withColumn("fg", F.lit(True)),
            "doc_id",
            "left",
        )
        .withColumn("fg", F.coalesce("fg", F.lit(False)))
    )
    tallies, totals = _sig_tallies_flagged(flagged)
    return _sig_rank(tallies, totals, k, min_fg_df)


def _sig_tallies(docs: DataFrame, predicate: str):
    """Per-corpus (term, fg_df, df) tallies and (n_docs, n_fg) totals —
    the additive pieces both the single-corpus and the federated
    significant-terms paths aggregate."""
    flagged = docs.select(
        "doc_id", "text", F.expr(f"({predicate})").cast("boolean").alias("fg")
    )
    return _sig_tallies_flagged(flagged)


def _sig_tallies_flagged(flagged: DataFrame):
    toks = (
        flagged.select(
            "doc_id",
            "fg",
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower("text"), SPLIT), lambda t: t != ""
                    )
                )
            ).alias("term"),
        )
    )
    tallies = toks.groupBy("term").agg(
        F.sum(F.when(F.col("fg"), 1).otherwise(0)).alias("fg_df"),
        F.count("*").alias("df"),
    )
    totals = flagged.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("fg"), 1).otherwise(0)).alias("n_fg"),
    )
    return tallies, totals


def _sig_rank(
    tallies: DataFrame, totals: DataFrame, k: int, min_fg_df: int
) -> DataFrame:
    fg_rate = F.col("fg_df") / F.col("n_fg")
    bg_rate = F.col("df") / F.col("n_docs")
    scored = (
        tallies.crossJoin(F.broadcast(totals))
        .filter((F.col("fg_df") >= min_fg_df) & (fg_rate > bg_rate))
        .select(
            "term",
            "fg_df",
            "df",
            F.round((fg_rate - bg_rate) * (fg_rate / bg_rate), 6).alias(
                "score_r"
            ),
        )
    )
    return _rank_top(
        scored, [F.desc("score_r"), F.asc("term")], k,
        ["rank", "term", "fg_df", "df", "score_r"],
    )


def significant_terms_federated(
    shards: list[DataFrame], predicate: str, k: int = 20, min_fg_df: int = 2
) -> DataFrame:
    """Cross-shard ``significant_terms`` — exact, because every input to
    the JLH score is an INTEGER count additive over disjoint shards:
    per-term fg_df and df, and the n_docs/n_fg totals. Each shard runs
    its local one-pass conditional aggregate (the same kernel as the
    single-corpus operator); the merge is a cluster-side union +
    re-aggregation — the term-keyed tally table is dictionary-cardinality
    (far too big for a coordinator collect at 100 TB, unlike the facet
    merge whose value space is small by definition), so it NEVER touches
    the driver. Scoring and ranking then run once on the merged tallies,
    bitwise the single-corpus result."""
    from functools import reduce

    if not shards:
        raise ValueError("significant_terms_federated: no shards")
    parts = [_sig_tallies(d, predicate) for d in shards]
    tallies = (
        reduce(DataFrame.unionByName, [t for t, _ in parts])
        .groupBy("term")
        .agg(F.sum("fg_df").alias("fg_df"), F.sum("df").alias("df"))
    )
    totals = (
        reduce(DataFrame.unionByName, [tot for _, tot in parts])
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("n_fg").alias("n_fg"))
    )
    return _sig_rank(tallies, totals, k, min_fg_df)

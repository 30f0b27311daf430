"""Distributed BPE tokenizer training — the byte-pair-encoding merge
learner (Sennrich et al. 2016) every LLM data pipeline runs before
pretraining, plus the matching encoder.

Distributed shape (the part that matters at 100 TB):

* ONE corpus-sized pass: pre-tokenize (the engine's analyzer split) and
  aggregate word frequencies. Everything after operates on the
  (word, count) table, which is VOCABULARY-sized (Heaps' law: ~10^7-8
  distinct words at 100 TB — a small DataFrame, never the corpus).
* Each merge round = one explode of adjacent symbol pairs weighted by
  word count (map-side combinable aggregation), one 1-row argmax
  collect (bounded by construction), and one MAP-ONLY fold applying the
  merge to the symbol arrays — no shuffle in the apply step. The fold
  is a pure JVM higher-order ``aggregate`` expression (leftmost-first,
  non-overlapping — exactly the reference semantics), so no Python
  touches the hot path. Lineage is truncated with a localCheckpoint
  every ``checkpoint_every`` rounds so a 32k-merge run doesn't build a
  32k-deep plan.
* Encoding re-uses the same fold: apply the merges in rank order to the
  DISTINCT words of the target corpus (vocabulary-sized, map-only per
  round), then join the word->tokens mapping back to the corpus — you
  encode the vocabulary once, not the corpus N times.

Determinism: the argmax tie-breaks (count DESC, left ASC, right ASC) —
documented, unlike the reference implementation's dict-order ties. The
end-of-word marker ``</w>`` cannot collide with word characters
(analyzer words are ``[a-z0-9_]+``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPLIT = "[^a-z0-9_]+"
EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) under the engine's analyzer split — the single
    corpus-sized pass of BPE training."""
    return (
        docs.select(
            F.explode(F.split(F.lower(text_col), SPLIT)).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _init_symbols(words: DataFrame) -> DataFrame:
    """word -> (syms = chars + end-of-word marker, count)."""
    return words.select(
        "word",
        "count",
        F.expr(
            f"concat(regexp_extract_all(word, '.', 0), array('{EOW}'))"
        ).alias("syms"),
    )


def _merge_expr(left: str, right: str) -> str:
    """JVM fold replacing adjacent (left, right) with left||right,
    leftmost-first non-overlapping. Seeding the accumulator with the
    first symbol keeps element_at(acc, -1) in-bounds under ANSI mode;
    syms always has >= 2 elements (char + EOW marker)."""
    for s in (left, right):
        if "'" in s or "\\" in s:  # analyzer makes this impossible
            raise ValueError(f"unmergeable symbol {s!r}")
    merged = left + right
    return f"""
aggregate(
  slice(syms, 2, size(syms) - 1),
  array(syms[0]),
  (acc, x) -> CASE
    WHEN element_at(acc, -1) = '{left}' AND x = '{right}'
    THEN concat(slice(acc, 1, size(acc) - 1), array('{merged}'))
    ELSE concat(acc, array(x)) END
)"""


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[int, str, str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus.

    Returns [(rank, left, right, merged)], rank starting at 1 in merge
    order. Stops early when the best pair's weighted count falls below
    ``min_pair_count`` (no point learning noise merges).
    """
    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    syms = _init_symbols(word_counts(docs, text_col)).persist()
    syms.count()  # materialize before the loop
    merges: list[tuple[int, str, str, str]] = []
    pair_expr = (
        "transform(slice(syms, 1, size(syms) - 1), (x, i) -> "
        "struct(x AS left, syms[i + 1] AS right))"
    )
    try:
        for rank in range(1, n_merges + 1):
            best = (
                syms.select(
                    F.col("count"), F.explode(F.expr(pair_expr)).alias("p")
                )
                .groupBy("p.left", "p.right")
                .agg(F.sum("count").alias("n"))
                .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not best or best[0]["n"] < min_pair_count:
                break
            left, right = best[0]["left"], best[0]["right"]
            merges.append((rank, left, right, left + right))
            nxt = syms.select(
                "word", "count", F.expr(_merge_expr(left, right)).alias("syms")
            )
            if rank % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
                nxt.count()
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()
    return merges


def merges_df(spark, merges: list[tuple[int, str, str, str]]) -> DataFrame:
    return spark.createDataFrame(
        merges or [], schema="rank int, left string, right string, merged string"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str]],
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Tokenize the corpus with a learned merge list.

    Applies the merges in rank order to the corpus's DISTINCT words
    (map-only fold per merge), then joins the word -> token-count
    mapping back to the exploded corpus. Output: (doc_id, n_words,
    n_bpe_tokens) per document — the token-budget accounting a packing/
    pricing pipeline needs. The word -> tokens mapping is returned by
    the companion ``encode_vocab`` if token sequences are wanted.
    """
    words = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower(text_col), SPLIT)).alias("word")
        )
        .filter(F.col("word") != "")
    )
    vocab = encode_vocab(words.select("word").distinct(), merges, checkpoint_every)
    return (
        words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_bpe_tokens"),
        )
    )


def encode_vocab(
    distinct_words: DataFrame,
    merges: list[tuple[int, str, str, str]],
    checkpoint_every: int = 8,
) -> DataFrame:
    """(word, tokens, n_tokens) for every distinct word, by replaying
    the merge list in rank order — N map-only passes over a
    vocabulary-sized frame, lineage truncated periodically."""
    cur = _init_symbols(
        distinct_words.select("word", F.lit(1).alias("count"))
    ).select("word", "syms")
    for i, (_rank, left, right, _m) in enumerate(merges, start=1):
        cur = cur.select("word", F.expr(_merge_expr(left, right)).alias("syms"))
        if i % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
    return cur.select(
        "word",
        F.col("syms").alias("tokens"),
        F.size("syms").alias("n_tokens"),
    )

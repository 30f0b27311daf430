"""Text-analysis operators over the ``documents`` table (LLM-pipeline:
language-ID heuristic, quality scoring, token counting, document
fingerprinting).

All four are pure relational column programs (whole-stage codegen, no
Python workers) whose expressions have exact DuckDB equivalents — the
oracle recomputes them from the raw parquet. At 100 TB each is a single
scan + narrow projection; none shuffles more than its grouped output.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = "[A-Za-z0-9_]+"
# BPE-ish pre-tokenizer: letter runs | digit singles | one non-space symbol
BPE_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

# tiny per-language stopword lists for the n-gram/stopword heuristic —
# deterministic and SQL-expressible (the fixture text is synthetic word
# soup, so the *operator* is what's exercised, not linguistic accuracy)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "value", "row", "data"],
    "es": ["el", "la", "de", "los", "en", "y", "que", "por"],
    "fr": ["le", "la", "les", "des", "et", "en", "que", "pour"],
    "de": ["der", "die", "das", "und", "in", "von", "mit", "zu"],
}


def _in_list(col: str, words: list[str]) -> str:
    lit = ", ".join(f"'{w}'" for w in words)
    return f"size(filter({col}, t -> t in ({lit})))"


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counts: whitespace tokens + BPE-ish regex tokens +
    distinct words (doc_id, n_ws, n_bpe, n_distinct)."""
    return docs.select(
        "doc_id",
        F.expr("size(regexp_extract_all(text, '[^ ]+', 0))").alias("n_ws"),
        F.expr(f"size(regexp_extract_all(text, '{BPE_RE}', 0))").alias("n_bpe"),
        F.expr(
            f"size(array_distinct(regexp_extract_all(text, '{WORD_RE}', 0)))"
        ).alias("n_distinct"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language ID: per-language hit counts over the word
    stream, argmax with deterministic tie-break (count DESC, lang ASC).
    Output (doc_id, pred_lang, hits).

    The argmax is per-row, so it's computed as `greatest` over
    (hits, -lang_index) structs — a pure map-side expression. The
    previous explode + row_number window shuffled the whole doc stream
    just to pick each row's max; this stays in one WholeStageCodegen
    span with no exchange (gated in tests/test_plans.py)."""
    langs = sorted(STOPWORDS.items())
    w = docs.select(
        "doc_id", F.expr(f"regexp_extract_all(lower(text), '{WORD_RE}', 0)").alias("w")
    )
    # struct comparison is field-order lexicographic: hits first (count
    # DESC), then -index (equal hits -> larger -index = smaller index =
    # lang ASC, matching the window tie-break this replaces)
    best = F.greatest(
        *[
            F.struct(
                F.expr(_in_list("w", words)).alias("hits"),
                F.lit(-i).alias("nidx"),
            )
            for i, (lang, words) in enumerate(langs)
        ]
    )
    name_arr = F.array(*[F.lit(lang) for lang, _ in langs])
    return w.withColumn("b", best).select(
        "doc_id",
        F.element_at(name_arr, -F.col("b.nidx") + 1).alias("pred_lang"),
        F.col("b.hits").alias("hits"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + a composite score:
    (doc_id, n_words, mean_word_len, alnum_ratio, stop_ratio, quality_r).
    All ratios are single-division doubles (cross-engine bit-stable),
    composite rounded to 6 dp."""
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return (
        docs.select(
            "doc_id",
            "n_chars",
            F.expr(f"regexp_extract_all(lower(text), '{WORD_RE}', 0)").alias("w"),
            F.expr("length(regexp_replace(text, '[^A-Za-z0-9]', ''))").alias("alnum"),
        )
        .select(
            "doc_id",
            F.size("w").alias("n_words"),
            # nullif guards division semantics (x/0 differs across
            # engines: Inf vs NULL), then coalesce pins empty docs to 0.0
            # so the output column is NULL-free in both engines
            F.expr(
                "coalesce(round(aggregate(w, 0L, (a, t) -> a + length(t)) * 1.0D "
                "/ nullif(size(w), 0), 6), 0D)"
            ).alias("mean_word_len"),
            F.expr(
                "coalesce(round(alnum * 1.0D / nullif(n_chars, 0), 6), 0D)"
            ).alias("alnum_ratio"),
            F.expr(
                f"coalesce(round(size(filter(w, t -> t in ({en}))) * 1.0D "
                "/ nullif(size(w), 0), 6), 0D)"
            ).alias("stop_ratio"),
        )
        .withColumn(
            "quality_r",
            F.round(
                F.least(F.col("n_words") / 100.0, F.lit(1.0)) * 0.4
                + F.col("alnum_ratio") * 0.4
                + (1.0 - F.col("stop_ratio")) * 0.2,
                6,
            ),
        )
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Order-invariant 60-bit content fingerprints from the md5-based
    word hash (cross-engine expression): min-hash + xor-mix
    (doc_id, fp_min, fp_xor)."""
    tok = docs.select(
        "doc_id", F.explode(F.expr(f"regexp_extract_all(text, '{WORD_RE}', 0)")).alias("t")
    ).withColumn(
        "h", F.expr("cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)")
    )
    return tok.groupBy("doc_id").agg(
        F.min("h").alias("fp_min"), F.expr("bit_xor(h)").alias("fp_xor")
    )


def term_vectors(docs: DataFrame, doc_ids: list[int],
                 split: str = "[^a-z0-9]+") -> DataFrame:
    """Per-document term vectors for a BOUNDED doc set — the Lucene
    term-vectors API (per-doc (term, tf) for hit inspection, MLT
    seeding, keyword extraction). Output (doc_id, term, tf).

    Design note: the inverted index cannot serve this cheaply (a per-doc
    read keyed by term would scan every posting list), which is exactly
    why Lucene stores term vectors as a FORWARD structure at index
    time. This engine keeps content out of the index entirely, so the
    forward read is a content-scan with the k doc ids PUSHED as an
    ``isin`` predicate (Parquet row-group pruning) + one map-only
    tokenize + a k-doc-sized aggregation — O(requested docs), never
    corpus-sized. The caller bounds ``doc_ids`` (typically the k hits
    of a query)."""
    if not doc_ids:
        raise ValueError("term_vectors needs a non-empty doc_id list")
    toks = (
        docs.filter(F.col("doc_id").isin([int(d) for d in doc_ids]))
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), split)).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def unigram_perplexity(docs: DataFrame, alpha: float = 1.0,
                       split: str = "[^a-z0-9]+") -> DataFrame:
    """Per-document perplexity under an add-α-smoothed unigram LM fit
    on the corpus itself — the classic cheap quality/outlier signal for
    LLM training-data curation (the KenLM-perplexity stage of CCNet /
    RefinedWeb, reduced to the unigram case so it is exactly
    recomputable by the oracle): gibberish and vocabulary-soup docs
    score high, repetitive boilerplate scores low; both tails get
    reviewed or dropped.

    ppl(d) = exp(-(1/|d|) · Σ_t∈d ln p(t)),
    p(t) = (C(t) + α) / (T + α·V)  over corpus counts C, total T, vocab V.

    Scale shape: one hash-agg for C(t) (map-side combinable), T and V
    are TWO scalars collected from it (bounded by construction), then
    one shuffle joining the token stream to C(t) keyed by term and one
    per-doc aggregation. Nothing corpus-sized at the driver; the
    term-keyed join inherits the same Zipf skew as the index build and
    AQE's skew-join handles the head terms. Output (doc_id, dl, ppl)."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), split)).alias("term")
    ).filter(F.col("term") != "")
    # materialize the vocabulary-sized counts once (localCheckpoint —
    # blocks are context-cleaned when the frame is GC'd, unlike a
    # CacheManager persist): the scalar collect AND the term-keyed join
    # both consume it, and unpinned each would re-run the corpus
    # tokenize+aggregate (guide §5 cache-when-reused)
    counts = (
        toks.groupBy("term")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = counts.agg(
        F.sum("c").alias("t_total"), F.count("*").alias("v")
    ).collect()[0]
    t_total, vocab = float(tot["t_total"]), float(tot["v"])
    denom = math.log(t_total + alpha * vocab)
    lp = toks.join(counts, "term").select(
        "doc_id", (F.log(F.col("c") + F.lit(alpha)) - F.lit(denom)).alias("lp")
    )
    return lp.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        F.exp(-F.avg("lp")).alias("ppl"),
    )


def _token_arrays(docs: DataFrame, split: str) -> DataFrame:
    return docs.select(
        "doc_id",
        F.expr(
            f"filter(split(lower(text), '{split}'), x -> x <> '')"
        ).alias("a"),
    )


def _adjacent_pairs(arr: DataFrame) -> DataFrame:
    # array-side pairing (slice + arrays_zip, whole-stage codegen): no
    # window over a corpus-wide token table, nothing re-sorts by pos
    return arr.filter(F.size("a") >= 2).select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("a"), 1, F.size("a") - 1).alias("t1"),
                F.expr("slice(a, 2, size(a) - 1)").alias("t2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))


def bigram_perplexity(docs: DataFrame, fit_docs: DataFrame | None = None,
                      lam: float = 0.4,
                      split: str = "[^a-z0-9]+") -> DataFrame:
    """Per-document perplexity under a Stupid-Backoff bigram LM
    (Brants et al. 2007 §3, "Large Language Models in Machine
    Translation") — the bigram-order version of the KenLM quality stage
    in CCNet/RefinedWeb: fit counts on a TRUSTED slice (``fit_docs``;
    defaults to ``docs`` itself), score every document, threshold the
    tails.

        S(w_i | w_{i-1}) = C(w_{i-1} w_i) / C(w_{i-1})  if the bigram
                                                         was seen,
                         = λ · max(C(w_i), 1) / T        otherwise,
        ppl(d) = exp(-(1/B) · Σ ln S)  over the doc's B adjacent pairs.

    Stupid Backoff's score is deliberately unnormalized (that is what
    makes it two map-side-combinable hash-aggs instead of a Kneser-Ney
    discount pipeline); perplexities are comparable across docs, which
    is all a filter thresholds on. The ``max(C, 1)`` floor is the OOV
    rule: an unseen unigram scores as if seen once, keeping every lp
    finite (fit-on-self never reaches the backoff branch — every doc
    bigram is in the counts — so the branch only matters when
    ``fit_docs`` is a proper slice, the CCNet deployment shape). Docs
    with <2 tokens have no bigram and drop from the output.

    Scale shape: bigram and unigram counts are two hash-aggs over the
    fit slice; T is one collected scalar; the scored pair stream takes
    two term-keyed left joins (same Zipf head the index build salts —
    AQE skew-join handles it here) and one per-doc agg. Nothing
    corpus-sized reaches the driver. Output (doc_id, n_bg, ppl).
    """
    fit_arr = _token_arrays(fit_docs if fit_docs is not None else docs,
                            split)
    cb = _adjacent_pairs(fit_arr).groupBy("t1", "t2").agg(
        F.count("*").alias("cb")
    )
    # one materialization (vocab-sized) feeds the scalar, c1 and c2 —
    # unpinned, the fit-corpus tokenize+aggregate ran three times
    cu = (
        fit_arr.select(F.explode("a").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cu"))
        .localCheckpoint(eager=True)
    )
    t_total = float(cu.agg(F.sum("cu").alias("t")).collect()[0]["t"] or 0)
    if t_total <= 0:
        raise ValueError("fit corpus has no tokens")
    c1 = cu.select(F.col("term").alias("t1"), F.col("cu").alias("cu1"))
    c2 = cu.select(F.col("term").alias("t2"), F.col("cu").alias("cu2"))
    lp = (
        _adjacent_pairs(_token_arrays(docs, split))
        .join(cb, ["t1", "t2"], "left")
        .join(c1, "t1", "left")
        .join(c2, "t2", "left")
        .select(
            "doc_id",
            F.when(
                F.col("cb").isNotNull(),
                F.log(F.col("cb") / F.col("cu1")),
            )
            .otherwise(
                F.log(
                    F.lit(lam)
                    * F.greatest(F.coalesce(F.col("cu2"), F.lit(0)), F.lit(1))
                    / F.lit(t_total)
                )
            )
            .alias("lp"),
        )
    )
    return lp.groupBy("doc_id").agg(
        F.count("*").alias("n_bg"),
        F.exp(-F.avg("lp")).alias("ppl"),
    )


def ppl_buckets(
    docs: DataFrame, alpha: float = 1.0, split: str = "[^a-z0-9]+"
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020 §4.3): within each language, documents are ordered by LM
    perplexity and split into head / middle / tail TERCILES by document
    count — head is the most fluent third (kept for training), tail the
    least (dropped or down-weighted). Rank-based terciles, not value
    thresholds, so the assignment is exactly replayable.

    Ordering key: (5-dp-rounded ppl ASC, doc_id ASC) — the rounded
    value is the cross-engine-stable comparison key (same device as the
    ANN lanes' ``sim_r``); cut points head = ceil(n/3), middle =
    ceil(2n/3) in integer math.

    Scale shape — NO per-language window over the document table (a
    window partitioned by ``lang`` would funnel each language's entire
    corpus through one task): the global rank is reconstructed from a
    per-(lang, ppl_r) HISTOGRAM. (1) one map-side-combinable count agg
    per (lang, ppl_r); (2) a cumulative sum + per-lang totals over that
    histogram (bounded by distinct rounded ppl values, NOT by docs);
    (3) the only doc-level window is row_number within (lang, ppl_r) —
    high-cardinality partition key, tie-group-sized partitions, no
    skew funnel. rank = cum_before_group + rank_in_group. Output
    (doc_id, lang, dl, ppl_r, bucket)."""
    from pyspark.sql import Window

    ppl = unigram_perplexity(docs, alpha=alpha, split=split)
    # pin the scored frame: the histogram branch and the doc-level
    # join both consume ppl_r, and WITHOUT pinning one materialization
    # each branch would re-execute the avg(lp) aggregation — whose
    # reduce-side merge order is shuffle-arrival-dependent — so a doc
    # within an ulp of a 5dp rounding boundary could carry DIFFERENT
    # ppl_r values into the two branches and vanish from the inner
    # join (the same ulp-straddle class the integer-key lanes close).
    # localCheckpoint (not persist): an eager materialization pins the
    # bytes the same way, and the blocks are context-cleaned when the
    # frame is garbage-collected — a CacheManager persist with no
    # unpersist leaked executor cache across repeated library calls
    # (ADVICE r5). At 100 TB this pin is a staged/checkpointed table,
    # same contract.
    j = (
        ppl.join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "dl", F.round("ppl", 5).alias("ppl_r"))
        .localCheckpoint(eager=True)
    )
    hist = j.groupBy("lang", "ppl_r").agg(F.count("*").alias("c"))
    hw = (
        Window.partitionBy("lang")
        .orderBy("ppl_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(hw))
    totals = hist.groupBy("lang").agg(F.sum("c").alias("n"))
    gw = Window.partitionBy("lang", "ppl_r").orderBy("doc_id")
    ranked = (
        j.withColumn("rn_in_group", F.row_number().over(gw))
        .join(cum, ["lang", "ppl_r"])
        .join(F.broadcast(totals), "lang")
        .withColumn("rn", F.col("cum") - F.col("c") + F.col("rn_in_group"))
    )
    head_cut = F.expr("CAST((n + 2) DIV 3 AS BIGINT)")
    mid_cut = F.expr("CAST((2 * n + 2) DIV 3 AS BIGINT)")
    return ranked.select(
        "doc_id",
        "lang",
        "dl",
        "ppl_r",
        F.when(F.col("rn") <= head_cut, F.lit("head"))
        .when(F.col("rn") <= mid_cut, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def repetition_stats(docs: DataFrame, n_top: int = 2, n_dup: int = 5) -> DataFrame:
    """Gopher-style within-document repetition metrics (Rae et al. 2021
    §A1.1; the rules RefinedWeb/Dolma re-implement) — the signals that
    catch boilerplate, templated spam, and degenerate generations that
    plain length/stopword quality scores miss:

    * ``dup_line_frac`` — fraction of LINES (split on ``\\n``) whose
      exact text occurs more than once in the doc;
    * ``dup_line_char_frac`` — fraction of line CHARACTERS inside such
      duplicated lines;
    * ``top_ngram_char_frac`` — characters covered by the single most
      frequent word ``n_top``-gram (count × gram length, space-joined)
      over total word-stream characters; most-frequent ties break to
      the lexicographically smallest gram (deterministic);
    * ``dup_ngram_char_frac`` — characters of all occurrences BEYOND
      THE FIRST of every duplicated word ``n_dup``-gram over total
      word-stream characters (the standard overlap-agnostic
      approximation — may exceed 1 on pathological docs; thresholds
      are applied on the raw value, as in the papers' reference
      filters).

    Output: (doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    top_ngram_char_frac, dup_ngram_char_frac), fractions rounded to 6.

    Scale shape: one explode per granularity feeding
    map-side-combinable per-(doc, unit) counts, re-aggregated per doc
    and joined back broadcast-free on doc_id — the same one-shuffle
    discipline as the other textstats operators; nothing leaves the
    doc's partition except (doc, unit, count) rows.
    """
    words_expr = f"filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"

    lines = docs.select(
        "doc_id", F.explode(F.split("text", "\n")).alias("line")
    ).filter(F.length("line") > 0)
    per_line = lines.groupBy("doc_id", "line").agg(F.count("*").alias("c"))
    line_agg = per_line.groupBy("doc_id").agg(
        F.sum("c").alias("n_lines"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_lines"),
        F.sum(F.col("c") * F.length("line")).alias("line_chars"),
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.length("line")).otherwise(0)
        ).alias("dup_line_chars"),
    )

    def grams(n: int):
        # sequence(1, 0) DESCENDS through 0 in Spark, so short docs
        # must short-circuit to an empty array before the transform.
        # The n-gram rides an arrays_zip of n shifted slices with a
        # lambda over its own variable only: the previous
        # index-the-words-array lambda got the tokenizer expression
        # inlined into PER-ELEMENT evaluation once the optimizer
        # pushed the explode-inferred non-empty filter below the
        # projection (O(words²) per doc — see
        # neardup.doc_shingle_hashes); explode_outer + a notNull
        # filter keeps that inferred filter from materializing the
        # gram array twice per row. Gram strings are unchanged
        # (concat_ws == array_join over null-free words).
        m = f"size(w)-{n - 1}"
        slices = ", ".join(f"slice(w, {j + 1}, {m})" for j in range(n))
        fields = ", ".join(f"t.`{j}`" for j in range(n))
        ga = (
            f"case when size(w) >= {n} then "
            f"transform(arrays_zip({slices}), t -> concat_ws(' ', {fields})) "
            "else array() end"
        )
        return (
            docs.select("doc_id", F.expr(words_expr).alias("w"))
            .select("doc_id", F.explode_outer(F.expr(ga)).alias("g"))
            .filter(F.col("g").isNotNull())
        )

    totals = docs.select(
        "doc_id",
        F.expr(f"length(array_join({words_expr}, ' '))").alias("w_chars"),
    )

    from pyspark.sql import Window

    wtop = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("g"))
    topg = (
        grams(n_top).groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        .withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select("doc_id", (F.col("c") * F.length("g")).alias("top_cov"))
    )
    dupg = (
        grams(n_dup).groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("c") > 1, (F.col("c") - 1) * F.length("g")
                ).otherwise(0)
            ).alias("dup_cov")
        )
    )

    out = (
        docs.select("doc_id")
        .join(line_agg, "doc_id", "left")
        .join(totals, "doc_id", "left")
        .join(topg, "doc_id", "left")
        .join(dupg, "doc_id", "left")
    )
    nz = lambda c: F.coalesce(c, F.lit(0))
    frac = lambda num, den: F.round(
        F.when(nz(den) > 0, nz(num) / nz(den)).otherwise(F.lit(0.0)), 6
    )
    return out.select(
        "doc_id",
        nz(F.col("n_lines")).alias("n_lines"),
        frac(F.col("dup_lines"), F.col("n_lines")).alias("dup_line_frac"),
        frac(F.col("dup_line_chars"), F.col("line_chars")).alias(
            "dup_line_char_frac"
        ),
        frac(F.col("top_cov"), F.col("w_chars")).alias("top_ngram_char_frac"),
        frac(F.col("dup_cov"), F.col("w_chars")).alias("dup_ngram_char_frac"),
    )

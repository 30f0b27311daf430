"""Spell suggestion / did-you-mean over the term dictionary, SymSpell
style (Lucene analogue: ``DirectSpellChecker`` + ``SuggestMode``).

The scale problem with fuzzy lookup is the candidate set: a banded
``levenshtein`` scan (expand.py ``TermExpander.fuzzy``) touches every
dictionary term of a similar length — O(V) work per query word, fine
for one query, wrong for a suggestion service. The SymSpell alternative
precomputes a DELETION INDEX: every dictionary term is expanded into
its <= ``max_edits`` deletion variants once at publish time, and a
query word's own deletion variants are probed with a hash join. For
edit distance <= 1 this is EXACT and linear:

* any single edit (insert / delete / substitute) between ``a`` and
  ``b`` implies a common string reachable by <= 1 deletion from each
  side, so joining a-variants against b-variants finds every true
  candidate (then the real ``levenshtein`` verifies — the join only
  OVER-generates);
* a term of length L contributes exactly L+1 variants, so the deletion
  table is ~(avgL+1) x dictionary rows — vocabulary-sized, NOT
  corpus-sized, and it never rebuilds on query.

The published table is range-partitioned and sorted by ``variant`` so
a probe's IN-list predicate prunes Parquet row groups the same way the
sorted dictionary prunes prefix scans. At 10^8-term vocabulary the
probe touches a handful of files; the corpus is never involved.

``max_edits >= 2`` is deliberately NOT served by this index: the
variant count grows O(L^2) per term and SymSpell's usual fix (prefix
truncation) forfeits exactness. Callers wanting distance-2 use the
banded-scan ``TermExpander.fuzzy`` path, which stays exact at O(V).

Ranking follows the did-you-mean convention: candidates at edit
distance 1 (the word itself never suggests itself), most-frequent
first (df DESC), term ASC tie-break, top ``k`` per word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog

DELETIONS_TABLE = "deletions"


def _deletion_variants_expr(col: str) -> str:
    """SQL expr: the string itself plus every single-char deletion."""
    return (
        f"array_union(array({col}), transform(sequence(1, length({col})), "
        f"i -> concat(substring({col}, 1, i - 1), substring({col}, i + 1))))"
    )


def py_deletion_variants(word: str) -> list[str]:
    """Driver-side twin of ``_deletion_variants_expr`` for query words."""
    out = [word]
    for i in range(len(word)):
        v = word[:i] + word[i + 1 :]
        if v not in out:
            out.append(v)
    return out


def deletions_are_fresh(cat: Catalog) -> bool:
    """True iff the deletion index derives from a dictionary that is
    itself current vs the segments snapshot. After an append/compact
    the chain segments -> dictionary -> deletions goes stale; a stale
    probe would silently miss corrections toward delta-only terms, so
    ``spell_suggest`` checks this and falls back to the exact banded
    levenshtein scan until ``build_deletion_index`` republishes."""
    from .expand import dictionary_is_fresh

    props = cat.get_properties() or {}
    st = props.get("deletions_state")
    return (
        cat.exists(DELETIONS_TABLE)
        and st is not None
        and int(st.get("dictionary_version", -1)) == cat.current_version("dictionary")
        and dictionary_is_fresh(cat)
    )


def build_deletion_index(
    spark: SparkSession, index_root: str, n_files: int = 32
) -> int:
    """Publish ``deletions(variant, term, df)`` from the dictionary
    (rebuilding the dictionary first if absent or stale). One projection
    shuffle of vocabulary-sized data; payloads never move. Returns the
    row count. Stamped with the source dictionary version
    (``deletions_are_fresh``)."""
    from .expand import build_term_dictionary, dictionary_is_fresh

    cat = Catalog(index_root)
    if not dictionary_is_fresh(cat):
        build_term_dictionary(spark, index_root)
    dic = cat.read(spark, "dictionary")
    dels = (
        dic.select(
            F.explode(F.expr(_deletion_variants_expr("term"))).alias("variant"),
            "term",
            "df",
        )
        .repartitionByRange(n_files, "variant")
        .sortWithinPartitions("variant", "term")
    )
    from pyspark.sql import Observation

    obs = Observation("deletions-size")
    dels = dels.observe(obs, F.count("*").alias("n"))
    cat.write(DELETIONS_TABLE, dels, mode="overwrite", tag={"unit": "deletions"})
    props = cat.get_properties() or {}
    props["deletions_state"] = {
        "dictionary_version": cat.current_version("dictionary")
    }
    cat.set_properties(props)
    return int(obs.get["n"] or 0)


def spell_suggest(
    spark: SparkSession,
    index_root: str,
    words: list[str],
    k: int = 5,
    suggest_mode: str = "always",
) -> DataFrame:
    """Top-``k`` distance-1 corrections per query word.

    Output: (word, rank, suggestion, df) — rank 1 is the best
    correction (df DESC, suggestion ASC). A word absent from every
    dictionary term's neighborhood yields no rows (callers treat that
    as "no suggestion"). Exactness: the deletion join over-generates,
    the JVM ``levenshtein`` verifies, identical matches are dropped.

    ``suggest_mode`` is the ES term-suggester contract:

    - ``always`` (default): suggest for every word;
    - ``missing``: suggest ONLY for words absent from the dictionary
      (the everyday did-you-mean trigger);
    - ``popular``: only suggestions with df STRICTLY greater than the
      word's own df (0 when OOV) — corrections must be more frequent
      than what the user typed.

    Both extra modes cost one vocabulary-sided IN-list df lookup for
    the query words (dictionary-pruned, never corpus-touching), then a
    candidate-frame filter.

    Plan shape: the probe side is len(words) * (avgL+1) rows built on
    the driver, so the join BROADCASTS it; the deletions scan carries an
    IN-list predicate on the sorted ``variant`` column, so Parquet
    row-group stats prune everything outside the probed neighborhoods.

    Staleness: when the segments -> dictionary -> deletions chain is
    out of date (an append/compact since the last publish), the probe
    falls back to the exact banded levenshtein scan over the LIVE
    (term, df) projection — same output contract, O(V) instead of
    O(probe), loud in cost but never silently missing delta terms.
    """
    cat = Catalog(index_root)
    if deletions_are_fresh(cat):
        probes = [(w, v) for w in words for v in py_deletion_variants(w)]
        probe_df = spark.createDataFrame(probes, "word string, variant string")
        variants = sorted({v for _, v in probes})
        dels = cat.read(spark, DELETIONS_TABLE).filter(
            F.col("variant").isin(variants)
        )
        cand = (
            dels.join(F.broadcast(probe_df), "variant")
            .select("word", "term", "df")
            .distinct()
            .filter(F.levenshtein("word", "term") == 1)
        )
    else:
        from .expand import dictionary_is_fresh

        live = (
            cat.read(spark, "dictionary")
            if dictionary_is_fresh(cat)
            else cat.read(spark, "segments").select("term", "df").distinct()
        )
        probe_df = spark.createDataFrame([(w,) for w in words], "word string")
        cand = (
            live.crossJoin(F.broadcast(probe_df))
            .filter(F.abs(F.length("term") - F.length("word")) <= 1)
            .filter(F.levenshtein("word", "term") == 1)
            .select("word", "term", "df")
        )
    if suggest_mode not in ("always", "missing", "popular"):
        raise ValueError(
            f"unknown suggest_mode {suggest_mode!r} (always|missing|popular)"
        )
    if suggest_mode != "always":
        from .expand import dictionary_is_fresh

        dic = (
            cat.read(spark, "dictionary")
            if dictionary_is_fresh(cat)
            else cat.read(spark, "segments").select("term", "df").distinct()
        )
        own = {
            r["term"]: r["df"]
            for r in dic.filter(F.col("term").isin(list(words))).collect()
        }
        if suggest_mode == "missing":
            keep = [w_ for w_ in words if w_ not in own]
            cand = cand.filter(F.col("word").isin(keep) if keep else F.lit(False))
        else:  # popular
            own_df = F.create_map(
                *[F.lit(x) for kv in own.items() for x in kv]
            ) if own else None
            floor = (
                F.coalesce(own_df[F.col("word")], F.lit(0))
                if own_df is not None else F.lit(0)
            )
            cand = cand.filter(F.col("df") > floor)
    from pyspark.sql import Window

    w = Window.partitionBy("word").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("word", "rank", F.col("term").alias("suggestion"), "df")
    )


def did_you_mean(
    spark: SparkSession,
    index_root: str,
    words: list[str],
    min_df: int = 1,
    k: int = 1,
) -> list[tuple[str, str]]:
    """Per query word: keep it if the dictionary knows it with
    df >= ``min_df``, else the top distance-1 suggestion (or the word
    unchanged when nothing suggests). Returns [(word, corrected)].
    Two vocabulary-sided lookups, no corpus access."""
    from .expand import dictionary_is_fresh

    cat = Catalog(index_root)
    dic = (
        cat.read(spark, "dictionary")
        if dictionary_is_fresh(cat)
        else cat.read(spark, "segments").select("term", "df").distinct()
    )
    known = {
        r["term"]
        for r in dic.filter(
            F.col("term").isin(list(words)) & (F.col("df") >= min_df)
        ).collect()
    }
    unknown = [w for w in words if w not in known]
    best: dict[str, str] = {}
    if unknown:
        for r in spell_suggest(spark, index_root, unknown, k=k).collect():
            if r["rank"] == 1:
                best[r["word"]] = r["suggestion"]
    return [(w, w if w in known else best.get(w, w)) for w in words]


def phrase_suggest(
    spark: SparkSession,
    index_root: str,
    docs: DataFrame,
    query: str,
    k: int = 3,
    per_word: int = 5,
    alpha: float = 0.4,
    max_phrases: int = 2000,
) -> DataFrame:
    """Whole-query did-you-mean — the ES *phrase suggester* (Lucene
    ``PhraseSuggester``): per-token candidate generation + a bigram
    language-model re-rank of entire candidate phrases, so corrections
    that are individually plausible but nonsense together lose to the
    phrase the corpus actually says.

    Candidate generation (per query token, ``suggest_mode=always``):
    every dictionary term at levenshtein distance <= 1 (the token
    itself included when known), ranked df DESC / term ASC, capped at
    ``per_word`` — the SymSpell deletion-index probe when fresh (exact:
    the deletion join only over-generates, JVM levenshtein verifies),
    else the banded live-scan fallback, same contract as
    ``spell_suggest``.

    Re-rank (Stupid Backoff, the Lucene default for this suggester)::

        score(p) = log10(c(w1)/N)
                 + sum_i  log10(c(w_{i-1} w_i) / c(w_{i-1}))   if seen
                          log10(alpha * c(w_i) / N)            else

    with counts from the documents word stream (unigram counts filtered
    to the candidate vocabulary, adjacent-bigram counts filtered to the
    candidate transitions, total token count N). Phrases containing a
    term the stream never saw are dropped (their backoff is -inf). Top
    ``k`` by score DESC, phrase ASC.

    Scale shape: the phrase lattice is per-position-capped so it is
    <= per_word^n rows, bounded by ``max_phrases`` (loud error, never a
    silent truncation) and lives driver-side; the corpus-sized work is
    ONE pass over ``docs`` with candidate-vocabulary ``isin`` filters,
    aggregated map-side — only vocabulary-sized counts are collected.
    At 100 TB the same counts would come from a published bigram
    sibling table; the query-side contract is unchanged.
    """
    import itertools
    import math
    import re

    from .percolate import SPLIT

    words = [w for w in re.split(SPLIT, query.lower()) if w]
    if not words:
        raise ValueError("empty query")

    cat = Catalog(index_root)
    if deletions_are_fresh(cat):
        probes = [(w, v) for w in set(words) for v in py_deletion_variants(w)]
        probe_df = spark.createDataFrame(probes, "word string, variant string")
        variants = sorted({v for _, v in probes})
        dels = cat.read(spark, DELETIONS_TABLE).filter(
            F.col("variant").isin(variants)
        )
        cand = (
            dels.join(F.broadcast(probe_df), "variant")
            .select("word", "term", "df")
            .distinct()
            .filter(F.levenshtein("word", "term") <= 1)
        )
    else:
        from .expand import dictionary_is_fresh

        live = (
            cat.read(spark, "dictionary")
            if dictionary_is_fresh(cat)
            else cat.read(spark, "segments").select("term", "df").distinct()
        )
        probe_df = spark.createDataFrame(
            [(w,) for w in set(words)], "word string"
        )
        cand = (
            live.crossJoin(F.broadcast(probe_df))
            .filter(F.abs(F.length("term") - F.length("word")) <= 1)
            .filter(F.levenshtein("word", "term") <= 1)
            .select("word", "term", "df")
        )
    from pyspark.sql import Window

    w = Window.partitionBy("word").orderBy(F.desc("df"), F.asc("term"))
    rows = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_word)
        .collect()
    )
    by_word: dict[str, list[str]] = {}
    for r in rows:
        by_word.setdefault(r["word"], []).append(r["term"])
    cands = [by_word.get(wd, []) for wd in words]
    if any(not c for c in cands):
        # a token with NO neighborhood anywhere in the vocabulary kills
        # every phrase — same "no suggestion" contract as spell_suggest
        return spark.createDataFrame(
            [], schema="rank long, phrase string, score_r double"
        )
    n_phrases = math.prod(len(c) for c in cands)
    if n_phrases > max_phrases:
        raise ValueError(
            f"{n_phrases} candidate phrases > max_phrases={max_phrases}; "
            "lower per_word or raise max_phrases"
        )
    phrases = [list(p) for p in itertools.product(*cands)]

    vocab = sorted({t for c in cands for t in c})
    pairs = sorted(
        {(p[i], p[i + 1]) for p in phrases for i in range(len(p) - 1)}
    )

    if bigrams_are_fresh(cat):
        # the published-LM lane (build_bigram_table): vocabulary-sized
        # probes against the key-sorted sibling tables — the corpus is
        # NOT touched at query time. Counts are definitionally the
        # scan lane's (same stream, same aggregation), so the output
        # is bitwise-identical (pytest-gated).
        st = (cat.get_properties() or {})["bigrams_state"]
        n_total = int(st["n_tokens"])
        uni = {
            r["term"]: r["c"]
            for r in cat.read(spark, UNIGRAMS_TABLE)
            .filter(F.col("term").isin(vocab)).collect()
        }
        bi = {
            f'{r["t1"]} {r["t2"]}': r["c"]
            for r in cat.read(spark, BIGRAMS_TABLE)
            .filter(
                F.col("t1").isin([a for a, _ in pairs])
                & F.col("t2").isin([b for _, b in pairs])
            ).collect()
        } if pairs else {}
    else:
        warr = F.filter(
            F.split(F.lower(F.col("text")), SPLIT), lambda t: t != ""
        )
        base = docs.select(warr.alias("ws"))
        n_total = base.select(F.sum(F.size("ws"))).collect()[0][0] or 0
        uni = {
            r["t"]: r["c"]
            for r in base.select(F.explode("ws").alias("t"))
            .filter(F.col("t").isin(vocab))
            .groupBy("t").agg(F.count("*").alias("c")).collect()
        }
        bi = {}
        if pairs:
            # tokens are [a-z0-9]+ so a space-joined key is unambiguous
            pair_keys = [f"{a} {b}" for a, b in pairs]
            nm1 = F.greatest(F.size("ws") - 1, F.lit(0))
            bi = {
                r["p"]: r["c"]
                for r in base.select(
                    F.explode(
                        F.zip_with(
                            F.slice(F.col("ws"), 1, nm1),
                            F.slice(F.col("ws"), 2, nm1),
                            lambda a_, b_: F.concat_ws(" ", a_, b_),
                        )
                    ).alias("p")
                )
                .filter(F.col("p").isin(pair_keys))
                .groupBy("p").agg(F.count("*").alias("c")).collect()
            }

    scored = []
    for p in phrases:
        if any(uni.get(t, 0) == 0 for t in p):
            continue
        s = math.log10(uni[p[0]] / n_total)
        for i in range(1, len(p)):
            cb = bi.get(f"{p[i - 1]} {p[i]}", 0)
            if cb > 0:
                s += math.log10(cb / uni[p[i - 1]])
            else:
                s += math.log10(alpha * uni[p[i]] / n_total)
        scored.append((" ".join(p), s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    out = [(i + 1, ph, round(s, 6)) for i, (ph, s) in enumerate(scored[:k])]
    return spark.createDataFrame(
        out, schema="rank long, phrase string, score_r double"
    )


BIGRAMS_TABLE = "bigrams"
UNIGRAMS_TABLE = "unigrams"


def bigrams_are_fresh(cat: Catalog) -> bool:
    """The published LM tables cover the CURRENT docs snapshot."""
    props = cat.get_properties() or {}
    st = props.get("bigrams_state")
    return (
        st is not None
        and cat.exists(BIGRAMS_TABLE)
        and cat.exists(UNIGRAMS_TABLE)
        and int(st.get("docs_version", -1)) == cat.current_version("docs")
    )


def build_bigram_table(
    spark: SparkSession, index_root: str, docs: DataFrame
) -> dict:
    """Publish the bigram/unigram language-model sibling tables the
    phrase suggester serves from: ``bigrams(t1, t2, c)`` (adjacent-pair
    counts over the documents word stream) and ``unigrams(term, c)``,
    plus the stream's total token count in ``bigrams_state``.

    This is what makes the suggester's 100-TB story real: the corpus
    is scanned ONCE at publish time (two map-side-combinable hash
    aggregations over the split stream — the same cost class as the
    index build's stats pass), and every later suggestion is a
    vocabulary-sized probe. Both tables are written sorted by their
    keys so a probe's ``isin`` filter prunes Parquet row groups; the
    bigram table is ~O(unique adjacent pairs), vocabulary-squared in
    the worst case but Zipf-bounded in practice — and never
    corpus-sized. Staleness follows the sibling-table convention
    (docs-version stamp; ``phrase_suggest`` falls back to the direct
    scan when stale, bitwise-identical output either way)."""
    import time as _time

    from .percolate import SPLIT

    t0 = _time.time()
    cat = Catalog(index_root)
    if not cat.exists("docs"):
        raise ValueError("build the main index first (docs table missing)")
    warr = F.filter(
        F.split(F.lower(F.col("text")), SPLIT), lambda t: t != ""
    )
    base = docs.select(warr.alias("ws"))
    n_total = int(base.select(F.sum(F.size("ws"))).collect()[0][0] or 0)
    uni = (
        base.select(F.explode("ws").alias("term"))
        .groupBy("term").agg(F.count("*").alias("c"))
        .orderBy("term")
    )
    nm1 = F.greatest(F.size("ws") - 1, F.lit(0))
    big = (
        base.select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("ws"), 1, nm1).alias("t1"),
                    F.slice(F.col("ws"), 2, nm1).alias("t2"),
                )
            ).alias("p")
        )
        .select(F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
        .groupBy("t1", "t2").agg(F.count("*").alias("c"))
        .orderBy("t1", "t2")
    )
    from pyspark.sql import Observation

    ob_u, ob_b = Observation("uni"), Observation("big")
    uni = uni.observe(ob_u, F.count("*").alias("n"))
    big = big.observe(ob_b, F.count("*").alias("n"))
    cat.write(UNIGRAMS_TABLE, uni, mode="overwrite",
              tag={"unit": "unigrams"})
    cat.write(BIGRAMS_TABLE, big, mode="overwrite",
              tag={"unit": "bigrams"})
    props = cat.get_properties() or {}
    props["bigrams_state"] = {
        "docs_version": cat.current_version("docs"),
        "n_tokens": n_total,
    }
    cat.set_properties(props)
    return {
        "n_tokens": n_total,
        "unigram_rows": int(ob_u.get["n"] or 0),
        "bigram_rows": int(ob_b.get["n"] or 0),
        "wall_s": round(_time.time() - t0, 2),
    }

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
) -> DataFrame:
    """Top-``k`` distance-1 corrections per query word.

    Output: (word, rank, suggestion, df) — rank 1 is the best
    correction (df DESC, suggestion ASC). A word absent from every
    dictionary term's neighborhood yields no rows (callers treat that
    as "no suggestion"). Exactness: the deletion join over-generates,
    the JVM ``levenshtein`` verifies, identical matches are dropped.

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

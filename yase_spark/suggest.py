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


def build_deletion_index(
    spark: SparkSession, index_root: str, n_files: int = 32
) -> int:
    """Publish ``deletions(variant, term, df)`` from the dictionary
    (building the dictionary first if absent). One projection shuffle of
    vocabulary-sized data; payloads never move. Returns the row count.
    """
    cat = Catalog(index_root)
    if not cat.exists("dictionary"):
        from .expand import build_term_dictionary

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
    """
    cat = Catalog(index_root)
    probes = [
        (w, v) for w in words for v in py_deletion_variants(w)
    ]
    probe_df = spark.createDataFrame(probes, "word string, variant string")
    variants = sorted({v for _, v in probes})
    dels = cat.read(spark, DELETIONS_TABLE).filter(F.col("variant").isin(variants))
    cand = (
        dels.join(F.broadcast(probe_df), "variant")
        .select("word", "term", "df")
        .distinct()
        .filter(F.levenshtein("word", "term") == 1)
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
    cat = Catalog(index_root)
    dic = cat.read(spark, "dictionary")
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

"""Multi-term query expansion: prefix / wildcard / regex / fuzzy, plus
faceted counts over match sets.

Lucene analogues: ``PrefixQuery`` / ``WildcardQuery`` / ``RegexpQuery`` /
``FuzzyQuery`` (MultiTermQuery rewrites) and facet collection. The
expansion step scans the TERM DICTIONARY, never postings:

* ``build_term_dictionary`` publishes a ``dictionary(term, df)`` table
  **range-partitioned and sorted by term**, so Parquet row-group min/max
  statistics prune prefix lookups (``term >= 'pre' AND term < 'prf'``)
  down to the few files whose range overlaps — the columnar analogue of
  Lucene's sorted term index. Wildcard/regex patterns with a literal
  prefix get the same range pruning (Lucene extracts the prefix too);
  a leading-wildcard pattern is honestly a full dictionary-column scan.
* Fuzzy expansion pre-filters by ``abs(length(term) - len(q)) <= e``
  (edit distance lower bound) before the JVM ``levenshtein``.

Matching docs for an expansion = ranked/boolean OR over the expanded
terms, capped at ``max_expansions`` (Lucene's maxClauseCount): the
driver lane feeds the expansion set through the existing block-max WAND
executor; corpus-sized results belong to the DataFrame lanes
(``*_df``), which stay executor-side end-to-end.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog

MAX_EXPANSIONS = 1024  # Lucene maxClauseCount analogue


def dictionary_is_fresh(cat: Catalog) -> bool:
    """True iff the published dictionary derives from the CURRENT
    segments snapshot. An append/compact bumps the segments version;
    a dictionary stamped with an older version would silently miss
    delta-only terms (recall loss in prefix/wildcard/fuzzy expansion),
    so consumers must check this and fall back to the live segments
    (term, df) projection — correct, just unsorted — until
    ``build_term_dictionary`` republishes."""
    props = cat.get_properties() or {}
    st = props.get("dictionary_state")
    return (
        cat.exists("dictionary")
        and st is not None
        and int(st.get("segments_version", -1)) == cat.current_version("segments")
    )


def build_term_dictionary(
    spark: SparkSession, index_root: str, n_files: int = 32
) -> int:
    """Publish the sorted ``dictionary(term, df)`` table (one shuffle of
    the (term, df) projection — payloads never move). Sorting by term is
    what turns prefix predicates into Parquet row-group pruning. The
    commit is stamped with the source segments version so readers can
    detect staleness after an append/compact (``dictionary_is_fresh``).
    """
    cat = Catalog(index_root)
    seg_version = cat.current_version("segments")
    segs = cat.read(spark, "segments")
    dic = (
        segs.groupBy("term").agg(F.max("df").alias("df"))
        .repartitionByRange(n_files, "term")
        .sortWithinPartitions("term")
    )
    from pyspark.sql import Observation

    obs = Observation("dictionary-size")
    dic = dic.observe(obs, F.count("*").alias("n"))
    cat.write("dictionary", dic, mode="overwrite", tag={"unit": "dictionary"})
    props = cat.get_properties() or {}
    props["dictionary_state"] = {"segments_version": seg_version}
    cat.set_properties(props)
    return int(obs.get["n"] or 0)


def build_synonyms(
    spark: SparkSession, index_root: str, groups: list[list[str]]
) -> int:
    """Publish the ``synonyms(term, variant)`` sibling table from
    synonym GROUPS (Solr ``expand=true`` semantics: every member of a
    group maps to every other member, symmetric, identity excluded).

    Analyzer-applied: each entry is run through the index's own
    analyzer and must yield exactly ONE term — analyzer parity is what
    keeps query-time expansion consistent with what the build indexed
    (an entry that analyzes to several parts, e.g. a camelCase
    identifier or a phrase, is rejected loudly; the rewrite is
    term-level and silently dropping or splitting entries would be
    invisible recall loss. Multi-word synonyms are a SynonymGraph
    feature, out of scope here).

    The table is vocabulary-sized, written sorted by ``term`` so a
    query's ``isin`` lookup prunes on Parquet min/max. Returns the
    number of (term, variant) rows committed."""
    from .tokenize import tokenize_text

    cat = Catalog(index_root)
    pairs: set[tuple[str, str]] = set()
    for group in groups:
        analyzed: list[str] = []
        for word in group:
            toks = tokenize_text(word, ngrams=False)
            if len(toks) != 1:
                raise ValueError(
                    f"synonym entry {word!r} analyzes to {toks!r}; each "
                    "entry must analyze to exactly one index term"
                )
            analyzed.append(toks[0])
        for a in analyzed:
            for b in analyzed:
                if a != b:
                    pairs.add((a, b))
    rows = sorted(pairs)
    df = spark.createDataFrame(
        rows or [], schema="term string, variant string"
    ).coalesce(1).sortWithinPartitions("term", "variant")
    cat.write("synonyms", df, mode="overwrite", tag={"unit": "synonyms"})
    return len(rows)


def s_stem_sql(col: str) -> str:
    """SQL text of the Harman S-stemmer (the light English plural
    stemmer: three suffix rules, no dictionary) over column ``col``:

    1. ``-ies`` -> ``-y``  unless the word ends ``-eies``/``-aies``
    2. ``-es``  -> ``-e``  (drop the s) unless ``-aes``/``-ees``/``-oes``
    3. ``-s``   -> drop    unless ``-us``/``-ss``

    Chosen over Porter because every rule is a suffix test + slice —
    exactly expressible as ONE CASE expression that Spark SQL and any
    ANSI oracle evaluate identically (the same
    shared-expression-text parity device as the PII patterns and the
    decay curves). Returned as a STRING; both engines compile it."""
    t = col
    # nested, not flat: each rule is an if/elif on the SUFFIX — a word
    # hitting a rule's exception list stays UNCHANGED (it must not fall
    # through to a shorter-suffix rule: "toes" is -oes-excepted, not
    # "-s, drop it")
    return (
        "CASE "
        f"WHEN {t} LIKE '%ies' THEN (CASE "
        f"WHEN {t} LIKE '%eies' OR {t} LIKE '%aies' THEN {t} "
        f"ELSE substring({t}, 1, length({t}) - 3) || 'y' END) "
        f"WHEN {t} LIKE '%es' THEN (CASE "
        f"WHEN {t} LIKE '%aes' OR {t} LIKE '%ees' OR {t} LIKE '%oes' "
        f"THEN {t} "
        f"ELSE substring({t}, 1, length({t}) - 1) END) "
        f"WHEN {t} LIKE '%s' THEN (CASE "
        f"WHEN {t} LIKE '%us' OR {t} LIKE '%ss' THEN {t} "
        f"ELSE substring({t}, 1, length({t}) - 1) END) "
        f"ELSE {t} END"
    )


def s_stem(term: str) -> str:
    """Driver-side mirror of ``s_stem_sql`` for stemming QUERY terms
    (one string, no Spark job). Kept rule-for-rule parallel; the
    equivalence is property-gated in tests (random suffix soup through
    both paths)."""
    if term.endswith("ies"):
        return term if term.endswith(("eies", "aies")) else term[:-3] + "y"
    if term.endswith("es"):
        return term if term.endswith(("aes", "ees", "oes")) else term[:-1]
    if term.endswith("s"):
        return term if term.endswith(("us", "ss")) else term[:-1]
    return term


def stems_are_fresh(cat: Catalog) -> bool:
    """Same freshness contract as ``dictionary_is_fresh``: the stems
    sibling must derive from the CURRENT segments snapshot or consumers
    fall back to stemming the live vocabulary on the fly."""
    props = cat.get_properties() or {}
    st = props.get("stems_state")
    return (
        cat.exists("stems")
        and st is not None
        and int(st.get("segments_version", -1)) == cat.current_version("segments")
    )


def build_stems(spark: SparkSession, index_root: str, n_files: int = 8) -> int:
    """Publish the ``stems(stem, term, df)`` sibling: every index term
    keyed by its S-stem — the vocabulary-sized lookup that retrofits
    stemmed search onto an index that stored SURFACE forms (the
    standard retrofit when reindexing 100 TB to stem at build time is
    off the table; Lucene ships the same idea as a stemming
    TokenFilter + SynonymGraph over keyword-repeated fields). Sorted
    by ``stem`` so a query's equality lookup prunes on Parquet min/max.
    Stamped with the segments version (``stems_are_fresh``). Returns
    the row count (== vocabulary size)."""
    cat = Catalog(index_root)
    seg_version = cat.current_version("segments")
    segs = cat.read(spark, "segments")
    dic = (
        segs.groupBy("term").agg(F.max("df").alias("df"))
        .select(F.expr(s_stem_sql("term")).alias("stem"), "term", "df")
        .repartitionByRange(n_files, "stem")
        .sortWithinPartitions("stem", "term")
    )
    from pyspark.sql import Observation

    obs = Observation("stems-size")
    dic = dic.observe(obs, F.count("*").alias("n"))
    cat.write("stems", dic, mode="overwrite", tag={"unit": "stems"})
    props = cat.get_properties() or {}
    props["stems_state"] = {"segments_version": seg_version}
    cat.set_properties(props)
    return int(obs.get["n"] or 0)


def _prefix_range(col, prefix: str):
    """term-range predicate for a literal prefix (pushed to Parquet
    min/max). ``prefix + chr(0x10FFFF)`` upper-bounds every extension."""
    return (col >= prefix) & (col <= prefix + "\U0010ffff")


def wildcard_to_regex(pattern: str) -> str:
    """Lucene wildcard syntax (``*`` any run, ``?`` one char) -> anchored
    regex, everything else literal."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def literal_prefix(pattern: str) -> str:
    """Longest literal prefix of a wildcard pattern (range-pruning key)."""
    out = []
    for ch in pattern:
        if ch in "*?":
            break
        out.append(ch)
    return "".join(out)


class TermExpander:
    """Dictionary-scan expansion over an index. Prefers the sorted
    ``dictionary`` table (range-pruned); falls back to the segments'
    (term, df) columns (columnar projection, no payload IO)."""

    def __init__(self, spark: SparkSession, index_root: str):
        self.spark = spark
        self.cat = Catalog(index_root)
        # a dictionary stamped with an OLD segments version (an append
        # or compaction happened since) would silently miss delta-only
        # terms — fall back to the live (term, df) projection until
        # build_term_dictionary republishes (correct, loses the sorted
        # range pruning)
        self._dic = (
            self.cat.read(spark, "dictionary")
            if dictionary_is_fresh(self.cat)
            # distinct: a shard-split term has one segments row per
            # shard, each carrying the same GLOBAL df
            else self.cat.read(spark, "segments").select("term", "df").distinct()
        )

    def _top(self, df: DataFrame, limit: int) -> list[str]:
        # deterministic cap: highest-df first (the expansions that
        # contribute most recall), term as tie-break
        rows = df.orderBy(F.desc("df"), F.asc("term")).limit(limit + 1).collect()
        if len(rows) > limit:
            raise ValueError(
                f"expansion exceeds max_expansions={limit}; narrow the "
                "pattern or raise the cap"
            )
        return [r["term"] for r in rows]

    def prefix(self, prefix: str, limit: int = MAX_EXPANSIONS) -> list[str]:
        return self._top(
            self._dic.filter(_prefix_range(F.col("term"), prefix)), limit
        )

    def prefix_capped(self, prefix: str, limit: int = MAX_EXPANSIONS) -> list[str]:
        """Like ``prefix`` but CAPS instead of raising — the ES
        ``match_phrase_prefix``/``max_expansions`` contract (the query
        silently uses the cap's worth of expansions). Same deterministic
        order: df DESC (most recall per clause), term ASC tie-break."""
        rows = (
            self._dic.filter(_prefix_range(F.col("term"), prefix))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(limit)
            .collect()
        )
        return [r["term"] for r in rows]

    def complete(self, prefix: str, k: int = 10) -> DataFrame:
        """ES-style completion suggester: the top-``k`` dictionary terms
        extending ``prefix``, weighted by document frequency (weight
        DESC, term ASC — deterministic). Unlike ``prefix()`` this is a
        RANKED suggest surface (autocomplete dropdown), not a query
        rewrite, so it returns (term, weight) rows and never raises on
        a broad prefix — the cap IS the answer size.

        Scale shape: the sorted dictionary turns the prefix predicate
        into Parquet min/max row-group pruning; orderBy().limit(k)
        compiles to TakeOrderedAndProject (per-partition heaps, P·k at
        the driver) — never a global sort, never payload IO."""
        d = self._dic.filter(_prefix_range(F.col("term"), prefix))
        return (
            d.orderBy(F.desc("df"), F.asc("term")).limit(k)
            .select("term", F.col("df").alias("weight"))
        )

    def wildcard(self, pattern: str, limit: int = MAX_EXPANSIONS) -> list[str]:
        rx = wildcard_to_regex(pattern)
        lead = literal_prefix(pattern)
        d = self._dic
        if lead:
            d = d.filter(_prefix_range(F.col("term"), lead))
        return self._top(d.filter(F.col("term").rlike(rx)), limit)

    def regex(self, pattern: str, limit: int = MAX_EXPANSIONS) -> list[str]:
        d = self._dic
        m = re.match(r"\^([a-z0-9_]+)", pattern)
        if m:
            d = d.filter(_prefix_range(F.col("term"), m.group(1)))
        return self._top(d.filter(F.col("term").rlike(pattern)), limit)

    def fuzzy(self, term: str, max_edits: int = 1, limit: int = MAX_EXPANSIONS) -> list[str]:
        d = self._dic.filter(
            F.abs(F.length("term") - F.lit(len(term))) <= max_edits
        )
        return self._top(
            d.filter(F.levenshtein(F.col("term"), F.lit(term)) <= max_edits),
            limit,
        )


def contexts_complete(
    docs: DataFrame,
    prefix: str,
    contexts: dict[str, float],
    k: int = 10,
    ctx_col: str = "lang",
    split: str = "[^a-z0-9]+",
) -> DataFrame:
    """ES completion suggester with CATEGORY CONTEXTS: suggestions are
    filtered to the requested context values and boosted per context —
    a suggestion matching several contexts scores with the MAX of its
    boosted weights (the ES contexts contract: boosts don't stack
    across contexts). The weight of (term, ctx) here is its distinct
    document frequency WITHIN that context (the ES index-time weight
    generalized to corpus statistics):

        score(term) = max over requested ctx of boost_ctx · df(term, ctx)

    Ties break (score DESC, term ASC), deterministic.

    Scale shape: the context filter lands on the scan (bounded IN
    list), the per-(ctx, term) distinct-doc count is one hash
    aggregate with map-side combine, the max-over-contexts is a
    second bucket-sized agg, and top-k compiles to
    TakeOrderedAndProject. At 100 TB the right layout is the published
    (ctx, term, df) dictionary sibling — this operator IS that table's
    builder query with the prefix predicate pushed down."""
    if not contexts:
        raise ValueError("contexts_complete needs >= 1 context boost")
    if not prefix:
        raise ValueError("empty prefix")
    vals = list(contexts)
    boost = "CASE " + " ".join(
        f"WHEN ctx = '{v}' THEN cast({float(contexts[v])!r} as double)"
        for v in vals
    ) + " END"
    per_ctx = (
        docs.filter(F.col(ctx_col).isin(vals))
        .select(
            "doc_id",
            F.col(ctx_col).alias("ctx"),
            F.explode(F.split(F.lower("text"), split)).alias("term"),
        )
        .filter(F.col("term").startswith(prefix))
        .groupBy("ctx", "term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    return (
        per_ctx.select(
            "term", F.expr(f"({boost}) * cast(df as double)").alias("__s")
        )
        .groupBy("term")
        .agg(F.round(F.max("__s"), 6).alias("score_r"))
        .orderBy(F.desc("score_r"), F.asc("term"))
        .limit(k)
    )

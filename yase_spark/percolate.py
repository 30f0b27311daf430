"""Percolation — reverse search: match INCOMING DOCUMENTS against a
registry of STORED QUERIES (the Elasticsearch percolator / Lucene
Monitor capability). The serving shape of alerting, routing, and
saved-search notification: instead of "which docs match this query",
answer "which stored queries match this doc" for a whole batch of docs
at once.

Query model: CNF — each stored query is an AND of OR-groups of terms
(``[["spark", "flink"], ["stream"]]`` ≡ (spark OR flink) AND stream).
That covers the routing/alerting filters percolators exist for, and it
makes the evaluation ONE relational pass:

1. explode the registry into (query_id, group_id, term) rows — a
   dictionary-sized table, BROADCAST;
2. join against the batch's distinct (doc_id, term) token stream: a
   group is satisfied the moment any of its terms appears, so the
   map-side-distinct join output is (doc_id, query_id, group_id);
3. a doc matches a query iff its satisfied-group count equals the
   query's group count — one hash aggregation.

Scale shape: the corpus-sized side is touched once (tokenize +
distinct), never replicated per query; the registry side is tiny by
construction (thousands of alert rules, not billions). No per-(doc,
query) pair is ever materialized for non-candidate pairs — only the
satisfied (doc, query, group) sliver flows. Contrast the naive cross
join (docs × queries), which is the thing this module exists to avoid.

Terms are matched against the lowercase word stream (the same SPLIT
convention as the other documents-table operators — cooccur,
textstats); each registry term must analyze to ONE token (a
multi-token term would make a group an AND-inside-OR, silently
breaking CNF — rejected loudly instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPLIT = "[^a-z0-9]+"


def registry_rows(queries) -> list[tuple[int, int, str]]:
    """Validate + flatten a stored-query registry to (query_id, gid,
    term) rows — the ONE registry contract shared by the batch
    relational lane (below) and the streaming compiled-expression lane
    (streaming.stream_percolate)."""
    import re

    rows = []
    for qid, groups in queries:
        if not groups:
            raise ValueError(f"query {qid}: empty CNF (matches everything)")
        for gid, group in enumerate(groups):
            if not group:
                raise ValueError(f"query {qid} group {gid}: empty OR-group")
            for term in group:
                low = str(term).lower()
                if not low or re.search(SPLIT, low):
                    raise ValueError(
                        f"query {qid}: term {term!r} is not a single "
                        "analyzed token"
                    )
                rows.append((int(qid), int(gid), low))
    return rows


def percolate(
    docs: DataFrame, queries: list[tuple[int, list[list[str]]]]
) -> DataFrame:
    """(doc_id, query_id) pairs where the document satisfies the stored
    CNF query — sorted output left to the caller (it is a match TABLE).

    ``queries``: [(query_id, [[or-terms...], ...]), ...]. Terms are
    lowercased; a term containing separator characters raises (see
    module docstring).
    """
    rows = registry_rows(queries)
    spark = docs.sparkSession
    qdf = spark.createDataFrame(rows, schema="query_id long, gid int, term string")
    need = qdf.groupBy("query_id").agg(
        F.countDistinct("gid").alias("n_groups")
    )

    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower("text"), SPLIT), lambda t: t != ""
                    )
                )
            ).alias("term"),
        )
    )
    sat = (
        toks.join(F.broadcast(qdf), "term")
        .select("doc_id", "query_id", "gid")
        .distinct()
    )
    cnt = sat.groupBy("doc_id", "query_id").agg(
        F.countDistinct("gid").alias("c")
    )
    return (
        cnt.join(F.broadcast(need), "query_id")
        .filter(F.col("c") == F.col("n_groups"))
        .select("doc_id", "query_id")
    )

"""Document-lookup query surface — the Elasticsearch ``mget`` API and
the ``terms`` query's *lookup* form (terms fetched from another
document's field instead of being inlined in the request).

Both are point-lookup shapes, and the 100-TB story is the same for
each: the request side is REQUEST-SIZED (a handful of ids, one lookup
document), so the only corpus-sized work allowed is a pushed-down
IN-list / semi-join against the doc store — never a full scan that the
driver then filters.

* ``mget`` — one row per REQUESTED id, in request order, with ES's
  ``found`` flag for ids that don't exist. The corpus is touched once
  through ``doc_id IN (...)``: an IN-list predicate Catalyst pushes
  into the parquet scan (row-group min/max pruning; on an id-sorted or
  bucketed store this is a true point read). The outer join that
  restores request order and manufactures ``found=false`` rows runs
  AFTER the filter, over at most ``len(ids)`` rows on each side — the
  big table is never on the outer side of anything.

* ``terms_lookup`` — ES ``terms`` query with ``index``/``id``/``path``:
  the filter's term set is the value of a field of one LOOKUP document.
  Phase 1 reads ONE document (the same pushed IN-list shape as mget)
  and derives its term set (distinct tokens, capped at ``max_terms`` by
  tf DESC / term ASC — ES caps lookup terms at 65k for the same
  reason: the set must stay broadcast-sized). Phase 2 is a semi-join of
  the corpus token stream against that broadcast set — filter context,
  constant score, exactly ES semantics — aggregated per doc into
  ``matched_terms`` (how many DISTINCT lookup terms the doc contains).
  At 100 TB phase 2 rides the inverted index instead of a token
  re-scan: the term set keys a bucket-pruned postings fetch and the
  per-doc distinct-count is the same one aggregation.

Determinism: integer counts, (matched_terms DESC, doc_id ASC) order,
explicit caps everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPLIT = "[^a-z0-9]+"


def mget(
    docs: DataFrame,
    ids: list[int],
    id_col: str = "doc_id",
    cols: tuple[str, ...] = ("lang", "source", "n_chars"),
) -> DataFrame:
    """ES ``mget``: one output row per requested id, request order
    preserved (``req_pos``), ``found`` false for absent ids (their
    payload columns NULL, as ES returns no ``_source``)."""
    if not ids:
        raise ValueError("mget requires at least one id")
    if len(ids) != len(set(ids)):
        raise ValueError("mget ids must be unique (ES collapses dupes)")
    spark = docs.sparkSession
    req = spark.createDataFrame(
        [(int(i), p) for p, i in enumerate(ids)], f"{id_col} long, req_pos int"
    )
    # corpus touched exactly once, through the pushed IN-list
    hits = docs.filter(F.col(id_col).isin([int(i) for i in ids])).select(
        id_col, *cols
    )
    return (
        req.join(hits, id_col, "left")
        .select(
            "req_pos",
            id_col,
            F.col(cols[0]).isNotNull().alias("found"),
            *cols,
        )
        .orderBy("req_pos")
    )


def lookup_terms(
    docs: DataFrame,
    lookup_id: int,
    max_terms: int = 16,
    split: str = SPLIT,
) -> DataFrame:
    """The lookup document's term set: distinct tokens of doc
    ``lookup_id``, capped at ``max_terms`` by tf DESC / term ASC (the
    deterministic stand-in for ES's document-order field array). One
    pushed point-read; output is request-sized."""
    if max_terms < 1:
        raise ValueError("max_terms must be >= 1")
    toks = (
        docs.filter(F.col("doc_id") == int(lookup_id))
        .select(F.explode(F.split(F.lower("text"), split)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(int(max_terms))
    )
    return toks.select("term")


def terms_lookup(
    docs: DataFrame,
    lookup_id: int,
    max_terms: int = 16,
    k: int = 15,
    split: str = SPLIT,
) -> DataFrame:
    """ES ``terms`` query, lookup form: docs containing ANY of the
    lookup doc's terms (filter context — constant score), ranked for
    output stability by ``matched_terms`` (distinct lookup terms
    present) DESC, doc_id ASC, top ``k``. The lookup doc itself is a
    legitimate hit, as in ES.

    Shape: the lookup term set is request-sized by construction
    (<= max_terms rows), so it collects once and the per-doc match
    count is a MAP-SIDE array_intersect against the literal list —
    no shuffle before the TakeOrdered cap (the r5 shape shuffled the
    corpus's whole distinct token stream to semi-join <= 16 terms).
    Construction is therefore EAGER: the lookup point-read runs when
    the function is called, not at the first action on the result."""
    if k < 1:
        raise ValueError("k must be >= 1")
    tl = sorted(
        r["term"]
        for r in lookup_terms(docs, lookup_id, max_terms, split).collect()
    )
    if not tl:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, matched_terms long"
        )
    from .aggs import distinct_tokens

    tarr = F.array(*[F.lit(t) for t in tl])
    return (
        docs.select(
            "doc_id",
            F.size(F.array_intersect(distinct_tokens(split), tarr))
            .cast("long").alias("matched_terms"),
        )
        .filter(F.col("matched_terms") >= 1)
        .orderBy(F.desc("matched_terms"), F.asc("doc_id"))
        .limit(int(k))
    )


# ES field_caps type mapping: 'text' = analyzed (searchable, NOT
# aggregatable — no doc_values), everything stored-and-typed is both.
_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def field_caps(docs: DataFrame, text_cols: tuple[str, ...] = ("text",)) -> DataFrame:
    """ES ``_field_caps`` API: one row per mapped field with its ES
    type and the searchable / aggregatable capability flags, derived
    from the DataFrame schema (the engine's mapping). String columns
    listed in ``text_cols`` report as analyzed ``text`` (searchable,
    not aggregatable); other strings are ``keyword`` (both); integer
    and floating columns map to their ES numeric type (both);
    booleans/dates pass through. Driver-side metadata — no job runs,
    exactly like the ES endpoint."""
    rows = []
    for f in docs.schema.fields:
        t = f.dataType.simpleString()
        if t == "string":
            if f.name in text_cols:
                es_t, searchable, aggregatable = "text", True, False
            else:
                es_t, searchable, aggregatable = "keyword", True, True
        elif t in _NUMERIC:
            es_t = {"bigint": "long", "int": "integer", "tinyint": "byte",
                    "smallint": "short"}.get(t, t)
            searchable = aggregatable = True
        elif t == "boolean":
            es_t, searchable, aggregatable = "boolean", True, True
        elif t == "timestamp":
            es_t, searchable, aggregatable = "date", True, True
        else:
            es_t, searchable, aggregatable = t, False, False
        rows.append((f.name, es_t, searchable, aggregatable))
    rows.sort()
    return docs.sparkSession.createDataFrame(
        rows, "field string, es_type string, searchable boolean, "
        "aggregatable boolean"
    )

"""End-to-end training-data materialization (LLM-pipeline brief): the
composition a data curator actually runs — near-dup group clustering,
quality scoring, and language selection folded into one KEEP set.

Scale shape at 10^12 docs: ``dup_groups`` is bounded label propagation
over the (sparse) pair graph, ``quality_scores`` is one map-only scan,
and the composition is two doc_id-keyed joins — co-partitioned
sort-merge, no all-pairs step anywhere (candidate generation happened
upstream in the bucketed near-dup operators). The output is the drop/keep
decision table; materializing the cleaned corpus is then one more
doc_id semi-join against the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .neardup import dup_groups
from .textstats import quality_scores


def clean_corpus(
    docs: DataFrame,
    pairs: DataFrame,
    min_quality: float = 0.45,
    langs: list[str] | None = None,
) -> DataFrame:
    """(doc_id, cluster_id, quality_r) of documents that SURVIVE the
    standard curation gauntlet:

    * near-dup clusters keep only their lowest-doc_id member
      (``dup_groups`` keep policy — every other member is dropped);
    * composite quality (``quality_scores``) >= ``min_quality``;
    * optional language allowlist over ``docs.lang``.

    ``pairs`` is any near-dup pair table (exact Jaccard, MinHash-LSH,
    SimHash, or embedding-cosine — they share the (doc_a, doc_b)
    shape), so the same materialization runs on whichever dedup tier
    the corpus size dictates.
    """
    groups = dup_groups(docs.select("doc_id"), pairs)
    q = quality_scores(docs).select("doc_id", "quality_r")
    kept = (
        groups.filter(F.col("keep"))
        .join(q, "doc_id")
        .filter(F.col("quality_r") >= min_quality)
    )
    if langs:
        kept = kept.join(docs.select("doc_id", "lang"), "doc_id").filter(
            F.col("lang").isin(list(langs))
        )
    return kept.select("doc_id", "cluster_id", "quality_r")

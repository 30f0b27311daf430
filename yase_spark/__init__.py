"""yase_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Spec: /root/repo/BASELINE.json (north_star line 6, north_rule line 14,
input_hint line 15). The reference tree /root/reference is empty (verified
— see SURVEY.md §0), so BASELINE.json is the binding capability spec and
no reference file:line citations are possible.

Architecture (SURVEY.md §3): every artifact is a Spark DataFrame persisted
as an Iceberg-shaped Parquet table; all heavy per-value work is vectorized
(numpy inside Arrow-batched pandas UDFs); no per-row Python UDFs, no RDDs.
"""

__version__ = "0.1.0"

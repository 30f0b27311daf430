"""Corpus source connectors: read the canonical corpus table
``(repo, path, commit, lang, content)`` from Parquet, JSONL, or CSV.

Parquet is the native format (typed, splittable, predicate-pushdown).
Real corpora frequently arrive as JSON-lines dumps or CSV exports, so
the reader accepts those too — mapped onto the same canonical schema
so every downstream stage (build, positions, trigrams, streaming) is
format-agnostic. Everything stays a plain ``spark.read`` declarative
scan: JSONL and CSV are both splittable line formats, so a 100-TB dump
parallelizes the same way parquet does (CSV only when ``multiLine`` is
off — content with embedded newlines forces whole-file parsing, which
is why the CSV path enables it and documents the trade; prefer JSONL
or Parquet for content-bearing corpora at scale).

Fidelity notes (pytest-gated in tests/test_sources.py):
* JSONL round-trips arbitrary content exactly (JSON string escaping).
* CSV round-trips exactly when written with Spark's own quoting
  (``escape='"'``); embedded newlines need ``multiLine=true``.
* Missing required columns fail loudly at read time, not mid-build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]
CORPUS_SCHEMA = StructType(
    [StructField(c, StringType()) for c in CORPUS_COLUMNS]
)


def infer_format(path: str) -> str:
    low = path.rstrip("/").lower()
    if low.endswith((".jsonl", ".json", ".ndjson")):
        return "jsonl"
    if low.endswith(".csv"):
        return "csv"
    return "parquet"


def read_corpus(
    spark: SparkSession, path: str, fmt: str | None = None
) -> DataFrame:
    """Canonical corpus DataFrame from ``path``. ``fmt`` is
    ``parquet`` | ``jsonl`` | ``csv``; inferred from the extension when
    omitted (directories default to parquet). Extra columns are
    dropped; missing ones raise."""
    fmt = (fmt or infer_format(path)).lower()
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt in ("jsonl", "json", "ndjson"):
        df = spark.read.schema(CORPUS_SCHEMA).json(path)
    elif fmt == "csv":
        df = (
            spark.read.schema(CORPUS_SCHEMA)
            .option("header", True)
            .option("multiLine", True)
            .option("quote", '"')
            .option("escape", '"')
            .csv(path)
        )
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")
    missing = [c for c in CORPUS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"corpus at {path} ({fmt}) lacks required columns {missing}"
        )
    return df.select(*CORPUS_COLUMNS)


def write_corpus(
    df: DataFrame, path: str, fmt: str = "parquet"
) -> None:
    """Write a corpus in any supported format with options that
    guarantee :func:`read_corpus` round-trips it exactly."""
    fmt = fmt.lower()
    out = df.select(*CORPUS_COLUMNS)
    if fmt == "parquet":
        out.write.mode("overwrite").parquet(path)
    elif fmt in ("jsonl", "json", "ndjson"):
        out.write.mode("overwrite").json(path)
    elif fmt == "csv":
        (
            out.write.mode("overwrite")
            .option("header", True)
            .option("quote", '"')
            .option("escape", '"')
            .option("quoteAll", True)
            .csv(path)
        )
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")

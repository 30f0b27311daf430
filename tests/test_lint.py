"""Engine-wide policy gates (SURVEY.md §5.6): no per-row Python UDFs, no
RDD transformations in the engine package (BASELINE.json:15 "vectorized
pandas/Arrow UDFs (no per-row Python) throughout")."""

import pathlib
import re

PKG = pathlib.Path(__file__).parent.parent / "yase_spark"

FORBIDDEN = [
    (r"\bF\.udf\(", "row-at-a-time Python UDF"),
    (r"\budf\(\s*lambda", "row-at-a-time Python UDF"),
    (r"\.rdd\b", "RDD access"),
    (r"\.toLocalIterator\(", "driver-side row loop"),
    (r"monotonically_increasing_id\(\).*doc_id", "nondeterministic doc_id"),
]


def test_no_per_row_python():
    for py in PKG.glob("*.py"):
        src = py.read_text()
        for pat, why in FORBIDDEN:
            hits = [
                (i + 1, line)
                for i, line in enumerate(src.splitlines())
                if re.search(pat, line) and not line.strip().startswith("#")
            ]
            assert not hits, f"{py.name}: {why}: {hits}"

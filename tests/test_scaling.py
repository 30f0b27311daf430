"""In-suite two-parallelism-level scaling check (BASELINE.json:14).

The authoritative ≥0.8 N→4N gate is measured by ``bench_scaling.py`` on an
exclusive machine at representative corpus sizes (see BENCH/BASELINE.md);
running that full protocol inside pytest would make the suite hours long
and load-sensitive. This test keeps the *mechanism* honest in-suite:

* the SAME job on the SAME staged input at two pinned parallelism levels
  (local[2] vs local[8] — "N and 4N cores" per the driver instruction);
* index contents and all reference-query results must be IDENTICAL across
  levels (parallelism invariance — the correctness half of the gate);
* throughput must actually improve with cores (a loose floor, default
  0.2 at this tiny size where fixed overhead dominates; tunable via
  YASE_TEST_SCALE_FLOOR for exclusive machines).

Reuses bench_scaling.run_level so there is exactly one measurement
implementation.
"""

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_scaling  # noqa: E402


@pytest.mark.slow
def test_two_level_scaling_invariance_and_floor():
    n_docs = int(os.environ.get("YASE_TEST_SCALE_DOCS", "20000"))
    floor = float(os.environ.get("YASE_TEST_SCALE_FLOOR", "0.2"))
    stage = bench_scaling.stage_corpus(n_docs)
    try:
        lo = bench_scaling.run_level(2, n_docs, stage)
        hi = bench_scaling.run_level(8, n_docs, stage)
    finally:
        shutil.rmtree(os.path.dirname(stage), ignore_errors=True)

    # parallelism invariance: identical index + identical query results
    assert lo["docs_sig"] == hi["docs_sig"], "docs table differs across levels"
    assert lo["seg_sig"] == hi["seg_sig"], "segments differ across levels"
    assert lo["query_sig"] == hi["query_sig"], "query results differ across levels"

    eff = (lo["wall_s"] / hi["wall_s"]) / 4.0
    assert eff >= floor, (
        f"scaling efficiency {eff:.3f} below in-suite floor {floor} "
        f"(N=2: {lo['wall_s']:.1f}s, 4N=8: {hi['wall_s']:.1f}s); the full "
        "gate is measured by bench_scaling.py, see BENCH/BASELINE.md"
    )

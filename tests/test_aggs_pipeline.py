"""date_histogram + pipeline aggregations and rare_terms (aggs.py).

Gates: the gap-fill is DENSE per event_type (a 3-hour hole becomes
three explicit zero-count buckets, each type spanning exactly its own
[min, max] bucket range); the derivative telescopes (its running sum
recovers the count series, with the zero left-boundary making the first
bucket's derivative equal its count); the trailing moving mean matches a hand
computation; rare_terms returns exactly the df<=N tail of a corpus with
known term frequencies.
"""

import datetime

import pytest

from yase_spark.aggs import date_histogram_pipeline, rare_terms

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    # rows: (hour_offset, event_type, value)
    return spark.createDataFrame(
        [
            (i, T0 + datetime.timedelta(hours=h, minutes=7), "u", et, v, "{}")
            for i, (h, et, v) in enumerate(rows)
        ],
        schema="event_id long, ts timestamp, user_id string, "
        "event_type string, value double, props string",
    )


@pytest.fixture(scope="module")
def hist(spark):
    ev = _events(
        spark,
        [
            (0, "a", 1.0),
            (0, "a", 2.0),
            (1, "a", 4.0),
            # hours 2-4 are a hole for type a
            (5, "a", 8.0),
            (5, "a", 16.0),
            (5, "a", 32.0),
            (10, "b", 100.0),
        ],
    )
    out = date_histogram_pipeline(ev, hours=1, window=2)
    return {(r["event_type"], r["bucket_start"].hour): r for r in out.collect()}, out


def test_gap_fill_is_dense_per_type(hist):
    rows, _ = hist
    # type a spans ITS OWN [0, 5] densely; type b is a single bucket
    assert sorted(h for t, h in rows if t == "a") == [0, 1, 2, 3, 4, 5]
    assert sorted(h for t, h in rows if t == "b") == [10]
    for h in (2, 3, 4):
        assert rows[("a", h)]["n"] == 0
        assert rows[("a", h)]["sum_value_r"] == 0.0


def test_counts_sums_and_derivative(hist):
    rows, _ = hist
    assert [rows[("a", h)]["n"] for h in range(6)] == [2, 1, 0, 0, 0, 3]
    assert rows[("a", 0)]["sum_value_r"] == 3.0
    assert rows[("a", 5)]["sum_value_r"] == 56.0
    # zero left-boundary: first derivative == first count
    assert [rows[("a", h)]["deriv_n"] for h in range(6)] == [2, -1, -1, 0, 0, 3]
    assert rows[("b", 10)]["deriv_n"] == 1


def test_derivative_telescopes_and_cum_runs(hist):
    rows, _ = hist
    # zero left-boundary => running sum of the derivative recovers the
    # series: sum(deriv_n[0..k]) == n[k]
    run = 0
    for h in range(6):
        run += rows[("a", h)]["deriv_n"]
        assert run == rows[("a", h)]["n"]
    assert [rows[("a", h)]["cum_n"] for h in range(6)] == [2, 3, 3, 3, 3, 6]
    assert rows[("a", 5)]["cum_n"] == 6  # total type-a events


def test_trailing_moving_mean(hist):
    rows, _ = hist
    # window=2: mean of (previous, current); first bucket is mean of itself
    assert rows[("a", 0)]["mov_avg_n_r"] == 2.0
    assert rows[("a", 1)]["mov_avg_n_r"] == 1.5
    assert rows[("a", 2)]["mov_avg_n_r"] == 0.5
    assert rows[("a", 5)]["mov_avg_n_r"] == 1.5


def test_window_validation(spark):
    with pytest.raises(ValueError):
        date_histogram_pipeline(_events(spark, [(0, "a", 1.0)]), window=0)


def test_rare_terms_exact_tail(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta common"),
            (1, "beta common"),
            (2, "gamma common gamma"),  # repeats inside one doc: df=1
            (3, "common"),
        ],
        schema="doc_id long, text string",
    )
    out = rare_terms(docs, "[^a-z0-9]+", max_doc_count=2).collect()
    assert [(r["term"], r["df"]) for r in out] == [
        ("alpha", 1),
        ("gamma", 1),
        ("beta", 2),
    ]


def test_rare_terms_bigram_shingles(spark):
    docs = spark.createDataFrame(
        [
            (0, "the cat sat"),
            (1, "the cat ran"),
            (2, "the dog sat the dog sat"),  # repeated bigrams: df=1
            (3, "solo"),  # one token: contributes no shingle
        ],
        schema="doc_id long, text string",
    )
    out = rare_terms(docs, "[^a-z0-9]+", max_doc_count=1, shingles=2).collect()
    assert [(r["term"], r["df"]) for r in out] == [
        ("cat ran", 1),
        ("cat sat", 1),
        ("dog sat", 1),
        ("sat the", 1),
        ("the dog", 1),
    ]
    with pytest.raises(ValueError):
        rare_terms(docs, "[^a-z0-9]+", shingles=3)

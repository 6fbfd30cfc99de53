"""MetricsCollector (parity with reference src/metrics.rs:81-115 tests)."""

import pytest

from vectordb_tpu import MetricsCollector


def test_counters():
    m = MetricsCollector()
    m.record_insert()
    m.record_insert(2)
    m.record_delete()
    m.record_query(0.001)
    assert m.total_inserts == 3
    assert m.total_deletes == 1
    assert m.total_queries == 1


def test_empty_aggregates_are_zero():
    m = MetricsCollector()
    assert m.avg_query_latency_us() == 0.0
    assert m.percentile_query_latency_us(99.0) == 0.0


def test_avg_latency():
    m = MetricsCollector()
    m.record_query(0.000100)  # 100us
    m.record_query(0.000300)  # 300us
    assert m.avg_query_latency_us() == pytest.approx(200.0, rel=1e-6)


def test_percentiles_rounded_rank():
    m = MetricsCollector()
    for us in [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]:
        m.record_query(us / 1e6)
    # index = round(p/100 * 9)
    assert m.percentile_query_latency_us(50.0) == pytest.approx(50.0, rel=1e-5)
    assert m.percentile_query_latency_us(95.0) == pytest.approx(100.0, rel=1e-5)
    assert m.percentile_query_latency_us(0.0) == pytest.approx(10.0, rel=1e-5)
    assert m.percentile_query_latency_us(100.0) == pytest.approx(100.0, rel=1e-5)


def test_bounded_reservoir():
    m = MetricsCollector(max_samples=4)
    for us in [1, 2, 3, 4, 1000, 2000]:
        m.record_query(us / 1e6)
    assert m.total_queries == 6
    # ring replaced oldest samples; max kept is 2000us
    assert m.percentile_query_latency_us(100.0) == pytest.approx(2000.0, rel=1e-5)


def test_snapshot_shape():
    m = MetricsCollector()
    snap = m.snapshot()
    assert set(snap) == {
        "total_queries", "total_inserts", "total_deletes",
        "avg_query_latency_us", "p50_query_latency_us",
        "p95_query_latency_us", "p99_query_latency_us"}

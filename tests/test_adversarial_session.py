"""The driver harness builds its OWN SparkSession — none of the
session-factory confs (UTC timezone, parquet nanosAsLong) can be assumed.
Every registry entry must self-heal via schemas.ensure_session_confs at
call time. This suite runs timestamp-sensitive entries through a
deliberately hostile newSession (America/New_York, nanos conf unset) and
asserts oracle parity still holds.
"""

from __future__ import annotations

import pytest

from tests.test_oracle import REGISTRY, duck_result, frame_multiset

# Timestamp/timezone-sensitive representatives: events-table reads (the
# ns-timestamp shim), date formatting, and the streaming file source.
SENSITIVE = [
    "q1_pricing_summary",
    "date_functions",
    "join_asof_events",
    "window_session",
    "dedup_keyed_first",
    "streaming_tumbling",
    "streaming_session",
]


@pytest.fixture(scope="module")
def hostile_spark(spark):
    ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ns.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        pass
    return ns


@pytest.mark.parametrize("name", SENSITIVE)
def test_oracle_parity_on_hostile_session(hostile_spark, duck, sf_dir, name):
    df = REGISTRY[name].fn(hostile_spark, sf_dir)
    s_cols, s_rows = df.columns, [tuple(r) for r in df.collect()]
    d_cols, d_rows = duck_result(duck, name)
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert frame_multiset(s_cols, s_rows) == frame_multiset(d_cols, d_rows)


def test_driver_window_runs_on_hostile_session(hostile_spark, sf_dir):
    """Driver dry-run: the exact first-50 registry entries (the driver's
    per-round correctness window) must EXECUTE on a vanilla session —
    value parity is covered by test_oracle; this catches conf-dependent
    crashes (e.g. the ns-timestamp parquet refusal) before the driver
    does. Sink entries are included: they write to /tmp like the real
    run."""
    failures = []
    for name in list(REGISTRY)[:50]:
        try:
            REGISTRY[name].fn(hostile_spark, sf_dir).count()
        except Exception as ex:  # noqa: BLE001 - collect all failures
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:120]}")
    assert not failures, f"driver-window entries failed on vanilla session: {failures}"

"""The events table's on-disk timestamp layout has changed across driver
testdata generations (INT64 TIMESTAMP(NANOS) in rounds ≤2, micros-NTZ in
round 3). sources.tables.normalize_events must keep yielding the same
(ts timestamp, ts_ns long) contract for every layout it has ever seen —
these tests pin that by writing one tiny events file per layout and
asserting all three normalize to identical rows.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from is3107datapipelineproject_spark.sources.tables import load_table

# Two instants; the second has sub-microsecond nanos in the NANOS layout
# to pin truncation (not rounding) — matching DuckDB's ns→us cast.
T0_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z
T1_US = 1_700_000_003_500_000


def _write_events(path: str, ts_array: pa.Array) -> None:
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": ts_array,
                "user_id": pa.array([10, 20], pa.int64()),
                "event_type": pa.array(["click", "view"]),
                "value": pa.array([1.5, 2.5], pa.float64()),
                "props": pa.array(["{}", "{}"]),
            }
        ),
        path,
    )


def _normalized_rows(spark, d):
    df = load_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert dict(df.dtypes)["ts_ns"] == "bigint"
    return sorted(
        (r.event_id, r.ts, r.ts_ns, r.user_id, r.event_type, r.value)
        for r in df.collect()
    )


EXPECTED_TS = [
    dt.datetime.utcfromtimestamp(T0_US / 1e6),
    dt.datetime.utcfromtimestamp(T1_US / 1e6),
]


@pytest.fixture()
def layout_dirs(tmp_path):
    micros_ntz = tmp_path / "ntz"
    nanos = tmp_path / "nanos"
    utc = tmp_path / "utc"
    for d in (micros_ntz, nanos, utc):
        d.mkdir()
    # Round-3 layout: TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark timestamp_ntz.
    _write_events(
        str(micros_ntz / "events.parquet"),
        pa.array([T0_US, T1_US], pa.int64()).cast(pa.timestamp("us")),
    )
    # Rounds ≤2 layout: INT64 TIMESTAMP(NANOS); +999 ns on row 2 must truncate away.
    _write_events(
        str(nanos / "events.parquet"),
        pa.array([T0_US * 1000, T1_US * 1000 + 999], pa.int64()).cast(pa.timestamp("ns")),
    )
    # Plain UTC micros: TIMESTAMP(MICROS, isAdjustedToUTC=true) → Spark timestamp.
    _write_events(
        str(utc / "events.parquet"),
        pa.array([T0_US, T1_US], pa.int64()).cast(pa.timestamp("us", tz="UTC")),
    )
    return micros_ntz, nanos, utc


def test_all_layouts_normalize_identically(spark, layout_dirs):
    micros_ntz, nanos, utc = layout_dirs
    got_ntz = _normalized_rows(spark, micros_ntz)
    got_nanos = _normalized_rows(spark, nanos)
    got_utc = _normalized_rows(spark, utc)
    # ts (and everything but ts_ns) agrees across all three layouts; the
    # nanos row 2 carries +999 ns, which ts TRUNCATES (not rounds) away.
    drop_ns = lambda rows: [(r[0], r[1], *r[3:]) for r in rows]  # noqa: E731
    assert drop_ns(got_ntz) == drop_ns(got_nanos) == drop_ns(got_utc)
    assert [r[1] for r in got_ntz] == EXPECTED_TS
    # ts_ns: micros-derived layouts are micro-aligned; the nanos layout
    # keeps the RAW nanosecond value (full precision is the point of ts_ns).
    assert [r[2] for r in got_ntz] == [T0_US * 1000, T1_US * 1000]
    assert got_utc == got_ntz
    assert [r[2] for r in got_nanos] == [T0_US * 1000, T1_US * 1000 + 999]

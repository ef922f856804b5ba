"""tables.load / tables.events_stream must read events.parquet correctly
regardless of the ts physical encoding — the driver's testdata has shipped
both INT64 TIMESTAMP(MICROS) (standard) and INT64 TIMESTAMP(NANOS)
(rejected by Spark's reader unless a legacy conf is set), and the harness
session sets no custom confs.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from embeddingsearch_spark import tables

TS = datetime.datetime(2024, 3, 1, 12, 34, 56, 789000)


def _write_events(dirpath, unit):
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([TS, TS + datetime.timedelta(hours=1)]).cast(
                pa.timestamp(unit)
            ),
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(tbl, f"{dirpath}/events.parquet", store_schema=False)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_events_any_encoding(spark, tmp_path, unit):
    d = str(tmp_path / unit)
    (tmp_path / unit).mkdir()
    _write_events(d, unit)
    df = tables.load(spark, d, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    rows = {r.event_id: r.ts for r in df.collect()}
    assert rows[1] == TS  # wall clock preserved, no 1000x drift
    assert rows[2] == TS + datetime.timedelta(hours=1)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_events_stream_any_encoding(spark, tmp_path, unit):
    d = str(tmp_path / unit)
    (tmp_path / unit).mkdir()
    _write_events(d, unit)
    stream = tables.events_stream(spark, d)
    q = (
        stream.writeStream.format("memory")
        .queryName(f"enc_{unit}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r.event_id: r.ts
        for r in spark.sql(f"SELECT * FROM enc_{unit}").collect()
    }
    assert rows[1] == TS

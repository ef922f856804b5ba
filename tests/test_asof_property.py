"""Property test: asof_join(how="left") agrees with pandas.merge_asof
(an independent reference implementation) on arbitrary keyed timelines
with distinct per-key right timestamps."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from embeddingsearch_spark.operators.asof import asof_join

BASE = dt.datetime(2024, 1, 1)


def _times(draw, n):
    secs = draw(
        st.lists(
            st.integers(min_value=0, max_value=5000),
            min_size=n, max_size=n, unique=True,
        )
    )
    return [BASE + dt.timedelta(seconds=s) for s in secs]


@st.composite
def timelines(draw):
    n_left = draw(st.integers(min_value=1, max_value=12))
    n_right = draw(st.integers(min_value=0, max_value=12))
    keys = st.sampled_from(["a", "b", "c"])
    left = [
        (i, draw(keys), t)
        for i, t in enumerate(_times(draw, n_left))
    ]
    right = [
        (100 + i, draw(keys), t)
        for i, t in enumerate(_times(draw, n_right))
    ]
    return left, right


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(timelines())
def test_matches_pandas_merge_asof(spark, data):
    left_rows, right_rows = data
    left = spark.createDataFrame(left_rows, "lid int, k string, ts timestamp")
    right = spark.createDataFrame(
        right_rows, "rid int, k string, ts timestamp"
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, on="k", how="left").collect()
    }

    def frame(rows, idname):
        df = pd.DataFrame(rows, columns=[idname, "k", "ts"])
        # empty frames come out all-object; merge_asof needs real dtypes
        return df.astype(
            {idname: "int64", "k": "object", "ts": "datetime64[ns]"}
        ).sort_values("ts")

    lpd = frame(left_rows, "lid")
    rpd = frame(right_rows, "rid")
    merged = pd.merge_asof(
        lpd, rpd, on="ts", by="k", direction="backward",
        allow_exact_matches=True,
    )
    expected = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == expected

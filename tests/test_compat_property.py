"""Property tests for compat.py column primitives: the pure-codegen
formulas (IoU, epoch bucketing) against plain-Python references on
random inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from big_data_traffict_prediction_spark.compat import bucket_epoch, iou

coords = st.integers(min_value=0, max_value=100)
boxes = st.lists(
    st.tuples(coords, coords, coords, coords, coords, coords, coords, coords).map(
        # degenerate (zero-area) boxes are the reference's crash case —
        # force x2>x1, y2>y1 like its detector output does
        lambda t: (t[0], t[1], t[0] + t[2] + 1, t[1] + t[3] + 1,
                   t[4], t[5], t[4] + t[6] + 1, t[5] + t[7] + 1)
    ),
    min_size=1,
    max_size=40,
)


def _py_iou(a, b):
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    union = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / union


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(bs=boxes)
def test_iou_matches_python_reference(spark, bs):
    df = spark.createDataFrame(
        [(i, *b) for i, b in enumerate(bs)],
        "i long, ax1 long, ay1 long, ax2 long, ay2 long, "
        "bx1 long, by1 long, bx2 long, by2 long",
    )
    col = iou(
        (F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2")),
        (F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2")),
    )
    got = {r.i: r.v for r in df.select("i", col.alias("v")).collect()}
    for i, b in enumerate(bs):
        expect = _py_iou(b[:4], b[4:])
        assert abs(got[i] - expect) < 1e-12, f"box pair {b}"


epochs = st.lists(
    st.integers(min_value=0, max_value=2_000_000_000), min_size=1, max_size=40
)
intervals = st.sampled_from([60, 120, 300, 900, 1800, 3600, 14400, 86400])


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(es=epochs, interval=intervals)
def test_bucket_epoch_is_integer_truncation(spark, es, interval):
    df = spark.createDataFrame(
        [(i, e) for i, e in enumerate(es)], "i long, epoch long"
    ).select("i", F.timestamp_seconds("epoch").alias("ts"), "epoch")
    got = {
        r.i: r.b
        for r in df.select("i", bucket_epoch("ts", interval).alias("b")).collect()
    }
    for i, e in enumerate(es):
        assert got[i] == (e // interval) * interval

"""Stateful streaming: per-camera IoU dedup + accumulators
(SURVEY.md §2.9 St2-St3).

The reference keeps per-camera mutable dicts guarded by a global lock
(``app/globals.py:4,13-14``) and suppresses a detection whose bbox
overlaps the previous frame's bbox at IoU > 0.5
(``app/services/camera.py:239-256``); accumulated counts are ``+=``
under the GIL (``:287-290``). Here the same semantics are ONE
``applyInPandasWithState`` operator keyed by camera_id: state =
(previous bbox, accumulated counts); locks, GIL and the dual-store
sync script all disappear — the state store + checkpoint give
exactly-once.

Rows within each micro-batch are processed in (ts, id) order, so the
suppressed-set matches the batch operator q_iou_dedup exactly — that
equivalence is pinned by tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

IOU_THRESHOLD = 0.5

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("camera_id", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("new_count", T.LongType()),
        T.StructField("iou_prev", T.DoubleType()),
        T.StructField("suppressed", T.BooleanType()),
        T.StructField("accumulated_count", T.LongType()),
    ]
)

# state: last seen bbox + running accumulator
STATE_SCHEMA = T.StructType(
    [
        T.StructField("x1", T.LongType()),
        T.StructField("y1", T.LongType()),
        T.StructField("x2", T.LongType()),
        T.StructField("y2", T.LongType()),
        T.StructField("accumulated", T.LongType()),
        T.StructField("has_prev", T.BooleanType()),
    ]
)


def _iou(a: tuple[int, int, int, int], b: tuple[int, int, int, int]) -> float:
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    union = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / union if union > 0 else 0.0


def dedup_fn(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-camera state function (vectorized per micro-batch)."""
    (camera_id,) = key
    if state.exists:
        x1, y1, x2, y2, accumulated, has_prev = state.get
        prev: tuple[int, int, int, int] | None = (x1, y1, x2, y2) if has_prev else None
    else:
        prev, accumulated = None, 0

    out: list[dict[str, Any]] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "id"])
        for row in pdf.itertuples(index=False):
            box = (int(row.x1), int(row.y1), int(row.x2), int(row.y2))
            iou_prev = _iou(box, prev) if prev is not None else 0.0
            suppressed = iou_prev > IOU_THRESHOLD
            if not suppressed:
                accumulated += int(row.new_count)
            out.append(
                {
                    "camera_id": camera_id,
                    "id": int(row.id),
                    "ts": row.ts,
                    "new_count": int(row.new_count),
                    "iou_prev": float(iou_prev),
                    "suppressed": bool(suppressed),
                    "accumulated_count": accumulated,
                }
            )
            prev = box

    if prev is not None:
        state.update((prev[0], prev[1], prev[2], prev[3], accumulated, True))
    else:
        state.update((0, 0, 0, 0, accumulated, False))
    if out:
        yield pd.DataFrame(out)


def stateful_dedup(stream: DataFrame) -> DataFrame:
    """Wire the state function onto a (possibly streaming) detection
    frame keyed by camera_id."""
    return stream.groupBy("camera_id").applyInPandasWithState(
        dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

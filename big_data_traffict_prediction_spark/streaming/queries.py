"""Driver-visible streaming queries (rows-only checks).

Each stages the deterministic detection stream into a scratch dir,
drains a bounded Structured Streaming query (availableNow) and returns
the result as a DataFrame — so the driver's correctness harness
exercises the real streaming path, not a batch stand-in. Genuinely
non-SQL-expressible (stateful / event-time streaming) → no DuckDB
oracle by design; batch-equivalence is pinned in
tests/test_streaming.py instead.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from . import simulate, state, windows


def _staged(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    base = tempfile.mkdtemp(prefix="traffic_stream_")
    stage = simulate.stage_stream_dir(spark, sf_dir, f"{base}/stage", n_chunks=4)
    return stage, base


@register("q_stream_iou_dedup", oracle=None)
def q_stream_iou_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """St2-St3: per-camera stateful IoU dedup + accumulators over the
    simulated stream (applyInPandasWithState). Equals the batch
    operator q_iou_dedup on the suppressed-set (tested)."""
    stage, base = _staged(spark, sf_dir)
    out = windows.run_to_memory(
        spark,
        state.stateful_dedup(simulate.read_stream(spark, stage)),
        f"q_stream_dedup_{uuid.uuid4().hex[:8]}",
        f"{base}/ckpt",
    )
    return out.orderBy("camera_id", "id")


@register("q_stream_tumbling_counts", oracle=None)
def q_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """St5: tumbling event-time windows with watermark over the
    simulated stream."""
    stage, base = _staged(spark, sf_dir)
    out = windows.run_to_memory(
        spark,
        windows.tumbling_counts(simulate.read_stream(spark, stage), "1 hour"),
        f"q_stream_tumbling_{uuid.uuid4().hex[:8]}",
        f"{base}/ckpt",
    )
    return out.orderBy("window_start", "camera_id")

@register("q_stream_sliding_counts", oracle=None)
def q_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """St4: sliding event-time windows (1h window / 15m slide) — the
    streaming form of the reference's trailing-window stats
    (app/utils.py:523-565)."""
    stage, base = _staged(spark, sf_dir)
    out = windows.run_to_memory(
        spark,
        windows.sliding_counts(simulate.read_stream(spark, stage)),
        f"q_stream_sliding_{uuid.uuid4().hex[:8]}",
        f"{base}/ckpt",
    )
    return out.orderBy("window_start")


@register("q_stream_session_windows", oracle=None)
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """St6: session windows (30m gap) per camera — not in the
    reference's surface; rounds out the event-time window family."""
    stage, base = _staged(spark, sf_dir)
    out = windows.run_to_memory(
        spark,
        windows.session_counts(simulate.read_stream(spark, stage)),
        f"q_stream_session_{uuid.uuid4().hex[:8]}",
        f"{base}/ckpt",
    )
    return out.orderBy("session_start", "camera_id")


@register("q_stream_dedup_delivery", oracle=None)
def q_stream_dedup_delivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once event delivery from an at-least-once transport:
    the staged stream is read TWICE and unioned (every record delivered
    2×), then streaming dropDuplicates on (id, ts) with the watermark
    bounding dedup state — the standard Kafka-consumer dedup shape.
    Returns per-camera counts; equals the single-delivery batch counts
    (pinned in tests/test_streaming.py)."""
    from pyspark.sql import functions as F

    stage, base = _staged(spark, sf_dir)
    once = simulate.read_stream(spark, stage)
    twice = once.unionByName(simulate.read_stream(spark, stage))
    deduped = twice.withWatermark("ts", "30 minutes").dropDuplicates(["id", "ts"])
    counts = deduped.groupBy("camera_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("new_count").alias("total_new_count"),
    )
    out = windows.run_to_memory(
        spark,
        counts,
        f"q_stream_dedup_delivery_{uuid.uuid4().hex[:8]}",
        f"{base}/ckpt",
        output_mode="complete",
    )
    return out.orderBy("camera_id")


ALERT_THRESHOLD = 300
ALERT_LOOKBACK = "15 minutes"


@register("q_stream_stream_join", oracle=None)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (the one streaming operator class the
    other registered streams don't cover): raw detections joined to a
    derived congestion-alert stream of the same feed, per camera,
    observation time within [alert - 15 min, alert]. BOTH sides carry
    watermarks and the join condition bounds both event times — the
    requirements for Spark to age out join state; without them state
    grows forever. Row-level output; genuinely non-SQL-expressible as
    a stream → rows-only driver check, batch-equivalence pinned in
    tests/test_streaming.py."""
    from pyspark.sql import functions as F

    stage, base = _staged(spark, sf_dir)
    obs = simulate.read_stream(spark, stage).withWatermark("ts", "30 minutes")
    alerts = (
        simulate.read_stream(spark, stage)
        .filter(F.col("new_count") >= ALERT_THRESHOLD)
        .select(
            F.col("camera_id").alias("a_camera"),
            F.col("ts").alias("alert_ts"),
            F.col("id").alias("alert_id"),
            F.col("new_count").alias("alert_count"),
        )
        .withWatermark("alert_ts", "30 minutes")
    )
    joined = obs.join(
        alerts,
        (F.col("camera_id") == F.col("a_camera"))
        & (F.col("ts") >= F.col("alert_ts") - F.expr(f"INTERVAL {ALERT_LOOKBACK}"))
        & (F.col("ts") <= F.col("alert_ts")),
    ).select("camera_id", "alert_id", "alert_ts", "alert_count", "id", "ts", "new_count")
    out = windows.run_to_memory(
        spark,
        joined,
        f"q_stream_stream_join_{uuid.uuid4().hex[:8]}",
        f"{base}/ckpt",
    )
    return out.orderBy("camera_id", "alert_id", "id")


@register("q_stream_static_join", oracle=None)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (the enrich-with-dim streaming pattern the
    stream-stream query doesn't cover): live detections join the
    batch-computed per-camera percentile thresholds and only
    over-p90 observations flow through, labeled with their threshold.

    The static side is a bounded batch DataFrame resolved per
    micro-batch and broadcast — no watermark and no state: Spark
    treats the dim as a lookup table, exactly how a 100 TB deployment
    scores a live feed against nightly-built baselines. Stateless →
    rows-only driver check; equality with the batch filter is pinned
    in tests/test_streaming.py."""
    from pyspark.sql import functions as F

    from ..operators.prediction import camera_thresholds

    stage, base = _staged(spark, sf_dir)
    static = camera_thresholds(spark, sf_dir).select("camera_id", "p90")
    flagged = (
        simulate.read_stream(spark, stage)
        .join(F.broadcast(static), "camera_id")
        .filter(F.col("new_count").cast("double") > F.col("p90"))
        .select("camera_id", "id", "ts", "new_count", "p90")
    )
    out = windows.run_to_memory(
        spark,
        flagged,
        f"q_stream_static_{uuid.uuid4().hex[:8]}",
        f"{base}/ckpt",
    )
    return out.orderBy("camera_id", "id")

"""CDC MERGE conflict-rule properties — the invariants a lakehouse
MERGE must hold at state level, pinned against the shipped rule
(operators/joins.py cdc_joined / cdc_post_state, the same code
q_cdc_merge audits):

- idempotence: applying the same compacted feed twice leaves the
  state where one application put it (replayed batches are safe);
- composition: merging the batches [T1,T2) then [T2,T3) equals
  merging [T1,T3) in one go — including through a tombstone-then-
  resurrect sequence, where only the AUDIT actions differ (insert vs
  update), never the state.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from big_data_traffict_prediction_spark.operators.joins import (
    CDC_KEY,
    cdc_latest_per_key,
    cdc_post_state,
)

T0 = datetime(2024, 1, 1)


def _rows_df(spark, rows):
    """rows: (id, camera_id, event_type, day_offset, new_count)."""
    return spark.createDataFrame(
        [
            (i, c, e, T0 + timedelta(days=d, minutes=i), n)
            for i, c, e, d, n in rows
        ],
        "id long, camera_id string, event_type string, ts timestamp, "
        "new_count long",
    )


def _state(df):
    return sorted(
        (r.camera_id, r.event_type, r.s.ts, r.s.id, r.s.new_count)
        for r in df.collect()
    )


def _planted(spark):
    """Target + two consecutive feeds covering every rule branch:
    update, delete (tombstone), insert, delete_miss, keep, and a
    tombstone-then-resurrect across the two feeds."""
    tgt_rows = [
        (1, "a", "t", 0, 10),  # updated by f1
        (2, "b", "t", 0, 20),  # tombstoned by f1, resurrected by f2
        (3, "c", "t", 0, 30),  # untouched (keep)
        (4, "d", "t", 0, 40),  # tombstoned by f2
    ]
    f1_rows = [
        (10, "a", "t", 5, 11),  # update
        (11, "b", "t", 5, 0),  # delete
        (12, "e", "t", 5, 50),  # insert
        (13, "f", "t", 5, 0),  # delete_miss
        (14, "a", "t", 6, 12),  # later same-key change: compaction picks it
    ]
    f2_rows = [
        (20, "b", "t", 10, 21),  # resurrect after f1's tombstone
        (21, "d", "t", 10, 0),  # delete
        (22, "e", "t", 10, 51),  # update the f1 insert
    ]
    tgt = cdc_latest_per_key(_rows_df(spark, tgt_rows), "s")
    f1 = cdc_latest_per_key(_rows_df(spark, f1_rows), "f")
    f2 = cdc_latest_per_key(_rows_df(spark, f2_rows), "f")
    both = cdc_latest_per_key(_rows_df(spark, f1_rows + f2_rows), "f")
    return tgt, f1, f2, both


def test_cdc_merge_is_idempotent(spark):
    tgt, f1, _, _ = _planted(spark)
    once = cdc_post_state(tgt, f1).localCheckpoint(eager=True)
    twice = cdc_post_state(once, f1)
    got = _state(once)
    assert got == _state(twice)
    # and the feed really did something (not idempotent-by-vacuity)
    assert got != _state(tgt)
    assert ("b", "t") not in {(c, e) for c, e, *_ in got}  # tombstoned


def test_cdc_merge_composes_across_batches(spark):
    tgt, f1, f2, both = _planted(spark)
    seq = cdc_post_state(
        cdc_post_state(tgt, f1).localCheckpoint(eager=True), f2
    )
    one_shot = cdc_post_state(tgt, both)
    got = _state(seq)
    assert got == _state(one_shot)
    by_key = {(c, e): n for c, e, _ts, _id, n in got}
    assert by_key[("b", "t")] == 21  # tombstone-then-resurrect survives
    assert ("d", "t") not in by_key  # f2 tombstone applied
    assert by_key[("e", "t")] == 51  # f1 insert then f2 update
    assert by_key[("a", "t")] == 12  # compaction picked f1's later row
    assert by_key[("c", "t")] == 30  # keep


def test_cdc_merge_idempotence_on_real_feed(spark, sf_dir):
    """Same properties over the real tables at smoke scale: the
    registered window's feed replayed twice lands on the same state."""
    from big_data_traffict_prediction_spark.operators.joins import (
        CDC_T1_EPOCH,
        CDC_T2_EPOCH,
    )
    from big_data_traffict_prediction_spark.tables import traffic_history

    h = traffic_history(spark, sf_dir)
    t1 = F.timestamp_seconds(F.lit(CDC_T1_EPOCH))
    t2 = F.timestamp_seconds(F.lit(CDC_T2_EPOCH))
    tgt = cdc_latest_per_key(h.filter(F.col("ts") < t1), "s")
    feed = cdc_latest_per_key(
        h.filter((F.col("ts") >= t1) & (F.col("ts") < t2)), "f"
    )
    once = cdc_post_state(tgt, feed).localCheckpoint(eager=True)
    assert _state(once) == _state(cdc_post_state(once, feed))
    assert set(CDC_KEY) == {"camera_id", "event_type"}

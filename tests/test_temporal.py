"""As-of join: brute-force equivalence + point-in-time edge cases."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cer_for_mti_spark.operators import temporal


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2025-01-01 00:00:00"), "a"),   # before any state
            (1, _ts("2025-01-01 01:00:00"), "b"),   # after s1
            (1, _ts("2025-01-01 02:00:00"), "c"),   # exactly at s2 -> s2
            (2, _ts("2025-01-01 05:00:00"), "d"),   # other key
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2025-01-01 00:30:00"), 10.0),  # s1
            (1, _ts("2025-01-01 02:00:00"), 20.0),  # s2
            (2, _ts("2025-01-01 04:00:00"), 30.0),
        ],
        "user_id long, ts timestamp, state double",
    )
    out = temporal.asof_join(left, right, right_cols=["state"])
    got = {(r.user_id, r.tag): r.state_r for r in out.collect()}
    assert got == {
        (1, "a"): None,
        (1, "b"): 10.0,
        (1, "c"): 20.0,   # same-timestamp right row is visible
        (2, "d"): 30.0,
    }


def test_asof_join_vs_brute_force(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    h = F.pmod(F.xxhash64(F.col("event_id").cast("string")), F.lit(7))
    state = (
        ev.filter(h == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("sv"))
    )
    left = ev.select("event_id", "user_id", "ts").limit(500)
    out = temporal.asof_join(left, state, right_cols=["sv"]).collect()

    srows = state.collect()
    by_user: dict = {}
    for r in srows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.sv))
    for v in by_user.values():
        v.sort()
    for r in out:
        cands = [sv for ts, sv in by_user.get(r.user_id, []) if ts <= r.ts]
        want = cands[-1] if cands else None
        assert r.sv_r == want, (r.event_id, r.sv_r, want)

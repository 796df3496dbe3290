"""Sessionization: batch vs an independent pandas model, plan shape
(one exchange total), and the streaming session_window variant agreeing
with the batch boundary rule on the same input."""

import shutil
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osmflat_rs_spark.operators.sessions import session_stats, sessionize, stream_sessionize

GAP_S = 120


def _events_pdf(seed=13, n=800, n_keys=20):
    """Per-user event sequences whose gaps straddle GAP_S and include the
    EXACT gap (the boundary rule under test: exact-gap MERGES, only
    strictly-greater gaps start a new session — Spark session_window's
    inclusive merge)."""
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    per_user = n // n_keys
    frames = []
    eid = 0
    for uid in range(n_keys):
        gaps = rng.choice([5, 30, GAP_S - 1, GAP_S, GAP_S + 1, 600], per_user)
        frames.append(
            pd.DataFrame(
                {
                    "user_id": np.full(per_user, uid, dtype=np.int64),
                    "ts": base + pd.to_timedelta(gaps.cumsum(), unit="s"),
                    "event_id": np.arange(eid, eid + per_user, dtype=np.int64),
                }
            )
        )
        eid += per_user
    pdf = pd.concat(frames, ignore_index=True)
    return pdf.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)


def _model_sessions(pdf, gap_s=GAP_S):
    out = []
    for uid, grp in pdf.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        sid = -1
        prev = None
        for _, row in grp.iterrows():
            if prev is None or (row["ts"] - prev).total_seconds() > gap_s:
                sid += 1
            out.append((uid, row["event_id"], sid))
            prev = row["ts"]
    return pd.DataFrame(out, columns=["user_id", "event_id", "session_idx"])


def test_sessionize_matches_model(spark):
    pdf = _events_pdf()
    got = (
        sessionize(spark.createDataFrame(pdf), "user_id", gap_s=GAP_S, order_cols=("event_id",))
        .select("user_id", "event_id", "session_idx")
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    want = _model_sessions(pdf).sort_values(["user_id", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_session_stats_one_exchange(spark):
    """The stats groupBy keys ⊇ the window partition key, so the whole
    operator plans exactly ONE exchange (the window's)."""
    pdf = _events_pdf()
    stats = session_stats(spark.createDataFrame(pdf), "user_id", gap_s=GAP_S, order_cols=("event_id",))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange")
    assert n_exchange == 1, f"expected 1 Exchange, got {n_exchange}:\n{plan[:3000]}"
    # and the stats themselves reconcile with the event-level assignment
    total = stats.agg(F.sum("n_events")).collect()[0][0]
    assert total == len(pdf)


def test_stream_sessionize_matches_batch(spark):
    """The streaming session_window aggregation must reproduce the batch
    operator's sessions — same (key, session start, event count) set —
    proving the inclusive-merge boundary rule is pinned across both
    forms."""
    pdf = _events_pdf(seed=29, n=400, n_keys=8)
    tmp = tempfile.mkdtemp(prefix="stream_sess_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ck"
    try:
        sdf = spark.createDataFrame(pdf[["user_id", "ts", "event_id"]])
        sdf.write.mode("append").parquet(src)
        schema = "user_id long, ts timestamp_ntz, event_id long"
        q = stream_sessionize(spark, src, schema, out, ckpt, key="user_id", gap_s=GAP_S)
        assert q.awaitTermination(300)
        # append-mode aggregates flush only when the watermark passes a
        # session's close (= last event + gap). The watermark tracks max
        # EVENT time, so the final session can only close when a LATER
        # event arrives — the defining property of unbounded streams. A
        # far-future sentinel row on a throwaway key plays that role.
        sentinel = pdf["ts"].max() + pd.Timedelta(days=1)
        spark.createDataFrame(
            pd.DataFrame({"user_id": [-1], "ts": [sentinel], "event_id": [-1]})
        ).write.mode("append").parquet(src)
        q2 = stream_sessionize(spark, src, schema, out, ckpt, key="user_id", gap_s=GAP_S)
        assert q2.awaitTermination(300)
        got = (
            spark.read.parquet(out)
            .filter(F.col("user_id") >= 0)
            .toPandas()
            .sort_values(["user_id", "start_us"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    want = (
        session_stats(spark.createDataFrame(pdf), "user_id", gap_s=GAP_S, order_cols=("event_id",))
        .select("user_id", "start_us", "n_events")
        .toPandas()
        .sort_values(["user_id", "start_us"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["user_id", "start_us", "n_events"]].astype("int64"),
        want.astype("int64"),
    )
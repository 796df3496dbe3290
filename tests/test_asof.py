"""As-of join vs the independent pandas ``merge_asof`` model.

Covers both directions, the exact-match boundary (``<=`` vs ``<``),
tolerance, LEFT semantics (row count preserved, NULLs for no-match),
and the null-payload-field case the single-struct design exists for.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osmflat_rs_spark.operators.asof import asof_join


def _mk_frames(seed=7, n_left=400, n_right=300, n_keys=12):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    # integer-second offsets with deliberate cross-side collisions so the
    # exact-match boundary is actually exercised
    lts = rng.integers(0, 5000, n_left)
    rts = rng.integers(0, 5000, n_right)
    left = pd.DataFrame(
        {
            "key": rng.integers(0, n_keys, n_left),
            "ts": base + pd.to_timedelta(lts, unit="s"),
            "lval": np.arange(n_left, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "key": rng.integers(0, n_keys, n_right),
            "ts": base + pd.to_timedelta(rts, unit="s"),
            "rval": np.arange(n_right, dtype=np.int64) * 10,
            # a payload column with real NULLs: last(ignorenulls) on bare
            # columns would skip to an OLDER row here; the struct must not
            "rnull": [None if i % 3 == 0 else float(i) for i in range(n_right)],
        }
    )
    # kill duplicate (key, ts) pairs per side AND the right side entirely
    # (merge_asof with duplicate right ts is ambiguous; the operator's
    # contract is deterministic only for unique (key, ts) on the right)
    right = right.drop_duplicates(["key", "ts"], keep="first").reset_index(drop=True)
    left = left.drop_duplicates(["key", "ts"], keep="first").reset_index(drop=True)
    return left, right


def _model(left, right, direction, allow_exact, tolerance_us=None):
    kw = {}
    if tolerance_us is not None:
        kw["tolerance"] = pd.Timedelta(tolerance_us, unit="us")
    m = pd.merge_asof(
        left.sort_values(["ts", "lval"]).reset_index(drop=True),
        right.sort_values("ts").reset_index(drop=True),
        on="ts",
        by="key",
        direction=direction,
        allow_exact_matches=allow_exact,
        suffixes=("", "_r"),
        **kw,
    )
    return m.sort_values("lval").reset_index(drop=True)


def _run(spark, left, right, direction, allow_exact, tolerance_us=None):
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    out = asof_join(
        ldf,
        rdf,
        on="key",
        right_cols=["rval", "rnull"],
        direction=direction,
        allow_exact_matches=allow_exact,
        tolerance_us=tolerance_us,
        suffix="_r",
    )
    return out.toPandas().sort_values("lval").reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_matches_pandas_model(spark, direction, allow_exact):
    left, right = _mk_frames()
    got = _run(spark, left, right, direction, allow_exact)
    want = _model(left, right, direction, allow_exact)
    assert len(got) == len(left)  # LEFT semantics: never drops/dups rows
    pd.testing.assert_series_equal(
        got["rval_r"].astype("float64"), want["rval"].astype("float64"), check_names=False
    )


def test_asof_null_payload_fields_stay_coherent(spark):
    """A NULL field in the matched right row must come through as NULL —
    not be replaced by the previous right row's value."""
    left, right = _mk_frames()
    got = _run(spark, left, right, "backward", True)
    want = _model(left, right, "backward", True)
    g = got["rnull_r"].to_numpy()
    w = want["rnull"].to_numpy()
    both_nan = pd.isna(g) & pd.isna(w)
    assert (both_nan | (g == w)).all()


def test_asof_tolerance(spark):
    left, right = _mk_frames()
    tol = 200 * 1_000_000  # 200 s in µs
    got = _run(spark, left, right, "backward", True, tolerance_us=tol)
    want = _model(left, right, "backward", True, tolerance_us=tol)
    gm = got["rval_r"].notna().to_numpy()
    wm = want["rval"].notna().to_numpy()
    assert (gm == wm).all()
    assert (got.loc[gm, "rval_r"].to_numpy() == want.loc[wm, "rval"].to_numpy()).all()


def test_asof_one_shuffle_no_join(spark):
    """Plan shape: the whole match is one window over the union — no join
    operator, no row amplification, exactly one hash-partitioning
    exchange for the window."""
    left, right = _mk_frames()
    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="key",
        right_cols=["rval"],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan
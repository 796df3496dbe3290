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

def test_interp_join_matches_python_model(spark):
    """Bracketing + linear interpolation against a brute-force model:
    exact hits collapse, edges extrapolate flat, missing keys NULL out,
    and row count always equals the query count."""
    import datetime

    import numpy as np

    from osmflat_rs_spark.operators.asof import interp_join

    rng = np.random.default_rng(103)
    fixes = {}
    rows_s = []
    for u in (1, 2):
        ts = sorted(int(t) for t in rng.choice(np.arange(100, 10_000, 7), 20, replace=False))
        fixes[u] = [(t, int(rng.integers(-50, 50))) for t in ts]
        rows_s += [(u, t, v) for t, v in fixes[u]]
    qs = []
    qid = 0
    for u in (1, 2, 9):  # 9 has no fixes
        for t in [1, 150, fixes.get(u, [(500, 0)])[3][0] if u in fixes else 500,
                  5000, 99_999]:
            qs.append((qid, u, int(t)))
            qid += 1

    def mk(t):
        return datetime.datetime.utcfromtimestamp(t)

    sdf = spark.createDataFrame(
        [(u, mk(t), v) for u, t, v in rows_s], "user long, ts timestamp, v long"
    )
    qdf = spark.createDataFrame(
        [(q, u, mk(t)) for q, u, t in qs], "qid long, user long, ts timestamp"
    )
    got = {
        r["qid"]: r.asDict()
        for r in interp_join(qdf, sdf, on="user", value_col="v").collect()
    }
    assert len(got) == len(qs)
    for q, u, t in qs:
        r = got[q]
        f = fixes.get(u, [])
        lo = max(((ft, fv) for ft, fv in f if ft <= t), default=None)
        hi = min(((ft, fv) for ft, fv in f if ft >= t), default=None)
        if lo is None and hi is None:
            assert r["v_interp"] is None and r["t_lo"] is None and r["t_hi"] is None
        elif lo is None:
            assert r["v_interp"] == float(hi[1])
        elif hi is None:
            assert r["v_interp"] == float(lo[1])
        elif lo[0] == hi[0]:
            assert r["v_interp"] == float(lo[1])
            assert r["t_lo"] == lo[0] * 1_000_000 and r["t_hi"] == hi[0] * 1_000_000
        else:
            want = lo[1] + (hi[1] - lo[1]) * ((t - lo[0]) / (hi[0] - lo[0]))
            assert abs(r["v_interp"] - want) < 1e-9, (q, r, want)

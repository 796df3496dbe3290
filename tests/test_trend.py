"""Mann-Kendall / Theil-Sen space-time trend vs a pure-Python oracle."""

import datetime

import numpy as np
import pytest


def _mk_oracle(vals):
    """Textbook MK with tie correction + Theil-Sen median slope."""
    t = len(vals)
    s = 0
    slopes = []
    for i in range(t):
        for j in range(i + 1, t):
            d = vals[j] - vals[i]
            s += (d > 0) - (d < 0)
            slopes.append(d / (j - i))
    ties = {}
    for v in vals:
        ties[v] = ties.get(v, 0) + 1
    tie_term = sum(c * (c - 1) * (2 * c + 5) for c in ties.values())
    var = (t * (t - 1) * (2 * t + 5) - tie_term) / 18.0
    if var > 0:
        z = (s - 1) / var ** 0.5 if s > 0 else (s + 1) / var ** 0.5 if s < 0 else 0.0
    else:
        z = None
    slopes.sort()
    m = len(slopes)
    if m == 0:
        sen = None
    elif m % 2 == 1:
        sen = slopes[(m - 1) // 2]
    else:
        sen = (slopes[m // 2 - 1] + slopes[m // 2]) / 2
    return s, var, z, sen


def test_mann_kendall_matches_python_oracle(spark):
    """Random tied integer series (zero-filled holes included) per cell
    vs the textbook oracle — exact s/var_s, rel-1e-12 z/sen."""
    from osmflat_rs_spark.operators.trend import mann_kendall

    rng = np.random.default_rng(13)
    t0, t1 = 100, 115
    rows, want = [], {}
    for cell in range(12):
        series = {}
        for b in range(t0, t1 + 1):
            if rng.random() < 0.75:  # leave holes -> zero-fill path
                v = int(rng.integers(0, 5))  # small ints -> heavy ties
                if v > 0:
                    series[b] = v
        for b, v in series.items():
            rows.append((cell, 0, b, v))
        dense = [series.get(b, 0) for b in range(t0, t1 + 1)]
        want[cell] = _mk_oracle(dense)
    # ensure at least one cell emits no cube rows at all is impossible
    # (a cube only has occupied cells) -- cells with rows only
    present = {c for c, _, _, _ in rows}
    df = spark.createDataFrame(rows, "ix long, iy long, tbin long, n long").repartition(4)
    got = {
        r["ix"]: (r["s"], r["var_s"], r["z"], r["sen"])
        for r in mann_kendall(df).collect()
    }
    assert set(got) == present
    for c in got:
        s, var, z, sen = want[c]
        gs, gvar, gz, gsen = got[c]
        assert gs == s and gvar == pytest.approx(var, abs=1e-9), c
        if z is None:
            assert gz is None, c
        else:
            assert gz == pytest.approx(z, rel=1e-12), c
        assert gsen == pytest.approx(sen, rel=1e-12), c


def test_mann_kendall_edge_series(spark):
    """Strictly increasing (max S), constant (Var 0 -> NULL z), and a
    single-bin global range (T=1: no pairs)."""
    from osmflat_rs_spark.operators.trend import mann_kendall

    inc = [(1, 0, b, b + 1) for b in range(8)]          # strictly increasing
    const = [(2, 0, b, 3) for b in range(8)]            # all tied
    df = spark.createDataFrame(inc + const, "ix long, iy long, tbin long, n long")
    got = {r["ix"]: r for r in mann_kendall(df).collect()}
    t = 8
    assert got[1]["s"] == t * (t - 1) // 2
    assert got[1]["z"] > 2 and got[1]["sen"] == 1.0
    assert got[2]["s"] == 0 and got[2]["var_s"] == 0.0 and got[2]["z"] is None
    assert got[2]["sen"] == 0.0

    one = spark.createDataFrame([(9, 9, 42, 5)], "ix long, iy long, tbin long, n long")
    row = mann_kendall(one).collect()[0]
    assert row["s"] == 0 and row["var_s"] == 0.0 and row["z"] is None and row["sen"] is None


def test_emerging_hotspots_end_to_end(spark):
    """Planted intensifying + diminishing blobs over 12 daily bins:
    signs and significance come out right; a steady cell scores |z|
    small."""
    from osmflat_rs_spark.operators.trend import emerging_hotspots

    rng = np.random.default_rng(3)
    X, Y = 132_000_000, 524_000_000
    OFF = 40_000_000  # separate blob cells at res 14
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for day in range(12):
        ts = base + datetime.timedelta(days=day, hours=3)
        for _ in range(2 + 3 * day):        # intensifying
            rows.append((ts, Y + int(rng.integers(0, 2000)), X + int(rng.integers(0, 2000))))
        for _ in range(40 - 3 * day):       # diminishing
            rows.append((ts, Y + OFF + int(rng.integers(0, 2000)), X + int(rng.integers(0, 2000))))
        for _ in range(5):                  # steady
            rows.append((ts, Y + int(rng.integers(0, 2000)), X + OFF + int(rng.integers(0, 2000))))
    df = spark.createDataFrame(rows, "ts timestamp, lat long, lon long")
    got = emerging_hotspots(df, res=14).collect()
    assert len(got) == 3
    by_sen = sorted(got, key=lambda r: r["sen"])
    assert by_sen[0]["z"] < -1.96 and by_sen[0]["sen"] == pytest.approx(-3.0, abs=0.5)
    assert by_sen[2]["z"] > 1.96 and by_sen[2]["sen"] == pytest.approx(3.0, abs=0.5)
    assert abs(by_sen[1]["z"] or 0.0) < 1.96


# ------------------------------------------------------------- grouped ols


def test_grouped_ols_exact_rationals(spark):
    import numpy as np

    from osmflat_rs_spark.operators.trend import grouped_ols

    rng = np.random.default_rng(31)
    rows = []
    for g in range(5):
        n = int(rng.integers(2, 60))
        for _ in range(n):
            x = int(rng.integers(-500, 500))
            rows.append((g, x, 3 * x + 7 + int(rng.integers(-40, 40))))
    rows += [(9, 5, 1), (9, 5, 2), (9, 5, 3)]   # constant x -> NULL line
    rows += [(8, 1, 10)]                          # n = 1 -> NULL line
    want = {}
    for g in {r[0] for r in rows}:
        pts = [(x, y) for gg, x, y in rows if gg == g]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts); sxy = sum(x * y for x, y in pts)
        den = n * sxx - sx * sx
        if den == 0:
            want[g] = (n, None, None, None)
        else:
            want[g] = (n, n * sxy - sx * sy, sy * sxx - sx * sxy, den)
    df = spark.createDataFrame(rows, "g long, x long, y long")
    for d in (df, df.repartition(7)):
        got = {
            r["g"]: (
                r["n"],
                None if r["slope_num"] is None else int(r["slope_num"]),
                None if r["icept_num"] is None else int(r["icept_num"]),
                None if r["den"] is None else int(r["den"]),
            )
            for r in grouped_ols(d, "g", "x", "y").collect()
        }
        assert got == want
    # sanity: the recovered slope is ~3 for the noisy-linear groups
    for g in range(5):
        n, sn, _, dn = want[g]
        assert abs(sn / dn - 3) < 0.5


# --------------------------------------------------------- seasonal profile


def test_seasonal_profile_matches_counter_model(spark):
    """Exact hour bucketing + means against a dict model; NULL values
    excluded from both means; seasonal indices sum (weighted) to 0."""
    import numpy as np

    from osmflat_rs_spark.operators.trend import seasonal_profile

    rng = np.random.default_rng(101)
    rows = []
    for i in range(500):
        us = int(rng.integers(0, 10)) * 3_600_000_000 + int(rng.integers(0, 3_600_000_000))
        rows.append(("a" if i % 2 else "b",
                     int(us),
                     int(rng.integers(-100, 100)) if i % 17 else None))
    import datetime

    df = spark.createDataFrame(
        [(k, datetime.datetime.utcfromtimestamp(us / 1e6), v) for k, us, v in rows],
        "k string, ts timestamp, v long",
    )
    got = {
        (r["k"], r["hour"]): r.asDict()
        for r in seasonal_profile(df, "k", "ts", "v", period_hours=24).collect()
    }
    from collections import defaultdict

    ph = defaultdict(list)
    for k, us, v in rows:
        if v is not None:
            ph[(k, (us // 3_600_000_000) % 24)].append(v)
    assert set(got) == set(ph)
    for (k, h), vs in ph.items():
        allv = [v for (kk, _), lst in ph.items() if kk == k for v in lst]
        r = got[(k, h)]
        assert r["n"] == len(vs)
        assert r["mean_v"] == sum(vs) / len(vs)
        assert r["key_mean"] == sum(allv) / len(allv)
        assert r["seasonal_idx"] == sum(vs) / len(vs) - sum(allv) / len(allv)
    for k in ("a", "b"):
        wsum = sum(got[(k, h)]["n"] * got[(k, h)]["seasonal_idx"]
                   for (kk, h) in got if kk == k)
        assert abs(wsum) < 1e-6


# ----------------------------------------------------------- AMOC changepoint


def test_changepoint_amoc_finds_planted_shift(spark):
    """Planted level shift is recovered at the exact split; statistic
    matches the brute-force model; n<2 keys yield NULL split; smallest-t
    tie-break is honored on a symmetric series."""
    import math

    from osmflat_rs_spark.operators.trend import changepoint_amoc

    rows = []
    for i in range(40):
        rows.append(("shift", i, 10 if i < 25 else 60))
    rows += [("single", 0, 5)]
    rows += [("tie", 0, 0), ("tie", 1, 100), ("tie", 2, 0)]
    df = spark.createDataFrame(rows, "k string, o long, v long")
    got = {r["k"]: r.asDict() for r in changepoint_amoc(df, "k", "o", "v").collect()}
    assert got["shift"]["t_star"] == 25 and got["shift"]["split_order"] == 24
    vs = [v for k, _, v in rows if k == "shift"]

    def stat(t):
        ml = sum(vs[:t]) / t
        mr = sum(vs[t:]) / (len(vs) - t)
        return abs(ml - mr) * math.sqrt(t * (len(vs) - t) / len(vs))

    best = max(range(1, len(vs)), key=lambda t: (stat(t), -t))
    assert got["shift"]["t_star"] == best
    assert abs(got["shift"]["stat"] - stat(best)) < 1e-9
    assert got["shift"]["mean_l"] == 10.0 and got["shift"]["mean_r"] == 60.0
    assert got["single"]["n"] == 1 and got["single"]["t_star"] is None
    # symmetric: stat(1) == stat(2); smallest t wins
    assert got["tie"]["t_star"] == 1


# ------------------------------------------------------------- isotonic PAVA


def test_isotonic_fit_properties_and_hand_case(spark):
    """PAVA fit is monotone, preserves the weighted mean, fixes the
    textbook violator case exactly, and leaves already-monotone data
    untouched."""
    import numpy as np

    from osmflat_rs_spark.operators.trend import isotonic_fit

    # hand case: means [1, 3, 2] with weights [1, 1, 2]
    rows = [("h", 0, 1), ("h", 1, 3), ("h", 2, 2), ("h", 2, 2)]
    rows += [("m", 0, 1), ("m", 1, 2), ("m", 2, 5)]
    rng = np.random.default_rng(157)
    for x in range(30):
        for _ in range(int(rng.integers(1, 8))):
            rows.append(("r", x, int(rng.integers(0, 100)) + 2 * x))
    df = spark.createDataFrame(rows, "g string, x long, v long")
    got = {}
    for r in isotonic_fit(df, "g", "x", "v").collect():
        got.setdefault(r["g"], {})[r["x"]] = r
    # violator pooled: blocks {1}, then {3,2,2} -> (3+4)/3
    assert got["h"][0]["fit"] == 1.0
    assert abs(got["h"][1]["fit"] - 7 / 3) < 1e-15
    assert got["h"][2]["fit"] == got["h"][1]["fit"]
    # monotone input unchanged
    for x in (0, 1, 2):
        assert got["m"][x]["fit"] == got["m"][x]["y_mean"]
    # random group: monotone + weighted-mean preserving
    xs = sorted(got["r"])
    fits = [got["r"][x]["fit"] for x in xs]
    assert all(a <= b + 1e-12 for a, b in zip(fits, fits[1:]))
    wsum = sum(got["r"][x]["n"] * got["r"][x]["fit"] for x in xs)
    vsum = sum(v for g, x, v in rows if g == "r")
    assert abs(wsum - vsum) < 1e-6


def test_acf_matches_statsmodels_convention(spark):
    """Per-key sample ACF matches the numpy full-variance-denominator
    model (statsmodels acf(adjusted=False)); an AR-ish series shows
    decaying positive r; white noise shows |r| small; short/constant
    series yield NULL; max_lag validated."""
    import numpy as np

    from osmflat_rs_spark.operators.trend import acf

    rng = np.random.default_rng(241)
    # AR(1)-ish integer series: x_t = 0.8 x_{t-1} + noise, scaled ints
    xs = [0.0]
    for _ in range(499):
        xs.append(0.8 * xs[-1] + rng.normal(0, 10))
    ar = [int(round(v * 100)) for v in xs]
    wn = [int(x) for x in rng.integers(-1000, 1001, 500)]
    rows = [("ar", i, v) for i, v in enumerate(ar)] + [("wn", i, v) for i, v in enumerate(wn)]
    rows += [("const", i, 7) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    got = {(r["k"], r["lag"]): r.asDict() for r in acf(df, "k", "t", "x", max_lag=3).collect()}

    def model(series, k):
        s = np.asarray(series, dtype=float)
        n = len(s)
        xb = s.mean()
        num = ((s[:-k] - xb) * (s[k:] - xb)).sum()
        den = ((s - xb) ** 2).sum()
        return num / den

    for k in (1, 2, 3):
        assert abs(got[("ar", k)]["r"] - model(ar, k)) < 1e-5
        assert abs(got[("wn", k)]["r"] - model(wn, k)) < 1e-5
        assert got[("const", k)]["r"] is None  # zero variance
        assert got[("ar", k)]["n_pairs"] == 500 - k
    assert got[("ar", 1)]["r"] > 0.6       # AR structure detected
    assert abs(got[("wn", 1)]["r"]) < 0.15  # white noise ~ 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        acf(df, "k", "t", "x", max_lag=0)


def test_decompose_recovers_planted_seasonality(spark):
    """trend + seasonal + resid == x on interior rows; the planted
    period-4 pattern is recovered (seasonal correlates with the
    plant, resid variance << raw variance); edges get NULL trend;
    params validated."""
    import numpy as np

    from osmflat_rs_spark.operators.trend import decompose

    rng = np.random.default_rng(257)
    season = [400, -100, -250, -50]  # sums to 0
    rows = []
    for k in ("u", "v"):
        for t in range(200):
            x = 1000 + 2 * t + season[t % 4] + int(rng.integers(-20, 21))
            rows.append((k, t, x))
    df = spark.createDataFrame(rows, "k string, t long, x long")
    got = {(r["k"], r["t"]): r.asDict() for r in decompose(df, "k", "t", "x", period=4).collect()}
    assert len(got) == 400
    xs = {(k, t): x for k, t, x in rows}
    for (k, t), r in got.items():
        assert r["x"] == xs[(k, t)]
        if t < 2 or t >= 198:
            assert r["trend"] is None and r["resid"] is None
        else:
            # additive identity holds to rounding
            assert abs((r["trend"] + r["seasonal"] + r["resid"]) - r["x"]) < 2e-6
    # seasonal pattern recovered: phase ordering matches the plant
    ph = {p: got[("u", 100 + p)]["seasonal"] for p in range(4)}
    assert ph[0] > ph[3] > ph[1] > ph[2]
    assert abs(ph[0] - 400) < 30 and abs(ph[2] + 250) < 30
    # residuals are small relative to the raw signal
    interior = [r["resid"] for r in got.values() if r["resid"] is not None]
    assert np.std(interior) < 40
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decompose(df, "k", "t", "x", period=1)


def test_rolling_ols_matches_polyfit(spark):
    """Windowed slope/intercept equal numpy polyfit over each full
    window; a pure linear series returns its exact slope everywhere;
    edges are NULL; params validated."""
    import numpy as np

    from osmflat_rs_spark.operators.trend import rolling_ols

    rng = np.random.default_rng(283)
    xs = [int(5 * t + rng.integers(-10, 11)) for t in range(80)]
    lin = [int(7 * t + 3) for t in range(40)]
    rows = [("a", t, v) for t, v in enumerate(xs)] + [("b", t, v) for t, v in enumerate(lin)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    H = 5
    got = {(r["k"], r["t"]): r.asDict() for r in rolling_ols(df, "k", "t", "x", half_window=H).collect()}
    for t in range(80):
        r = got[("a", t)]
        if t < H or t >= 80 - H:
            assert r["slope"] is None and r["icept"] is None
        else:
            win = np.array(xs[t - H : t + H + 1], dtype=float)
            off = np.arange(-H, H + 1, dtype=float)
            sl, ic = np.polyfit(off, win, 1)
            assert abs(r["slope"] - sl) < 1e-6
            assert abs(r["icept"] - ic) < 1e-6
    for t in range(H, 40 - H):
        assert got[("b", t)]["slope"] == 7.0
        assert got[("b", t)]["icept"] == float(7 * t + 3)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rolling_ols(df, "k", "t", "x", half_window=0)


def test_acf_and_rolling_ols_single_exchange(spark):
    """The per-key groupBy (acf) rides the window's hash(key)
    partitioning and the rolling fit is window-only: both plans hold
    at exactly ONE Exchange — the shape that survives a 100x
    scale-up."""
    from osmflat_rs_spark.operators.trend import acf, rolling_ols

    df = spark.createDataFrame(
        [("k%d" % (i % 5), i, i * 3 % 100) for i in range(500)], "k string, t long, x long"
    )
    for out in (acf(df, "k", "t", "x", max_lag=3), rolling_ols(df, "k", "t", "x", half_window=3)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        n = plan.count("Exchange") - plan.count("ReusedExchange")
        assert n == 1, f"expected 1 Exchange:\n{plan[:2000]}"


def test_forecast_accuracy_matches_model(spark):
    """All four metrics match the exact lattice model; a perfect
    forecast scores 0/0/0/0; naive-equivalent forecast has MASE ~1;
    zero-denominator sMAPE rows contribute 0."""
    import math

    import numpy as np

    from osmflat_rs_spark.operators.trend import forecast_accuracy

    rng = np.random.default_rng(359)
    rows = []
    series = {}
    for k in ("a", "b"):
        xs = [int(1000 + 50 * math.sin(t / 5) * (1 if k == "a" else 3) + rng.integers(-9, 10))
              for t in range(100)]
        series[k] = xs
        for t, a in enumerate(xs):
            f = a + int(rng.integers(-15, 16)) if k == "a" else (xs[t - 1] if t else a)
            rows.append((k, t, a, f))
    rows.append(("z", 0, 0, 0))  # |a|+|f| = 0 -> smape term 0
    rows.append(("z", 1, 5, 5))
    df = spark.createDataFrame(rows, "k string, t long, a long, f long")
    got = {r["k"]: r.asDict() for r in forecast_accuracy(df, "k", "t", "a", "f").collect()}
    SC = 10**9
    for k in ("a", "b", "z"):
        sub = [(t, a, f) for kk, t, a, f in rows if kk == k]
        sub.sort()
        n = len(sub)
        se = sum(abs(a - f) for _, a, f in sub)
        se2 = sum((a - f) ** 2 for _, a, f in sub)
        ssm = sum(
            math.floor(2 * abs(a - f) / (abs(a) + abs(f)) * SC + 0.5) if abs(a) + abs(f) > 0 else 0
            for _, a, f in sub
        )
        snaive = sum(abs(sub[i][1] - sub[i - 1][1]) for i in range(1, n))
        r = got[k]
        assert r["n"] == n
        assert r["mae"] == round(se / n, 6)
        assert r["rmse"] == round(math.sqrt(se2 / n), 6)
        assert r["smape"] == round(ssm / n / SC, 6)
        if snaive > 0:
            assert r["mase"] == round(se * (n - 1) / (n * snaive), 6)
    # b's forecast IS naive lag-1 -> MASE == (n-1)/n (the off-by-one of
    # the first row's zero-error naive term)
    assert abs(got["b"]["mase"] - 99 / 100) < 1e-6
    # perfect forecast
    perf = spark.createDataFrame([("p", t, 10 + t, 10 + t) for t in range(10)],
                                 "k string, t long, a long, f long")
    r = forecast_accuracy(perf, "k", "t", "a", "f").collect()[0]
    assert r["mae"] == r["rmse"] == r["smape"] == 0.0 and r["mase"] == 0.0


def test_decompose_short_series_rows_survive(spark):
    """A key shorter than the MA window keeps ALL its rows with NULL
    trend/seasonal/resid instead of vanishing (left-join contract)."""
    from osmflat_rs_spark.operators.trend import decompose

    rows = [("long", t, 100 + t) for t in range(30)] + [("tiny", t, 5) for t in range(3)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    got = decompose(df, "k", "t", "x", period=4).collect()
    assert len(got) == 33
    tiny = [r for r in got if r["k"] == "tiny"]
    assert len(tiny) == 3
    assert all(r["trend"] is None and r["seasonal"] is None and r["resid"] is None for r in tiny)
    assert all(r["x"] == 5 for r in tiny)

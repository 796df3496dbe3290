"""Cross-engine float-stability guard (ADVICE r01 low #4).

Three driver gates compare values that pass through floating point in two
engines (JVM libm vs DuckDB libm; different summation orders):

- ``tile_events``: FLOOR of a transcendental — a 1-ulp difference at a
  tile boundary would flip tile_y;
- ``road_length_users`` / ``q1_pricing``: ROUND(SUM(double), k) — the
  accumulation order differs between engines and can cross a rounding
  boundary.

These tests measure, at the gate SF (sf0.01 — the one the driver runs
CORRECTNESS at), the minimum distance of every such value from its
nearest decision boundary, and assert it exceeds the worst plausible
cross-engine divergence by ≥2 orders of magnitude. If driver data ever
changes to put a value on a knife edge, this fails loudly instead of the
gate flaking.

Measured at round 2: tile_y margin 5.8e-05 (error ~1e-12), road-sum
margin 2.7e-3 on x*100 (error ~1e-7), q1 margins ≥5e-2 (error ~1e-3
worst-case bound, ~4e-6 realistic random-walk)."""

import duckdb
import numpy as np
import pytest

import __spark_entry__ as e

SF_DIR = "/root/testdata/sf0.01"

# worst plausible |engine - oracle| divergence, with safety factor 100
TILE_ERR = 1e-9  # 1-ulp libm differences scaled by n=2^14
SUM_ERR = 1e-4  # accumulation-order noise on ~1e8-magnitude sums (x100 scale)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "lineitem"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    c.sql(f"CREATE VIEW synth AS ({e._SYNTH_SQL})")
    return c


def test_tile_events_floor_margin(con):
    ev = con.sql("SELECT lat, lon FROM synth").df()
    lat = ev["lat"].to_numpy(np.float64) / 1e7
    lon = ev["lon"].to_numpy(np.float64) / 1e7
    n = 1 << e.ZOOM
    latr = np.radians(np.clip(lat, -85.05112878, 85.05112878))
    fy = (1.0 - np.log(np.tan(latr) + 1.0 / np.cos(latr)) / np.pi) / 2.0 * n
    fx = (lon + 180.0) / 360.0 * n
    assert np.abs(fy - np.round(fy)).min() > 100 * TILE_ERR
    assert np.abs(fx - np.round(fx)).min() > 100 * TILE_ERR


def test_road_length_round_margin(con):
    hav = e._haversine_sql("lat", "lon", "lat2", "lon2")
    df = con.sql(
        f"""
        WITH seg AS (SELECT user_id, lat, lon,
          LEAD(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lat2,
          LEAD(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lon2 FROM synth)
        SELECT SUM({hav}) AS s, COUNT(*) AS n
        FROM seg WHERE lat2 IS NOT NULL GROUP BY user_id
        """
    ).df()
    sums = df["s"].to_numpy(np.float64)
    counts = df["n"].to_numpy(np.float64)
    frac_from_half = np.abs((sums * 100) - np.floor(sums * 100) - 0.5)
    # per-group worst-case accumulation divergence on the x*100 scale:
    # (n_terms + a few per-row libm ulps) * ulp(|sum|) * 100
    err = (counts + 8) * np.abs(sums) * 2.3e-16 * 100
    assert (frac_from_half > 100 * err).all(), (
        f"min margin {frac_from_half.min():.2e} vs 100x error bound {err.max():.2e}"
    )


def test_q1_pricing_round_margin(con):
    q1 = con.sql(
        """SELECT SUM(l_quantity) a, SUM(l_extendedprice) b,
                  SUM(l_extendedprice*(1-l_discount)) c, AVG(l_quantity) d
           FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
           GROUP BY l_returnflag, l_linestatus"""
    ).df()

    def margin(vals, dec):
        v = np.asarray(vals, np.float64) * 10**dec
        return np.abs(v - np.floor(v) - 0.5).min()

    assert margin(q1["a"], 2) > 100 * SUM_ERR
    assert margin(q1["b"], 2) > 100 * SUM_ERR
    assert margin(q1["c"], 2) > 100 * SUM_ERR
    assert margin(q1["d"], 4) > 100 * SUM_ERR

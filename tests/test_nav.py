"""Navigation functions (functions/nav.py) vs a numpy spherical model
and geometric invariants: on-route points have zero cross-track, rhumb
distance >= great-circle and equals it on meridians, destination point
round-trips through the inverse great-circle distance."""

import math

import numpy as np
from pyspark.sql import functions as F

from osmflat_rs_spark.functions.geo import EARTH_RADIUS_M
from osmflat_rs_spark.functions import nav

R = float(EARTH_RADIUS_M)


def _np_bearing(lat1, lon1, lat2, lon2):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dl = np.radians(lon2) - np.radians(lon1)
    return np.arctan2(
        np.sin(dl) * np.cos(p2),
        np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dl),
    )


def _np_angle(lat1, lon1, lat2, lon2):
    dlat_h = (np.radians(lat2) - np.radians(lat1)) / 2
    dlon_h = (np.radians(lon2) - np.radians(lon1)) / 2
    a = np.sin(dlat_h) ** 2 + np.cos(np.radians(lat1)) * np.cos(
        np.radians(lat2)
    ) * np.sin(dlon_h) ** 2
    return 2 * np.arcsin(np.sqrt(a))


def test_cross_track_numpy_parity_and_on_route_zero(spark):
    """Random points vs the numpy formulary; a point ON the route's
    great circle (the start itself, and the midpoint by construction on
    the equator route) has |xt| ~ 0; sign flips across the route."""
    rng = np.random.default_rng(11)
    a = (52.40, 13.20)
    b = (52.60, 13.60)
    lats = 52.4 + rng.uniform(0, 0.2, 50)
    lons = 13.2 + rng.uniform(0, 0.4, 50)
    rows = [(i, float(lats[i]), float(lons[i])) for i in range(50)]
    rows.append((100, a[0], a[1]))  # on route: xt == 0 exactly
    df = spark.createDataFrame(rows, "id long, plat double, plon double")
    got = {
        r["id"]: (r["xt"], r["at"])
        for r in df.select(
            "id",
            nav.cross_track_m(
                F.col("plat"), F.col("plon"),
                F.lit(a[0]), F.lit(a[1]), F.lit(b[0]), F.lit(b[1]),
            ).alias("xt"),
            nav.along_track_m(
                F.col("plat"), F.col("plon"),
                F.lit(a[0]), F.lit(a[1]), F.lit(b[0]), F.lit(b[1]),
            ).alias("at"),
        ).collect()
    }
    assert abs(got[100][0]) < 1e-6 and abs(got[100][1]) < 1e-6
    t12 = _np_bearing(*a, *b)
    signs = set()
    for i in range(50):
        d13 = _np_angle(*a, lats[i], lons[i])
        t13 = _np_bearing(*a, lats[i], lons[i])
        xt = np.arcsin(np.clip(np.sin(d13) * np.sin(t13 - t12), -1, 1))
        at = np.arccos(np.clip(np.cos(d13) / np.cos(xt), -1, 1))
        if np.cos(t13 - t12) < 0:
            at = -at
        assert abs(got[i][0] - xt * R) < 1e-6, i
        assert abs(got[i][1] - at * R) < 1e-6, i
        signs.add(got[i][0] > 0)
    assert signs == {True, False}  # points on both sides of the route


def test_rhumb_vs_great_circle_and_meridian_equality(spark):
    """Rhumb distance >= great-circle everywhere; on a meridian (same
    lon) the two coincide; rhumb bearing on a due-east course is 90°."""
    rows = [
        (0, 52.40, 13.30, 52.55, 13.30),   # meridian
        (1, 52.50, 13.20, 52.50, 13.55),   # east-west (the dpsi guard path)
        (2, 52.41, 13.21, 52.58, 13.57),   # diagonal
    ]
    df = spark.createDataFrame(rows, "id long, a double, b double, c double, d double")
    from osmflat_rs_spark.functions.geo import haversine_m

    out = {
        r["id"]: r
        for r in df.select(
            "id",
            nav.rhumb_distance_m(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("rh"),
            haversine_m(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("gc"),
            F.degrees(
                nav.rhumb_bearing_rad(F.col("a"), F.col("b"), F.col("c"), F.col("d"))
            ).alias("brg"),
        ).collect()
    }
    for i in (0, 1, 2):
        assert out[i]["rh"] >= out[i]["gc"] - 1e-9
    assert abs(out[0]["rh"] - out[0]["gc"]) < 1e-6      # meridian: equal
    assert abs(out[0]["brg"]) < 1e-9                     # due north
    assert abs(out[1]["brg"] - 90.0) < 1e-9              # due east
    # east-west rhumb length = dlon * cos(lat) * R (small-circle arc)
    want = math.radians(0.35) * math.cos(math.radians(52.5)) * R
    assert abs(out[1]["rh"] - want) < 1e-6


def test_destination_point_roundtrip(spark):
    """destination(p, brg, d) must land at great-circle distance d from
    p (the direct problem inverts the inverse one), and bearing 0 moves
    due north (same lon)."""
    rng = np.random.default_rng(23)
    rows = [
        (i, 52.4 + float(rng.uniform(0, 0.2)), 13.2 + float(rng.uniform(0, 0.4)),
         float(rng.uniform(0, 2 * math.pi)), float(rng.uniform(50, 20000)))
        for i in range(30)
    ]
    rows.append((100, 52.5, 13.4, 0.0, 5000.0))
    df = spark.createDataFrame(rows, "id long, plat double, plon double, brg double, d double")
    got = df.select(
        "id", "plat", "plon", "d",
        nav.destination_lat_deg(F.col("plat"), F.col("brg"), F.col("d")).alias("la2"),
        nav.destination_lon_deg(
            F.col("plat"), F.col("plon"), F.col("brg"), F.col("d")
        ).alias("lo2"),
    ).collect()
    for r in got:
        back = _np_angle(r["plat"], r["plon"], r["la2"], r["lo2"]) * R
        assert abs(back - r["d"]) < 1e-3, (r["id"], back, r["d"])
        if r["id"] == 100:
            assert abs(r["lo2"] - 13.4) < 1e-12
            assert r["la2"] > 52.5


def test_sphere_ring_area_square_and_numpy_parity(spark):
    """Chamberlain-Duquette spherical area: a ~1km x ~1km fixed-point
    'square' at 52.5N has area ~ (dlat_m * dlon_m * cos(lat)) within
    0.2%; random rings match the numpy restatement of the line integral
    exactly (same formula, same double ops)."""
    from osmflat_rs_spark.functions.geo import sphere_ring_area_m2

    rng = np.random.default_rng(7)
    rows = []
    # group 0: an axis-aligned square, 0.01 deg on each side, CCW
    sq = [(525_000_000, 134_000_000), (525_000_000, 134_100_000),
          (525_100_000, 134_100_000), (525_100_000, 134_000_000)]
    for s, (la, lo) in enumerate(sq):
        rows.append((0, s, la, lo))
    # random rings
    for g in (1, 2, 3):
        n = int(rng.integers(4, 30))
        for s in range(n):
            rows.append(
                (g, s,
                 int(524_000_000 + rng.integers(0, 2_000_000)),
                 int(132_000_000 + rng.integers(0, 4_000_000)))
            )
    df = spark.createDataFrame(rows, "user_id long, seq long, lat long, lon long")
    got = {
        r["user_id"]: (r["n_vertices"], r["area_m2"])
        for r in sphere_ring_area_m2(df, "user_id", ["seq"]).collect()
    }
    R = EARTH_RADIUS_M
    # square sanity: planar estimate dlat_m * dlon_m * cos(mid lat)
    dlat_m = math.radians(0.01) * R
    dlon_m = math.radians(0.01) * R * math.cos(math.radians(52.505))
    approx = dlat_m * dlon_m
    assert got[0][0] == 4
    assert abs(got[0][1] - approx) / approx < 0.002
    # numpy parity on the random rings
    by_g = {}
    for g, s, la, lo in rows:
        by_g.setdefault(g, []).append((s, la, lo))
    for g, pts in by_g.items():
        pts.sort()
        phi = np.radians(np.array([p[1] for p in pts]) / 1e7)
        lam = np.radians(np.array([p[2] for p in pts]) / 1e7)
        phi2, lam2 = np.roll(phi, -1), np.roll(lam, -1)
        want = abs(np.sum((lam2 - lam) * (2 + np.sin(phi) + np.sin(phi2)))) * (R * R / 2)
        assert abs(got[g][1] - want) < 1e-6 * max(1.0, want), g


def test_ring_centroid_square_center_and_model_parity(spark):
    """Area-weighted centroid of an axis-aligned square is its exact
    center (where the vertex mean would drift if vertices are uneven);
    random rings match the numpy restatement; orientation (CW vs CCW)
    does not change the centroid (signs cancel)."""
    from osmflat_rs_spark.functions.geo import ring_centroid_stats

    rng = np.random.default_rng(37)
    rows = []
    # group 0: square with an EXTRA collinear vertex on one edge — the
    # vertex mean is biased toward that edge, the area centroid is not
    sq = [(524_000_000, 132_000_000), (524_000_000, 132_200_000),
          (524_000_000, 132_400_000),  # extra collinear vertex: the
          # first three share lat, so the south edge carries 3 of the
          # 5 vertices and biases the vertex mean
          (524_400_000, 132_400_000), (524_400_000, 132_000_000)]
    for s, (la, lo) in enumerate(sq):
        rows.append((0, s, la, lo))
    for g in (1, 2):
        n = int(rng.integers(4, 20))
        for s in range(n):
            rows.append((g, s,
                         int(524_000_000 + rng.integers(0, 2_000_000)),
                         int(132_000_000 + rng.integers(0, 4_000_000))))
    # group 3: group 1 reversed (opposite orientation)
    g1 = sorted([r for r in rows if r[0] == 1], key=lambda r: r[1])
    for s, r in enumerate(reversed(g1)):
        rows.append((3, s, r[2], r[3]))
    df = spark.createDataFrame(rows, "user_id long, seq long, lat long, lon long")
    got = {
        r["user_id"]: r
        for r in ring_centroid_stats(
            df, "user_id", ["seq"], lat0=524_000_000, lon0=132_000_000
        ).collect()
    }
    assert abs(got[0]["cx_deg"] - 13.22) < 1e-9      # center lon
    assert abs(got[0]["cy_deg"] - 52.42) < 1e-9      # center lat
    # orientation invariance
    assert abs(got[1]["cx_deg"] - got[3]["cx_deg"]) < 1e-9
    assert abs(got[1]["cy_deg"] - got[3]["cy_deg"]) < 1e-9
    assert got[1]["area2x"] == -got[3]["area2x"]
    # numpy model parity
    for g in (1, 2):
        pts = sorted([r for r in rows if r[0] == g], key=lambda r: r[1])
        y = np.array([p[2] - 524_000_000 for p in pts], dtype=np.int64)
        x = np.array([p[3] - 132_000_000 for p in pts], dtype=np.int64)
        xn, yn = np.roll(x, -1), np.roll(y, -1)
        cross = x * yn - xn * y
        a2 = int(cross.sum())
        cx = (132_000_000 + float(((x + xn).astype(float) * cross.astype(float)).sum()) / (3.0 * a2)) / 1e7
        cy = (524_000_000 + float(((y + yn).astype(float) * cross.astype(float)).sum()) / (3.0 * a2)) / 1e7
        assert got[g]["area2x"] == a2
        assert abs(got[g]["cx_deg"] - cx) < 1e-9
        assert abs(got[g]["cy_deg"] - cy) < 1e-9


def test_ring_compactness_circle_square_ordering(spark):
    """Polsby-Popper: a 64-gon 'circle' scores ~1 (>0.99), an
    axis-aligned square ~pi/4, and a long thin rectangle far less —
    the canonical compactness ordering; perimeter matches the summed
    haversine model."""
    from osmflat_rs_spark.functions.geo import haversine_m  # noqa: F401
    from osmflat_rs_spark.functions.geo import ring_compactness

    rows = []
    # 64-gon around (52.5, 13.4), radius ~0.05 deg lat (lon scaled by
    # 1/cos(lat) so the shape is metrically round)
    k = math.cos(math.radians(52.5))
    for s in range(64):
        th = 2 * math.pi * s / 64
        rows.append((0, s,
                     int(525_000_000 + 500_000 * math.sin(th)),
                     int(134_000_000 + 500_000 / k * math.cos(th))))
    # square ~ 0.04 x 0.04 deg-lat-equivalent
    sqv = [(0, 0), (0, 1), (1, 1), (1, 0)]
    for s, (a, b) in enumerate(sqv):
        rows.append((1, s,
                     524_000_000 + a * 400_000,
                     132_000_000 + int(b * 400_000 / k)))
    # 16:1 thin rectangle of the same area
    for s, (a, b) in enumerate(sqv):
        rows.append((2, s,
                     524_000_000 + a * 100_000,
                     132_000_000 + int(b * 1_600_000 / k)))
    df = spark.createDataFrame(rows, "user_id long, seq long, lat long, lon long")
    got = {
        r["user_id"]: r
        for r in ring_compactness(df, "user_id", ["seq"]).collect()
    }
    assert got[0]["polsby_popper"] > 0.99
    assert abs(got[1]["polsby_popper"] - math.pi / 4) < 0.01
    assert got[2]["polsby_popper"] < 0.45
    assert got[0]["polsby_popper"] > got[1]["polsby_popper"] > got[2]["polsby_popper"]
    # perimeter of the square ~ 4 * 0.04deg-lat in meters (within 0.5%)
    side = math.radians(0.04) * R
    assert abs(got[1]["perimeter_m"] - 4 * side) / (4 * side) < 0.005


def test_geometric_median_robustness_and_model_parity(spark):
    """The geometric median barely moves under one far outlier (where
    the mean center lurches toward it); values match a numpy Weiszfeld
    restatement with the identical skip-at-zero rule; a group whose
    points all coincide returns that point."""
    from osmflat_rs_spark.operators.hotspot import geometric_median, mean_center

    rng = np.random.default_rng(61)
    rows = []
    cloud = [(int(524_000_000 + rng.integers(0, 100_000)),
              int(132_000_000 + rng.integers(0, 100_000))) for _ in range(40)]
    for g, extra in ((0, []), (1, [(900_000_000, 1_700_000_000)])):  # far outlier
        for la, lo in cloud + extra:
            rows.append((g, la, lo))
    for _ in range(5):
        rows.append((2, 524_500_000, 133_000_000))  # degenerate: one point
    df = spark.createDataFrame(rows, "user_id long, lat long, lon long")
    got = {
        r["user_id"]: (r["med_lat"], r["med_lon"], r["n"])
        for r in geometric_median(df, "user_id", iters=5).collect()
    }
    mc = {
        r["user_id"]: (r["mean_lat"], r["mean_lon"])
        for r in mean_center(df, "user_id").collect()
    }
    # robustness: the outlier moves the median < 2000 fixed units but
    # the mean by millions
    assert abs(got[1][0] - got[0][0]) < 2_000
    assert abs(mc[1][0] - mc[0][0]) > 5_000_000
    assert got[2] == (524_500_000.0, 133_000_000.0, 5)

    def model(pts, iters=5):
        p = np.array(pts, dtype=np.float64)
        c = p.mean(axis=0)
        for _ in range(iters):
            d = np.sqrt(((p - c) ** 2).sum(axis=1))
            w = np.where(d > 0, 1.0 / d, 0.0)
            if w.sum() > 0:
                c = (p * w[:, None]).sum(axis=0) / w.sum()
        return c
    for g, pts in ((0, cloud), (1, cloud + [(900_000_000, 1_700_000_000)])):
        want = model(pts)
        assert abs(got[g][0] - want[0]) < 1e-3 and abs(got[g][1] - want[1]) < 1e-3, g


def test_areal_interpolate_known_split_and_conservation(spark):
    """A rect straddling four cells splits its value by exact area
    fractions; per-source mass is conserved (outputs sum to inputs);
    degenerate (zero-area) rects drop; a rect edge exactly on a cell
    boundary leaves no zero-weight sliver row."""
    from osmflat_rs_spark.operators.bbox import areal_interpolate

    cell = 1000
    rows = [
        # 1: straddles 4 cells: [500,1500]x[750,1250]; area 500000
        (1, 500, 750, 1500, 1250, 80.0),
        # 2: exactly one cell, edges ON the boundaries of cell (2,2)
        (2, 2000, 2000, 3000, 3000, 7.0),
        # 3: degenerate line
        (3, 5000, 5000, 5000, 6000, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "id long, x_min long, y_min long, x_max long, y_max long, value double"
    )
    got = {
        (r["cx"], r["cy"]): r["value"]
        for r in areal_interpolate(df, cell).collect()
    }
    # rect 1 quadrant areas: x splits 500/500, y splits 250/250 of a
    # 1000x500 box -> each quadrant 1/4 of the value
    for c in [(0, 0), (1, 0), (0, 1), (1, 1)]:
        assert abs(got[c] - 20.0) < 1e-12, c
    # rect 2: boundary-aligned -> all mass in (2,2); the sliver cells
    # (3,2),(2,3),(3,3) its fdiv cover touches must NOT appear
    assert abs(got[(2, 2)] - 7.0) < 1e-12
    assert (3, 2) not in got and (2, 3) not in got and (3, 3) not in got
    # degenerate rect contributes nowhere
    assert abs(sum(got.values()) - 87.0) < 1e-9


def test_linear_reference_offsets_on_known_route(spark):
    """On an L-shaped route with known vertex spacing the snapped
    offset equals (sum of prior segment lengths + within-segment
    projection) by hand; out-of-radius points are absent; ties and
    clamping behave like nearest_segment_join."""
    from osmflat_rs_spark.operators.snap import linear_reference

    # route 7: east 1000 units, east 2000, then north 1000 (L corner)
    verts = [(0, 0), (0, 1000), (0, 3000), (1000, 3000)]
    routes = spark.createDataFrame(
        [(7, s, la + 524_000_000, lo + 132_000_000) for s, (la, lo) in enumerate(verts)],
        "route_id long, seq long, lat long, lon long",
    )
    qpts = [
        (0, 524_000_050, 132_000_500),   # above seg1 midpoint: offset 500
        (1, 524_000_050, 132_002_500),   # above seg2 at 1500 in: offset 2500
        (2, 524_000_500, 132_003_040),   # right of seg3: clamps x, offset 3500
        (3, 524_900_000, 132_900_000),   # far away: absent
    ]
    q = spark.createDataFrame(qpts, "query_id long, lat long, lon long")
    got = {
        r["query_id"]: r
        for r in linear_reference(q, routes, 200, point_id="query_id").collect()
    }
    assert 3 not in got and len(got) == 3
    assert abs(got[0]["offset"] - 500.0) < 1e-9 and got[0]["seq"] == 1
    assert abs(got[1]["offset"] - 2500.0) < 1e-9 and got[1]["seq"] == 2
    assert abs(got[2]["offset"] - 3500.0) < 1e-9 and got[2]["seq"] == 3
    assert abs(got[0]["d2"] - 50.0 ** 2) < 1e-9
    # within-segment parameter for query 1: 1500 into the 2000 segment
    assert abs(got[1]["t"] - 0.75) < 1e-12

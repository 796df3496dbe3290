"""convex_hull: independent Caratheodory-oracle parity (collinear-heavy
grids), degenerate groups, planet-scale exact arithmetic."""

from itertools import combinations

import numpy as np

from osmflat_rs_spark.operators.hull import _hull_of, convex_hull


def _oracle_hull(pts):
    """p is a vertex iff no triangle of 3 OTHER distinct points contains
    it inside-or-on (bbox guard for degenerate triangles) — a different
    construction from the monotone chain under test."""
    pts = sorted(set(map(tuple, pts)))

    def orient(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    out = []
    for p in pts:
        others = [q for q in pts if q != p]
        contained = False
        for a, b, c in combinations(others, 3):
            s1, s2, s3 = orient(a, b, p), orient(b, c, p), orient(c, a, p)
            if (
                ((s1 >= 0 and s2 >= 0 and s3 >= 0) or (s1 <= 0 and s2 <= 0 and s3 <= 0))
                and min(a[0], b[0], c[0]) <= p[0] <= max(a[0], b[0], c[0])
                and min(a[1], b[1], c[1]) <= p[1] <= max(a[1], b[1], c[1])
            ):
                contained = True
                break
        if not contained:
            out.append(p)
    return sorted(out)


def test_hull_matches_independent_oracle_on_collinear_grids():
    rng = np.random.default_rng(6)
    for _ in range(25):
        n = int(rng.integers(4, 25))
        pts = rng.integers(0, 12, size=(n, 2)).astype(np.int64)
        assert sorted(map(tuple, _hull_of(pts))) == _oracle_hull(pts.tolist())


def test_hull_degenerate_groups():
    # all collinear -> the two endpoints only
    pts = np.array([[0, 0], [2, 2], [5, 5], [9, 9], [3, 3]], dtype=np.int64)
    assert sorted(map(tuple, _hull_of(pts))) == [(0, 0), (9, 9)]
    # duplicates collapse; single distinct point survives
    pts = np.array([[4, 4], [4, 4], [4, 4]], dtype=np.int64)
    assert sorted(map(tuple, _hull_of(pts))) == [(4, 4)]


def test_hull_exact_at_planet_scale():
    big = 2**31
    # int64 cross products overflow at this scale and the float filter
    # cannot split a 1-unit offset from the 2^31 diagonal: the bigint
    # path must decide. 1 unit BELOW the diagonal -> a 4th hull corner;
    # exactly ON it -> collinear, excluded; 1 unit ABOVE -> interior.
    base = [[0, 0], [big, big], [0, big]]
    below = np.array(base + [[big // 2, big // 2 - 1]], dtype=np.int64)
    assert sorted(map(tuple, _hull_of(below))) == [
        (0, 0), (0, big), (big // 2, big // 2 - 1), (big, big)
    ]
    on = np.array(base + [[big // 2, big // 2]], dtype=np.int64)
    assert sorted(map(tuple, _hull_of(on))) == [(0, 0), (0, big), (big, big)]
    above = np.array(base + [[big // 2, big // 2 + 1]], dtype=np.int64)
    assert sorted(map(tuple, _hull_of(above))) == [(0, 0), (0, big), (big, big)]


def test_hull_spark_groups_and_partition_invariance(spark):
    rng = np.random.default_rng(11)
    rows = [
        (g, int(rng.integers(0, 50)), int(rng.integers(0, 50)))
        for g in range(12)
        for _ in range(30)
    ]
    df = spark.createDataFrame(rows, "g long, lat long, lon long")
    got = sorted(map(tuple, convex_hull(df, "g").collect()))
    want = []
    for g in range(12):
        pts = [(la, lo) for gg, la, lo in rows if gg == g]
        want += [(g, la, lo) for la, lo in _oracle_hull(pts)]
    assert got == sorted(want)
    assert sorted(map(tuple, convex_hull(df.repartition(7), "g").collect())) == got


def test_point_set_diameter_matches_bruteforce(spark):
    """Random groups vs brute-force all-pairs; degenerate single-point
    and all-identical groups; tie determinism (square's two diagonals)."""
    import numpy as np

    from osmflat_rs_spark.operators.hull import point_set_diameter

    rng = np.random.default_rng(23)
    rows = []
    for g in range(6):
        for _ in range(40):
            rows.append((g, int(rng.integers(-5_000, 5_000)), int(rng.integers(-5_000, 5_000))))
    rows.append((100, 7, 9))                      # single point
    rows += [(101, 3, 3)] * 4                     # all identical
    rows += [(102, 0, 0), (102, 0, 10), (102, 10, 0), (102, 10, 10)]  # square: tied diagonals
    df = spark.createDataFrame(rows, "user_id long, lat long, lon long")
    got = {r["user_id"]: (r["diam2"], r["lat_a"], r["lon_a"], r["lat_b"], r["lon_b"])
           for r in point_set_diameter(df, "user_id").collect()}
    by_g = {}
    for g, la, lo in rows:
        by_g.setdefault(g, []).append((la, lo))
    for g, pts in by_g.items():
        best = None
        for a in pts:
            for b in pts:
                if a <= b:
                    d2 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
                    key = (-d2, a[0], a[1], b[0], b[1])
                    if best is None or key < best:
                        best = key
        want = (-best[0], best[1], best[2], best[3], best[4])
        assert got[g] == want, (g, got[g], want)
    assert got[100] == (0, 7, 9, 7, 9)
    assert got[101] == (0, 3, 3, 3, 3)
    assert got[102] == (200, 0, 0, 10, 10)  # min-lex diagonal of the two


def test_point_set_diameter_overflow_guard(spark):
    import pytest as _pytest

    from osmflat_rs_spark.operators.hull import point_set_diameter

    df = spark.createDataFrame(
        [(1, -1_800_000_000, -3_600_000_000), (1, 1_800_000_000, 3_600_000_000)],
        "user_id long, lat long, lon long",
    )
    with _pytest.raises(Exception, match="int64|diam"):
        point_set_diameter(df, "user_id").collect()

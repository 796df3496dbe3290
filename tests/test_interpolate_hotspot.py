"""IDW interpolation and grid hotspot clustering vs independent
pure-Python oracles (brute-force kNN + BFS flood fill)."""

import math

import numpy as np
import pytest


def _idw_oracle(pts, queries, k, power):
    """Brute force: all distances, sort by (d2, id), weight 1/d^power."""
    out = {}
    for qid, qla, qlo in queries:
        d = sorted(
            ((la - qla) ** 2 + (lo - qlo) ** 2, i, v) for i, la, lo, v in pts
        )[:k]
        zeros = [v for d2, _, v in d if d2 == 0]
        if zeros:
            out[qid] = sum(zeros) / len(zeros)
        else:
            num = sum(v / math.sqrt(d2) ** power for d2, _, v in d)
            den = sum(1 / math.sqrt(d2) ** power for d2, _, _ in d)
            out[qid] = num / den
    return out


def test_idw_matches_bruteforce(spark):
    from osmflat_rs_spark.operators.interpolate import idw_interpolate

    rng = np.random.default_rng(5)
    X, Y = 132_000_000, 524_000_000
    pts = [
        (int(i), int(Y + rng.integers(0, 300_000)), int(X + rng.integers(0, 600_000)),
         float(rng.uniform(-50, 150)))
        for i in range(400)
    ]
    queries = [
        (f"q{j}", int(Y + rng.integers(0, 300_000)), int(X + rng.integers(0, 600_000)))
        for j in range(12)
    ]
    pdf = spark.createDataFrame(pts, "event_id long, lat long, lon long, value double")
    qdf = spark.createDataFrame(queries, "query_id string, lat long, lon long")
    for power in (2, 4):
        got = {
            r["query_id"]: (r["idw"], r["n_neighbors"])
            for r in idw_interpolate(
                pdf, qdf, k=5, power=power, metric="sqeuclid",
                res=14, radius_m=400_000, exact_fallback=True,
            ).collect()
        }
        want = _idw_oracle(pts, queries, k=5, power=power)
        assert set(got) == {q for q, _, _ in queries}
        for qid in want:
            assert got[qid][1] == 5
            assert got[qid][0] == pytest.approx(want[qid], rel=1e-9), (power, qid)


def test_idw_zero_distance_takes_exact_mean(spark):
    """Two observations AT the query point (values 10 and 30) -> 20,
    regardless of everything else within k."""
    from osmflat_rs_spark.operators.interpolate import idw_interpolate

    X, Y = 132_000_000, 524_000_000
    pts = [
        (1, Y, X, 10.0), (2, Y, X, 30.0),
        (3, Y + 100, X, 999.0), (4, Y, X + 200, -999.0), (5, Y + 300, X + 300, 5.0),
    ]
    pdf = spark.createDataFrame(pts, "event_id long, lat long, lon long, value double")
    qdf = spark.createDataFrame([("q0", Y, X)], "query_id string, lat long, lon long")
    row = idw_interpolate(
        pdf, qdf, k=5, metric="sqeuclid", res=14, radius_m=400_000
    ).collect()[0]
    assert row["idw"] == pytest.approx(20.0)


def _hotspot_oracle(pts, cs, min_pts):
    """Grid + BFS flood fill over 8-adjacent dense cells."""
    from collections import defaultdict, deque

    P, M = 1 << 30, 1 << 31
    cells = defaultdict(list)
    for i, la, lo in pts:
        cells[(lo // cs, la // cs)].append(i)
    core = {c for c, ids in cells.items() if len(ids) >= min_pts}
    label = {}
    for c in sorted(core, key=lambda c: (c[0] + P) * M + (c[1] + P)):
        if c in label:
            continue
        lbl = (c[0] + P) * M + (c[1] + P)
        dq = deque([c])
        label[c] = lbl
        while dq:
            x, y = dq.popleft()
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    n = (x + dx, y + dy)
                    if n in core and n not in label:
                        label[n] = lbl
                        dq.append(n)
    return {i: label[c] for c, ids in cells.items() if c in core for i in ids}


def test_hotspot_matches_bfs_oracle(spark):
    from osmflat_rs_spark.operators.hotspot import hotspot_clusters

    rng = np.random.default_rng(9)
    # three planted blobs + uniform noise; negative coords exercise floor
    blobs = [(-40_000, -30_000), (110_000, 45_000), (112_000, 47_500)]
    pts = []
    i = 0
    for bx, by in blobs:
        for _ in range(120):
            pts.append((i, int(by + rng.normal(0, 1500)), int(bx + rng.normal(0, 1500))))
            i += 1
    for _ in range(150):
        pts.append((i, int(rng.integers(-60_000, 60_000)), int(rng.integers(-60_000, 120_000))))
        i += 1
    cs, mp = 1000, 4
    want = _hotspot_oracle(pts, cs, mp)
    df = spark.createDataFrame(pts, "event_id long, lat long, lon long")
    got = {
        r["event_id"]: r["cluster"]
        for r in hotspot_clusters(df, cell_size=cs, min_pts=mp).collect()
    }
    assert got == want
    # sanity: the two close blobs may or may not merge, but there are
    # >= 2 clusters and most blob points are clustered
    assert len(set(want.values())) >= 2
    assert sum(1 for i in want if i < 360) > 150


def test_hotspot_isolated_core_cell_is_own_cluster(spark):
    from osmflat_rs_spark.operators.hotspot import hotspot_clusters

    pts = [(i, 500, 500) for i in range(5)] + [(9, 50_000, 50_000)]
    df = spark.createDataFrame(pts, "event_id long, lat long, lon long")
    got = hotspot_clusters(df, cell_size=1000, min_pts=3).collect()
    assert {r["event_id"] for r in got} == {0, 1, 2, 3, 4}
    assert len({r["cluster"] for r in got}) == 1


def test_gi_star_matches_python_oracle(spark):
    """Getis-Ord Gi* vs an independent dense-grid NumPy oracle that
    MATERIALIZES the empty cells the operator only reasons about:
    padded dense array, explicit box convolution, textbook formula."""
    import numpy as np
    from pyspark.sql import functions as F

    from osmflat_rs_spark.functions.cells import grid_exprs
    from osmflat_rs_spark.operators.tiling import gi_star

    rng = np.random.default_rng(17)
    X, Y = 132_000_000, 524_000_000
    pts = [
        (int(Y + rng.integers(0, 400_000)), int(X + rng.integers(0, 800_000)))
        for _ in range(600)
    ]
    df = spark.createDataFrame(pts, "lat long, lon long")
    res, r = 16, 2
    # shared cell assignment (grid encoding is pinned by the focal tests)
    ix, iy = grid_exprs(F.col("lat"), F.col("lon"), res)
    assign = [(row["ix"], row["iy"]) for row in df.select(ix.alias("ix"), iy.alias("iy")).collect()]
    xs = sorted({a for a, _ in assign}); ys = sorted({b for _, b in assign})
    ix0, ix1, iy0, iy1 = min(xs), max(xs), min(ys), max(ys)
    grid = np.zeros((ix1 - ix0 + 1, iy1 - iy0 + 1))
    for a, b in assign:
        grid[a - ix0, b - iy0] += 1
    n = grid.size
    xbar = grid.sum() / n
    s = np.sqrt((grid ** 2).sum() / n - xbar ** 2)
    want = {}
    for a in range(grid.shape[0]):
        for b in range(grid.shape[1]):
            if grid[a, b] == 0:
                continue  # operator emits occupied cells only
            sl = grid[max(0, a - r):a + r + 1, max(0, b - r):b + r + 1]
            w = sl.size
            z = (sl.sum() - xbar * w) / (s * np.sqrt((n * w - w * w) / (n - 1)))
            want[(a + ix0, b + iy0)] = (int(grid[a, b]), w, z)
    got = {
        (row["ix"], row["iy"]): (row["x"], row["w"], row["z"])
        for row in gi_star(df, res=res, radius=r).collect()
    }
    assert set(got) == set(want)
    assert len(got) > 100  # enough occupied cells AND empty bbox holes
    assert any(v[1] < (2 * r + 1) ** 2 for v in got.values())  # edge clamping hit
    for k in want:
        assert got[k][0] == want[k][0] and got[k][1] == want[k][1], k
        assert got[k][2] == pytest.approx(want[k][2], rel=1e-9), k
    # hot spots exist: some |z| should be meaningfully positive
    assert max(v[2] for v in got.values()) > 1.0


def test_morans_i_matches_dense_oracle(spark):
    """Moran's I: the engine's sparse-analytic form (empty cells never
    materialized) vs a dense NumPy double-sum that materializes them.
    Clustered data scores high positive; shuffled labels ~0."""
    import numpy as np
    from pyspark.sql import functions as F

    from osmflat_rs_spark.functions.cells import grid_exprs
    from osmflat_rs_spark.operators.tiling import morans_i

    rng = np.random.default_rng(23)
    X, Y = 132_000_000, 524_000_000
    # clustered: a few dense blobs -> strong positive autocorrelation
    pts = []
    for bx, by in [(100_000, 80_000), (500_000, 300_000), (700_000, 120_000)]:
        for _ in range(250):
            pts.append((int(Y + by + rng.normal(0, 40_000)), int(X + bx + rng.normal(0, 40_000))))
    for _ in range(100):
        pts.append((int(Y + rng.integers(0, 400_000)), int(X + rng.integers(0, 800_000))))
    df = spark.createDataFrame(pts, "lat long, lon long")
    res, r = 16, 1
    ix, iy = grid_exprs(F.col("lat"), F.col("lon"), res)
    assign = [(row["ix"], row["iy"]) for row in df.select(ix.alias("ix"), iy.alias("iy")).collect()]
    ix0 = min(a for a, _ in assign); ix1 = max(a for a, _ in assign)
    iy0 = min(b for _, b in assign); iy1 = max(b for _, b in assign)
    grid = np.zeros((ix1 - ix0 + 1, iy1 - iy0 + 1))
    for a, b in assign:
        grid[a - ix0, b - iy0] += 1
    n = grid.size
    dev = grid - grid.mean()
    num = 0.0
    s0 = 0
    A, B = grid.shape
    for a in range(A):
        for b in range(B):
            for da in range(-r, r + 1):
                for db in range(-r, r + 1):
                    if (da, db) == (0, 0):
                        continue
                    na, nb = a + da, b + db
                    if 0 <= na < A and 0 <= nb < B:
                        num += dev[a, b] * dev[na, nb]
                        s0 += 1
    want = (n / s0) * num / (dev ** 2).sum()
    row = morans_i(df, res=res, radius=r).collect()[0]
    assert row["n"] == n and row["s0"] == s0
    assert row["i"] == pytest.approx(want, rel=1e-9)
    assert row["i"] > 0.3  # clustered blobs autocorrelate strongly


def test_gearys_c_matches_dense_oracle(spark):
    """Geary's C: the engine's sparse-analytic form vs a dense NumPy
    pairwise double-sum over the materialized bbox grid. Clustered data
    scores well below 1; shuffled labels ~1 (complement of Moran)."""
    import numpy as np
    from pyspark.sql import functions as F

    from osmflat_rs_spark.functions.cells import grid_exprs
    from osmflat_rs_spark.operators.tiling import gearys_c

    rng = np.random.default_rng(31)
    X, Y = 132_000_000, 524_000_000
    pts = []
    for bx, by in [(100_000, 80_000), (500_000, 300_000), (700_000, 120_000)]:
        for _ in range(250):
            pts.append((int(Y + by + rng.normal(0, 40_000)), int(X + bx + rng.normal(0, 40_000))))
    for _ in range(100):
        pts.append((int(Y + rng.integers(0, 400_000)), int(X + rng.integers(0, 800_000))))
    df = spark.createDataFrame(pts, "lat long, lon long")
    res, r = 16, 1
    ix, iy = grid_exprs(F.col("lat"), F.col("lon"), res)
    assign = [(row["ix"], row["iy"]) for row in df.select(ix.alias("ix"), iy.alias("iy")).collect()]
    ix0 = min(a for a, _ in assign); ix1 = max(a for a, _ in assign)
    iy0 = min(b for _, b in assign); iy1 = max(b for _, b in assign)
    grid = np.zeros((ix1 - ix0 + 1, iy1 - iy0 + 1))
    for a, b in assign:
        grid[a - ix0, b - iy0] += 1
    n = grid.size
    num = 0.0
    s0 = 0
    A, B = grid.shape
    for a in range(A):
        for b in range(B):
            for da in range(-r, r + 1):
                for db in range(-r, r + 1):
                    if (da, db) == (0, 0):
                        continue
                    na, nb = a + da, b + db
                    if 0 <= na < A and 0 <= nb < B:
                        num += (grid[a, b] - grid[na, nb]) ** 2
                        s0 += 1
    dev = grid - grid.mean()
    want = ((n - 1) / (2 * s0)) * num / (dev ** 2).sum()
    row = gearys_c(df, res=res, radius=r).collect()[0]
    assert row["n"] == n and row["s0"] == s0
    assert row["c"] == pytest.approx(want, rel=1e-9)
    assert row["c"] < 0.9  # clustered blobs: local contrast well below CSR

    # shuffled (uniform) control: C should sit near 1
    flat = grid.flatten()
    rng.shuffle(flat)
    shuf = flat.reshape(grid.shape)
    num_s = 0.0
    for a in range(A):
        for b in range(B):
            for da in range(-r, r + 1):
                for db in range(-r, r + 1):
                    if (da, db) == (0, 0):
                        continue
                    na, nb = a + da, b + db
                    if 0 <= na < A and 0 <= nb < B:
                        num_s += (shuf[a, b] - shuf[na, nb]) ** 2
    dev_s = shuf - shuf.mean()
    c_shuf = ((n - 1) / (2 * s0)) * num_s / (dev_s ** 2).sum()
    assert abs(c_shuf - 1.0) < 0.25


def test_ripley_k_matches_bruteforce(spark):
    """ripley_k vs the all-pairs NumPy count at 4 radii; k_hat formula
    identical IEEE ops; coincident points counted (i≠j by id, not by
    distance); CSR sanity (k_hat within a loose factor of pi*r^2)."""
    import numpy as np

    from osmflat_rs_spark.operators.hotspot import ripley_k

    rng = np.random.RandomState(9)
    n = 800
    lat = rng.randint(0, 1_000_000, n).astype("int64")
    lon = rng.randint(0, 2_000_000, n).astype("int64")
    lat[5], lon[5] = lat[4], lon[4]  # exact duplicate point
    ids = np.arange(n, dtype="int64")
    df = spark.createDataFrame(
        [(int(i), int(la), int(lo)) for i, la, lo in zip(ids, lat, lon)],
        "node_idx long, lat long, lon long",
    ).repartition(6)
    radii = [20_000, 50_000, 100_000, 200_000]
    area = 1_000_000.0 * 2_000_000.0
    got = {r["r"]: (r["n_pairs"], r["k_hat"]) for r in ripley_k(df, radii, area).collect()}

    dla = lat[:, None] - lat[None, :]
    dlo = lon[:, None] - lon[None, :]
    d2 = dla * dla + dlo * dlo
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    for r in radii:
        npairs = int((d2 <= r * r).sum())
        k = area * float(npairs) / float(n * (n - 1))
        assert got[r] == (npairs, k), r
    # CSR sanity at the smallest radius (edge effects grow with r)
    import math

    assert 0.5 * math.pi * radii[0] ** 2 < got[radii[0]][1] < 2.0 * math.pi * radii[0] ** 2


def test_ripley_k_validation(spark):
    import pytest as _pytest

    from osmflat_rs_spark.operators.hotspot import ripley_k

    df = spark.createDataFrame([(1, 0, 0)], "node_idx long, lat long, lon long")
    with _pytest.raises(ValueError):
        ripley_k(df, [100], 1.0)  # n < 2
    df2 = spark.createDataFrame([(1, 0, 0), (2, 5, 5)], "node_idx long, lat long, lon long")
    with _pytest.raises(ValueError):
        ripley_k(df2, [], 1.0)


def test_dbscan_matches_bruteforce(spark):
    """Point-level DBSCAN vs an independent NumPy + union-find model:
    core/border/noise partition, min-core-id labels, min-label border
    assignment (including a border point between two clusters)."""
    import numpy as np

    from osmflat_rs_spark.operators.hotspot import dbscan

    rng = np.random.RandomState(21)
    pts = []
    # two dense blobs + sparse background noise
    for cx, cy in ((100_000, 100_000), (400_000, 120_000)):
        pts += [
            (cx + int(rng.randint(-30_000, 30_000)), cy + int(rng.randint(-30_000, 30_000)))
            for _ in range(60)
        ]
    pts += [(int(rng.randint(0, 600_000)), int(rng.randint(0, 300_000))) for _ in range(80)]
    ids = list(range(len(pts)))
    df = spark.createDataFrame(
        [(i, la, lo) for i, (lo, la) in zip(ids, pts)], "node_idx long, lat long, lon long"
    ).repartition(5)
    radius, min_pts = 25_000, 6

    lon = np.array([p[0] for p in pts], dtype=np.int64)
    lat = np.array([p[1] for p in pts], dtype=np.int64)
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    nbr = d2 <= radius * radius  # includes self on diagonal
    is_core = nbr.sum(axis=1) >= min_pts

    parent = list(range(len(pts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(pts)):
        if not is_core[i]:
            continue
        for j in range(len(pts)):
            if i < j and is_core[j] and nbr[i, j]:
                parent[find(i)] = find(j)
    comp = {}
    for i in range(len(pts)):
        if is_core[i]:
            comp.setdefault(find(i), []).append(i)
    label = {}
    for members in comp.values():
        m = min(members)
        for i in members:
            label[i] = m
    want = {i: (label[i], True) for i in range(len(pts)) if is_core[i]}
    for i in range(len(pts)):
        if is_core[i]:
            continue
        cands = [label[j] for j in range(len(pts)) if is_core[j] and nbr[i, j]]
        if cands:
            want[i] = (min(cands), False)

    got = {r["node_idx"]: (r["cluster"], r["is_core"]) for r in dbscan(df, radius, min_pts).collect()}
    assert got == want
    assert sum(1 for _, c in got.values() if c) > 50, "model degenerate: too few cores"
    assert any(not c for _, c in got.values()), "no border points exercised"
    assert len(got) < len(pts), "no noise points exercised"


def test_dbscan_min_pts_validation(spark):
    from osmflat_rs_spark.operators.hotspot import dbscan

    df = spark.createDataFrame([(1, 0, 0)], "node_idx long, lat long, lon long")
    with pytest.raises(ValueError, match="min_pts"):
        dbscan(df, 10, 1)


def test_local_morans_i_matches_dense_oracle(spark):
    """LISA vs a dense NumPy oracle that materializes the empty bbox
    cells: I_i, analytic z, and the HH/LL/HL/LH quadrant for every
    occupied cell (rel 1e-9 on the doubles, exact on x/w/quadrant)."""
    import numpy as np
    from pyspark.sql import functions as F

    from osmflat_rs_spark.functions.cells import grid_exprs
    from osmflat_rs_spark.operators.tiling import local_morans_i

    rng = np.random.default_rng(31)
    X, Y = 132_000_000, 524_000_000
    pts = []
    for bx, by in [(100_000, 80_000), (500_000, 300_000)]:
        for _ in range(220):
            pts.append((int(Y + by + rng.normal(0, 40_000)), int(X + bx + rng.normal(0, 40_000))))
    for _ in range(120):
        pts.append((int(Y + rng.integers(0, 400_000)), int(X + rng.integers(0, 800_000))))
    df = spark.createDataFrame(pts, "lat long, lon long")
    res, r = 16, 1
    ix, iy = grid_exprs(F.col("lat"), F.col("lon"), res)
    assign = [(row["ix"], row["iy"]) for row in df.select(ix.alias("ix"), iy.alias("iy")).collect()]
    ix0 = min(a for a, _ in assign); ix1 = max(a for a, _ in assign)
    iy0 = min(b for _, b in assign); iy1 = max(b for _, b in assign)
    grid = np.zeros((ix1 - ix0 + 1, iy1 - iy0 + 1))
    for a, b in assign:
        grid[a - ix0, b - iy0] += 1
    n = grid.size
    dev = grid - grid.mean()
    m2 = (dev ** 2).sum() / n
    m4 = (dev ** 4).sum() / n
    b2 = m4 / m2 ** 2
    A, B = grid.shape
    want = {}
    for a in range(A):
        for b in range(B):
            if grid[a, b] == 0:
                continue
            sl = dev[max(0, a - r):a + r + 1, max(0, b - r):b + r + 1]
            wp = sl.size - 1
            lagdev = sl.sum() - dev[a, b]
            ii = dev[a, b] / m2 * lagdev
            e = -wp / (n - 1)
            var = (
                wp * (n - b2) / (n - 1)
                + (wp * wp - wp) * (2 * b2 - n) / ((n - 1) * (n - 2))
                - wp * wp / (n - 1) ** 2
            )
            z = (ii - e) / np.sqrt(var) if var > 0 else None
            quad = (
                "HH" if dev[a, b] > 0 and lagdev > 0
                else "LL" if dev[a, b] < 0 and lagdev < 0
                else "HL" if dev[a, b] > 0 and lagdev < 0
                else "LH" if dev[a, b] < 0 and lagdev > 0
                else None
            )
            want[(a + ix0, b + iy0)] = (int(grid[a, b]), wp, ii, z, quad)
    got = {
        (row["ix"], row["iy"]): (row["x"], row["w"], row["ii"], row["z"], row["quadrant"])
        for row in local_morans_i(df, res=res, radius=r).collect()
    }
    assert set(got) == set(want)
    assert len(got) > 80
    quads = {v[4] for v in got.values()}
    assert {"HH", "LH"} <= quads, quads  # clusters AND outliers exercised
    for k, (x, wp, ii, z, quad) in want.items():
        gx, gw, gii, gz, gquad = got[k]
        assert gx == x and gw == wp and gquad == quad, k
        assert gii == pytest.approx(ii, rel=1e-9), k
        if z is None:
            assert gz is None, k
        else:
            assert gz == pytest.approx(z, rel=1e-9), k


def test_local_morans_i_moments_match_permutation(spark):
    """The analytic E/Var (Anselin 1995 randomization moments, binary
    weights) behind the operator's z-score, validated INDEPENDENTLY by
    Monte-Carlo: permute the cell values over the bbox grid, recompute
    I_i each time, and compare the operator's z to the MC z."""
    import numpy as np
    from pyspark.sql import functions as F

    from osmflat_rs_spark.functions.cells import grid_exprs
    from osmflat_rs_spark.operators.tiling import local_morans_i

    rng = np.random.default_rng(7)
    X, Y = 132_000_000, 524_000_000
    pts = [
        (int(Y + rng.integers(0, 250_000)), int(X + rng.integers(0, 250_000)))
        for _ in range(120)
    ]
    df = spark.createDataFrame(pts, "lat long, lon long")
    res, r = 16, 1
    ix, iy = grid_exprs(F.col("lat"), F.col("lon"), res)
    assign = [(row["ix"], row["iy"]) for row in df.select(ix.alias("ix"), iy.alias("iy")).collect()]
    ix0 = min(a for a, _ in assign); ix1 = max(a for a, _ in assign)
    iy0 = min(b for _, b in assign); iy1 = max(b for _, b in assign)
    grid = np.zeros((ix1 - ix0 + 1, iy1 - iy0 + 1))
    for a, b in assign:
        grid[a - ix0, b - iy0] += 1
    A, B = grid.shape
    n = grid.size
    assert n >= 16 and (grid == 0).any()
    # target: the occupied cell nearest the grid center (full window)
    occ = np.argwhere(grid > 0)
    ca, cb = min(map(tuple, occ), key=lambda t: abs(t[0] - A // 2) + abs(t[1] - B // 2))
    vals = grid.ravel()
    m2 = ((vals - vals.mean()) ** 2).mean()
    # neighbor flat indices of (ca, cb), self excluded
    nbrs = [
        na * B + nb
        for na in range(max(0, ca - r), min(A, ca + r + 1))
        for nb in range(max(0, cb - r), min(B, cb + r + 1))
        if (na, nb) != (ca, cb)
    ]
    self_idx = ca * B + cb
    trials = 60_000
    perms = np.array([rng.permutation(vals) for _ in range(trials)])
    devp = perms - vals.mean()
    i_mc = devp[:, self_idx] / m2 * devp[:, nbrs].sum(axis=1)
    got = {
        (row["ix"], row["iy"]): row
        for row in local_morans_i(df, res=res, radius=r).collect()
    }
    row = got[(ca + ix0, cb + iy0)]
    dev = vals.reshape(A, B) - vals.mean()
    ii_obs = dev[ca, cb] / m2 * sum(dev.ravel()[j] for j in nbrs)
    assert row["ii"] == pytest.approx(ii_obs, rel=1e-9)
    z_mc = (ii_obs - i_mc.mean()) / i_mc.std(ddof=1)
    assert row["z"] == pytest.approx(z_mc, rel=0.05), (row["z"], z_mc)


# -------------------------------------------------------------- mean center


def test_mean_center_matches_numpy(spark):
    import math

    import numpy as np

    from osmflat_rs_spark.operators.hotspot import mean_center

    rng = np.random.default_rng(37)
    rows = []
    for g in ("a", "b"):
        for _ in range(200):
            rows.append((g, int(rng.integers(-900_000_000, 900_000_000)),
                         int(rng.integers(-1_800_000_000, 1_800_000_000))))
    df = spark.createDataFrame(rows, "g string, lat long, lon long")
    got = {r["g"]: r.asDict() for r in mean_center(df, "g").collect()}
    for g in ("a", "b"):
        la = np.array([r[1] for r in rows if r[0] == g], dtype=np.float64)
        lo = np.array([r[2] for r in rows if r[0] == g], dtype=np.float64)
        assert got[g]["n"] == 200
        assert abs(got[g]["mean_lat"] - la.mean()) < 1e-4
        assert abs(got[g]["mean_lon"] - lo.mean()) < 1e-4
        sd = math.sqrt(la.var() + lo.var())
        assert abs(got[g]["std_dist"] - sd) < max(1e-4, sd * 1e-9)
        th = math.atan2(2 * ((la * lo).mean() - la.mean() * lo.mean()),
                        la.var() - lo.var()) / 2
        assert abs(got[g]["ellipse_theta"] - th) < 1e-5
    # exact-sum partition invariance: the decimal accumulators make the
    # rounded outputs BIT-identical across layouts
    got2 = {r["g"]: r.asDict() for r in mean_center(df.repartition(17), "g").collect()}
    assert got2 == got


def test_mean_center_degenerate_single_point(spark):
    from osmflat_rs_spark.operators.hotspot import mean_center

    df = spark.createDataFrame([("x", 5, -7)], "g string, lat long, lon long")
    r = mean_center(df, "g").collect()[0]
    assert (r["n"], r["mean_lat"], r["mean_lon"]) == (1, 5.0, -7.0)
    assert r["std_dist"] == 0.0 and r["ellipse_theta"] == 0.0


def test_empirical_variogram_matches_bruteforce(spark):
    """empirical_variogram vs the all-pairs NumPy gamma at 4 lags:
    identical pair counts, bit-identical gamma (exact int64 sums, one
    IEEE division), unordered pairs counted once, coincident distinct
    points land in lag 0, pairs at exactly max distance excluded."""
    import numpy as np

    from osmflat_rs_spark.operators.hotspot import empirical_variogram

    rng = np.random.RandomState(17)
    n = 600
    lat = rng.randint(0, 1_000_000, n).astype("int64")
    lon = rng.randint(0, 2_000_000, n).astype("int64")
    v = rng.randint(-500, 500, n).astype("int64")
    lat[5], lon[5] = lat[4], lon[4]  # nugget pair: d = 0, different v
    ids = np.arange(n, dtype="int64")
    df = spark.createDataFrame(
        [(int(i), int(la), int(lo), int(vv)) for i, la, lo, vv in zip(ids, lat, lon, v)],
        "node_idx long, lat long, lon long, v long",
    ).repartition(6)
    w, nlags = 100_000, 4
    rows = empirical_variogram(df, w, nlags).collect()
    got = {r["lag"]: (r["h_lo"], r["h_hi"], r["n_pairs"], r["gamma"]) for r in rows}

    iu = np.triu_indices(n, k=1)
    dla = (lat[:, None] - lat[None, :])[iu]
    dlo = (lon[:, None] - lon[None, :])[iu]
    d2 = dla * dla + dlo * dlo
    dv2 = ((v[:, None] - v[None, :])[iu]) ** 2
    lag = np.floor(np.sqrt(d2.astype("float64")) / float(w)).astype("int64")
    keep = d2 <= (w * nlags) ** 2  # the radius-join bound
    for i in range(nlags):
        m = keep & (lag == i)
        npairs = int(m.sum())
        s = int(dv2[m].sum())
        gamma = float(s) / (2.0 * float(npairs))
        assert got[i] == (i * w, (i + 1) * w, npairs, gamma), i
    assert sorted(got) == list(range(nlags))
    # the nugget pair sits in lag 0
    assert got[0][2] >= 1


def test_empirical_variogram_validation(spark):
    import pytest as _pytest

    from osmflat_rs_spark.operators.hotspot import empirical_variogram

    df = spark.createDataFrame([(1, 0, 0, 1)], "node_idx long, lat long, lon long, v long")
    with _pytest.raises(ValueError):
        empirical_variogram(df, 0, 4)
    with _pytest.raises(ValueError):
        empirical_variogram(df, 100, 0)


def test_g_function_matches_bruteforce(spark):
    """g_function vs the all-pairs NumPy nearest-neighbour distances:
    exact within-counts at 4 radii, censoring at max(r) (isolated point
    counted in n but in no bucket), duplicate point lands in the
    smallest bucket, g_hat = n_within/n bit-identical."""
    import numpy as np

    from osmflat_rs_spark.operators.hotspot import g_function

    rng = np.random.RandomState(31)
    n = 500
    lat = rng.randint(0, 1_000_000, n).astype("int64")
    lon = rng.randint(0, 2_000_000, n).astype("int64")
    lat[5], lon[5] = lat[4], lon[4]     # coincident pair: NN distance 0
    lat[0], lon[0] = 900_000_000 // 2, 1_700_000_000 // 2  # far outlier: censored
    ids = np.arange(n, dtype="int64")
    df = spark.createDataFrame(
        [(int(i), int(la), int(lo)) for i, la, lo in zip(ids, lat, lon)],
        "node_idx long, lat long, lon long",
    ).repartition(6)
    radii = [20_000, 50_000, 100_000, 200_000]
    got = {r["r"]: (r["n_within"], r["g_hat"]) for r in g_function(df, radii).collect()}

    dla = lat[:, None] - lat[None, :]
    dlo = lon[:, None] - lon[None, :]
    d2 = dla * dla + dlo * dlo
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    nnd = d2.min(axis=1)
    for r in radii:
        nw = int((nnd <= r * r).sum())
        assert got[r] == (nw, float(nw) / float(n)), r
    # the outlier is censored: its NN distance exceeds max(r)
    assert nnd[0] > radii[-1] ** 2
    # monotone non-decreasing in r, and the dup pair guarantees >= 2 at the smallest
    vals = [got[r][0] for r in radii]
    assert vals == sorted(vals) and vals[0] >= 2


def test_huff_probabilities_matches_model(spark):
    """huff_probabilities vs a Python model: regularized A/(d2+1)
    weights, per-point normalization sums to 1, point sitting exactly ON
    a facility stays finite and dominates, out-of-range points emit
    nothing, attractiveness doubles the share at equal distance."""
    import numpy as np

    from osmflat_rs_spark.operators.interpolate import huff_probabilities

    facs = [("fA", 0, 0, 2), ("fB", 0, 2_000, 1), ("fC", 900_000, 900_000, 5)]
    pts = [
        (1, 0, 0),          # ON fA
        (2, 0, 1_000),      # midway fA/fB
        (3, 10_000, 10_000),
        (4, 5_000_000, 5_000_000),  # out of range of everything
    ]
    df = spark.createDataFrame(pts, "node_idx long, lat long, lon long").repartition(2)
    rows = huff_probabilities(df, facs, 100_000).collect()
    got = {}
    for r in rows:
        got.setdefault(r["node_idx"], {})[r["facility_id"]] = (r["d2"], r["p"])
    assert 4 not in got
    # model
    for pid, pla, plo in pts[:3]:
        ws = {}
        for fid, fla, flo, a in facs:
            d2 = (pla - fla) ** 2 + (plo - flo) ** 2
            if d2 <= 100_000 ** 2:
                ws[fid] = (d2, a / (d2 + 1.0))
        tot = sum(w for _, w in ws.values())
        assert set(got[pid]) == set(ws), pid
        for fid, (d2, w) in ws.items():
            gd2, gp = got[pid][fid]
            assert gd2 == d2
            assert abs(gp - w / tot) < 1e-12
    # ON-facility point: fA share ~ 1 (d2=0 -> w=2 vs fB w=1/(2000^2+1))
    assert got[1]["fA"][1] > 0.999999
    # per-point probabilities sum to 1
    for pid in (1, 2, 3):
        assert abs(sum(p for _, p in got[pid].values()) - 1.0) < 1e-12
    # midway point: equal distance, attractiveness 2 vs 1 -> 2/3 vs 1/3
    assert abs(got[2]["fA"][1] - 2.0 / 3.0) < 1e-9


def test_ipf_balance_matches_numpy_and_converges(spark):
    """3-round Furness balancing equals the numpy matrix model, and the
    row margins after a row-scaling round hit the targets exactly (the
    defining IPF invariant); partition-layout invariance; iters >= 1."""
    from pyspark.sql import functions as F

    from osmflat_rs_spark.operators.interpolate import ipf_balance

    rng = np.random.default_rng(17)
    n_o, n_d = 6, 5
    seed = rng.uniform(0.5, 3.0, (n_o, n_d))
    o_tot = rng.integers(10, 50, n_o).astype(float)
    d_tot = rng.integers(5, 40, n_d).astype(float)
    d_tot *= o_tot.sum() / d_tot.sum()

    T = seed.copy()
    for _ in range(3):
        T *= (o_tot / T.sum(axis=1))[:, None]
        T *= d_tot / T.sum(axis=0)

    rows = [
        (int(i), int(j), float(seed[i, j]))
        for i in range(n_o)
        for j in range(n_d)
    ]
    od = spark.createDataFrame(rows, "o int, d int, seed double")
    om = spark.createDataFrame(
        [(int(i), float(o_tot[i])) for i in range(n_o)], "o int, tot double"
    )
    dm = spark.createDataFrame(
        [(int(j), float(d_tot[j])) for j in range(n_d)], "d int, tot double"
    )
    for src in (od, od.repartition(7)):
        got = {
            (r["o"], r["d"]): r["t"]
            for r in ipf_balance(src, "o", "d", "seed", om, dm, iters=3).collect()
        }
        assert len(got) == n_o * n_d
        for i in range(n_o):
            for j in range(n_d):
                assert abs(got[(i, j)] - T[i, j]) < 1e-9
    # column margins exact after the final column scaling
    col_sums = np.zeros(n_d)
    for (i, j), t in got.items():
        col_sums[j] += t
    assert np.allclose(col_sums, d_tot, rtol=1e-12)
    with pytest.raises(ValueError):
        ipf_balance(od, "o", "d", "seed", om, dm, iters=0)


def test_hansen_accessibility_matches_brute_force(spark):
    """Composed radius-join accessibility equals the all-pairs model;
    zero-neighbor queries survive with access 0."""
    from osmflat_rs_spark.operators.interpolate import hansen_accessibility

    rng = np.random.default_rng(61)
    pts = [
        (i, int(rng.integers(0, 2_000_000)), int(rng.integers(0, 2_000_000)),
         int(rng.integers(1, 6)))
        for i in range(300)
    ]
    qs = [("q0", 1_000_000, 1_000_000), ("q1", 200_000, 1_800_000),
          ("qfar", 900_000_000, 900_000_000)]
    R = 400_000
    L2 = R * R
    pdf = spark.createDataFrame(pts, "pid long, lat long, lon long, w long")
    qdf = spark.createDataFrame(qs, "query_id string, lat long, lon long")
    got = {
        r["query_id"]: (r["n_within"], r["access"])
        for r in hansen_accessibility(
            pdf, qdf, radius_m=R, weight_col="w", scale_l2=L2,
            res=14, id_col="pid",
        ).collect()
    }
    for qid, qla, qlo in qs:
        terms = [
            (w * L2) / (L2 + (la - qla) ** 2 + (lo - qlo) ** 2)
            for _, la, lo, w in pts
            if (la - qla) ** 2 + (lo - qlo) ** 2 <= R * R
        ]
        assert got[qid][0] == len(terms)
        assert abs(got[qid][1] - round(sum(terms), 9)) < 1e-6, qid
    assert got["qfar"] == (0, 0.0)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hansen_accessibility(pdf, qdf, radius_m=R, weight_col="w",
                             scale_l2=0, id_col="pid")


def test_gravity_calibrate_recovers_beta(spark):
    """On flows synthesized exactly as T = round(K·O·D·(d²+1)^(-b/2)),
    the fitted slope recovers -b/2 closely and matches numpy lstsq on
    the same margin-normalized points; degenerate input yields NULLs."""
    import math

    from osmflat_rs_spark.operators.interpolate import gravity_calibrate

    rng = np.random.default_rng(67)
    zones = [(i, int(rng.integers(0, 20)), int(rng.integers(0, 20))) for i in range(8)]
    beta = 1.6
    rows = []
    for i, xi, yi in zones:
        for j, xj, yj in zones:
            d2 = (xi - xj) ** 2 + (yi - yj) ** 2
            t = int(round(500.0 * (d2 + 1) ** (-beta / 2)))
            if t > 0:
                rows.append((i, j, t, d2))
    df = spark.createDataFrame(rows, "o long, d long, t long, d2 long")
    r = gravity_calibrate(df, "o", "d", "t", "d2").collect()[0]
    # numpy model on the same (x, y)
    ot = {}; dt = {}
    for o, d, t, d2 in rows:
        ot[o] = ot.get(o, 0) + t
        dt[d] = dt.get(d, 0) + t
    x = np.array([math.log(d2 + 1) for _, _, _, d2 in rows])
    y = np.array([math.log(t) - math.log(ot[o]) - math.log(dt[d]) for o, d, t, _ in rows])
    A = np.vstack([x, np.ones_like(x)]).T
    slope, icept = np.linalg.lstsq(A, y, rcond=None)[0]
    assert r["n_pairs"] == len(rows)
    assert abs(r["slope"] - slope) < 1e-7 and abs(r["intercept"] - icept) < 1e-7
    assert 0.0 <= r["r2"] <= 1.0 and r["r2"] > 0.8
    # rounding error aside, slope should sit near -beta/2
    assert abs(r["slope"] - (-beta / 2)) < 0.15
    one = spark.createDataFrame([(0, 1, 5, 4)], "o long, d long, t long, d2 long")
    r1 = gravity_calibrate(one, "o", "d", "t", "d2").collect()[0]
    assert r1["slope"] is None and r1["r2"] is None


def test_clark_evans_matches_brute_force(spark):
    """Censored NN mean, CSR expectation from the exact bbox, R and z
    against a brute-force model; clustered points give R < 1."""
    import math

    from osmflat_rs_spark.operators.hotspot import clark_evans

    rng = np.random.default_rng(83)
    # two tight clusters -> strongly clustered pattern
    pts = []
    for cx, cy in ((200_000, 200_000), (1_500_000, 1_500_000)):
        for i in range(60):
            pts.append((len(pts), cx + int(rng.integers(0, 30_000)),
                        cy + int(rng.integers(0, 30_000))))
    df = spark.createDataFrame(pts, "pid long, lat long, lon long")
    rmax = 400_000
    r = clark_evans(df, rmax=rmax, id_col="pid", res=14).collect()[0]
    n = len(pts)
    la = [p[1] for p in pts]; lo = [p[2] for p in pts]
    area = (max(la) - min(la)) * (max(lo) - min(lo))
    nnd = []
    for i, lai, loi in pts:
        best = min(
            (lai - laj) ** 2 + (loi - loj) ** 2
            for j, laj, loj in pts if j != i
        )
        if best <= rmax * rmax:
            nnd.append(math.sqrt(best))
    expected = 0.5 * math.sqrt(area / n)
    se = 0.26136 * math.sqrt(area) / n
    mean = sum(nnd) / len(nnd)
    assert r["n"] == n and r["n_nn"] == len(nnd)
    assert abs(r["mean_nnd"] - mean) < 1e-3
    assert r["expected_nnd"] == round(expected, 6)
    assert abs(r["r_index"] - mean / expected) < 1e-5
    assert abs(r["z"] - (mean - expected) / se) < 1e-4
    assert r["r_index"] < 1.0 and r["z"] < 0


def test_spatial_chi2_matches_contingency_model(spark):
    """Closed-form zero-pair folding equals the full-grid chi-square on
    a small contingency; segregated pattern scores huge, proportional
    pattern scores ~0."""
    from collections import Counter

    from osmflat_rs_spark.operators.hotspot import spatial_chi2

    res = 12
    # two cells, two categories, perfectly segregated
    seg = [(100_000, 100_000, "a")] * 30 + [(100_000, 80_000_000, "b")] * 30
    # same two cells, identical mixes -> independence
    prop = ([(100_000, 100_000, "a")] * 20 + [(100_000, 100_000, "b")] * 10
            + [(100_000, 80_000_000, "a")] * 40 + [(100_000, 80_000_000, "b")] * 20)
    for rows, expect_big in ((seg, True), (prop, False)):
        df = spark.createDataFrame(rows, "lat long, lon long, cat string")
        r = spatial_chi2(df, "cat", res=res).collect()[0]

        def cell(la, lo):
            ix = (lo + 1_800_000_000) * (1 << res) // 3_600_000_000
            iy = (la + 900_000_000) * (1 << res) // 1_800_000_000
            return ix, iy

        obs = Counter((cell(la, lo), c) for la, lo, c in rows)
        cells = {k for k, _ in obs}
        cats = {c for _, c in obs}
        n = sum(obs.values())
        rt = Counter(); ct = Counter()
        for (k, c), o in obs.items():
            rt[k] += o
            ct[c] += o
        chi2 = sum(
            (obs.get((k, c), 0) - rt[k] * ct[c] / n) ** 2 / (rt[k] * ct[c] / n)
            for k in cells
            for c in cats
        )
        assert r["n"] == n and r["n_cells"] == len(cells) and r["n_cats"] == len(cats)
        assert r["df"] == (len(cells) - 1) * (len(cats) - 1)
        assert abs(r["chi2"] - chi2) < 1e-6
        assert (r["chi2"] > 10) == expect_big


def test_home_range_matches_sorted_model(spark):
    """Membership equals the sorted cumulative model with (density
    desc, cell) tie order; the in-range set is minimal and covers
    >= q% of mass; q validation raises."""
    import numpy as np

    from osmflat_rs_spark.operators.hotspot import home_range

    rng = np.random.default_rng(107)
    rows = []
    for gx in range(12):
        for gy in range(12):
            c = int(rng.integers(0, 20))
            rows += [(gy * 439453 + 7, gx * 878906 + 7)] * c
    df = spark.createDataFrame(rows, "lat long, lon long")
    res = 12
    got = {(r["ix"], r["iy"]): r.asDict() for r in home_range(df, 95, res=res).collect()}

    def cell(la, lo):
        return ((lo + 1_800_000_000) * (1 << res) // 3_600_000_000,
                (la + 900_000_000) * (1 << res) // 1_800_000_000)

    from collections import Counter

    cnt = Counter(cell(la, lo) for la, lo in rows)
    N = sum(cnt.values())
    order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0][0] * (1 << res) + kv[0][1]))
    cum = 0
    want = {}
    for (k, n) in order:
        want[k] = (n, cum + n, 100 * cum < 95 * N)
        cum += n
    assert set(got) == set(want)
    for k, (n, c, inr) in want.items():
        assert (got[k]["n"], got[k]["cum"], got[k]["in_range"]) == (n, c, inr), k
    mass = sum(n for k, (n, c, inr) in want.items() if inr)
    assert 100 * mass >= 95 * N
    import pytest as _pytest

    with _pytest.raises(ValueError):
        home_range(df, 0)


def test_segregation_h_extremes_and_model(spark):
    """H == 1 on fully segregated cells, ~0 on identical mixes, and the
    general case matches the direct entropy model."""
    import math
    from collections import Counter, defaultdict

    from osmflat_rs_spark.operators.hotspot import segregation_h

    res = 12
    seg = [(100_000, 100_000, "a")] * 25 + [(100_000, 80_000_000, "b")] * 25
    mix = ([(100_000, 100_000, "a")] * 10 + [(100_000, 100_000, "b")] * 10
           + [(100_000, 80_000_000, "a")] * 30 + [(100_000, 80_000_000, "b")] * 30)
    import numpy as np

    rng = np.random.default_rng(109)
    gen = [(int(rng.integers(0, 4)) * 439_453 + 7, int(rng.integers(0, 4)) * 878_906 + 7,
            str(rng.choice(["a", "b", "c"]))) for _ in range(400)]
    for rows, expect in ((seg, 1.0), (mix, 0.0), (gen, None)):
        df = spark.createDataFrame(rows, "lat long, lon long, cat string")
        r = segregation_h(df, "cat", res=res).collect()[0]

        def cell(la, lo):
            return ((lo + 1_800_000_000) * (1 << res) // 3_600_000_000,
                    (la + 900_000_000) * (1 << res) // 1_800_000_000)

        obs = Counter((cell(la, lo), c) for la, lo, c in rows)
        nc = defaultdict(int); ct = defaultdict(int)
        for (k, c), o in obs.items():
            nc[k] += o; ct[c] += o
        N = sum(nc.values())
        E = -sum(v / N * math.log(v / N) for v in ct.values())
        num = 0.0
        for k in nc:
            ec = -sum(o / nc[k] * math.log(o / nc[k])
                      for (kk, c), o in obs.items() if kk == k)
            num += nc[k] * ec
        want = 1.0 - num / (N * E)
        assert abs(r["h"] - want) < 1e-5
        assert abs(r["entropy"] - E) < 1e-5
        if expect is not None:
            assert abs(r["h"] - expect) < 1e-6


def test_kriging_matches_numpy_reference(spark):
    """Batched kriging equals a direct per-query NumPy reference solve
    (weights sum to 1, exact-hit honors the data), variance positive
    away from data; under-populated neighborhoods yield NULL."""
    from osmflat_rs_spark.operators.interpolate import kriging_interpolate

    rng = np.random.default_rng(151)
    pts = [
        (i, int(rng.integers(0, 2_000_000)), int(rng.integers(0, 2_000_000)),
         float(rng.uniform(-10, 10)))
        for i in range(120)
    ]
    qs = [(f"q{i}", int(rng.integers(0, 2_000_000)), int(rng.integers(0, 2_000_000)))
          for i in range(15)]
    pdf = spark.createDataFrame(pts, "event_id long, lat long, lon long, value double")
    qdf = spark.createDataFrame(qs, "query_id string, lat long, lon long")
    k, nug, sill, rng_m = 6, 0.1, 2.0, 800_000.0
    got = {
        r["query_id"]: r.asDict()
        for r in kriging_interpolate(
            pdf, qdf, k=k, nugget=nug, sill=sill, range_=rng_m,
            model="exponential", res=12,
        ).collect()
    }

    def gamma(d):
        if d == 0:
            return 0.0
        return nug + (sill - nug) * (1.0 - np.exp(-3.0 * d / rng_m))

    for qid, qla, qlo in qs:
        # reference: k nearest by (d2, id), direct solve
        nb = sorted(pts, key=lambda p: ((p[1] - qla) ** 2 + (p[2] - qlo) ** 2, p[0]))[:k]
        A = np.zeros((k + 1, k + 1))
        for i in range(k):
            for j in range(k):
                dij = np.hypot(nb[i][1] - nb[j][1], nb[i][2] - nb[j][2])
                A[i, j] = gamma(dij)
            A[i, k] = A[k, i] = 1.0
        b = np.ones(k + 1)
        for i in range(k):
            b[i] = gamma(np.hypot(nb[i][1] - qla, nb[i][2] - qlo))
        sol = np.linalg.solve(A, b)
        pred = sum(sol[i] * nb[i][3] for i in range(k))
        kvar = sum(sol[i] * b[i] for i in range(k)) + sol[k]
        r = got[qid]
        assert r["n_neighbors"] == k
        assert abs(r["kriged"] - pred) < 1e-6, qid
        assert abs(r["kvar"] - kvar) < 1e-6
        assert r["kvar"] > -1e-9
    # under-populated: more neighbors requested than points exist
    small = spark.createDataFrame(pts[:3], "event_id long, lat long, lon long, value double")
    r = kriging_interpolate(small, qdf.limit(1), k=6, nugget=nug, sill=sill,
                            range_=rng_m, res=12).collect()[0]
    assert r["kriged"] is None and r["n_neighbors"] < 6
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kriging_interpolate(pdf, qdf, k=6, nugget=2.0, sill=1.0, range_=1.0)


def test_spatial_mi_matches_sklearn_style_model(spark):
    """MI equals the direct contingency computation; independent mixes
    give MI ~ 0, segregated ones give NMI = 1."""
    import math
    from collections import Counter, defaultdict

    from osmflat_rs_spark.operators.hotspot import spatial_mutual_information

    res = 12
    seg = [(100_000, 100_000, "a")] * 25 + [(100_000, 80_000_000, "b")] * 25
    prop = ([(100_000, 100_000, "a")] * 20 + [(100_000, 100_000, "b")] * 10
            + [(100_000, 80_000_000, "a")] * 40 + [(100_000, 80_000_000, "b")] * 20)
    for rows, kind in ((seg, "seg"), (prop, "ind")):
        df = spark.createDataFrame(rows, "lat long, lon long, cat string")
        r = spatial_mutual_information(df, "cat", res=res).collect()[0]

        def cell(la, lo):
            return ((lo + 1_800_000_000) * (1 << res) // 3_600_000_000,
                    (la + 900_000_000) * (1 << res) // 1_800_000_000)

        obs = Counter((cell(la, lo), c) for la, lo, c in rows)
        rt = defaultdict(int); ct = defaultdict(int)
        for (k, c), o in obs.items():
            rt[k] += o; ct[c] += o
        n = sum(obs.values())
        mi = sum(o / n * math.log(o * n / (rt[k] * ct[c])) for (k, c), o in obs.items())
        assert abs(r["mi"] - mi) < 1e-5
        if kind == "ind":
            assert abs(r["mi"]) < 1e-9
        else:
            hr = -sum(v / n * math.log(v / n) for v in rt.values())
            hc = -sum(v / n * math.log(v / n) for v in ct.values())
            assert abs(r["nmi"] - mi / math.sqrt(hr * hc)) < 1e-5
            assert abs(r["nmi"] - 1.0) < 1e-6


def test_gwr_recovers_spatially_varying_slope(spark):
    """On data with slope +5 in the west and -5 in the east, GWR
    queries near each pole recover the local sign while global OLS
    would average to ~0; values match the exact lattice model."""
    import numpy as np

    from osmflat_rs_spark.operators.interpolate import gwr_local

    rng = np.random.default_rng(331)
    rows = []
    for i in range(800):
        lon = int(rng.integers(0, 200_000))
        lat = int(rng.integers(0, 50_000))
        x = int(rng.integers(0, 100))
        slope = 5 if lon < 100_000 else -5
        y = 1000 + slope * x + int(rng.integers(-20, 21))
        rows.append((i, lat, lon, x, y))
    pts = spark.createDataFrame(rows, "node_idx long, lat long, lon long, x long, y long")
    qs = spark.createDataFrame(
        [("west", 25_000, 30_000), ("east", 25_000, 170_000)],
        "query_id string, lat long, lon long",
    )
    B = 60_000.0
    got = {r["query_id"]: r.asDict() for r in
           gwr_local(pts, qs, "x", "y", bandwidth=B, res=6).collect()}
    # exact model
    SC = 10**9
    for qid, qla, qlo in (("west", 25_000, 30_000), ("east", 25_000, 170_000)):
        sw = swx = swy = swxx = swxy = n = 0
        for _, la, lo, x, y in rows:
            d2 = (la - qla) ** 2 + (lo - qlo) ** 2
            if d2 <= B * B:
                u = d2 / (B * B)
                w = int(np.floor((1 - u) * (1 - u) * SC + 0.5))
                n += 1; sw += w; swx += w * x; swy += w * y
                swxx += w * x * x; swxy += w * x * y
        num = sw * swxy - swx * swy
        den = sw * swxx - swx * swx
        slope = num / den
        icept = (swy - slope * swx) / sw
        r = got[qid]
        assert r["n_nbrs"] == n
        assert r["slope"] == round(slope, 6)
        assert r["icept"] == round(icept, 6)
    assert got["west"]["slope"] > 4 and got["east"]["slope"] < -4


def test_jenks_breaks_finds_natural_clusters(spark):
    """Three well-separated value clusters are recovered exactly as
    the three classes; results match a direct python DP on the same
    histogram; classes partition the data; params validated."""
    import itertools

    import numpy as np

    from osmflat_rs_spark.operators.hotspot import jenks_breaks

    rng = np.random.default_rng(337)
    vals = (
        [int(v) for v in rng.integers(0, 50, 300)]
        + [int(v) for v in rng.integers(500, 560, 200)]
        + [int(v) for v in rng.integers(2000, 2100, 100)]
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = sorted(
        (r["class"], r["lo"], r["hi"], r["n"], r["mean"])
        for r in jenks_breaks(df, "v", n_classes=3, n_bins=128).collect()
    )
    assert len(out) == 3
    # the classes recover the planted clusters
    (c0, lo0, hi0, n0, m0), (c1, lo1, hi1, n1, m1), (c2, lo2, hi2, n2, m2) = out
    assert n0 == 300 and n1 == 200 and n2 == 100
    assert hi0 < 500 and lo1 >= 500 and hi1 < 2000 and lo2 >= 2000
    assert abs(m1 - np.mean([v for v in vals if 500 <= v < 600])) < 1e-6
    assert n0 + n1 + n2 == len(vals)
    # model: direct DP over the same histogram must give the same cuts
    lo, hi = min(vals), max(vals)
    span = hi - lo + 1
    NB = 128
    hist = {}
    for v in vals:
        b = ((v - lo) * NB) // span
        n, s1, s2, vmin, vmax = hist.get(b, (0, 0, 0, v, v))
        hist[b] = (n + 1, s1 + v, s2 + v * v, min(vmin, v), max(vmax, v))
    bins = [hist[b] for b in sorted(hist)]
    m = len(bins)
    pn = [0] + list(itertools.accumulate(x[0] for x in bins))
    p1 = [0] + list(itertools.accumulate(x[1] for x in bins))
    p2 = [0] + list(itertools.accumulate(x[2] for x in bins))

    def cost(i, j):
        n = pn[j] - pn[i]
        if n == 0:
            return 0.0
        s1, s2 = p1[j] - p1[i], p2[j] - p2[i]
        return float(s2) - float(s1) * float(s1) / n

    INF = float("inf")
    dp = [[INF] * (m + 1) for _ in range(4)]
    arg = [[0] * (m + 1) for _ in range(4)]
    dp[0][0] = 0.0
    for c in range(1, 4):
        for j in range(c, m + 1):
            best, bi = INF, c - 1
            for i in range(c - 1, j):
                vv = dp[c - 1][i] + cost(i, j)
                if vv < best:
                    best, bi = vv, i
            dp[c][j], arg[c][j] = best, bi
    cuts = [m]
    j = m
    for c in range(3, 0, -1):
        j = arg[c][j]
        cuts.append(j)
    cuts = cuts[::-1]
    want = []
    for c in range(3):
        seg = bins[cuts[c]:cuts[c + 1]]
        n = sum(x[0] for x in seg)
        s1 = sum(x[1] for x in seg)
        want.append((c, min(x[3] for x in seg), max(x[4] for x in seg), n, round(s1 / n, 6)))
    assert out == want
    import pytest as _pytest

    with _pytest.raises(ValueError):
        jenks_breaks(df, "v", n_classes=1)

"""segment_intersection_join: brute-force parity, boundary losslessness,
contract exclusions (touching/collinear), and the exact-arithmetic
fallback at planet-scale coordinates."""

import numpy as np
import pandas as pd
import pytest

from osmflat_rs_spark.operators.segments import (
    _orient_signs,
    _proper_mask,
    segment_intersection_join,
)


def _run(spark, rows, cell_size=1 << 16):
    pdf = pd.DataFrame(rows, columns=["sid", "x1", "y1", "x2", "y2"])
    out = segment_intersection_join(spark.createDataFrame(pdf), cell_size=cell_size)
    return {(r["id_a"], r["id_b"]) for r in out.collect()}


def test_matches_bruteforce_and_cell_size_invariant(spark):
    rng = np.random.default_rng(3)
    n = 800
    x1 = rng.integers(0, 2_000_000, n)
    y1 = rng.integers(0, 1_000_000, n)
    x2 = x1 + rng.integers(-80_000, 80_001, n)
    y2 = y1 + rng.integers(-80_000, 80_001, n)
    ia, ib = np.triu_indices(n, 1)
    mask = _proper_mask(x1[ia], y1[ia], x2[ia], y2[ia], x1[ib], y1[ib], x2[ib], y2[ib])
    want = set(zip(ia[mask].tolist(), ib[mask].tolist()))
    rows = list(zip(range(n), x1.tolist(), y1.tolist(), x2.tolist(), y2.tolist()))
    assert _run(spark, rows) == want
    # the grid is candidate machinery only — never semantics
    assert _run(spark, rows, cell_size=1 << 13) == want


def test_contract_exclusions_and_inclusions(spark):
    rows = [
        (0, 0, 0, 100, 100),      # X-crossing with 1 at (50, 50): IN
        (1, 0, 100, 100, 0),
        (2, 200, 0, 300, 0),      # collinear overlap with 3: OUT
        (3, 250, 0, 350, 0),
        (4, 400, 0, 500, 0),      # endpoint touch with 5 at (500, 0): OUT
        (5, 500, 0, 600, 100),
        (6, 700, 0, 800, 0),      # T-junction: 7's endpoint ON 6's interior: OUT
        (7, 750, 0, 750, 100),
        (8, 900, 0, 900, 50),     # parallel disjoint with 9: OUT
        (9, 910, 0, 910, 50),
        (10, 1000, 0, 1000, 0),   # zero-length on 0's path: OUT
    ]
    assert _run(spark, rows, cell_size=64) == {(0, 1)}


def test_crossing_exactly_on_grid_corner_is_found(spark):
    # intersection point at (cs, cs) — the corner of four cells; the
    # cover must be boundary-lossless for the pair to share a cell
    cs = 1 << 10
    rows = [
        (0, 0, 0, 2 * cs, 2 * cs),          # diagonal through the corner
        (1, 0, 2 * cs, 2 * cs, 0),          # anti-diagonal through it
        (2, cs, 0, cs, 2 * cs),             # vertical ON a grid line
        (3, 0, cs // 2, 2 * cs, cs // 2),   # horizontal crossing 2
    ]
    got = _run(spark, rows, cell_size=cs)
    # ALL pairs cross properly — 0, 1, 2 mutually at the exact corner
    # (cs, cs), and 3 crosses each of them transversally
    assert got == {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}


def test_exact_fallback_at_planet_scale_coords(spark):
    # |Δ| near 2^31: orientation products overflow int64 and round in
    # float64; the filter must route these rows to the bigint path.
    big = 2**31
    # nearly-collinear: det = big·(big/2 + 1) − big·(big/2) = big — tiny
    # against ~2^61 products, inside the float filter band
    s = _orient_signs(
        np.array([0]), np.array([0]),
        np.array([big]), np.array([big]),
        np.array([big // 2]), np.array([big // 2 + 1]),
    )
    assert s.tolist() == [1]
    s = _orient_signs(
        np.array([0]), np.array([0]),
        np.array([big]), np.array([big]),
        np.array([big // 2]), np.array([big // 2]),
    )
    assert s.tolist() == [0]
    # end-to-end at huge coords: a crossing and a near-miss
    rows = [
        (0, 0, 0, big, big),
        (1, 0, big, big, 0),                  # crosses 0 at the center
        (2, 0, 1, big, big + 1),              # parallel to 0 (no cross), crosses 1
    ]
    got = _run(spark, rows, cell_size=1 << 28)
    assert got == {(0, 1), (1, 2)}


def test_validation(spark):
    with pytest.raises(ValueError):
        segment_intersection_join(
            spark.createDataFrame(pd.DataFrame({"sid": [1], "x1": [0], "y1": [0], "x2": [1], "y2": [1]})),
            cell_size=1,
        )


def test_reference_point_dedup_no_duplicates_and_no_pair_shuffle(spark):
    """Long segments cover many cells; every crossing pair must still be
    emitted exactly once (reference-point rule replaces the distinct),
    and the plan must end at the Python stage — no pair exchange."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = 300
    # long spokes through a small area -> pairs share MANY cells
    x1 = rng.integers(0, 50_000, n)
    y1 = rng.integers(0, 50_000, n)
    x2 = x1 + rng.integers(-400_000, 400_001, n)
    y2 = y1 + rng.integers(-400_000, 400_001, n)
    pdf = pd.DataFrame(
        {"sid": range(n), "x1": x1, "y1": y1, "x2": x2, "y2": y2}
    )
    out = segment_intersection_join(spark.createDataFrame(pdf), cell_size=1 << 12)
    rows = [(r["id_a"], r["id_b"]) for r in out.collect()]
    assert len(rows) == len(set(rows)) > 0  # exactly-once emission
    ia, ib = np.triu_indices(n, 1)
    mask = _proper_mask(x1[ia], y1[ia], x2[ia], y2[ia], x1[ib], y1[ib], x2[ib], y2[ib])
    assert set(rows) == set(zip(ia[mask].tolist(), ib[mask].tolist()))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("== Initial Plan ==")[0]
    assert tree.count("Exchange") == 1  # the cell clustering only
    assert "HashAggregate" not in plan  # distinct is gone

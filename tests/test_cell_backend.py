"""Cell-backend seam (VERDICT r02 #7): the two-phase PIP join must be
cell-scheme agnostic — any backend honoring the superset-cover +
interior-flag contract yields identical exact results. Exercised with a
row-major alternative scheme (different ID bit layout than Morton), plus
the optional H3 backend when the wheel exists (skip-clean here)."""

import pytest

from osmflat_rs_spark.functions.cell_backend import (
    MortonBackend,
    RowMajorBackend,
    available_backends,
    get_backend,
)


def test_pip_join_backend_agnostic(tables, poly_df):
    from osmflat_rs_spark.operators.spatial_join import pip_join

    want = sorted(
        (r["polygon_id"], r["node_idx"]) for r in pip_join(tables["nodes"], poly_df).collect()
    )
    got = sorted(
        (r["polygon_id"], r["node_idx"])
        for r in pip_join(tables["nodes"], poly_df, cover_res=12, backend=RowMajorBackend()).collect()
    )
    assert got == want and len(want) > 0


def test_pip_join_shuffle_backend_agnostic(tables, poly_df):
    from osmflat_rs_spark.operators.spatial_join import pip_join, pip_join_shuffle

    want = sorted(
        (r["polygon_id"], r["node_idx"]) for r in pip_join(tables["nodes"], poly_df).collect()
    )
    got = sorted(
        (r["polygon_id"], r["node_idx"])
        for r in pip_join_shuffle(
            tables["nodes"], poly_df, cover_res=12, salt=2, backend=RowMajorBackend()
        ).collect()
    )
    assert got == want


def test_custom_backend_requires_explicit_res(tables, poly_df):
    from osmflat_rs_spark.operators.spatial_join import pip_join

    with pytest.raises(ValueError, match="cover_res"):
        pip_join(tables["nodes"], poly_df, backend=RowMajorBackend())


def test_backend_registry():
    assert "morton" in available_backends()
    assert isinstance(get_backend("rowmajor"), RowMajorBackend)
    assert isinstance(get_backend(), MortonBackend)
    assert isinstance(get_backend("morton"), MortonBackend)
    with pytest.raises(ValueError, match="unknown"):
        get_backend("nope")


def test_h3_backend_if_available(tables, poly_df):
    """Runs only where the h3 wheel exists (not in this image): the H3
    cover + pandas-UDF encode must reproduce the exact Morton results."""
    pytest.importorskip("h3")
    from osmflat_rs_spark.operators.spatial_join import pip_join

    want = sorted(
        (r["polygon_id"], r["node_idx"]) for r in pip_join(tables["nodes"], poly_df).collect()
    )
    got = sorted(
        (r["polygon_id"], r["node_idx"])
        for r in pip_join(tables["nodes"], poly_df, cover_res=7, backend=get_backend("h3")).collect()
    )
    assert got == want


def test_h3ronpy_probe_shared_and_symbol_aware(monkeypatch):
    """ADVICE r04 (medium): the vectorized-encode probe must resolve the
    ACTUAL symbol (h3ronpy.vector names it coordinates_to_cells; older
    releases latlng_to_cells) and the same probe must drive both the
    encode and cell_expr's slow-path warning. Simulated with a fake
    h3ronpy module since the wheel is absent in this image."""
    import sys
    import types

    import numpy as np

    from osmflat_rs_spark.functions.cell_backend import H3Backend

    # image truth: no wheel -> probe returns None (per-point fallback)
    assert H3Backend._vectorized_encoder() is None

    calls = {}

    def fake_coordinates_to_cells(la, lo, res):
        calls["args"] = (np.asarray(la), np.asarray(lo), res)
        return np.array([0x8928308280FFFFF] * len(la), dtype=np.uint64)

    pkg = types.ModuleType("h3ronpy")
    vec = types.ModuleType("h3ronpy.vector")
    vec.coordinates_to_cells = fake_coordinates_to_cells
    pkg.vector = vec
    monkeypatch.setitem(sys.modules, "h3ronpy", pkg)
    monkeypatch.setitem(sys.modules, "h3ronpy.vector", vec)

    assert H3Backend._vectorized_encoder() is fake_coordinates_to_cells
    # _encode_batch must route through the probed symbol (no h3 wheel
    # needed on this path: the import h3 below would fail if reached)
    out = H3Backend._encode_batch(np.array([1.0, 2.0]), np.array([3.0, 4.0]), 9)
    assert calls["args"][2] == 9
    assert len(out) == 2 and out.dtype == np.int64

    # a module exposing only the LEGACY name still resolves
    del vec.coordinates_to_cells
    vec.latlng_to_cells = fake_coordinates_to_cells
    assert H3Backend._vectorized_encoder() is fake_coordinates_to_cells

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

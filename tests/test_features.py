"""J7 multipolygon assembly, render sinks (PGM/SVG/JSON), and the
sequence operator family (delta decode / pairs / gcd)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from osmflat_rs_spark import oracle
from osmflat_rs_spark import queries as q
from osmflat_rs_spark.operators import render, sequence
from tests.util import assert_frames_equal


def test_multipolygon_assembly(tables, model):
    got = q.multipolygon_outer_coords(tables)
    want = oracle.q_multipolygon(model)
    assert len(want) > 0
    assert_frames_equal(got, want, ["relation_idx", "ring_pos", "pos", "lat", "lon"])


def test_raster_pgm_sink(tables, model, spark):
    from osmflat_rs_spark.operators.tiling import RASTER_H, RASTER_W, raster_assign

    bb = q.bbox(tables).collect()[0]
    raster = raster_assign(
        q.road_coords(tables), (bb["min_lat"], bb["max_lat"], bb["min_lon"], bb["max_lon"])
    )
    pgm = render.raster_to_pgm(raster, RASTER_W, RASTER_H)
    assert pgm.startswith(b"P5\n512 512\n255\n")
    body = pgm[len(b"P5\n512 512\n255\n") :]
    assert len(body) == RASTER_W * RASTER_H
    n_set = sum(1 for b in body if b == 255)
    want_pixels = {(r.x, r.y) for r in oracle.q_raster_assign(model).itertuples()}
    assert n_set == len(want_pixels)


def test_svg_sink_deterministic(spark):
    rows = [
        ("w1", "Road", 0, [{"x": 1.0, "y": 2.0}, {"x": 3.123456, "y": 4.0}]),
        ("r1", "Park", 0, [{"x": 0.0, "y": 0.0}, {"x": 5.0, "y": 5.0}]),
    ]
    df = spark.createDataFrame(
        rows,
        schema="feature_id string, category string, line_pos int, points array<struct<x:double,y:double>>",
    )
    svg = render.features_to_svg(df)
    assert svg.count("<polyline") == 2
    assert 'data-category="Park"' in svg and 'data-category="Road"' in svg
    assert "3.12346,4.00000" in svg  # fixed 5-decimal formatting (F11)
    assert render.features_to_svg(df) == svg  # deterministic


def test_cities_json_sink(tables, model):
    out = render.cities_json(q.cities(tables)).collect()
    want = oracle.q_cities(model)
    assert len(out) == len(want)
    import json

    names = sorted(json.loads(r["json"])["name"] for r in out)
    assert names == sorted(want["name"])


def test_debug_dump(tables, model):
    got = q.debug_dump(tables, types="nw", num=3).collect()
    assert len(got) == 6  # 3 nodes + 3 ways
    node0 = next(r for r in got if r["source"] == "node" and r["idx"] == 0)
    n0 = model["nodes"].iloc[0]
    assert f"id={n0.osm_id}" in node0["text"]
    assert f"{n0.lat / 1e7:.7f}" in node0["text"].replace(",", "")  # degree formatting
    way0 = next(r for r in got if r["source"] == "way" and r["idx"] == 0)
    w0 = model["ways"].iloc[0]
    assert f"id={w0.osm_id}" in way0["text"]
    # unresolved refs print as None (INVALID_IDX semantics)
    if any(i is None for _, i in w0.refs):
        assert "None" in way0["text"]


def test_delta_decode(spark):
    rows = [("a", 0, 10), ("a", 1, 5), ("a", 2, -3), ("b", 0, 100), ("b", 1, 1)]
    df = spark.createDataFrame(rows, schema="k string, o int, d long")
    got = {
        (r["k"], r["o"]): r["d"]
        for r in sequence.delta_decode_keyed(df, ["k"], "o", ["d"]).collect()
    }
    assert got == {("a", 0): 10, ("a", 1): 15, ("a", 2): 12, ("b", 0): 100, ("b", 1): 101}


def test_consecutive_pairs(spark):
    df = spark.createDataFrame([("a", 0, 1.0), ("a", 1, 4.0), ("a", 2, 9.0)], schema="k string, o int, v double")
    got = sequence.consecutive_pairs(df, ["k"], "o", ["v"]).orderBy("o").collect()
    assert [(r["v"], r["v_next"]) for r in got] == [(1.0, 4.0), (4.0, 9.0)]


def test_gcd_reduce(spark):
    df = spark.createDataFrame([(100,), (250,), (1000,)], schema="g long")
    assert sequence.gcd_reduce(df, "g") == 50


def test_delta_decode_blocks_equals_keyed_window(spark):
    """The block-local np.cumsum form (reference per-PBF-block += shape)
    must equal the keyed-window form on shuffled input, incl. negative
    deltas and many blocks."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [
        (f"blk{int(b)}", int(o), int(d))
        for b, o, d in zip(
            rng.integers(0, 17, size=800),
            rng.permutation(800),
            rng.integers(-50, 50, size=800),
        )
    ]
    df = spark.createDataFrame(rows, schema="k string, o int, d long").repartition(8)
    blocks = {
        (r["k"], r["o"]): r["d"]
        for r in sequence.delta_decode_blocks(df, "k", ["o"], ["d"]).collect()
    }
    keyed = {
        (r["k"], r["o"]): r["d"]
        for r in sequence.delta_decode_keyed(df, ["k"], "o", ["d"]).collect()
    }
    assert blocks == keyed and len(blocks) == 800


def test_audit_dense_index_accepts_and_rejects(spark, tables):
    """The audit passes on a real assignment and fails on a scrambled one."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from osmflat_rs_spark.plans.indexing import assign_dense_index, audit_dense_index

    o = tables["nodes"].select("osm_id")
    idx = assign_dense_index(o, ["osm_id"], "idx")
    n = audit_dense_index(idx, "idx")
    assert n == o.count()

    # scramble: swap two indices via arithmetic — audit must catch it
    bad = idx.withColumn(
        "idx",
        F.when(F.col("idx") == 0, F.lit(1))
        .when(F.col("idx") == 1, F.lit(0))
        .otherwise(F.col("idx")),
    )
    with _pytest.raises(RuntimeError):
        audit_dense_index(bad, "idx")


def test_raster_png_sink_roundtrip(tables, spark):
    """The PNG sink (S10 — the reference's actual artifact) must encode
    the exact same pixels as the PGM sink: parse the chunks, inflate,
    strip filter-0 bytes, compare."""
    import struct
    import zlib

    from osmflat_rs_spark.operators.render import raster_to_pgm, raster_to_png

    df = spark.createDataFrame(
        [(int(x), int(y)) for x in range(0, 16, 3) for y in range(0, 12, 2)],
        schema="x long, y long",
    )
    w, h = 16, 12
    png = raster_to_png(df, w, h)
    pgm = raster_to_pgm(df, w, h)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # walk chunks
    i, idat = 8, b""
    seen = []
    while i < len(png):
        (ln,) = struct.unpack(">I", png[i : i + 4])
        tag = png[i + 4 : i + 8]
        data = png[i + 8 : i + 8 + ln]
        (crc,) = struct.unpack(">I", png[i + 8 + ln : i + 12 + ln])
        assert crc == (zlib.crc32(tag + data) & 0xFFFFFFFF)
        seen.append(tag)
        if tag == b"IHDR":
            pw, ph, depth, ctype = struct.unpack(">IIBB", data[:10])
            assert (pw, ph, depth, ctype) == (w, h, 8, 0)
        if tag == b"IDAT":
            idat += data
        i += 12 + ln
    assert seen[0] == b"IHDR" and seen[-1] == b"IEND"
    raw = zlib.decompress(idat)
    pixels = b"".join(raw[y * (w + 1) + 1 : (y + 1) * (w + 1)] for y in range(h))
    assert pixels == pgm[len(f"P5\n{w} {h}\n255\n") :]


def test_pcm_window_rms_known_signals(spark):
    """Constant-amplitude PCM gives rms == |A|, a square wave too, the
    final short window reports its true length, empty payload yields a
    NULL row, odd byte length raises."""
    import numpy as np
    import pytest as _pytest

    from osmflat_rs_spark.operators.multimodal import pcm_window_rms

    const = np.full(600, 1000, dtype="<i2").tobytes()
    square = np.tile(np.array([2000, -2000], dtype="<i2"), 128).tobytes()
    rows = [(1, bytearray(const)), (2, bytearray(square)), (3, bytearray(b""))]
    df = spark.createDataFrame(rows, "media_ref long, payload binary")
    got = {}
    for r in pcm_window_rms(df, win=256).collect():
        got.setdefault(r["media_ref"], []).append(
            (r["win_idx"], r["n_samples"], r["rms"])
        )
    for k in got:
        got[k].sort()
    assert got[1] == [(0, 256, 1000.0), (1, 256, 1000.0), (2, 88, 1000.0)]
    assert got[2] == [(0, 256, 2000.0)]
    assert got[3] == [(0, 0, None)]
    bad = spark.createDataFrame([(9, bytearray(b"\x01\x02\x03"))], "media_ref long, payload binary")
    with _pytest.raises(Exception):
        pcm_window_rms(bad).collect()

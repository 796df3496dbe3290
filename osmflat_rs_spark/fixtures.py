"""Deterministic synthetic fixture generator (FIXTURES.md §1-2).

Generates the interleaved text+media document carrier table ``docs`` and
the broadcast ``polygons`` table, seeded and integer-exact so golden
results are bit-identical across machines. The generator *encodes*
entities into spans; the model oracle (oracle.py) and the engine
(ingest.py) both *decode* them independently — generator↔oracle roundtrip
and engine↔oracle equality are separate tests.

Reference expectations re-expressed (see FIXTURES.md):
- sparse strictly-increasing OSM ids spanning multiple 2^24 blocks
  (osmflatc/src/ids.rs:94-99, :116-119);
- 2% dangling way refs → unresolved NULL semantics
  (osmflatc/src/main.rs:243-246);
- relation→relation members forcing the two-phase dictionary dependency
  (osmflatc/src/main.rs:531-533);
- tag vocabulary with heavy repetition (dedup, main.rs:100-150) including
  the 9 unwanted highway values (render-roads.rs:100-110), place=city +
  population try-cast (cities.rs:33-38), amenity=pub + addr:*
  (pub-names.rs:26-31), waterway + width (render-features.rs:189-197),
  park/forest/lake/multipolygon (render-features.rs:202-233).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmflat_rs_spark.functions.geo import COORD_SCALE

UNWANTED_HIGHWAYS = [
    "pedestrian",
    "steps",
    "footway",
    "construction",
    "bic",
    "cycleway",
    "layby",
    "bridleway",
    "path",
]
GOOD_HIGHWAYS = ["primary", "secondary", "tertiary", "residential", "motorway", "trunk"]

LAT_MIN = int(52.4 * COORD_SCALE)
LAT_MAX = int(52.6 * COORD_SCALE)
LON_MIN = int(13.2 * COORD_SCALE)
LON_MAX = int(13.6 * COORD_SCALE)


def _sparse_ids(rng: np.random.RandomState, n: int) -> np.ndarray:
    """Strictly increasing sparse ids spanning multiple 2^24 blocks."""
    gaps = rng.randint(1, 60, size=n).astype(np.int64)
    ids = np.cumsum(gaps) + 1000
    n_jumps = min(4, max(1, n // 500))
    jump_at = np.linspace(0, n, n_jumps + 2, dtype=np.int64)[1:-1]
    for j in jump_at:
        ids[j:] += np.int64(1 << 24)
    return ids


def generate_entities(
    n_nodes: int = 2000, n_ways: int = 300, n_rels: int = 50, seed: int = 42
) -> dict:
    """Generate raw entity truth (pre-encoding). Deterministic."""
    rng = np.random.RandomState(seed)
    node_ids = _sparse_ids(rng, n_nodes)
    way_ids = _sparse_ids(rng, n_ways)
    rel_ids = _sparse_ids(rng, n_rels)
    node_id_set = set(int(i) for i in node_ids)

    lats = rng.randint(LAT_MIN, LAT_MAX + 1, size=n_nodes).astype(np.int64)
    lons = rng.randint(LON_MIN, LON_MAX + 1, size=n_nodes).astype(np.int64)

    generic_keys = ["name", "source", "note", "surface", "oneway", "access"]
    generic_vals = ["yes", "no", "asphalt", "survey", "local", "Berlin", "unknown"]

    def generic_tags(k_max: int) -> list[tuple[str, str]]:
        k = rng.randint(0, k_max + 1)
        return [
            (generic_keys[rng.randint(len(generic_keys))], generic_vals[rng.randint(len(generic_vals))])
            for _ in range(k)
        ]

    nodes = []
    for i in range(n_nodes):
        tags: list[tuple[str, str]] = []
        r = rng.rand()
        if r < 0.05:
            pop = str(rng.randint(1000, 5_000_000)) if rng.rand() < 0.8 else ["many", "12k", ""][rng.randint(3)]
            tags += [("place", "city"), ("name", f"City{i}"), ("population", pop)]
            if rng.rand() < 0.2:
                tags = tags[:2]  # city without population → skipped by cities query
        elif r < 0.08:
            tags += [("amenity", "pub"), ("name", f"Pub {i}")]
            if rng.rand() < 0.7:
                tags += [("addr:street", f"Street {rng.randint(100)}"), ("addr:city", "Berlin")]
            if rng.rand() < 0.3:
                tags += [("addr:housenumber", str(rng.randint(1, 200)))]
        tags += generic_tags(2)
        nodes.append({"osm_id": int(node_ids[i]), "lat": int(lats[i]), "lon": int(lons[i]), "tags": tags})

    ways = []
    for i in range(n_ways):
        n_refs = rng.randint(2, 13)
        refs = [int(node_ids[rng.randint(n_nodes)]) for _ in range(n_refs)]
        for j in range(n_refs):
            if rng.rand() < 0.02:
                dangling = int(node_ids[-1]) + 7 + int(rng.randint(1, 1 << 20)) * 2
                while dangling in node_id_set:
                    dangling += 1
                refs[j] = dangling
        tags = []
        r = rng.rand()
        if r < 0.5:
            hv_pool = GOOD_HIGHWAYS + UNWANTED_HIGHWAYS
            tags.append(("highway", hv_pool[rng.randint(len(hv_pool))]))
        elif r < 0.65:
            tags.append(("waterway", ["river", "stream", "canal"][rng.randint(3)]))
            wr = rng.rand()
            if wr < 0.4:
                tags.append(("width", str(rng.randint(1, 40))))
            elif wr < 0.5:
                tags.append(("maxwidth", str(rng.randint(1, 40))))
            elif wr < 0.6:
                tags.append(("width", "narrow"))  # unparseable → classify None
        tags += generic_tags(2)
        rng.shuffle(tags)
        ways.append({"osm_id": int(way_ids[i]), "tags": tags, "refs": refs})

    rels = []
    for i in range(n_rels):
        tags = []
        members: list[tuple[str, int, str]] = []
        if i < 10:
            mp_tags = [("type", "multipolygon")]
            flavor = rng.rand()
            if flavor < 0.4:
                mp_tags.append(("leisure", "park"))
            elif flavor < 0.6:
                mp_tags.append(("landuse", ["forest", "recreation_ground"][rng.randint(2)]))
            elif flavor < 0.9:
                mp_tags.append(("water", "lake"))
            else:
                mp_tags += [("leisure", "park"), ("water", "lake")]
            rng.shuffle(mp_tags)
            tags += mp_tags
            n_outer = rng.randint(1, 4)
            for _ in range(n_outer):
                members.append(("way", int(way_ids[rng.randint(n_ways)]), "outer"))
            if rng.rand() < 0.5:
                members.append(("way", int(way_ids[rng.randint(n_ways)]), "inner"))
        tags += generic_tags(2)
        n_extra = rng.randint(0, 5)
        for _ in range(n_extra):
            t = rng.rand()
            if t < 0.4:
                members.append(("node", int(node_ids[rng.randint(n_nodes)]), ["", "label", "admin_centre"][rng.randint(3)]))
            elif t < 0.7:
                members.append(("way", int(way_ids[rng.randint(n_ways)]), ["", "outer", "inner"][rng.randint(3)]))
            else:
                # relation→relation, may point forward (two-phase dependency)
                members.append(("relation", int(rel_ids[rng.randint(n_rels)]), ["", "subarea"][rng.randint(2)]))
        if rng.rand() < 0.1 and members:
            # dangling member id
            kind = members[0][0]
            members.append((kind, int(9_999_999_999 + rng.randint(1000)), "lost"))
        rng.shuffle(members)
        rels.append({"osm_id": int(rel_ids[i]), "tags": tags, "members": members})

    return {"nodes": nodes, "ways": ways, "relations": rels, "seed": seed}


def _encode_doc(rng: np.random.RandomState, entity_type: str, ent: dict) -> dict:
    """Entity → interleaved span list (the carrier encoding of FIXTURES §1)."""
    payload: list[tuple[str, str, str]] = [("header", f"{entity_type} {ent['osm_id']}", "")]
    if entity_type == "node":
        payload.append(("coord", f"{ent['lat']},{ent['lon']}", ""))
    for k, v in ent["tags"]:
        payload.append(("tag", f"{k}={v}", ""))
    if entity_type == "way":
        for r in ent["refs"]:
            payload.append(("ref", str(r), ""))
    if entity_type == "relation":
        for mtype, mid, role in ent["members"]:
            payload.append(("member", f"{mtype}:{mid}:{role}", ""))
    # interleave 0-3 media spans at deterministic positions (never before header)
    n_media = rng.randint(0, 4)
    for k in range(n_media):
        pos = rng.randint(1, len(payload) + 1)
        payload.insert(pos, ("media", "", f"media://{entity_type}/{ent['osm_id']}/{k}.png"))
    # strictly increasing but non-consecutive offsets (order != offset)
    offsets = np.cumsum(rng.randint(1, 4, size=len(payload))) - 1
    spans = [
        {"kind": k, "text": t, "media_ref": m, "offset": int(o)}
        for (k, t, m), o in zip(payload, offsets)
    ]
    prefix = {"node": "n", "way": "w", "relation": "r"}[entity_type]
    return {"doc_id": f"{prefix}{ent['osm_id']}", "spans": spans}


def generate_docs(
    n_nodes: int = 2000, n_ways: int = 300, n_rels: int = 50, seed: int = 42
) -> tuple[pd.DataFrame, dict]:
    """→ (docs pandas DataFrame, raw entity truth dict)."""
    truth = generate_entities(n_nodes, n_ways, n_rels, seed)
    rng = np.random.RandomState(seed + 1)  # media/offset stream, independent of truth
    rows = []
    for ent in truth["nodes"]:
        rows.append(_encode_doc(rng, "node", ent))
    for ent in truth["ways"]:
        rows.append(_encode_doc(rng, "way", ent))
    for ent in truth["relations"]:
        rows.append(_encode_doc(rng, "relation", ent))
    return pd.DataFrame(rows), truth


def generate_polygons(seed: int = 42, n_poly: int = 25) -> pd.DataFrame:
    """25 seeded star-shaped (convex + concave) polygons inside/straddling
    the node bbox; polygon 0 is the deliberate hot cell (covers ≥40% of the
    bbox area) to exercise salting (FIXTURES §2)."""
    rng = np.random.RandomState(seed + 2)
    rows = []
    for p in range(n_poly):
        if p == 0:
            cx = (LON_MIN + LON_MAX) // 2
            cy = (LAT_MIN + LAT_MAX) // 2
            r_lon = int((LON_MAX - LON_MIN) * 0.40)
            r_lat = int((LAT_MAX - LAT_MIN) * 0.40)
            kind = "district"
        else:
            cx = rng.randint(LON_MIN - (LON_MAX - LON_MIN) // 8, LON_MAX + (LON_MAX - LON_MIN) // 8)
            cy = rng.randint(LAT_MIN - (LAT_MAX - LAT_MIN) // 8, LAT_MAX + (LAT_MAX - LAT_MIN) // 8)
            r_lon = rng.randint((LON_MAX - LON_MIN) // 40, (LON_MAX - LON_MIN) // 6)
            r_lat = rng.randint((LAT_MAX - LAT_MIN) // 40, (LAT_MAX - LAT_MIN) // 6)
            kind = ["district", "park", "lake"][rng.randint(3)]
        k = rng.randint(5, 13)
        angles = np.sort(rng.rand(k) * 2 * np.pi)
        radii = 0.5 + rng.rand(k) * 0.5  # varying radii → concave stars
        xs = (cx + np.cos(angles) * radii * r_lon).astype(np.int64)
        ys = (cy + np.sin(angles) * radii * r_lat).astype(np.int64)
        ring = [{"lat": int(a), "lon": int(b)} for a, b in zip(ys, xs)]
        rows.append({"polygon_id": f"poly{p:03d}", "ring": ring, "kind": kind})
    return pd.DataFrame(rows)


def docs_to_spark(spark, docs_pdf: pd.DataFrame):
    """pandas docs → Spark DataFrame with the exact input_hint schema.

    r6: built as a pyarrow Table (guide §6 — Arrow driver transfer).
    The previous list-of-tuples ``createDataFrame`` pickled every nested
    row through the Py4J/RDD path AND re-deserialized it in Python
    workers on EVERY downstream scan (measured 3.9 s vs 0.6 s at 2,350
    docs for one scan); the Arrow table ships once as Arrow batches and
    scans JVM-side. Same values, same nullability."""
    import pyarrow as pa

    span_t = pa.struct(
        [
            pa.field("kind", pa.string(), nullable=False),
            pa.field("text", pa.string()),
            pa.field("media_ref", pa.string()),
            pa.field("offset", pa.int32(), nullable=False),
        ]
    )
    schema = pa.schema(
        [
            pa.field("doc_id", pa.string(), nullable=False),
            pa.field("spans", pa.list_(pa.field("item", span_t, nullable=False)), nullable=False),
        ]
    )
    recs = [
        {
            "doc_id": r.doc_id,
            "spans": [
                {
                    "kind": s["kind"],
                    "text": s["text"],
                    "media_ref": s["media_ref"],
                    "offset": s["offset"],
                }
                for s in r.spans
            ],
        }
        for r in docs_pdf.itertuples()
    ]
    df = spark.createDataFrame(pa.Table.from_pylist(recs, schema=schema))
    # Truncate the multi-MB LocalRelation out of downstream plans: every
    # job over a plan-embedded local table re-copies it through analysis/
    # optimization on the DRIVER (guide §7.3 "very large query plans") —
    # measured ~2.6 s of driver time per warm ingest (5 jobs) vs ~0.45 s
    # of actual cluster work. localCheckpoint materializes the rows once
    # (eager, in the untimed construction phase) and plans then reference
    # a compact RDD scan.
    return df.localCheckpoint(eager=True)


def polygons_to_spark(spark, poly_pdf: pd.DataFrame):
    """Arrow-table carrier for the same reason as ``docs_to_spark`` —
    ``pip_join`` collect()s this table on every call, and the pickle-RDD
    form spread ~tiny row counts over defaultParallelism Python tasks."""
    import pyarrow as pa

    vert_t = pa.struct(
        [pa.field("lat", pa.int64(), nullable=False), pa.field("lon", pa.int64(), nullable=False)]
    )
    schema = pa.schema(
        [
            pa.field("polygon_id", pa.string(), nullable=False),
            pa.field("ring", pa.list_(pa.field("item", vert_t, nullable=False)), nullable=False),
            pa.field("kind", pa.string(), nullable=False),
        ]
    )
    recs = [
        {
            "polygon_id": r.polygon_id,
            "ring": [{"lat": int(v["lat"]), "lon": int(v["lon"])} for v in r.ring],
            "kind": r.kind,
        }
        for r in poly_pdf.itertuples()
    ]
    return spark.createDataFrame(pa.Table.from_pylist(recs, schema=schema))

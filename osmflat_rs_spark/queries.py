"""The reference example queries (SURVEY §2/§5 acceptance suite) as
DataFrame plans over the ingested columnar tables.

Each function mirrors one reference program; tag semantics are expressed
with higher-order array functions (``exists`` / ``filter`` / ``aggregate``)
— the Spark restatement of the byte-predicate closures in
osmflat/src/tags.rs:35-84 — so the hot path stays inside
whole-stage-codegen with zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmflat_rs_spark.fixtures import UNWANTED_HIGHWAYS
from osmflat_rs_spark.functions.geo import COORD_SCALE, EARTH_RADIUS_M


def _exists_tag(k: str, v: str | None = None):
    if v is None:
        return F.exists("tags", lambda t: t["key"] == k)
    return F.exists("tags", lambda t: (t["key"] == k) & (t["value"] == v))


def _find_tag(k: str):
    """First tag value for key (find_tag, osmflat/src/tags.rs:59-63).
    F.get (not element_at): null-safe on empty arrays under ANSI mode."""
    return F.get(F.filter("tags", lambda t: t["key"] == k), 0)["value"]


def counts(t: dict[str, DataFrame]) -> DataFrame:
    """count.rs:15-17 — entity cardinalities."""
    return (
        t["nodes"].select(F.lit("node").alias("entity_type"))
        .unionByName(t["ways"].select(F.lit("way").alias("entity_type")))
        .unionByName(t["relations"].select(F.lit("relation").alias("entity_type")))
        .groupBy("entity_type")
        .agg(F.count("*").alias("n"))
    )


def cities(t: dict[str, DataFrame]) -> DataFrame:
    """cities.rs:25-40 — place=city nodes with parseable population;
    try-cast skip semantics via a digits-only guard (usize::parse)."""
    pop = _find_tag("population")
    return (
        t["nodes"]
        .filter(_exists_tag("place", "city"))
        .select(
            _find_tag("name").alias("name"),
            # try_cast, not cast: a >19-digit population passes the
            # digits regex but overflows long — ANSI cast would abort the
            # job; try_cast yields NULL = the reference's parse-skip
            F.when(pop.rlike("^[0-9]+$"), pop.try_cast("long")).alias("population"),
        )
        .filter(F.col("name").isNotNull() & F.col("population").isNotNull())
    )


def pub_names(t: dict[str, DataFrame]) -> DataFrame:
    """pub-names.rs:22-38 — nodes ∪ ways with amenity=pub; ordered addr:*
    tags concatenated (U1 union + P10 key-prefix filter)."""
    def side(df: DataFrame, source: str) -> DataFrame:
        return (
            df.filter(_exists_tag("amenity", "pub"))
            .select(
                F.lit(source).alias("source"),
                F.col("osm_id"),
                F.coalesce(_find_tag("name"), F.lit("unknown pub name")).alias("name"),
                F.array_join(
                    F.transform(
                        F.filter("tags", lambda tg: tg["key"].startswith("addr:")),
                        lambda tg: F.concat(tg["key"], F.lit("="), tg["value"]),
                    ),
                    "|",
                ).alias("addr_tags"),
            )
        )

    return side(t["nodes"], "node").unionByName(side(t["ways"], "way"))


def _haversine_arr(c1, c2):
    """Haversine between two struct<lat,lon> fixed-point elements — inline
    expression form usable inside zip_with (formula order of geo.haversine_m)."""
    la1 = F.radians(c1["lat"].cast("double") / F.lit(float(COORD_SCALE)))
    la2 = F.radians(c2["lat"].cast("double") / F.lit(float(COORD_SCALE)))
    dlat_half = (la2 - la1) / F.lit(2.0)
    dlon_half = (
        F.radians(c2["lon"].cast("double") / F.lit(float(COORD_SCALE)))
        - F.radians(c1["lon"].cast("double") / F.lit(float(COORD_SCALE)))
    ) / F.lit(2.0)
    a = F.sin(dlat_half) * F.sin(dlat_half) + F.cos(la1) * F.cos(la2) * F.sin(dlon_half) * F.sin(dlon_half)
    return F.lit(2.0) * F.asin(F.sqrt(a)) * F.lit(EARTH_RADIUS_M)


def way_lengths(t: dict[str, DataFrame]) -> DataFrame:
    """Per-highway-way length (road-length.rs:44-89): explode refs → join
    nodes (THE hot FK join, SURVEY J5) → re-assemble ordered coord array →
    in-row pairwise haversine fold (deterministic sequential order, the
    Spark analog of the reference's fold_options) with NULL-poisoning."""
    highways = t["ways"].filter(_exists_tag("highway")).select("way_idx", "refs")
    exploded = highways.select("way_idx", F.explode("refs").alias("r")).select(
        "way_idx", F.col("r.pos").alias("pos"), F.col("r.node_idx").alias("node_idx")
    )
    joined = exploded.join(
        t["nodes"].select("node_idx", "lat", "lon"), "node_idx", "left"
    )
    coords = joined.groupBy("way_idx").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("lat"), F.col("lon")))
        ).alias("coords"),
        # null-poisoning: any unresolved ref (null node_idx → null lat after
        # the left join) poisons the way (fold_options semantics)
        F.sum(F.when(F.col("node_idx").isNull() | F.col("lat").isNull(), 1).otherwise(0)).alias("n_bad"),
    )
    n = F.size("coords")
    pair_dists = F.zip_with(
        F.slice("coords", 1, n - 1), F.slice("coords", 2, n - 1), _haversine_arr
    )
    # sequential left fold — deterministic float accumulation order
    length = F.aggregate(pair_dists, F.lit(0.0), lambda acc, x: acc + x)
    return coords.select(
        "way_idx",
        F.when(F.col("n_bad") > 0, F.lit(None)).otherwise(length).alias("length_m"),
    )


def road_length(t: dict[str, DataFrame]) -> DataFrame:
    """Σ lengths of non-poisoned highway ways, meters (A2 global sum)."""
    return way_lengths(t).agg(F.sum("length_m").alias("total_m"))


def _road_filter(ways: DataFrame) -> DataFrame:
    """way_filter of render-roads.rs:99-120 (∃ highway tag with value ∉ 9
    unwanted) AND fully resolved (forall refs non-null — null-propagation
    P13, checked in-row, no join needed)."""
    return ways.filter(
        F.exists("tags", lambda tg: (tg["key"] == "highway") & ~tg["value"].isin(UNWANTED_HIGHWAYS))
        & F.forall("refs", lambda r: r["node_idx"].isNotNull())
    )


def road_coords(t: dict[str, DataFrame]) -> DataFrame:
    """(way_idx, pos, lat, lon) of renderable road vertices.

    Fast path: when the ingest provided ``ways_geo`` (refs with
    denormalized coords), this is a pure in-row explode — NO join against
    the node table and no shuffle at all. Fallback (plain ``ways``):
    explode + FK join to nodes."""
    wg = t.get("ways_geo")
    if wg is not None:
        return _road_filter(wg).select("way_idx", F.explode("refs").alias("r")).select(
            "way_idx", F.col("r.pos").alias("pos"), F.col("r.lat").alias("lat"), F.col("r.lon").alias("lon")
        )
    roads = _road_filter(t["ways"])
    exploded = roads.select("way_idx", F.explode("refs").alias("r")).select(
        "way_idx", F.col("r.pos").alias("pos"), F.col("r.node_idx").alias("node_idx")
    )
    return exploded.join(t["nodes"].select("node_idx", "lat", "lon"), "node_idx").select(
        "way_idx", "pos", "lat", "lon"
    )


def _zip_pairs(refs_col: str):
    """array<struct<..lat,lon..>> → consecutive-pair structs, in-row."""
    return F.zip_with(
        F.slice(refs_col, 1, F.greatest(F.size(refs_col) - 1, F.lit(0))),
        F.slice(refs_col, 2, F.greatest(F.size(refs_col) - 1, F.lit(0))),
        lambda a, b: F.struct(
            a["lat"].alias("lat"),
            a["lon"].alias("lon"),
            b["lat"].alias("lat2"),
            b["lon"].alias("lon2"),
        ),
    )


def road_segments(t: dict[str, DataFrame]) -> DataFrame:
    """(way_idx, lat, lon, lat2, lon2) consecutive road vertex pairs —
    the tile phase's input, built with the minimum possible movement:

    - given the ingest dict (has ``assembled``): the road-tag filter runs
      BEFORE the resolution join (non-road ways never enter a shuffle),
      the resolve is refs ⋈ nodes on the long osm_id, re-grouped by the
      long ``way_idx`` (not the string doc_id), and there is NO join back
      to the way table — the pairs zip in-row from the grouped array.
      Two slim shuffles total, then everything is in-row.
    - given only ``ways_geo``: pure in-row zip (the resolution already
      happened inside ways_geo's own plan).

    Both forms are exactly equal (tests/test_tiling.py)."""
    asm = t.get("assembled")
    nodes = t.get("nodes")
    if asm is not None and nodes is not None:
        roads = asm.filter(
            (F.col("entity_type") == "way")
            & F.exists(
                "tags_arr",
                lambda tg: (tg["key"] == "highway") & ~tg["value"].isin(UNWANTED_HIGHWAYS),
            )
        )
        refs = roads.select(
            F.col("eidx").alias("way_idx"), F.explode("refs_arr").alias("r")
        ).select("way_idx", F.col("r.order").alias("order"), F.col("r.ref_osm_id").alias("ref_osm_id"))
        resolved = refs.join(
            nodes.select(F.col("osm_id").alias("ref_osm_id"), "node_idx", "lat", "lon"),
            "ref_osm_id",
            "left",
        )
        grouped = resolved.groupBy("way_idx").agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("order").alias("_o"), "node_idx", "lat", "lon"))
            ).alias("rr")
        )
        fully = grouped.filter(
            F.forall("rr", lambda r: r["node_idx"].isNotNull()) & (F.size("rr") >= 2)
        )
        return fully.select("way_idx", F.explode(_zip_pairs("rr")).alias("s")).select(
            "way_idx", "s.lat", "s.lon", "s.lat2", "s.lon2"
        )
    wg = t["ways_geo"]
    return (
        _road_filter(wg)
        .filter(F.size("refs") >= 2)
        .select("way_idx", F.explode(_zip_pairs("refs")).alias("s"))
        .select("way_idx", "s.lat", "s.lon", "s.lat2", "s.lon2")
    )


def bbox(t: dict[str, DataFrame]) -> DataFrame:
    """render-roads.rs:55-69 — 4-way min/max over renderable road coords."""
    return road_coords(t).agg(
        F.min("lat").alias("min_lat"),
        F.max("lat").alias("max_lat"),
        F.min("lon").alias("min_lon"),
        F.max("lon").alias("max_lon"),
    )


def classify(t: dict[str, DataFrame]) -> DataFrame:
    """render-features.rs:163-233 — order-dependent CASE classification.

    Way: first highway/waterway tag in array order decides; waterway width
    parse failure poisons (the `.ok()?`). Relation: the two-flag automaton
    reduces to completion-time arithmetic over first tag positions:
    t_park = max(pos_mp, pos_park), t_water = max(pos_mp, pos_lake),
    earliest completion wins, tie → Park (checked first in the source).
    """
    keys = F.transform("tags", lambda tg: tg["key"])
    pos_h = F.array_position(keys, "highway")
    pos_w = F.array_position(keys, "waterway")
    hval = _find_tag("highway")
    width_tag = F.get(
        F.filter("tags", lambda tg: (tg["key"] == "width") | (tg["key"] == "maxwidth")), 0
    )["value"]
    way_cat = (
        F.when(
            (pos_h > 0) & ((pos_w == 0) | (pos_h < pos_w)),
            F.when(hval.isin(UNWANTED_HIGHWAYS), F.lit(None)).otherwise(F.lit("Road")),
        )
        .when(
            pos_w > 0,
            F.when(width_tag.isNull(), F.lit("River")).when(
                width_tag.rlike("^[0-9]+$"), F.lit("River")
            ),  # unparseable width → NULL (poison)
        )
    )
    way_width = F.when(
        (pos_w > 0) & ((pos_h == 0) | (pos_w < pos_h)),
        F.when(width_tag.isNull(), F.lit(1)).otherwise(
            F.when(width_tag.rlike("^[0-9]+$"), width_tag.try_cast("long"))
        ),
    )
    ways = (
        t["ways"]
        .filter(F.size("refs") >= 3)
        .select(
            F.lit("way").alias("source"),
            F.col("way_idx").alias("feature_idx"),
            way_cat.alias("category"),
            way_width.alias("width"),
        )
        .filter(F.col("category").isNotNull())
    )

    kv = F.transform("tags", lambda tg: F.concat(tg["key"], F.lit("="), tg["value"]))
    pos_mp = F.array_position(kv, "type=multipolygon")
    pos_park = F.least(
        *[
            F.when(F.array_position(kv, lit_kv) > 0, F.array_position(kv, lit_kv))
            for lit_kv in ["leisure=park", "landuse=recreation_ground", "landuse=forest"]
        ]
    )
    pos_lake = F.when(F.array_position(kv, "water=lake") > 0, F.array_position(kv, "water=lake"))
    t_park = F.when((pos_mp > 0) & pos_park.isNotNull(), F.greatest(pos_mp, pos_park))
    t_water = F.when((pos_mp > 0) & pos_lake.isNotNull(), F.greatest(pos_mp, pos_lake))
    rel_cat = (
        F.when(t_park.isNotNull() & (t_water.isNull() | (t_park <= t_water)), F.lit("Park"))
        .when(t_water.isNotNull(), F.lit("Water"))
    )
    rels = (
        t["relations"]
        .select(
            F.lit("relation").alias("source"),
            F.col("relation_idx").alias("feature_idx"),
            rel_cat.alias("category"),
            F.lit(None).cast("long").alias("width"),
        )
        .filter(F.col("category").isNotNull())
    )
    return ways.unionByName(rels)


def debug_dump(t: dict[str, DataFrame], types: str = "nwr", num: int | None = None) -> DataFrame:
    """debug.rs:120-205 — formatted dump of the first ``num`` entities of
    the selected types (ordered take-first-N, SURVEY W5/O4), coordinates in
    degrees (P1), tags as k=v lists."""
    from osmflat_rs_spark.functions.geo import COORD_SCALE

    tag_str = F.array_join(F.transform("tags", lambda tg: F.concat(tg["key"], F.lit("="), tg["value"])), ",")
    parts = []
    if "n" in types:
        parts.append(
            t["nodes"].select(
                F.lit("node").alias("source"),
                F.col("node_idx").alias("idx"),
                F.concat(
                    F.lit("Node{id="),
                    F.col("osm_id"),
                    F.lit(", lat="),
                    F.format_number(F.col("lat") / F.lit(float(COORD_SCALE)), 7),
                    F.lit(", lon="),
                    F.format_number(F.col("lon") / F.lit(float(COORD_SCALE)), 7),
                    F.lit(", tags=["),
                    tag_str,
                    F.lit("]}"),
                ).alias("text"),
            )
        )
    if "w" in types:
        refs_str = F.array_join(
            F.transform("refs", lambda r: F.coalesce(r["node_idx"].cast("string"), F.lit("None"))), ","
        )
        parts.append(
            t["ways"].select(
                F.lit("way").alias("source"),
                F.col("way_idx").alias("idx"),
                F.concat(
                    F.lit("Way{id="), F.col("osm_id"), F.lit(", tags=["), tag_str,
                    F.lit("], nodes=["), refs_str, F.lit("]}"),
                ).alias("text"),
            )
        )
    if "r" in types:
        mem_str = F.array_join(
            F.transform(
                "members",
                lambda m: F.concat_ws(
                    ":", m["member_type"], F.coalesce(m["member_idx"].cast("string"), F.lit("None")), m["role"]
                ),
            ),
            ",",
        )
        parts.append(
            t["relations"].select(
                F.lit("relation").alias("source"),
                F.col("relation_idx").alias("idx"),
                F.concat(
                    F.lit("Relation{id="), F.col("osm_id"), F.lit(", tags=["), tag_str,
                    F.lit("], members=["), mem_str, F.lit("]}"),
                ).alias("text"),
            )
        )
    if not parts:
        raise ValueError(
            f"debug_dump: types={types!r} selects no entity kind — use a "
            f"string containing any of 'n' (nodes), 'w' (ways), 'r' (relations)"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if num is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("source").orderBy("idx")
        out = out.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= num).drop("_rn")
    return out


def multipolygon_outer_coords(t: dict[str, DataFrame]) -> DataFrame:
    """J7 multipolygon assembly (render-features.rs:133-149): for each
    relation, its way-members with role='outer' in member order, each
    expanded to the way's ordered node coords — the 3-hop FK join chain
    relations ⋈ members ⋈ ways ⋈ nodes. A relation with ANY unresolved
    outer way member is dropped entirely (the Option-collect), as is one
    whose ring ways have unresolved node refs (way_into coords are
    null-propagating, render-features.rs:80-97).

    → (relation_idx, ring_pos, pos, lat, lon)."""
    outer = (
        t["relations"]
        .select("relation_idx", F.explode("members").alias("m"))
        .filter((F.col("m.member_type") == "way") & (F.col("m.role") == "outer"))
        .select("relation_idx", F.col("m.pos").alias("member_pos"), F.col("m.member_idx").alias("way_idx"))
    )
    from pyspark.sql import Window

    # poison: any NULL outer way member kills the relation (left-anti)
    poisoned = outer.filter(F.col("way_idx").isNull()).select("relation_idx").distinct()
    ok = outer.join(poisoned, "relation_idx", "left_anti")
    # ring_pos = rank of member_pos among the outer members of the relation
    w = Window.partitionBy("relation_idx").orderBy("member_pos")
    rings = ok.withColumn("ring_pos", F.row_number().over(w) - 1)
    ways = t["ways"].select("way_idx", "refs").filter(
        F.forall("refs", lambda r: r["node_idx"].isNotNull())
    )
    # inner join drops rings with unresolved way refs → relation keeps
    # only fully-resolved rings? No: the reference's way coords are
    # Option-per-way inside the polyline; a bad ring poisons the feature.
    bad_rings = (
        rings.join(t["ways"].select("way_idx", "refs"), "way_idx")
        .filter(~F.forall("refs", lambda r: r["node_idx"].isNotNull()))
        .select("relation_idx")
        .distinct()
    )
    good = rings.join(bad_rings, "relation_idx", "left_anti")
    exploded = (
        good.join(ways, "way_idx")
        .select("relation_idx", "ring_pos", F.explode("refs").alias("r"))
        .select("relation_idx", "ring_pos", F.col("r.pos").alias("pos"), F.col("r.node_idx").alias("node_idx"))
    )
    return exploded.join(t["nodes"].select("node_idx", "lat", "lon"), "node_idx").select(
        "relation_idx", "ring_pos", "pos", "lat", "lon"
    )

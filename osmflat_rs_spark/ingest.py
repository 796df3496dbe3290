"""Ingest: interleaved text+media documents → columnar entity tables.

This is the engine's restatement of the reference compiler
(``osmflatc``, osmflatc/src/main.rs:588-715): a 3-stage DAG
(nodes → ways → relations, the dictionary dependency of main.rs:666-698)
expressed as declarative DataFrame plans — no per-row Python anywhere;
span parsing is pure Catalyst string expressions on the exploded array.

Outputs (golden-table schemas of FIXTURES.md §3):
- ``nodes(node_idx, osm_id, lat, lon, tags)`` — consecutive idx in id
  order (main.rs:192-193) via the scalable two-pass dense index;
- ``ways(way_idx, osm_id, tags, refs)`` — refs left-joined against the
  node dictionary, NULL for dangling (main.rs:232-251);
- ``relations(relation_idx, osm_id, tags, members)`` — typed 3-way member
  resolution incl. relation→relation (main.rs:362-397, :531-533);
- ``tags_dim(tag_idx, key, value)`` — dedup in global first-seen order
  (main.rs:100-150);
- ``strings_dim(offset, s)`` — interning with offset += len+1 semantics
  (strings.rs:73-109, test expectations :134-145);
- ``metrics`` — the Stats counters (stats.rs:4-12) incl. counted
  left-anti unresolved ids (main.rs:244);
- ``media`` + ``span_layout`` + ``unresolved`` — lossless carriers so the
  per-doc span sequence (kind, text, media_ref, order) can be rebuilt
  exactly (the per-row invariant of BASELINE.json.input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmflat_rs_spark.plans.indexing import assign_dense_index

STAGE_RANK = {"node": 0, "way": 1, "relation": 2}


def parse_spans(docs: DataFrame) -> DataFrame:
    """docs → one row per span: (doc_id, order, kind, text, media_ref, offset).

    ``order`` is the rank of ``offset`` within the doc (the engine does NOT
    assume the array arrives offset-sorted): re-sort in-row with
    ``array_sort`` on (offset, …) — an O(n log n) per-row JVM operation,
    no shuffle, then ``posexplode``.
    """
    sorted_spans = F.array_sort(
        F.transform(
            "spans",
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    return docs.select(
        "doc_id", F.posexplode(sorted_spans).alias("order", "s")
    ).select(
        "doc_id",
        F.col("order").cast("int").alias("order"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def _entities(spans: DataFrame) -> DataFrame:
    """header spans → (doc_id, entity_type, osm_id)."""
    return (
        spans.filter(F.col("kind") == "header")
        .select(
            "doc_id",
            F.substring_index("text", " ", 1).alias("entity_type"),
            F.substring_index("text", " ", -1).cast("long").alias("osm_id"),
        )
    )


def _doc_tags(spans: DataFrame) -> DataFrame:
    """tag spans parsed: (doc_id, order, tag_pos, key, value).

    key = text up to the first '=', value = the rest (values may contain
    '='); tag_pos is the tag's rank within the doc's tag sequence.
    """
    tags = spans.filter(F.col("kind") == "tag").select(
        "doc_id",
        "order",
        F.substring_index("text", "=", 1).alias("key"),
        F.expr("substring(text, instr(text, '=') + 1)").alias("value"),
    )
    # tag_pos via in-doc rank of order — computed without a window: tags per
    # doc are few; collect+re-explode keeps it shuffle-light (one agg).
    return tags


def _collect_ordered(df: DataFrame, key: str, order_col: str, payload: list[str], out: str) -> DataFrame:
    """groupBy(key) → array of payload structs sorted by order_col, plus a
    parallel pos (0-based) — the in-row flattened 1:n carrier replacing the
    reference's range-by-sentinel (flatdata/osm.flatdata:205-224)."""
    arr = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("_o"), *[F.col(p).alias(p) for p in payload]))
    )
    return df.groupBy(key).agg(arr.alias(out))


def ingest(docs: DataFrame) -> dict[str, DataFrame]:
    spans = parse_spans(docs)
    entities = _entities(spans)
    tags = _doc_tags(spans).join(entities, "doc_id")

    # ---- stage 1: nodes ---------------------------------------------------
    coords = (
        spans.filter(F.col("kind") == "coord")
        .select(
            "doc_id",
            F.split("text", ",").getItem(0).cast("long").alias("lat"),
            F.split("text", ",").getItem(1).cast("long").alias("lon"),
        )
    )
    node_tags = _collect_ordered(
        tags.filter(F.col("entity_type") == "node"), "doc_id", "order", ["key", "value"], "tags_arr"
    )
    nodes_base = (
        entities.filter(F.col("entity_type") == "node")
        .join(coords, "doc_id")
        .join(node_tags, "doc_id", "left")
    )
    nodes = assign_dense_index(nodes_base, ["osm_id"], "node_idx").select(
        "node_idx",
        "osm_id",
        "lat",
        "lon",
        _strip_order("tags_arr").alias("tags"),
        "doc_id",
    )

    node_dict = nodes.select(F.col("osm_id").alias("ref_osm_id"), "node_idx")

    # ---- stage 2: ways ----------------------------------------------------
    refs = (
        spans.filter(F.col("kind") == "ref")
        .join(entities.filter(F.col("entity_type") == "way").select("doc_id"), "doc_id")
        .select("doc_id", "order", F.col("text").cast("long").alias("ref_osm_id"))
    )
    # THE resolution join (main.rs:232-251): LEFT join keeps dangling refs
    # as NULL node_idx — @optional(INVALID_IDX) semantics.
    refs_resolved = refs.join(node_dict, "ref_osm_id", "left")
    way_refs = (
        refs_resolved.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("order").alias("_o"), F.col("node_idx"), F.col("ref_osm_id")))
            ).alias("refs_arr")
        )
    )
    way_tags = _collect_ordered(
        tags.filter(F.col("entity_type") == "way"), "doc_id", "order", ["key", "value"], "tags_arr"
    )
    ways_base = (
        entities.filter(F.col("entity_type") == "way")
        .join(way_tags, "doc_id", "left")
        .join(way_refs, "doc_id", "left")
    )
    ways = assign_dense_index(ways_base, ["osm_id"], "way_idx").select(
        "way_idx",
        "osm_id",
        _strip_order("tags_arr").alias("tags"),
        # refs: array<struct<pos:int, node_idx:long>> (pos = in-way rank)
        F.transform(
            F.coalesce("refs_arr", F.array()),
            lambda s, i: F.struct(i.cast("int").alias("pos"), s["node_idx"].alias("node_idx")),
        ).alias("refs"),
        F.transform(F.coalesce("refs_arr", F.array()), lambda s: s["ref_osm_id"]).alias("_ref_ids"),
        "doc_id",
    )

    way_dict = ways.select(F.col("osm_id").alias("m_osm_id"), F.col("way_idx").alias("member_idx")).withColumn(
        "member_type", F.lit("way")
    )

    # ---- stage 3: relations (members may reference relations: build the
    # relation dictionary FIRST — the pre-pass of main.rs:531-533) ----------
    rel_tags = _collect_ordered(
        tags.filter(F.col("entity_type") == "relation"), "doc_id", "order", ["key", "value"], "tags_arr"
    )
    rels_base = entities.filter(F.col("entity_type") == "relation").join(rel_tags, "doc_id", "left")
    rels_indexed = assign_dense_index(rels_base, ["osm_id"], "relation_idx")

    rel_dict = rels_indexed.select(
        F.col("osm_id").alias("m_osm_id"), F.col("relation_idx").alias("member_idx")
    ).withColumn("member_type", F.lit("relation"))
    node_mdict = node_dict.select(
        F.col("ref_osm_id").alias("m_osm_id"), F.col("node_idx").alias("member_idx")
    ).withColumn("member_type", F.lit("node"))
    member_dict = node_mdict.unionByName(way_dict).unionByName(rel_dict)

    members = (
        spans.filter(F.col("kind") == "member")
        .select(
            "doc_id",
            "order",
            F.split("text", ":", 3).getItem(0).alias("member_type"),
            F.split("text", ":", 3).getItem(1).cast("long").alias("m_osm_id"),
            F.split("text", ":", 3).getItem(2).alias("role"),
        )
    )
    members_resolved = members.join(member_dict, ["member_type", "m_osm_id"], "left")
    rel_members = members_resolved.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("order").alias("_o"),
                    F.col("member_type"),
                    F.col("member_idx"),
                    F.col("role"),
                    F.col("m_osm_id"),
                )
            )
        ).alias("members_arr")
    )
    relations = rels_indexed.join(rel_members, "doc_id", "left").select(
        "relation_idx",
        "osm_id",
        _strip_order("tags_arr").alias("tags"),
        F.transform(
            F.coalesce("members_arr", F.array()),
            lambda s, i: F.struct(
                i.cast("int").alias("pos"),
                s["member_type"].alias("member_type"),
                s["member_idx"].alias("member_idx"),
                s["role"].alias("role"),
            ),
        ).alias("members"),
        F.transform(F.coalesce("members_arr", F.array()), lambda s: s["m_osm_id"]).alias("_member_ids"),
        "doc_id",
    )

    # ---- dimensions: tag dedup + string interning -------------------------
    tags_global = tags.select(
        "key",
        "value",
        F.struct(
            _stage_rank_col().alias("stage"), F.col("osm_id").alias("eid"), F.col("order").alias("ord")
        ).alias("gpos"),
    )
    tag_first = tags_global.groupBy("key", "value").agg(F.min("gpos").alias("first_pos"))
    tags_dim = assign_dense_index(
        tag_first, ["first_pos.stage", "first_pos.eid", "first_pos.ord"], "tag_idx"
    ).select("tag_idx", "key", "value")

    # string stream: for tag_idx ascending, key then value (strings.rs:73-109)
    strs = (
        tags_dim.select((F.col("tag_idx") * 2).alias("spos"), F.col("key").alias("s"))
        .unionByName(tags_dim.select((F.col("tag_idx") * 2 + 1).alias("spos"), F.col("value").alias("s")))
        .groupBy("s")
        .agg(F.min("spos").alias("first_spos"))
    )
    strs_ranked = assign_dense_index(strs, ["first_spos"], "srank")
    # offset = Σ (len+1) of all earlier strings (strings.rs:134-145: +1 for \0)
    from pyspark.sql import Window

    w = Window.orderBy("srank").rowsBetween(Window.unboundedPreceding, -1)
    strings_dim = strs_ranked.select(
        F.coalesce(F.sum(F.length("s") + 1).over(w), F.lit(0)).cast("long").alias("offset"), "s"
    )

    # ---- media + span layout + unresolved (lossless roundtrip carriers) ---
    media = (
        spans.filter(F.col("kind") == "media")
        .withColumn("media_pos", F.row_number().over(Window.partitionBy("doc_id").orderBy("order")) - 1)
        .select("doc_id", "media_pos", "order", "media_ref")
    )
    from pyspark.sql import Window as W

    layout = spans.withColumn(
        "elem_pos",
        F.row_number().over(W.partitionBy("doc_id", "kind").orderBy("order")) - 1,
    ).select("doc_id", "order", "kind", "elem_pos")

    unresolved_refs = refs_resolved.filter(F.col("node_idx").isNull()).select(
        "doc_id", F.lit("ref").alias("kind"), "order", F.col("ref_osm_id").alias("raw_id")
    )
    unresolved_members = members_resolved.filter(F.col("member_idx").isNull()).select(
        "doc_id", F.lit("member").alias("kind"), "order", F.col("m_osm_id").alias("raw_id")
    )
    unresolved = unresolved_refs.unionByName(unresolved_members)

    # ---- metrics (stats.rs:4-12; counted left-anti join, main.rs:244) -----
    spark = docs.sparkSession
    n_nodes = nodes.count()
    n_ways = ways.count()
    n_rels = relations.count()
    n_unres_node = refs_resolved.filter(F.col("node_idx").isNull()).count() + members_resolved.filter(
        (F.col("member_type") == "node") & F.col("member_idx").isNull()
    ).count()
    n_unres_way = members_resolved.filter(
        (F.col("member_type") == "way") & F.col("member_idx").isNull()
    ).count()
    n_unres_rel = members_resolved.filter(
        (F.col("member_type") == "relation") & F.col("member_idx").isNull()
    ).count()
    metrics = spark.createDataFrame(
        [("ingest", n_nodes, n_ways, n_rels, n_unres_node, n_unres_way, n_unres_rel)],
        schema=(
            "stage string, num_nodes long, num_ways long, num_relations long, "
            "num_unresolved_node_ids long, num_unresolved_way_ids long, num_unresolved_rel_ids long"
        ),
    )

    return {
        "spans": spans,
        "nodes": nodes.drop("doc_id"),
        "ways": ways.drop("doc_id", "_ref_ids"),
        "relations": relations.drop("doc_id", "_member_ids"),
        "nodes_full": nodes,
        "ways_full": ways,
        "relations_full": relations,
        "tags_dim": tags_dim,
        "strings_dim": strings_dim,
        "metrics": metrics,
        "media": media,
        "span_layout": layout,
        "unresolved": unresolved,
    }


def _strip_order(arr_col: str):
    return F.transform(
        F.coalesce(arr_col, F.array()),
        lambda s: F.struct(s["key"].alias("key"), s["value"].alias("value")),
    )


def _stage_rank_col():
    return (
        F.when(F.col("entity_type") == "node", F.lit(0))
        .when(F.col("entity_type") == "way", F.lit(1))
        .otherwise(F.lit(2))
        .cast("int")
    )


def reconstruct_spans(t: dict[str, DataFrame]) -> DataFrame:
    """Rebuild (doc_id, order, kind, text, media_ref) from the ingested
    columnar tables — proof of losslessness (the per-row span-sequence
    invariant). Every value is re-derived from entity tables, not cached
    raw spans; unresolved ids come from the ``unresolved`` side table
    (the reference drops them into INVALID_IDX, osm.flatdata:6-9 — our
    invariant is stronger, so they are carried explicitly)."""
    nodes, ways, rels = t["nodes_full"], t["ways_full"], t["relations_full"]
    layout, media, unresolved = t["span_layout"], t["media"], t["unresolved"]

    ent = (
        nodes.select("doc_id", F.lit("node").alias("etype"), "osm_id")
        .unionByName(ways.select("doc_id", F.lit("way").alias("etype"), "osm_id"))
        .unionByName(rels.select("doc_id", F.lit("relation").alias("etype"), "osm_id"))
    )
    header = layout.filter(F.col("kind") == "header").join(ent, "doc_id").select(
        "doc_id", "order", "kind", F.concat_ws(" ", "etype", "osm_id").alias("text"), F.lit("").alias("media_ref")
    )
    coord = layout.filter(F.col("kind") == "coord").join(nodes, "doc_id").select(
        "doc_id", "order", "kind", F.concat_ws(",", "lat", "lon").alias("text"), F.lit("").alias("media_ref")
    )
    all_tags = (
        nodes.select("doc_id", "tags")
        .unionByName(ways.select("doc_id", "tags"))
        .unionByName(rels.select("doc_id", "tags"))
    )
    tag = (
        layout.filter(F.col("kind") == "tag")
        .join(all_tags, "doc_id")
        .select(
            "doc_id",
            "order",
            "kind",
            F.concat(
                F.element_at("tags", F.col("elem_pos") + 1)["key"],
                F.lit("="),
                F.element_at("tags", F.col("elem_pos") + 1)["value"],
            ).alias("text"),
            F.lit("").alias("media_ref"),
        )
    )
    # refs: node_idx → osm_id; NULL → unresolved side table
    ref_elems = ways.select("doc_id", F.posexplode("refs").alias("elem_pos", "r")).select(
        "doc_id", "elem_pos", F.col("r.node_idx").alias("node_idx")
    )
    ref = (
        layout.filter(F.col("kind") == "ref")
        .join(ref_elems, ["doc_id", "elem_pos"])
        .join(nodes.select(F.col("node_idx"), F.col("osm_id").alias("ref_id")), "node_idx", "left")
        .join(
            unresolved.filter(F.col("kind") == "ref").select("doc_id", "order", F.col("raw_id")),
            ["doc_id", "order"],
            "left",
        )
        .select(
            "doc_id",
            "order",
            F.lit("ref").alias("kind"),
            F.coalesce(F.col("ref_id"), F.col("raw_id")).cast("string").alias("text"),
            F.lit("").alias("media_ref"),
        )
    )
    mem_elems = rels.select("doc_id", F.posexplode("members").alias("elem_pos", "m")).select(
        "doc_id", "elem_pos", "m.member_type", "m.member_idx", "m.role"
    )
    idx_to_id = (
        nodes.select(F.lit("node").alias("member_type"), F.col("node_idx").alias("member_idx"), F.col("osm_id").alias("m_id"))
        .unionByName(ways.select(F.lit("way").alias("member_type"), F.col("way_idx").alias("member_idx"), F.col("osm_id").alias("m_id")))
        .unionByName(
            rels.select(
                F.lit("relation").alias("member_type"), F.col("relation_idx").alias("member_idx"), F.col("osm_id").alias("m_id")
            )
        )
    )
    member = (
        layout.filter(F.col("kind") == "member")
        .join(mem_elems, ["doc_id", "elem_pos"])
        .join(idx_to_id, ["member_type", "member_idx"], "left")
        .join(
            unresolved.filter(F.col("kind") == "member").select("doc_id", "order", "raw_id"),
            ["doc_id", "order"],
            "left",
        )
        .select(
            "doc_id",
            "order",
            F.lit("member").alias("kind"),
            F.concat_ws(":", "member_type", F.coalesce(F.col("m_id"), F.col("raw_id")).cast("string"), "role").alias(
                "text"
            ),
            F.lit("").alias("media_ref"),
        )
    )
    med = layout.filter(F.col("kind") == "media").join(
        media.select("doc_id", "order", "media_ref"), ["doc_id", "order"]
    ).select("doc_id", "order", "kind", F.lit("").alias("text"), "media_ref")

    return header.unionByName(coord).unionByName(tag).unionByName(ref).unionByName(member).unionByName(med)

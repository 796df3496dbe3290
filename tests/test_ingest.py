"""Golden ingest tests: engine tables vs the pure-pandas model oracle
(FIXTURES.md §3), incl. the reference invariants — consecutive index
assignment, dedup first-seen order, string-intern offsets, left-join NULL
for unresolved refs, and the per-doc span-sequence roundtrip."""

from pyspark.sql import functions as F

from osmflat_rs_spark.ingest import parse_spans, reconstruct_spans
from tests.util import assert_frames_equal


def test_nodes_golden(tables, model):
    assert_frames_equal(tables["nodes"], model["nodes"], ["node_idx", "osm_id", "lat", "lon", "tags"])


def test_ways_golden(tables, model):
    assert_frames_equal(tables["ways"], model["ways"], ["way_idx", "osm_id", "tags", "refs"])


def test_relations_golden(tables, model):
    assert_frames_equal(
        tables["relations"], model["relations"], ["relation_idx", "osm_id", "tags", "members"]
    )


def test_tags_dim_first_seen_order(tables, model):
    assert_frames_equal(tables["tags_dim"], model["tags_dim"], ["tag_idx", "key", "value"])


def test_strings_dim_offsets(tables, model):
    # the "hello"→0, "world"→6, "!"→12 arithmetic (strings.rs:134-145)
    assert_frames_equal(tables["strings_dim"], model["strings_dim"], ["offset", "s"])


def test_metrics(tables, model):
    cols = [
        "stage",
        "num_nodes",
        "num_ways",
        "num_relations",
        "num_unresolved_node_ids",
        "num_unresolved_way_ids",
        "num_unresolved_rel_ids",
    ]
    assert_frames_equal(tables["metrics"], model["metrics"], cols)


def test_span_roundtrip(tables, model, docs_df):
    """THE per-row invariant: (kind, text, media_ref, order) per doc,
    rebuilt from the columnar tables, equals the input exactly."""
    rebuilt = reconstruct_spans(tables)
    cols = ["doc_id", "order", "kind", "text", "media_ref"]
    assert_frames_equal(rebuilt, model["spans_flat"], cols)
    # and the parsed span view equals the input too
    assert_frames_equal(parse_spans(docs_df).select(*cols), model["spans_flat"], cols)


def test_consecutive_indices(tables):
    """main.rs:192-193 invariant: indices are 0..n-1 consecutive in id order."""
    for tbl, idx, n in (("nodes", "node_idx", None), ("ways", "way_idx", None), ("relations", "relation_idx", None)):
        df = tables[tbl]
        total = df.count()
        stats = df.agg(
            F.min(idx).alias("mn"), F.max(idx).alias("mx"), F.countDistinct(idx).alias("d")
        ).collect()[0]
        assert stats["mn"] == 0 and stats["mx"] == total - 1 and stats["d"] == total
        # idx order == osm_id order
        bad = df.filter(F.col(idx).isNotNull()).select(idx, "osm_id").orderBy(idx).collect()
        ids = [r["osm_id"] for r in bad]
        assert ids == sorted(ids)


def test_duplicate_offset_ties_follow_input_order(spark):
    """ADVICE r01: duplicate span offsets are legal (the engine does not
    assume offset-sorted OR offset-unique input); ties must break by the
    ORIGINAL array position — the same stable order the pandas oracle
    uses — in both parse_spans and the assembled tables."""
    from osmflat_rs_spark.ingest import parse_spans

    rows = [
        (
            "nX",
            [
                ("header", "node 7", "", 0),
                ("tag", "b=2", "", 5),  # same offset, later position
                ("coord", "1,2", "", 1),
                ("tag", "a=1", "", 5),  # wait — a=1 comes AFTER b=2 here
            ],
        )
    ]
    docs = spark.createDataFrame(
        rows, schema="doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    got = [(r["order"], r["kind"], r["text"]) for r in parse_spans(docs).orderBy("order").collect()]
    # offsets: header(0) < coord(1) < [b=2, a=1] both at 5 in input order
    assert got == [
        (0, "header", "node 7"),
        (1, "coord", "1,2"),
        (2, "tag", "b=2"),
        (3, "tag", "a=1"),
    ]

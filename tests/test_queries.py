"""Golden query tests: engine DataFrame plans vs the pandas model oracle
(the reference examples as an acceptance suite, SURVEY §5)."""

import math

from osmflat_rs_spark import queries as q
from osmflat_rs_spark import oracle
from tests.util import assert_frames_equal


def test_counts(tables, model):
    assert_frames_equal(q.counts(tables), oracle.q_counts(model), ["entity_type", "n"])


def test_cities(tables, model):
    assert_frames_equal(q.cities(tables), oracle.q_cities(model), ["name", "population"])


def test_pub_names(tables, model):
    assert_frames_equal(
        q.pub_names(tables), oracle.q_pub_names(model), ["source", "osm_id", "name", "addr_tags"]
    )


def test_road_length(tables, model):
    got = q.road_length(tables).collect()[0]["total_m"]
    want = oracle.q_road_length(model)
    assert want > 0
    assert math.isclose(got, want, rel_tol=1e-9), (got, want)


def test_bbox(tables, model):
    assert_frames_equal(q.bbox(tables), oracle.q_bbox(model), ["min_lat", "max_lat", "min_lon", "max_lon"])


def test_classify(tables, model):
    assert_frames_equal(
        q.classify(tables), oracle.q_classify(model), ["source", "feature_idx", "category", "width"]
    )

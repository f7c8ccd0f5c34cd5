"""MinHash-LSH linking + connected components."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocds_entity_extract_spark.operators.cc import (
    canonical_mapping,
    connected_components,
)
from ocds_entity_extract_spark.operators.linking import (
    candidate_pairs,
    verified_edges,
    with_minhash_bands,
    with_shingles,
)


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "entity_id string")


def test_shingles(spark):
    df = with_shingles(_ids(spark, ["abcd"]))
    assert df.collect()[0]["shingles"] == ["abc", "bcd"]


def test_minhash_deterministic(spark):
    df1 = with_minhash_bands(with_shingles(_ids(spark, ["grupo-aurora"])))
    df2 = with_minhash_bands(with_shingles(_ids(spark, ["grupo-aurora"])))
    assert df1.collect()[0]["bands"] == df2.collect()[0]["bands"]


def test_alias_pairs_found_and_verified(spark):
    ids = [
        "grupo-aurora-delta-s-a-de-c-v",
        "grupo-aurora-delta",                 # suffix-drop alias
        "grupo-aurora-delta-sa-de-cv",       # suffix-abbrev alias
        "juan-perez-garcia",
        "juan-perez",                        # middle-drop alias
        "secretaria-de-salud-de-jalisco",
        "secretaria-de-salud",               # place-drop alias
        "secretaria-de-cultura",             # different institution — no edge
        "constructora-omega-s-c",            # unrelated
    ]
    edges = {
        (r["src"], r["dst"]) for r in verified_edges(_ids(spark, ids)).collect()
    }
    assert ("grupo-aurora-delta", "grupo-aurora-delta-s-a-de-c-v") in edges
    assert ("grupo-aurora-delta-s-a-de-c-v", "grupo-aurora-delta-sa-de-cv") in edges or (
        "grupo-aurora-delta-sa-de-cv",
        "grupo-aurora-delta-s-a-de-c-v",
    ) in edges
    assert ("juan-perez", "juan-perez-garcia") in edges
    assert ("secretaria-de-salud", "secretaria-de-salud-de-jalisco") in edges
    for s, d in edges:
        assert "secretaria-de-cultura" not in (s, d)
        assert "constructora-omega-s-c" not in (s, d)


def test_bucket_cap_guards_hot_buckets(spark):
    # 100 identical-prefix ids -> prefix bucket larger than cap -> dropped
    ids = [f"same-prefix-aaaa-{i:03d}" for i in range(100)]
    pairs = candidate_pairs(_ids(spark, ids), max_bucket=10)
    # capped: no quadratic blowup (uncapped would be ~4950 prefix pairs)
    assert pairs.count() < 4000


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("e", "d"), ("x", "y")],
        "src string, dst string",
    )
    cc = {
        r["entity_id"]: r["canonical_id"] for r in connected_components(edges).collect()
    }
    assert cc["a"] == "a" and cc["b"] == "a" and cc["c"] == "a"
    assert cc["d"] == "d" and cc["e"] == "d"
    assert cc["x"] == "x" and cc["y"] == "x"


def test_connected_components_chain_and_star(spark):
    # long chain exercises multi-round convergence
    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(15)]
    edges = spark.createDataFrame(chain, "src string, dst string")
    cc = {
        r["entity_id"]: r["canonical_id"] for r in connected_components(edges).collect()
    }
    assert set(cc.values()) == {"n00"}
    assert len(cc) == 16


def test_cc_driver_vs_distributed_parity(spark):
    """Size-adaptive fast path (union-find) must equal the distributed
    star-loop on the same graph."""
    import random

    rng = random.Random(7)
    edges_py = {(f"n{rng.randint(0, 60):02d}", f"n{rng.randint(0, 60):02d}") for _ in range(80)}
    edges_py = [(a, b) for a, b in edges_py if a != b]
    edges = spark.createDataFrame(edges_py, "src string, dst string")
    fast = {
        (r["entity_id"], r["canonical_id"])
        for r in connected_components(edges).collect()
    }
    dist = {
        (r["entity_id"], r["canonical_id"])
        for r in connected_components(edges, small_graph_threshold=0).collect()
    }
    assert fast == dist


def test_canonical_mapping_includes_singletons(spark):
    all_ids = _ids(spark, ["a", "b", "zz-singleton"])
    edges = spark.createDataFrame([("b", "a")], "src string, dst string")
    m = {r["entity_id"]: r["canonical_id"] for r in canonical_mapping(all_ids, edges).collect()}
    assert m == {"a": "a", "b": "a", "zz-singleton": "zz-singleton"}

"""Connected-components dedup clustering (operators/dedup.py).

The min-label propagation must converge beyond one round: a chain
a-b-c-d needs ~diameter rounds for the min label to reach the far end.
"""

from pyspark.sql import functions as F

from impresso_ta.operators import dedup


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_chain_converges_to_single_component(spark):
    # 0-1-2-3-4-5 chain: diameter 5, forces several propagation rounds.
    pairs = _pairs(spark, [(i, i + 1) for i in range(5)])
    comp = dedup.connected_components(pairs).collect()
    assert {r["node"] for r in comp} == set(range(6))
    assert {r["label"] for r in comp} == {0}


def test_two_components_and_representatives(spark):
    pairs = _pairs(spark, [(10, 11), (11, 12), (20, 21)])
    out = {r["doc_id"]: r for r in dedup.dedup_clusters(pairs).collect()}
    assert out[10]["component"] == 10 and out[12]["component"] == 10
    assert out[20]["component"] == 20 and out[21]["component"] == 20
    assert out[10]["cluster_size"] == 3 and out[21]["cluster_size"] == 2
    assert out[10]["is_rep"] and out[20]["is_rep"]
    assert not out[11]["is_rep"] and not out[21]["is_rep"]


def test_edge_direction_irrelevant(spark):
    # Reversed edges give identical components (symmetrization).
    fwd = dedup.connected_components(_pairs(spark, [(1, 2), (3, 2)]))
    rev = dedup.connected_components(_pairs(spark, [(2, 1), (2, 3)]))
    assert sorted(map(tuple, fwd.collect())) == sorted(map(tuple, rev.collect()))


def test_dedup_survivors_keeps_reps_and_singletons(spark):
    from impresso_ta.operators.dedup import dedup_survivors

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    # clusters {1,2,3} and {5,6}; 4 and 7 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r["doc_id"] for r in dedup_survivors(docs, pairs).collect()
    )
    assert kept == [1, 4, 5, 7]

"""Connected components vs a local union-find oracle."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from spatial4n_spark.operators.components import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node of component
    comp = {}
    for v in range(n_nodes):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


@pytest.mark.parametrize("seed,n,m", [(7, 60, 40), (11, 200, 150),
                                      (13, 50, 400)])
def test_cc_matches_union_find(spark, seed, n, m):
    rng = np.random.default_rng(seed)
    edges = [(int(a), int(b)) for a, b in
             zip(rng.integers(0, n, m), rng.integers(0, n, m)) if a != b]
    want = _union_find(n, edges)
    edf = spark.createDataFrame(edges, ["src", "dst"])
    vdf = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    got = {r.node: r.label for r in
           connected_components(edf, vertices=vdf).collect()}
    assert got == want


def test_cc_long_chain_converges(spark):
    """A 20-node path — worst-case diameter for label propagation; the
    max_iter bound must still reach the fixpoint."""
    edges = [(i, i + 1) for i in range(19)]
    edf = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.label for r in
           connected_components(edf, max_iter=50).collect()}
    assert got == {i: 0 for i in range(20)}


def test_cc_string_ids_and_singletons(spark):
    edf = spark.createDataFrame([("d3", "d1"), ("d2", "d3")],
                                ["src", "dst"])
    vdf = spark.createDataFrame([("d1",), ("d2",), ("d3",), ("d9",)],
                                ["doc_id"])
    got = {r.node: r.label for r in
           connected_components(edf, vertices=vdf).collect()}
    assert got == {"d1": "d1", "d2": "d1", "d3": "d1", "d9": "d9"}


def test_cc_strict_raises_on_nonconvergence(spark):
    edges = [(i, i + 1) for i in range(19)]
    edf = spark.createDataFrame(edges, ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edf, max_iter=3)


def test_parquet_stage_equals_in_memory(spark, tmp_path):
    """stage_dir (100 TB spill-safe path): parquet-staged rounds must
    produce exactly the in-memory localCheckpoint labels."""
    from spatial4n_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20), (11, 12), (3, 4)],
        ["src", "dst"])
    verts = spark.createDataFrame([(1,), (2,), (3,), (4,), (10,), (11,),
                                   (12,), (20,), (99,)], ["node"])
    mem = {(r["node"], r["label"])
           for r in connected_components(edges, vertices=verts).collect()}
    pq = {(r["node"], r["label"])
          for r in connected_components(
              edges, vertices=verts,
              stage_dir=str(tmp_path / "cc_stage")).collect()}
    assert mem == pq
    assert (99, 99) in pq  # isolated vertex labels itself

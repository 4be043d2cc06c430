"""Connected components over near-dup pair lists (the cluster-collapse step
after MinHash/SimHash/Jaccard pair generation).

Reference parity: the reference collapses duplicates per-KEY via LWW
(PostgresRepository.java's latest-wins upsert); cross-document near-dup
collapse is the training-data analog and needs transitive closure, which the
pair queries alone don't give.
"""

from __future__ import annotations

import random

from aqueduct_core_spark.functions.dedup import connected_components, dedup_assignments


def _cc(spark, pair_list, node_ids):
    pairs = spark.createDataFrame(pair_list or [(0, 0)], "id_a long, id_b long")
    if not pair_list:
        pairs = pairs.filter("id_a < 0")
    nodes = spark.createDataFrame([(int(n),) for n in node_ids], "doc_id long")
    out = connected_components(pairs, nodes)
    return {r["doc_id"]: r["rep_id"] for r in out.collect()}


def _union_find(pair_list, node_ids):
    parent = {int(n): int(n) for n in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_list:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize to the component MIN (find() roots are already min-biased
    # by the union rule above, but normalize explicitly)
    comp = {}
    for n in parent:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_chain_and_islands(spark):
    # chain 1-2-3-4 collapses to 1; pair (10,11) to 10; 99 is a singleton
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)], [1, 2, 3, 4, 10, 11, 99])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_long_path_needs_iterations(spark):
    # a 33-node path is the worst case for one propagation round; pointer
    # jumping must still converge well inside max_iter
    n = 33
    pair_list = [(i, i + 1) for i in range(n - 1)]
    got = _cc(spark, pair_list, range(n))
    assert set(got.values()) == {0}


def test_no_pairs_all_singletons(spark):
    got = _cc(spark, [], [5, 6, 7])
    assert got == {5: 5, 6: 6, 7: 7}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(1234)
    nodes = list(range(200))
    pair_list = [tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)]
    got = _cc(spark, pair_list, nodes)
    want = _union_find(pair_list, nodes)
    assert got == want


def test_dedup_assignments_keep_and_size(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dedup_assignments(docs, pairs).collect()}
    assert [rows[i]["rep_id"] for i in range(6)] == [0, 0, 0, 3, 4, 4]
    assert [rows[i]["cluster_size"] for i in range(6)] == [3, 3, 3, 1, 2, 2]
    assert [rows[i]["keep"] for i in range(6)] == [True, False, False, True, True, False]

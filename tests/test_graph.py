"""Graph operators (operators/graph.py): triangle census and
fixed-point PageRank pinned against independent driver-side
computations on hand-built graphs, plus oracle parity at sf0.001."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F


def _edges_df(spark, pairs):
    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    return spark.createDataFrame(canon, "u long, v long")


def _ref_triangles(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = sorted({x for e in es for x in e})
    tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (a, c) in es and (b, c) in es
    )
    deg = {n: 0 for n in nodes}
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    return len(nodes), len(es), wedges, tri


def _ref_pagerank(pairs, iters, scale=1_000_000, num=85, den=100):
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj: dict[int, list[int]] = {}
    for a, b in es:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    base = (scale * den - num * scale) // den
    score = {n: scale for n in adj}
    for _ in range(iters):
        incoming = {n: 0 for n in adj}
        for u, nbrs in adj.items():
            c = score[u] // len(nbrs)
            for v in nbrs:
                incoming[v] += c
        score = {n: base + (num * incoming[n]) // den for n in adj}
    return score


def test_triangle_census_on_known_graphs(spark):
    from big_data_traffict_prediction_spark.operators.graph import triangle_census

    cases = [
        # K4: 4 triangles, plus a pendant and a disjoint edge
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (9, 10)],
        # triangle + square (0 triangles in the square)
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (13, 10)],
        # star: no triangles, many wedges
        [(0, k) for k in range(1, 9)],
    ]
    for pairs in cases:
        row = triangle_census(_edges_df(spark, pairs)).collect()[0]
        n, m, wed, tri = _ref_triangles(pairs)
        assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
            n, m, wed, tri,
        ), pairs
        exp_ppm = 3 * tri * 1_000_000 // max(wed, 1)
        assert row.clustering_ppm == exp_ppm


def test_triangle_census_matches_bruteforce_on_random_graph(spark):
    import random

    from big_data_traffict_prediction_spark.operators.graph import triangle_census

    rng = random.Random(7)
    pairs = {tuple(sorted(rng.sample(range(40), 2))) for _ in range(220)}
    row = triangle_census(_edges_df(spark, pairs)).collect()[0]
    n, m, wed, tri = _ref_triangles(pairs)
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
        n, m, wed, tri,
    )


def test_pagerank_matches_reference_exactly(spark):
    """The distributed fixed-point iteration equals an independent
    Python reference bit-for-bit (same floor divisions) — including on
    a hub graph where the hub must dominate."""
    import random

    from big_data_traffict_prediction_spark.operators.graph import (
        PAGERANK_ITERS,
        pagerank,
    )

    rng = random.Random(11)
    hub = [(0, k) for k in range(1, 15)]
    ring = [(100 + i, 100 + (i + 1) % 6) for i in range(6)]
    rand = [tuple(sorted(rng.sample(range(200, 230), 2))) for _ in range(60)]
    pairs = hub + ring + [p for p in rand if p[0] != p[1]]

    got = {
        r.node: r.score
        for r in pagerank(_edges_df(spark, pairs), PAGERANK_ITERS).collect()
    }
    exp = _ref_pagerank(pairs, PAGERANK_ITERS)
    assert got == exp
    # the hub out-scores every leaf
    assert got[0] > max(got[k] for k in range(1, 15))


def test_pagerank_deep_iteration_checkpoints_and_conserves_mass(spark):
    """iters=20 (2 checkpoint truncations at PR_CHECKPOINT_EVERY=10):
    still bit-equal to the Python reference, and total score mass stays
    within the floor-division loss envelope of N·PR_SCALE — each round
    re-injects exact N·base then loses < d_u units at each node's
    score//d plus < 1 unit per damping floor, a steady-state deficit
    bounded by (num/(den-num))·(2·|E| + N)."""
    import random

    from big_data_traffict_prediction_spark.operators.graph import (
        PR_CHECKPOINT_EVERY,
        PR_SCALE,
        pagerank,
    )

    rng = random.Random(23)
    pairs = [tuple(sorted(rng.sample(range(60), 2))) for _ in range(150)]
    pairs = [p for p in pairs if p[0] != p[1]]
    iters = 2 * PR_CHECKPOINT_EVERY
    got = {r.node: r.score for r in pagerank(_edges_df(spark, pairs), iters).collect()}
    exp = _ref_pagerank(pairs, iters)
    assert got == exp, "checkpoint cadence must not change any score"
    n = len(exp)
    m = len({(min(a, b), max(a, b)) for a, b in pairs})
    total, exact = sum(got.values()), n * PR_SCALE
    max_deficit = (85 * (2 * m + n)) // 15 + 1
    assert exact - max_deficit <= total <= exact, (total, exact, max_deficit)
    assert all(s > 0 for s in got.values())


def _ref_kcore(pairs, k):
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        doomed = [n for n, s in adj.items() if len(s) < k]
        if not doomed:
            return {n: len(s) for n, s in adj.items()}
        for n in doomed:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]


def test_kcore_matches_reference_on_random_and_cascading_graphs(spark):
    """The distributed peel equals full-convergence Python peeling —
    including a graph built to CASCADE (removing the fringe drops core
    members below k in later rounds) so multi-round correctness is
    actually exercised, and the over-cap case raises instead of
    returning a partially peeled graph."""
    import random

    import pytest

    from big_data_traffict_prediction_spark.operators.graph import kcore_edges

    rng = random.Random(7)
    rand = [tuple(sorted(rng.sample(range(40), 2))) for _ in range(120)]
    # K4 core + a chain of pendants hanging off it: peeling the chain
    # takes one round per link (cascade), 5 rounds for k=2
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    chain = [(3, 100), (100, 101), (101, 102), (102, 103), (103, 104)]
    for pairs, k in [(rand, 5), (k4 + chain, 2), (k4 + chain, 3)]:
        pairs = [p for p in pairs if p[0] != p[1]]
        core = kcore_edges(_edges_df(spark, pairs), k)
        got: dict[int, int] = {}
        for r in core.collect():
            got[r.u] = got.get(r.u, 0) + 1
            got[r.v] = got.get(r.v, 0) + 1
        assert got == _ref_kcore(pairs, k), (k, len(pairs))
    # a 2-core peel of a 50-link path needs 25 rounds > the 20 cap
    path = [(i, i + 1) for i in range(50)]
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore_edges(_edges_df(spark, path), 2)


def test_graph_queries_match_oracle_at_smoke_sf(spark, sf_dir):
    """End-to-end oracle parity at the smoke SF (the driver re-checks
    at sf0.01)."""
    import duckdb

    from big_data_traffict_prediction_spark.operators.graph import (
        q_graph_triangles,
        q_pagerank_parts,
    )
    from big_data_traffict_prediction_spark.registry import all_oracles

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    oracles = all_oracles()
    from big_data_traffict_prediction_spark.operators.graph import q_kcore_parts

    for name, fn in [
        ("q_graph_triangles", q_graph_triangles),
        ("q_pagerank_parts", q_pagerank_parts),
        ("q_kcore_parts", q_kcore_parts),
    ]:
        sp = {
            tuple(sorted(r.asDict().items())) for r in fn(spark, sf_dir).collect()
        }
        du_cols = [d[0] for d in con.execute(oracles[name]).description]
        du = {
            tuple(sorted(zip(du_cols, row)))
            for row in con.execute(oracles[name]).fetchall()
        }
        assert sp == du, name


def test_lpa_communities_partition_nodes(spark, sf_dir):
    """LPA labels must PARTITION the node set: every node gets exactly
    one final label, and community sizes sum to n_nodes (checked on
    the full community frame, not the top-20 projection)."""
    from pyspark.sql import functions as F

    from big_data_traffict_prediction_spark.operators.graph import (
        LPA_ITERS,
        _sym,
        copurchase_edges,
        lpa_labels,
    )

    edges = copurchase_edges(spark, sf_dir)
    sym = _sym(edges)
    n_nodes = sym.select("u").distinct().count()
    lab = lpa_labels(edges, LPA_ITERS)
    assert lab.count() == n_nodes  # one label per node, none dropped
    assert lab.select("node").distinct().count() == n_nodes
    # every final label is itself a node id (labels only propagate)
    assert (
        lab.join(
            sym.select(F.col("u").alias("lab")).distinct(), "lab", "left_anti"
        ).count()
        == 0
    )


def _ref_lpa(pairs, iters):
    """Pure-Python synchronous LPA: most-frequent neighbor label,
    ties to the smallest — the deterministic variant lpa_labels
    implements."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    lab = {n: n for n in adj}
    for _ in range(iters):
        nxt = {}
        for n in adj:
            c = Counter(lab[m] for m in adj[n])
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        lab = nxt
    return lab


def test_lpa_matches_python_reference_on_hand_graphs(spark):
    """Two 4-cliques joined by one bridge edge must resolve to two
    communities (labelled by each clique's min id); also check a ring
    and a star — shapes with ties, hubs, and symmetry."""
    from big_data_traffict_prediction_spark.operators.graph import (
        LPA_ITERS,
        lpa_labels,
    )

    def clique(nodes):
        return [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1 :]]

    graphs = [
        clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)],
        [(i, (i + 1) % 8) if i + 1 < 8 else (0, 7) for i in range(8)],  # ring
        [(0, i) for i in range(1, 9)],  # star
    ]
    for pairs in graphs:
        pairs = sorted({(min(a, b), max(a, b)) for a, b in pairs})
        got = {
            r.node: r.lab
            for r in lpa_labels(_edges_df(spark, pairs), LPA_ITERS).collect()
        }
        assert got == _ref_lpa(pairs, LPA_ITERS), pairs

"""Property-based tests (hypothesis) for the graph iteration cores
(VERDICT r9 item 6): random small symmetric graphs, asserted against
brute-force Python BFS / k-core peeling / Adamic-Adar scoring.

The cores under test are the factored-out frame functions
(`bfs_hops_frame`, `kcore_peel`, `adamic_adar_scored` in
operators/graphops.py) — the exact iteration bodies the registered
fixture queries run, driven here with adversarial topologies the
trade backbone never produces (disconnected components, isolated
nodes, stars, near-cliques).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transit_data_pipeline_spark.operators.graphops import (
    adamic_adar_scored,
    bfs_hops_frame,
    kcore_peel,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: Random undirected simple graph on nodes 0..n-1: n in 2..8, any
#: edge subset (drawn as ordered pairs, canonicalized u<v, no loops).
_GRAPHS = st.integers(min_value=2, max_value=8).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.sets(
            st.tuples(
                st.integers(0, n - 1), st.integers(0, n - 1)
            ).map(lambda p: (min(p), max(p))),
            max_size=n * (n - 1) // 2 + n,
        ).map(lambda es: frozenset((u, v) for u, v in es if u != v)),
    )
)


def _frames(spark, n, und_edges):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node int")
    sym = sorted(
        {(u, v) for u, v in und_edges} | {(v, u) for u, v in und_edges}
    )
    if sym:
        edges = spark.createDataFrame(sym, "src int, dst int")
    else:
        edges = spark.createDataFrame([], "src int, dst int")
    return nodes, edges


def _adj(n, und_edges):
    adj = {i: set() for i in range(n)}
    for u, v in und_edges:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def _bfs_py(adj, source, max_hops):
    dist = {source: 0}
    frontier = [source]
    for h in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    return dist


def _kcore_py(adj, k):
    alive = {u for u in adj if len(adj[u]) >= k}
    while True:
        drop = {u for u in alive if len(adj[u] & alive) < k}
        if not drop:
            return alive
        alive -= drop


@settings(**_SETTINGS)
@given(_GRAPHS, st.integers(min_value=1, max_value=9))
def test_bfs_matches_bruteforce(spark, graph, max_hops):
    """Bounded BFS from node 0 equals brute-force level traversal:
    exact hop counts within the budget, NULL beyond/unreachable —
    including disconnected graphs and budgets below the diameter."""
    n, und = graph
    nodes, edges = _frames(spark, n, und)
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops_frame(nodes, edges, 0, max_hops).collect()
    }
    want = _bfs_py(_adj(n, und), 0, max_hops)
    assert set(got) == set(range(n))
    for i in range(n):
        assert got[i] == want.get(i), (
            f"node {i}: got {got[i]} want {want.get(i)} "
            f"(edges={sorted(und)}, budget={max_hops})"
        )


@settings(**_SETTINGS)
@given(_GRAPHS, st.integers(min_value=1, max_value=4))
def test_kcore_fixpoint_matches_bruteforce(spark, graph, k):
    """Degree peeling with rounds=|nodes| reaches the exact k-core
    fixpoint: survivor set equals the brute-force peel, in-core
    degrees equal induced-subgraph degrees, and the fixpoint is
    stable (every survivor keeps >= k in-core neighbors)."""
    n, und = graph
    nodes, edges = _frames(spark, n, und)
    adj = _adj(n, und)
    deg0, alive, deg = kcore_peel(nodes, edges, k=k, rounds=n)
    got_deg0 = {r["node"]: r["deg"] for r in deg0.collect()}
    assert got_deg0 == {i: len(adj[i]) for i in range(n)}
    got_core = {r["node"] for r in alive.collect()}
    want_core = _kcore_py(adj, k)
    assert got_core == want_core, (
        f"core mismatch: got {sorted(got_core)} want {sorted(want_core)} "
        f"(edges={sorted(und)}, k={k})"
    )
    got_deg = {r["node"]: r["deg"] for r in deg.collect()}
    for u in want_core:
        ind = len(adj[u] & want_core)
        assert got_deg[u] == ind and ind >= k


@settings(**_SETTINGS)
@given(_GRAPHS)
def test_adamic_adar_matches_bruteforce(spark, graph):
    """AA scoring over a random graph equals the brute-force
    common-neighbor sum Σ 1/log(deg z) for every non-adjacent pair
    (common neighbors always have degree >= 2, so the weight table
    covers them); adjacent pairs never appear."""
    n, und = graph
    nodes, edges = _frames(spark, n, und)
    adj = _adj(n, und)
    want = {}
    for u in range(n):
        for v in range(u + 1, n):
            if v in adj[u]:
                continue
            common = adj[u] & adj[v]
            if common:
                want[(u, v)] = (
                    len(common),
                    sum(1.0 / math.log(len(adj[z])) for z in common),
                )
    got = {
        (r["u"], r["v"]): (r["n_common"], r["aa_score"])
        for r in adamic_adar_scored(spark, edges).collect()
    }
    assert set(got) == set(want), (
        f"pair set: got {sorted(got)} want {sorted(want)} "
        f"(edges={sorted(und)})"
    )
    for p, (nc, score) in want.items():
        assert got[p][0] == nc
        assert abs(got[p][1] - score) < 1e-9, (
            f"pair {p}: got {got[p][1]} want {score}"
        )

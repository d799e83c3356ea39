"""Iterative graph algorithms over the nation trade graph: bounded
single-source BFS (frontier relaxation) and k-core decomposition
(degree peeling).

These complete the graph-audit family (`nation_trade_pagerank`,
`hits_trade_graph`, `dedup_graph_triangles`, `dedup_components`) with
the two classic distance/density primitives. Both run on a SPARSE
"trade backbone": the weighted nation→nation edge list is thinned to
each source's top-k partners (row_number per src — deterministic
tiebreak on dst) and symmetrized, so hop distances and core membership
are non-trivial (the full trade graph is near-complete and both
answers would be degenerate).

Scale notes: the one corpus-scale pass is the weighted-edge build
(lineitem ⋈ orders ⋈ customer ⋈ supplier → groupBy(src,dst)) — the
same map-side-combinable aggregate PageRank pays. Everything after
runs on the |nations|²-bounded edge list, localCheckpoint-ed so the
fact-table lineage executes once, not once per iteration. The BFS
iteration is the standard Pregel frontier shape (join frontier→edges
keyed on src, min-aggregate on dst); the peel iteration is one
degree aggregate + one semi-join per round. At web scale both remain
join+aggregate per round with no driver-side data movement — the
driver holds only loop counters (fixed bounds, so the plan is static
and the DuckDB twin can unroll the same rounds).

Reference parity: the reference ships no graph operators; these are
north-star extensions in the spirit of its network-style analyses
(`sql/analysis_queries.sql` route-cascade chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from .registry import register

#: Bounded-BFS hop budget: distances beyond this are reported NULL on
#: BOTH sides (the oracle's recursive walk carries the same bound, so
#: the contract is "shortest distance within _BFS_HOPS hops").
_BFS_HOPS = 8
#: Out-degree kept per source nation in the thinned backbone.
_BFS_TOPK = 2
_CORE_TOPK = 3
#: k-core threshold and fixed peel rounds (25 nodes stabilize in ≤3
#: rounds; 6 is slack — the oracle unrolls the same 6).
_CORE_K = 3
_CORE_ROUNDS = 6


def _backbone_sql(k: int) -> str:
    """Shared oracle CTEs: weighted pairs → top-k per src → symmetric.

    MATERIALIZED throughout: DuckDB inlines plain CTEs, so an
    iterative consumer (k-core's 2-per-round references to `edges`)
    would re-run the 4-way fact join dozens of times — at ×8 that ran
    the oracle into the 48 GB cap. The backbone is ≤ 25·k rows;
    computing it once is the point. (DuckDB accepts the hint inside
    WITH RECURSIVE blocks too — the BFS oracle shares these CTEs.)"""
    return f"""
pairs AS MATERIALIZED (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
),
topk AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
      ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk
    FROM pairs
  ) WHERE rk <= {k}
),
edges AS MATERIALIZED (
  SELECT src, dst FROM topk
  UNION
  SELECT dst AS src, src AS dst FROM topk
)"""


def _backbone_edges(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Symmetric top-k trade backbone, materialized (localCheckpoint)
    so the fact-scale lineage runs once across all iterations."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pairs = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wrk = Window.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst"))
    topk = (
        pairs.select("src", "dst", F.row_number().over(wrk).alias("rk"))
        .filter(F.col("rk") <= k)
        .select("src", "dst")
    )
    return (
        # One-pass symmetrization (explode of both orientations): the
        # union-of-swapped spelling re-executed the fact-scale
        # aggregate + window once per branch when the checkpoint
        # materialized — two corpus passes for one 25-row frame (r10).
        topk.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint()
    )


def bfs_hops_frame(
    nodes: DataFrame, edges: DataFrame, source: int, max_hops: int
) -> DataFrame:
    """Bounded single-source BFS by frontier relaxation over an
    ARBITRARY symmetric edge list — the iteration core of
    ``bfs_shortest_hops``, factored out so property tests can drive
    it with hypothesis-generated graphs (VERDICT r9 item 6).

    `nodes`: one int column ``node`` (every vertex, reachable or
    not); `edges`: ``src``/``dst``. Returns (node, hops) with hops
    NULL when the node is unreachable within `max_hops`."""
    dist = nodes.select(
        "node",
        F.when(F.col("node") == source, F.lit(0)).alias("hops"),
    )
    for it in range(max_hops):
        cand = (
            dist.filter(F.col("hops").isNotNull())
            .join(F.broadcast(edges), dist["node"] == edges["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg((F.min("hops") + 1).alias("via"))
        )
        dist = (
            dist.join(F.broadcast(cand), "node", "left")
            .select(
                "node",
                # Explicit null-aware min — Spark's least() skips
                # NULLs but engines disagree on that contract, so the
                # CASE spells it out identically on both sides.
                F.when(F.col("hops").isNull(), F.col("via"))
                .when(F.col("via").isNull(), F.col("hops"))
                .when(F.col("via") < F.col("hops"), F.col("via"))
                .otherwise(F.col("hops"))
                .alias("hops"),
            )
        )
        # small frame; cutting lineage every OTHER round (and on the
        # final round) keeps analysis/planning cost bounded — one
        # plan doubling between cuts — while halving the
        # materialization jobs (was per-round: measured 8.7 s with no
        # cut at all, a chained-plan tax, not data; r10 halves the
        # job count on top).
        if it % 2 == 1 or it == max_hops - 1:
            dist = dist.localCheckpoint()
    return dist


def kcore_peel(
    nodes: DataFrame, edges: DataFrame, k: int, rounds: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Degree peeling over an ARBITRARY symmetric edge list — the
    iteration core of ``kcore_trade_graph``, factored out for
    property tests (VERDICT r9 item 6).

    Returns (deg0, alive, deg): initial degrees, the survivor set
    after `rounds` peels, and the last round's survivor-restricted
    degrees. With rounds >= |nodes| the survivor set is the exact
    k-core fixpoint (each non-final round removes >= 1 node)."""
    deg0 = (
        nodes.join(F.broadcast(edges), nodes["node"] == edges["src"], "left")
        .groupBy("node")
        .agg(F.count(edges["dst"]).alias("deg"))
    )
    alive = deg0.filter(F.col("deg") >= k).select("node")
    deg = deg0
    for r in range(rounds):
        # Fresh column names per round: `alive` feeds the round twice
        # (as survivors and as the neighbor filter), so renamed
        # projections keep the self-join unambiguous.
        e = edges.select(
            F.col("src").alias("e_src"), F.col("dst").alias("e_dst")
        )
        nbr = alive.select(F.col("node").alias("nbr"))
        deg = (
            alive.join(F.broadcast(e), alive["node"] == F.col("e_src"), "left")
            .join(F.broadcast(nbr), F.col("e_dst") == F.col("nbr"), "left")
            .groupBy("node")
            .agg(F.count("nbr").alias("deg"))
        )
        # small frame; lineage cut every other round (see bfs note).
        if r % 2 == 1 or r == rounds - 1:
            deg = deg.localCheckpoint()
        alive = deg.filter(F.col("deg") >= k).select("node")
    return deg0, alive, deg


def _bfs_oracle() -> str:
    return f"""
WITH RECURSIVE {_backbone_sql(_BFS_TOPK)},
walk AS (
  SELECT CAST(0 AS INT) AS node, 0 AS hops
  UNION
  SELECT CAST(e.dst AS INT) AS node, w.hops + 1
  FROM walk w JOIN edges e ON w.node = e.src
  WHERE w.hops < {_BFS_HOPS}
),
dist AS (SELECT node, MIN(hops) AS hops FROM walk GROUP BY 1)
SELECT n.n_nationkey AS nationkey, n.n_name,
  CAST(d.hops AS BIGINT) AS hops,
  d.hops IS NOT NULL AS reachable
FROM nation n LEFT JOIN dist d ON n.n_nationkey = d.node
"""


@register(
    "bfs_shortest_hops",
    ops=("J4", "A3", "A11", "W4"),
    doc="Bounded single-source BFS over the thinned (top-2-partner) "
    "trade backbone: shortest hop count from nation 0 to every "
    "nation, computed by frontier relaxation — each of the "
    f"{_BFS_HOPS} rounds is dist ⋈ edges (keyed on src) → "
    "min-aggregate on dst → merge with the running distances, the "
    "standard Pregel shape with no driver-side state. Distances "
    "beyond the hop budget are NULL. Integer arithmetic throughout, "
    "so every round is bitwise-reproducible under any partitioning; "
    "the DuckDB twin is the engine-idiomatic recursive CTE carrying "
    "the same hop bound. The corpus-scale work is the one weighted-"
    "edge aggregate (shared shape with nation_trade_pagerank); the "
    "iteration runs on the checkpointed |nations|²-bounded edges.",
    oracle=_bfs_oracle(),
)
def bfs_shortest_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _backbone_edges(spark, sf_dir, _BFS_TOPK)
    nation = table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").cast("int").alias("node"))
    dist = bfs_hops_frame(nodes, edges, source=0, max_hops=_BFS_HOPS)
    return dist.join(
        F.broadcast(nation), dist["node"] == nation["n_nationkey"]
    ).select(
        F.col("n_nationkey").alias("nationkey"),
        "n_name",
        F.col("hops").cast("bigint").alias("hops"),
        F.col("hops").isNotNull().alias("reachable"),
    )


def _kcore_oracle() -> str:
    ctes = [
        "nodes AS (SELECT n_nationkey AS node FROM nation)",
        """deg0 AS (
  SELECT x.node, COUNT(e.dst) AS deg
  FROM nodes x LEFT JOIN edges e ON x.node = e.src
  GROUP BY 1
)""",
        f"a0 AS (SELECT node FROM deg0 WHERE deg >= {_CORE_K})",
    ]
    for r in range(1, _CORE_ROUNDS + 1):
        ctes.append(
            f"""d{r} AS (
  SELECT x.node, COUNT(y.node) AS deg
  FROM a{r - 1} x
  LEFT JOIN edges e ON x.node = e.src
  LEFT JOIN a{r - 1} y ON e.dst = y.node
  GROUP BY 1
)"""
        )
        ctes.append(
            f"a{r} AS (SELECT node FROM d{r} WHERE deg >= {_CORE_K})"
        )
    return (
        f"WITH {_backbone_sql(_CORE_TOPK)},\n"
        + ",\n".join(ctes)
        + f"""
SELECT n.n_nationkey AS nationkey, n.n_name,
  CAST(d0.deg AS BIGINT) AS degree_initial,
  a.node IS NOT NULL AS in_core,
  CAST(CASE WHEN a.node IS NOT NULL THEN df.deg END AS BIGINT)
    AS degree_in_core
FROM nation n
JOIN deg0 d0 ON n.n_nationkey = d0.node
LEFT JOIN a{_CORE_ROUNDS} a ON n.n_nationkey = a.node
LEFT JOIN d{_CORE_ROUNDS} df ON n.n_nationkey = df.node
"""
    )


@register(
    "kcore_trade_graph",
    ops=("J4", "A1", "A11", "J2"),
    doc=f"{_CORE_K}-core decomposition of the top-{_CORE_TOPK} trade "
    "backbone by degree peeling: each round drops every node whose "
    f"degree among survivors is < {_CORE_K}, fixed {_CORE_ROUNDS} "
    "rounds (25 nodes stabilize in ≤3; the DuckDB twin unrolls the "
    "same rounds as chained CTEs). Per round the plan is one degree "
    "aggregate over the survivor-restricted edge list + one filter — "
    "at web scale each round is a semi-join + aggregate keyed on the "
    "node id, the textbook distributed k-core. Emits every nation's "
    "initial degree, core membership, and in-core degree; integer "
    "counts throughout.",
    oracle=_kcore_oracle(),
)
def kcore_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _backbone_edges(spark, sf_dir, _CORE_TOPK)
    nation = table(spark, sf_dir, "nation")
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    deg0, alive, deg = kcore_peel(nodes, edges, k=_CORE_K, rounds=_CORE_ROUNDS)
    return (
        nation.join(
            deg0.withColumnRenamed("deg", "deg_init"),
            nation["n_nationkey"] == F.col("node"),
        )
        .drop("node")
        .join(
            alive.select(F.col("node").alias("core_node")),
            nation["n_nationkey"] == F.col("core_node"),
            "left",
        )
        .join(
            deg.select(
                F.col("node").alias("deg_node"), F.col("deg").alias("deg_final")
            ),
            nation["n_nationkey"] == F.col("deg_node"),
            "left",
        )
        .select(
            F.col("n_nationkey").alias("nationkey"),
            "n_name",
            F.col("deg_init").cast("bigint").alias("degree_initial"),
            F.col("core_node").isNotNull().alias("in_core"),
            F.when(F.col("core_node").isNotNull(), F.col("deg_final"))
            .cast("bigint")
            .alias("degree_in_core"),
        )
    )


#: 1/log(deg) weights for Adamic-Adar, precomputed as stdlib literals
#: for every possible backbone degree (≤ 2·nations) — no libm in
#: either engine, same recipe as the normal-quantile tables.
import math as _math

_AA_WEIGHTS = {
    d: 1.0 / _math.log(d) for d in range(2, 51)
}
_AA_WEIGHT_SQL = " ".join(
    f"WHEN {d} THEN CAST('{v!r}' AS DOUBLE)" for d, v in _AA_WEIGHTS.items()
)


def adamic_adar_scored(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """AA scores for every non-adjacent pair with >= 1 common
    neighbor, over an ARBITRARY symmetric edge list — the scoring
    core of ``adamic_adar_link_prediction``, factored out for
    property tests (VERDICT r9 item 6). Returns (u, v, n_common,
    aa_score) with u < v, unranked."""
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    wmap = spark.createDataFrame(
        [(d, v) for d, v in _AA_WEIGHTS.items()], "d int, wt double"
    )
    w = deg.join(F.broadcast(wmap), "d").select("node", "wt")
    a = edges.select(F.col("src").alias("u"), F.col("dst").alias("za"))
    b = edges.select(F.col("src").alias("zb"), F.col("dst").alias("v"))
    # two-hop paths u -z- v with u < v; z must really neighbor u
    # (edges are symmetric, so a's (u,z) suffices) — the third join in
    # the oracle mirrors symmetry explicitly.
    two_hop = a.join(
        F.broadcast(b), (F.col("za") == F.col("zb")) & (F.col("u") < F.col("v"))
    ).select("u", "v", F.col("za").alias("z"))
    ex = edges.select(F.col("src").alias("xu"), F.col("dst").alias("xv"))
    cand = two_hop.join(
        F.broadcast(ex),
        (F.col("u") == F.col("xu")) & (F.col("v") == F.col("xv")),
        "left_anti",
    )
    # LEFT join mirrors the oracle's CASE: a common neighbor whose
    # degree falls outside the weight table still counts in n_common
    # (its NULL weight is skipped by SUM) instead of silently dropping
    # the row — semantics hold even if the backbone constants change.
    return (
        cand.join(F.broadcast(w), cand["z"] == w["node"], "left")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum("wt").alias("aa_score"),
        )
    )


@register(
    "adamic_adar_link_prediction",
    ops=("J4", "A3", "J1", "W4"),
    doc="Adamic-Adar link prediction over the trade backbone (Adamic "
    "& Adar 2003 — the classic common-neighbor score, weighting "
    "rare mutual partners above hubs): for every non-adjacent "
    "nation pair, AA = Σ 1/log(deg z) over common neighbors z. "
    "The degree→weight map is a precomputed stdlib literal table "
    "(like the normal-quantile grids), so neither engine calls "
    "log. Common neighbors via the two-hop self-join of the "
    "checkpointed edge list, anti-filtered against existing edges "
    "— the standard distributed link-prediction plan; the corpus-"
    "scale work is the shared weighted-edge aggregate. Emits the "
    "top-15 candidate links.",
    oracle=f"""
WITH {_backbone_sql(_CORE_TOPK)},
deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY 1),
w AS (SELECT node, (CASE d {_AA_WEIGHT_SQL} END) AS wt FROM deg),
two_hop AS (
  SELECT a.src AS u, b.dst AS v, e.src AS z
  FROM edges a
  JOIN edges b ON a.dst = b.src AND a.src < b.dst
  JOIN edges e ON e.src = a.dst AND e.dst = a.src
),
cand AS (
  SELECT t.u, t.v, t.z
  FROM two_hop t
  LEFT JOIN edges x ON t.u = x.src AND t.v = x.dst
  WHERE x.src IS NULL
),
scored AS (
  SELECT c.u, c.v,
    COUNT(*) AS n_common,
    SUM(w.wt) AS aa_score
  FROM cand c LEFT JOIN w ON c.z = w.node
  GROUP BY 1, 2
)
SELECT u AS nation_a, v AS nation_b,
  CAST(n_common AS BIGINT) AS n_common_neighbors,
  ROUND(aa_score, 6) AS aa_score
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY ROUND(aa_score, 6) DESC, u, v) AS rk
  FROM scored
) WHERE rk <= 15
""",
)
def adamic_adar_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _backbone_edges(spark, sf_dir, _CORE_TOPK)
    scored = adamic_adar_scored(spark, edges)
    # Rank on the ROUNDED score: the raw double sum is order-dependent
    # across partition layouts, so mathematically-tied pairs could
    # straddle the top-15 boundary differently between runs/engines;
    # rounding to 6 dp before ranking (both sides) stabilizes the cut.
    rk = F.row_number().over(
        Window.orderBy(F.round("aa_score", 6).desc(), "u", "v")
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= 15)
        .select(
            F.col("u").alias("nation_a"),
            F.col("v").alias("nation_b"),
            F.col("n_common").cast("bigint").alias("n_common_neighbors"),
            F.round("aa_score", 6).alias("aa_score"),
        )
    )

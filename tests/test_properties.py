"""Property-based tests (hypothesis) for the engine's foundational
invariants:

* the GTFS time parser accepts exactly the reference grammar
  ('H+:MM:SS', hours unbounded, NULL on anything else —
  `create_schema.sql:199-221`);
* the decimal-exact aggregates are partition-order independent — the
  same numbers give bitwise-identical sums on any partitioning, which
  is the premise of the whole oracle gate (and of AQE being free to
  re-partition at 100 TB).

Each example set is evaluated in ONE Spark job (batched into a single
DataFrame), so the suite stays fast.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transit_data_pipeline_spark.functions import numeric as N
from transit_data_pipeline_spark.gtfs.ingest import gtfs_time_to_seconds

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 99),  # GTFS hours routinely exceed 24
            st.integers(0, 59),
            st.integers(0, 59),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_time_parser_roundtrip(spark, triples):
    rows = [(f"{h:02d}:{m:02d}:{s:02d}", h * 3600 + m * 60 + s) for h, m, s in triples]
    df = spark.createDataFrame(rows, "t string, expected int")
    got = df.select(
        (gtfs_time_to_seconds(F.col("t")) == F.col("expected")).alias("ok")
    ).collect()
    assert all(r.ok for r in got)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.just("25:0:00"),  # minutes not 2-digit
            st.just("12:60:00"),  # minutes out of range
            st.just("12:00:61"),  # seconds out of range
            st.just("::"),
            st.just("12:34"),  # missing seconds
            st.just("abc"),
            st.just("12:34:56:78"),
            st.text(max_size=12).filter(
                lambda t: not __import__("re").fullmatch(r"\d+:[0-5]\d:[0-5]\d", t)
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_time_parser_rejects_malformed(spark, bad):
    df = spark.createDataFrame([(b,) for b in bad], "t string")
    got = df.select(gtfs_time_to_seconds(F.col("t")).alias("v")).collect()
    assert all(r.v is None for r in got)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.floats(
            min_value=-1e9,
            max_value=1e9,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=2,
        max_size=200,
    )
)
def test_dsum_partition_order_independent(spark, values):
    """Same multiset of doubles → bitwise-identical dsum/davg on 1
    partition, 8 partitions, and reversed input order."""
    results = []
    for vals in (values, list(reversed(values))):
        for parts in (1, 8):
            df = spark.createDataFrame(
                [(v,) for v in vals], "x double"
            ).repartition(parts)
            row = df.agg(
                N.dsum("x").alias("s"), N.davg("x").alias("a")
            ).first()
            results.append((row.s.hex(), row.a.hex()))
    assert len(set(results)) == 1, results


def _cc_labels(spark, pairs):
    """Run _min_label_components on an undirected pair list."""
    from transit_data_pipeline_spark.operators.dedup import (
        _min_label_components,
    )

    df = spark.createDataFrame(pairs, "a long, b long")
    edges = df.selectExpr("a AS src", "b AS dst").union(
        df.selectExpr("b AS src", "a AS dst")
    )
    out = _min_label_components(edges).collect()
    return {r.doc_id: r.comp for r in out}


def _union_find(pairs):
    """Driver-side oracle: component-min label per node."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_components_path_graph_beyond_iteration_bound(spark):
    """Diameter-59 path graph: plain 20-round min-label propagation
    cannot resolve it; the pointer-jumping step (rounds >= 3) must.
    Node ids are scrambled so the component min sits mid-path."""
    ids = [((i * 37) % 60) + 100 for i in range(60)]  # permutation
    pairs = list(zip(ids, ids[1:]))
    got = _cc_labels(spark, pairs)
    assert got == {i: 100 for i in ids}


def test_components_match_union_find_oracle(spark):
    """Mixed topology — two cliques, a long path bridging one of them,
    a 4-cycle, isolated edge — against a driver union-find oracle."""
    clique1 = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
    clique2 = [(i, j) for i in range(20, 24) for j in range(i + 1, 24)]
    bridge = list(zip(range(5, 20), range(6, 21)))  # path 5..20
    cycle = [(30, 31), (31, 32), (32, 33), (33, 30)]
    lone = [(40, 41)]
    pairs = clique1 + clique2 + bridge + cycle + lone
    assert _cc_labels(spark, pairs) == _union_find(pairs)


def test_ngram_jaccard_guard_refuses_blowup(spark, sf_dir):
    """The Σdf² blast-radius guard: an adversarially low budget makes
    the exact all-pairs operator refuse instead of running quadratic
    work, and the error routes users to the scale path."""
    import pytest as _pytest

    from transit_data_pipeline_spark.operators.dedup import (
        dedup_ngram_jaccard,
    )

    with _pytest.raises(ValueError, match="dedup_lsh_verified"):
        dedup_ngram_jaccard(spark, sf_dir, max_join_rows=10)
    # the default budget admits the fixture corpus
    assert dedup_ngram_jaccard(spark, sf_dir).count() >= 0


def test_embedding_cosine_guard_refuses_blowup(spark, sf_dir):
    """All-pairs cosine refuses corpora beyond the vector budget and
    routes users to the bucket-restricted ANN operators."""
    import pytest as _pytest

    from transit_data_pipeline_spark.operators.dedup import (
        dedup_embedding_cosine,
    )

    with _pytest.raises(ValueError, match="similarity_lsh_ann"):
        dedup_embedding_cosine(spark, sf_dir, max_vectors=1)
    assert dedup_embedding_cosine(spark, sf_dir).count() >= 0


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40)),  # (user, day)
        min_size=1,
        max_size=60,
    )
)
def test_streak_islands_match_bruteforce(spark, pairs):
    """Gaps-and-islands streak stats must equal a python brute-force
    over sorted distinct day sets for every user."""
    from pyspark.sql import Window

    days = sorted(set(pairs))
    df = spark.createDataFrame(days, "user_id int, d int")
    w = Window.partitionBy("user_id").orderBy("d")
    isl = df.select(
        "user_id", "d", (F.col("d") - F.row_number().over(w)).alias("island")
    )
    got = {
        (r.user_id): (r.n, r.mx)
        for r in isl.groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("len").alias("mx"))
        .collect()
    }
    # brute force
    from itertools import groupby

    expect = {}
    for u in sorted({u for u, _ in days}):
        ds = sorted(d for uu, d in days if uu == u)
        streaks, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        expect[u] = (len(streaks), max(streaks))
    assert got == expect


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.floats(0, 100, allow_nan=False)),
        min_size=0,
        max_size=15,
    )
)
def test_locf_fill_matches_bruteforce(spark, obs):
    """LOCF gap-fill over a 10-slot spine must carry the last observed
    value forward and default to 0.0 before the first observation."""
    from pyspark.sql import Window

    seen = {}
    for slot, v in obs:
        seen[slot] = v  # last write wins, like an aggregated daily value
    spine = spark.range(10).select(F.col("id").cast("int").alias("slot"))
    vals = (
        spark.createDataFrame(
            [(k, v) for k, v in seen.items()], "slot int, v double"
        )
        if seen
        else spark.createDataFrame([], "slot int, v double")
    )
    joined = spine.join(vals, "slot", "left")
    w = Window.orderBy("slot").rowsBetween(Window.unboundedPreceding, 0)
    got = {
        r.slot: r.filled
        for r in joined.select(
            "slot",
            F.coalesce(F.last("v", ignorenulls=True).over(w), F.lit(0.0)).alias(
                "filled"
            ),
        ).collect()
    }
    expect, carry = {}, 0.0
    for slot in range(10):
        if slot in seen:
            carry = seen[slot]
        expect[slot] = carry
    assert got == expect


def test_bloom_membership_no_false_negatives(spark, sf_dir):
    """A Bloom filter may report false positives but NEVER a false
    negative: n_bloom_positive must cover every true member. Also, the
    observed FP rate must stay far below saturation (the 128K-bit
    sizing claim)."""
    from transit_data_pipeline_spark.operators.registry import all_specs

    row = (
        all_specs()["sketch_bloom_membership"].fn(spark, sf_dir).collect()[0]
    )
    # Every member key probes positive (no false negatives)...
    assert row.n_bloom_positive >= row.n_members
    # ...and the positives beyond members are exactly the false ones.
    assert row.n_bloom_positive - row.n_members == row.n_false_positive
    assert row.fp_rate < 0.25, f"bloom saturated: {row.asDict()}"


def test_pagerank_conserves_scaled_mass(spark, sf_dir):
    """Integer PageRank invariants: every rank >= the damping base,
    and total mass stays within [0.8, 1.0] of the 10^12 scale (only
    integer-truncation loss — a wrong out-weight or double-counted
    edge breaks this bound immediately)."""
    from transit_data_pipeline_spark.operators.pipelineops import _PR_SCALE
    from transit_data_pipeline_spark.operators.registry import all_specs

    rows = all_specs()["nation_trade_pagerank"].fn(spark, sf_dir).collect()
    n = len(rows)
    base = (15 * _PR_SCALE) // (100 * n)
    assert all(r.rank_int >= base for r in rows)
    total = sum(r.rank_int for r in rows)
    assert 0.8 * _PR_SCALE <= total <= _PR_SCALE, total


def test_weighted_percentiles_bracket_weight_mass(spark, sf_dir):
    """For each group the weighted quartiles must be ordered and the
    weight mass strictly below w_p25 must be < 25% of the total (the
    defining property of a weighted percentile)."""
    from transit_data_pipeline_spark.operators.registry import all_specs
    from transit_data_pipeline_spark.catalog import table as cat_table

    rows = {
        r.flag: r
        for r in all_specs()["weighted_percentiles"].fn(spark, sf_dir).collect()
    }
    l = cat_table(spark, sf_dir, "lineitem")
    for flag, r in rows.items():
        assert r.w_p25 <= r.w_median <= r.w_p75
        below = (
            l.filter(
                (F.col("l_returnflag") == flag)
                & (F.col("l_extendedprice") < r.w_p25)
            )
            .agg(N.dsum("l_quantity"))
            .collect()[0][0]
            or 0.0
        )
        assert below < 0.25 * r.total_weight + 1e-9


def test_shard_packing_respects_sequential_rule(spark, sf_dir):
    """Shards within a source must cover contiguous, non-overlapping
    doc ranges in shard order, and byte totals must sum to the source
    total."""
    from transit_data_pipeline_spark.operators.registry import all_specs

    rows = all_specs()["multimodal_shard_packing"].fn(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, shards in by_src.items():
        shards.sort(key=lambda r: r.shard_id)
        for a, b in zip(shards, shards[1:]):
            assert a.last_doc < b.first_doc, (src, a, b)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 60)),
        min_size=1,
        max_size=20,
    )
)
def test_interval_coverage_matches_sweep(spark, pairs):
    """The running-max interval-merge window must produce the same
    per-user covered length and interval count as a python sweep over
    sorted [s, s+L) intervals (L=10), including touching-but-not-
    overlapping intervals (s == prev end starts a NEW island: the
    operator merges only true overlap, s > prev_max_e tests strict)."""
    from pyspark.sql import Window

    L = 10
    rows = [(u, i, s) for i, (u, s) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "user_id int, event_id int, s int")
    iv = df.withColumn("e", F.col("s") + F.lit(L))
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = iv.withColumn("prev_max_e", F.max("e").over(w_prev)).withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1
            ).otherwise(0)
        ).over(w_run),
    )
    g = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("i_start"), F.max("e").alias("i_end")
    )
    got = {
        r.user_id: (r.n, r.cov)
        for r in g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("i_end") - F.col("i_start")).alias("cov"),
        )
        .collect()
    }
    expect = {}
    for u in sorted({u for u, _ in pairs}):
        starts = sorted(s for uu, s in pairs if uu == u)
        merged = []
        for s in starts:
            if merged and s <= merged[-1][1]:  # s == end stays in island
                merged[-1][1] = max(merged[-1][1], s + L)
            else:
                merged.append([s, s + L])
        expect[u] = (len(merged), sum(e - s for s, e in merged))
    assert got == expect


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(-50, 50)),
        min_size=2,
        max_size=20,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_time_weighted_avg_matches_bruteforce(spark, triples):
    """TWA over integer values/timestamps must equal the exact
    fraction Σ(v·dt)/Σ(dt) computed in python (integer arithmetic —
    no float tolerance needed); keys with a single observation yield
    NULL (no holding intervals)."""
    from fractions import Fraction

    from pyspark.sql import Window

    rows = [(k, i, s, float(v)) for i, (k, s, v) in enumerate(triples)]
    df = spark.createDataFrame(rows, "k int, event_id int, s long, value double")
    w = Window.partitionBy("k").orderBy("s", "event_id")
    d = df.withColumn("dt", F.lead("s").over(w) - F.col("s"))
    got = {
        r.k: r.twa
        for r in d.groupBy("k")
        .agg(
            (
                F.sum((F.col("value") * F.col("dt")).cast(N.DEC)).cast("double")
                / F.sum("dt").cast("double")
            ).alias("twa")
        )
        .collect()
    }
    by_k = {}
    for k, s, v in triples:
        by_k.setdefault(k, []).append((s, v))
    for k, obs in by_k.items():
        obs.sort()
        num = sum(Fraction(v) * (s2 - s1) for (s1, v), (s2, _) in zip(obs, obs[1:]))
        den = sum(s2 - s1 for (s1, _), (s2, _) in zip(obs, obs[1:]))
        if den == 0:
            assert got[k] is None or got[k] != got[k]  # NULL or NaN (0/0)
        else:
            assert abs(got[k] - float(Fraction(num, den))) < 1e-9, (k, got[k])


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(1, 8)),
        min_size=1,
        max_size=25,
    )
)
def test_pareto_frontier_matches_bruteforce(spark, points):
    """The two-window skyline must equal the O(n²) dominance check:
    keep (s, o) iff no other point is >= on both axes and > on one."""
    from pyspark.sql import Window

    rows = [(i, s, o) for i, (s, o) in enumerate(points)]
    df = spark.createDataFrame(rows, "id int, spend long, orders long")
    w_richer = (
        Window.orderBy(F.col("spend").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_equal = Window.partitionBy("spend")
    m = df.select(
        "id",
        "spend",
        "orders",
        F.max("orders").over(w_richer).alias("br"),
        F.max("orders").over(w_equal).alias("be"),
    )
    got = {
        r.id
        for r in m.filter(
            (F.col("br").isNull() | (F.col("br") < F.col("orders")))
            & (F.col("be") == F.col("orders"))
        ).collect()
    }
    expect = set()
    for i, (s, o) in enumerate(points):
        dominated = any(
            (s2 >= s and o2 >= o and (s2 > s or o2 > o))
            for j, (s2, o2) in enumerate(points)
            if j != i
        )
        if not dominated:
            expect.add(i)
    assert got == expect


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(1, 40), min_size=1, max_size=30),
)
def test_binpack_next_fit_invariants(spark, sizes):
    """Next-fit packing by cumulative sum: bin ids are contiguous from
    0, files stay in order, and every bin except possibly ones holding
    a single oversized file closes within target + max_file."""
    from pyspark.sql import Window

    target = 50
    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "seq int, bytes long")
    w = Window.orderBy("seq").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed = df.withColumn(
        "bin_id",
        F.floor((F.sum("bytes").over(w) - F.col("bytes")) / F.lit(target)).cast(
            "long"
        ),
    ).collect()
    by_bin = {}
    for r in sorted(packed, key=lambda r: r.seq):
        by_bin.setdefault(r.bin_id, []).append(r)
    bins = sorted(by_bin)
    assert bins[0] == 0
    # bins are non-decreasing along the file order
    order = [r.bin_id for r in sorted(packed, key=lambda r: r.seq)]
    assert order == sorted(order)
    for b, rs in by_bin.items():
        total = sum(r.bytes for r in rs)
        assert total < target + max(r.bytes for r in rs), (b, total)


def test_semdedup_invariants(spark, sf_dir):
    """SemDeDup keep-set invariants: the smallest vec_id in every
    cluster is always kept (nothing precedes it), every vector appears
    exactly once, and the guard on the eval harness fires as designed."""
    from transit_data_pipeline_spark.operators.dedup import dedup_semdedup

    out = dedup_semdedup(spark, sf_dir).collect()
    seen = {}
    by_cluster_min = {}
    for r in out:
        assert r.vec_id not in seen, "vector appears twice"
        seen[r.vec_id] = r
        cur = by_cluster_min.get(r.cluster_id)
        if cur is None or r.vec_id < cur.vec_id:
            by_cluster_min[r.cluster_id] = r
    for r in by_cluster_min.values():
        assert r.keep, f"cluster {r.cluster_id} min vec {r.vec_id} was dropped"


def test_simhash_eval_guard_refuses_blowup(spark, sf_dir):
    from transit_data_pipeline_spark.operators.dedup import simhash_eval_pr

    import pytest

    with pytest.raises(ValueError, match="blow-up"):
        simhash_eval_pr(spark, sf_dir, max_join_rows=10)


def test_novelty_bounds_and_first_doc(spark, sf_dir):
    """Novelty ratios are in [0,1]; the earliest doc with shingles is
    fully novel (nothing precedes it)."""
    from transit_data_pipeline_spark.operators.dedup import doc_ngram_novelty

    rows = doc_ngram_novelty(spark, sf_dir).collect()
    assert rows
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty_ratio == 1.0
    for r in rows:
        assert 0.0 <= r.novelty_ratio <= 1.0
        assert r.n_novel <= r.n_shingles


def test_percentile_disc_members_of_group(spark, sf_dir):
    """Discrete percentiles must be actual members of their group —
    the defining property vs interpolated percentile_cont."""
    from transit_data_pipeline_spark.operators.relational import (
        percentile_disc_suite,
    )
    from transit_data_pipeline_spark.catalog import table

    rows = percentile_disc_suite(spark, sf_dir).collect()
    o = table(spark, sf_dir, "orders")
    vals = {
        r.status: {x.o_totalprice for x in g}
        for r in rows
        for g in [o.filter(F.col("o_orderstatus") == r.status).select("o_totalprice").collect()]
    }
    for r in rows:
        for p in (r.p25_disc, r.p50_disc, r.p75_disc):
            assert p in vals[r.status]


def test_consistent_hash_moves_only_to_new_shard(spark, sf_dir):
    """The defining consistent-hashing property: adding a shard only
    steals keys — no key moves between pre-existing shards — and the
    stolen fraction stays near 1/(N+1), far from mod-N's (N-1)/N."""
    from transit_data_pipeline_spark.operators.pipelineops import (
        consistent_hash_shards,
    )

    rows = consistent_hash_shards(spark, sf_dir).collect()
    assert rows
    assert all(r.n_moved_elsewhere == 0 for r in rows)
    total = sum(r.n_docs for r in rows)
    moved = sum(r.n_moved for r in rows)
    assert moved / total < 0.35  # expected ≈ 1/9


def test_cdc_upsert_matches_batch_argmax(spark, sf_dir):
    """The streamed store equals the batch latest-wins argmax, and
    per-user event counts are conserved across micro-batches."""
    from transit_data_pipeline_spark.catalog import table
    from transit_data_pipeline_spark.operators.streamingops import (
        streaming_cdc_upsert,
    )

    got = {r.user_id: r for r in streaming_cdc_upsert(spark, sf_dir).collect()}
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "ts").collect()
    from collections import defaultdict

    best, counts = {}, defaultdict(int)
    for r in ev:
        counts[r.user_id] += 1
        k = (r.ts, r.event_id)
        if r.user_id not in best or k > best[r.user_id]:
            best[r.user_id] = k
    assert set(got) == set(counts)
    for uid, (ts, eid) in best.items():
        assert got[uid].last_event_id == eid
        assert got[uid].n_events == counts[uid]


def test_knn_outliers_rank_is_contiguous(spark, sf_dir):
    """Top-15 loneliest vectors: ranks are 1..15 with no gaps, and
    non-null distances are non-increasing down the ranking."""
    from transit_data_pipeline_spark.operators.similarity import (
        embedding_knn_outliers,
    )

    rows = sorted(embedding_knn_outliers(spark, sf_dir).collect(), key=lambda r: r.rnk)
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    ds = [r.nn_d2 for r in rows if r.nn_d2 is not None]
    assert ds == sorted(ds, reverse=True)


def test_contract_validator_fixture_is_clean(spark, sf_dir):
    """The driver fixtures satisfy every contract rule — a violation
    here means either the fixture changed shape or a rule regressed."""
    from transit_data_pipeline_spark.operators.pipelineops import (
        data_contract_validator,
    )

    rows = data_contract_validator(spark, sf_dir).collect()
    assert len(rows) == 6
    bad = [r.rule_id for r in rows if not r.passed]
    assert not bad, bad


def test_kmv_union_bounds(spark, sf_dir):
    """Merged sketch can never estimate above the naive sum of parts
    (the sum double-counts cross-sketch overlap)."""
    from transit_data_pipeline_spark.operators.sketches import sketch_kmv_union

    r = sketch_kmv_union(spark, sf_dir).collect()[0]
    assert r.merged_estimate <= r.sum_of_parts + 1e-9
    assert r.n_sketches >= 2


def test_maxsim_scores_bounded_and_ranked(spark, sf_dir):
    """MaxSim over 4 unit-normalized query tokens is bounded by 4;
    ranking is dense and score-ordered."""
    from transit_data_pipeline_spark.operators.similarity import (
        retrieval_maxsim_late_interaction,
    )

    rows = sorted(
        retrieval_maxsim_late_interaction(spark, sf_dir).collect(),
        key=lambda r: r.rnk,
    )
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.maxsim_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(-4.1 <= s <= 4.1 for s in scores)


def test_late_dim_funnel_conserves_counts(spark, sf_dir):
    from transit_data_pipeline_spark.operators.sources import (
        late_arriving_dim_handling,
    )

    r = late_arriving_dim_handling(spark, sf_dir).collect()[0]
    assert r.n_matched_initial + r.n_quarantined == r.n_facts
    assert r.n_recovered + r.n_unresolved == r.n_quarantined
    assert r.n_unresolved == 0  # fixture FK integrity holds


def test_quality_weighted_sampling_tracks_expectation(spark, sf_dir):
    """Realized keep rate concentrates around the expected rate
    (independent per-doc draws → loose Chernoff-style tolerance)."""
    from transit_data_pipeline_spark.operators.curation import (
        quality_weighted_sampling,
    )

    for r in quality_weighted_sampling(spark, sf_dir).collect():
        assert 0.0 < r.expected_rate <= 1.0
        assert abs(r.keep_rate - r.expected_rate) < 0.2


def test_calibration_gaps_are_small(spark, sf_dir):
    """Outcomes are drawn FROM the model on an independent hash
    channel, so every decile's observed rate must track its mean
    predicted probability within sampling noise."""
    from transit_data_pipeline_spark.operators.mlops import model_calibration_bins

    rows = model_calibration_bins(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Sampling noise scales ~1/√n: well-populated bins must be
        # tight; a 9-cell tail bin may legitimately wobble.
        tol = 0.06 if r.n_cells >= 100 else 0.25
        assert abs(r.calibration_gap) < tol, r
        # Brier for a calibrated bin ≈ p̄(1−p̄) ≤ 0.25 + small-sample slack.
        assert 0.0 <= r.brier <= 0.30


def test_target_encode_loo_excludes_self(spark, sf_dir):
    """LOO property: two rows of the same segment with different
    targets get different encodings (the self-label is excluded), and
    every encoding stays inside (0, 1)."""
    from transit_data_pipeline_spark.operators.mlprep import target_encode_loo

    rows = target_encode_loo(spark, sf_dir).collect()
    by_seg = {}
    for r in rows:
        assert 0.0 < r.te_loo < 1.0
        by_seg.setdefault(r.segment, set()).add((r.y, round(r.te_loo, 12)))
    some_seg = next(s for s in by_seg.values() if len({y for y, _ in s}) == 2)
    te0 = {t for y, t in some_seg if y == 0}
    te1 = {t for y, t in some_seg if y == 1}
    assert te0 and te1 and te0.isdisjoint(te1)
    assert min(te1) < max(te0)  # removing a positive lowers the rate


def test_srm_counts_conserve_users(spark, sf_dir):
    from transit_data_pipeline_spark.catalog import table
    from transit_data_pipeline_spark.operators.events import ab_srm_check

    r = ab_srm_check(spark, sf_dir).collect()[0]
    n_users = table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert r.n_a + r.n_b == n_users
    assert r.chi2 >= 0.0
    assert r.expected_each == (r.n_a + r.n_b) / 2


def test_woe_information_value_nonnegative(spark, sf_dir):
    """(ps−ns) and ln(ps/ns) always share sign, so every segment's
    IV contribution is ≥ 0; WoE sign tracks the share comparison."""
    from transit_data_pipeline_spark.operators.mlprep import woe_encoding

    rows = woe_encoding(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.iv_contrib >= -1e-12, r


def test_km_curve_monotone_and_bounded(spark, sf_dir):
    """log-survival is nonincreasing in t and ≤ 0; at-risk counts are
    nonincreasing; churns never exceed the at-risk set."""
    from transit_data_pipeline_spark.operators.timeseries import (
        survival_km_retention,
    )

    rows = survival_km_retention(spark, sf_dir).collect()
    assert rows
    prev_ls, prev_n = 1e-12, None
    for r in rows:  # already ordered by t
        assert r.d_t <= r.n_t
        assert r.log_survival <= prev_ls + 1e-12
        if prev_n is not None:
            assert r.n_t <= prev_n
        prev_ls, prev_n = r.log_survival, r.n_t


def test_cuped_never_increases_variance(spark, sf_dir):
    """var(Y−θX) = var(Y) − cov²/var(X) ≤ var(Y) by construction, and
    the reported reduction fraction sits in [0, 1]."""
    from transit_data_pipeline_spark.operators.events import ab_cuped_adjustment

    r = ab_cuped_adjustment(spark, sf_dir).collect()[0]
    assert r.var_adj <= r.var_y + 1e-9
    assert 0.0 <= r.var_reduction <= 1.0


def test_auc_bounds_and_rank_sum_identity(spark, sf_dir):
    """Every per-source AUC lies in [0,1]; n_pos+n_neg covers the
    source's documents exactly."""
    from transit_data_pipeline_spark.catalog import table
    from transit_data_pipeline_spark.operators.mlops import auc_mann_whitney

    rows = auc_mann_whitney(spark, sf_dir).collect()
    assert rows
    per_source = {
        r["source"]: r["cnt"]
        for r in table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in rows:
        assert 0.0 <= r.auc <= 1.0
        assert r.n_pos + r.n_neg == per_source[r.source]


def test_bootstrap_ci_brackets_point_mean(spark, sf_dir):
    """The 95% Poisson-bootstrap CI must contain the full-sample mean
    (it always does for the mean at these replicate counts), and the
    bounds must be ordered."""
    from transit_data_pipeline_spark.operators.mlops import bootstrap_poisson_ci

    r = bootstrap_poisson_ci(spark, sf_dir).collect()[0]
    assert r.ci_lo <= r.point_mean <= r.ci_hi
    assert r.n_replicates == 64


def test_conformal_coverage_near_target(spark, sf_dir):
    """Split-conformal guarantees coverage ≥ 1−α in expectation; on
    the fixed grid it must land within sampling noise of the target."""
    from transit_data_pipeline_spark.operators.mlops import (
        conformal_interval_calibration,
    )

    r = conformal_interval_calibration(spark, sf_dir).collect()[0]
    assert r.n_calib + r.n_eval == 1440
    assert abs(r.coverage - r.target) < 0.05


def test_kappa_identity_against_confusion(spark, sf_dir):
    """κ recomputed from the returned confusion marginals matches the
    operator's column; diagonal ≤ marginals."""
    from transit_data_pipeline_spark.operators.mlops import label_centroid_kappa

    rows = label_centroid_kappa(spark, sf_dir).collect()
    assert rows
    n = sum(r.n_true for r in rows)
    diag = sum(r.n_correct for r in rows)
    pe = sum(r.n_true * r.n_pred for r in rows) / (n * n)
    kappa = ((diag / n) - pe) / (1 - pe)
    for r in rows:
        assert r.n_correct <= min(r.n_true, r.n_pred)
        assert abs(r.kappa - round(kappa, 4)) <= 1e-9


def test_erasure_cascade_leaves_no_orphans(spark, sf_dir):
    from transit_data_pipeline_spark.operators.curation import (
        erasure_cascade_audit,
    )

    rows = {r.tbl: r for r in erasure_cascade_audit(spark, sf_dir).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    for r in rows.values():
        assert r.orphans_after == 0
        assert 0 <= r.rows_erased <= r.rows_total


def test_theilsen_median_is_pairwise_median(spark, sf_dir):
    """n_pairs equals C(days,2) per priority and the reported slope is
    sign-consistent with the rising flag."""
    from transit_data_pipeline_spark.operators.timeseries import (
        _daily,
        theilsen_trend,
    )

    days = {
        r["o_orderpriority"]: r["cnt"]
        for r in _daily(spark, sf_dir)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in theilsen_trend(spark, sf_dir).collect():
        d = days[r.o_orderpriority]
        assert r.n_pairs == d * (d - 1) // 2
        assert r.rising == (r.median_slope > 0)


def test_pca_unit_norm_and_share(spark, sf_dir):
    """The returned eigenvector is unit-norm (to 6-dp rounding) and
    the explained-variance share of PC1 lies in (0, 1]."""
    from transit_data_pipeline_spark.operators.similarity import (
        embedding_pca_power,
    )

    rows = embedding_pca_power(spark, sf_dir).collect()
    assert len(rows) == 64
    norm2 = sum(r.loading**2 for r in rows)
    assert abs(norm2 - 1.0) < 1e-4
    assert 0.0 < rows[0].explained_share <= 1.0


def test_weighted_reservoir_sample_is_k_distinct(spark, sf_dir):
    from transit_data_pipeline_spark.operators.mlprep import (
        WRS_K,
        weighted_reservoir_sample,
    )

    rows = weighted_reservoir_sample(spark, sf_dir).collect()
    assert len(rows) == WRS_K
    assert len({r.doc_id for r in rows}) == WRS_K
    assert sorted(r.rnk for r in rows) == list(range(1, WRS_K + 1))
    keys = [r.sample_key for r in sorted(rows, key=lambda r: r.rnk)]
    assert keys == sorted(keys, reverse=True)


def test_isotonic_fit_is_monotone_and_mass_preserving(spark, sf_dir):
    """The PAV minimax fit must be non-decreasing in the score bin,
    bounded by [0, 1], and preserve total keep mass:
    Σ n·iso == Σ n·observed (PAV pools are weighted averages)."""
    from transit_data_pipeline_spark.operators.statsaudit import (
        isotonic_calibration_pav,
    )

    rows = sorted(
        isotonic_calibration_pav(spark, sf_dir).collect(), key=lambda r: r.bin
    )
    iso = [r.iso_rate for r in rows]
    assert iso == sorted(iso)
    assert all(0.0 <= v <= 1.0 for v in iso)
    mass_obs = sum(r.n_docs * r.observed_rate for r in rows)
    mass_iso = sum(r.n_docs * r.iso_rate for r in rows)
    assert abs(mass_obs - mass_iso) < 1e-6


def test_gini_bounds_and_lorenz_order(spark, sf_dir):
    """Gini ∈ [0, 1); the bottom-half token share can never exceed the
    group's share of documents (Lorenz curve lies under the diagonal),
    and the top decile can never hold less than its count share."""
    from transit_data_pipeline_spark.operators.statsaudit import (
        gini_token_concentration,
    )

    for r in gini_token_concentration(spark, sf_dir).collect():
        assert 0.0 <= r.gini < 1.0
        assert r.bottom_half_share <= 0.5 + 1e-12
        assert r.top_decile_share >= (r.n_docs // 10) / r.n_docs - 1e-12
        assert 0.0 <= r.bottom_half_share <= 1.0
        assert 0.0 <= r.top_decile_share <= 1.0


def test_spearman_within_bounds_and_rank_invariant(spark, sf_dir):
    """ρ ∈ [−1, 1] and n matches the FK aggregate's order count (the
    fixture's price and quantity columns are synthetically independent,
    so no sign is asserted — only the metric's bounds)."""
    from transit_data_pipeline_spark.operators.statsaudit import (
        spearman_rank_corr,
    )

    r = spearman_rank_corr(spark, sf_dir).collect()[0]
    assert -1.0 <= r.spearman_rho <= 1.0
    assert -1.0 <= r.pearson_r <= 1.0
    assert r.n_orders > 0


def test_did_identity_from_cell_means(spark, sf_dir):
    """The DiD estimate must equal the four cell means' double-difference
    exactly (same operation order)."""
    from transit_data_pipeline_spark.operators.statsaudit import did_estimator

    r = did_estimator(spark, sf_dir).collect()[0]
    assert r.did_estimate == (r.m_t_post - r.m_t_pre) - (r.m_c_post - r.m_c_pre)
    assert r.n_t_pre + r.n_t_post + r.n_c_pre + r.n_c_post > 0


def test_merkle_root_flips_on_any_leaf_change(spark, sf_dir):
    """Equal corpora → equal roots; perturbing ONE document's text must
    flip that source's root and no other's."""
    import os

    from transit_data_pipeline_spark.operators.statsaudit import (
        corpus_merkle_manifest,
    )

    base = {
        r.source: r.root_hash
        for r in corpus_merkle_manifest(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    first = docs.orderBy("doc_id").limit(1).collect()[0]
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        perturbed = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") == first.doc_id,
                F.concat(F.col("text"), F.lit(" TAMPERED")),
            ).otherwise(F.col("text")),
        )
        perturbed.write.parquet(os.path.join(tmp, "documents.parquet"))
        changed = {
            r.source: r.root_hash
            for r in corpus_merkle_manifest(spark, tmp).collect()
        }
    assert changed[first.source] != base[first.source]
    assert all(
        changed[s] == base[s] for s in base if s != first.source
    )


def test_hits_shares_bounded_and_normalized(spark, sf_dir):
    """Integer-L1 HITS: every share ∈ [0, 1] and each side's total is 1
    up to integer truncation (≤ n_nodes ulps of 1e-6)."""
    from transit_data_pipeline_spark.operators.pipelineops import (
        hits_trade_graph,
    )

    rows = hits_trade_graph(spark, sf_dir).collect()
    n = len(rows)
    for side in ("hub_share", "auth_share"):
        vals = [getattr(r, side) for r in rows]
        assert all(0.0 <= v <= 1.0 for v in vals)
        assert 1.0 - n * 1e-6 <= sum(vals) <= 1.0 + 1e-9


def test_t_closeness_emd_bounds(spark, sf_dir):
    """Ordered-EMD is a normalized metric: every value ∈ [0, 1]."""
    from transit_data_pipeline_spark.operators.curation import (
        t_closeness_audit,
    )

    for r in t_closeness_audit(spark, sf_dir).collect():
        assert 0.0 <= r.emd_t <= 1.0
        assert r.meets_t_02 == (r.emd_t <= 0.2)


def test_ndcg_metric_identities(spark, sf_dir):
    """nDCG ≤ 1, DCG ≤ IDCG, precision/recall/MRR ∈ [0,1], and
    n_hits ≤ min(10, n_relevant)."""
    from transit_data_pipeline_spark.operators.similarity import (
        retrieval_ndcg_eval,
    )

    rows = retrieval_ndcg_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hits <= min(10, r.n_relevant)
        assert 0.0 <= r.prec_at_10 <= 1.0
        assert 0.0 <= r.recall_at_10 <= 1.0
        assert 0.0 <= r.mrr_at_10 <= 1.0
        assert r.dcg_at_10 <= r.idcg_at_10 + 1e-12
        assert 0.0 <= r.ndcg_at_10 <= 1.0


def test_winnowing_guarantee_on_fixture(spark, sf_dir):
    """Winnowing selects ≥ 1 fingerprint per window: density ∈ (0, 1]
    and n_fingerprints ≤ windows ≤ n_grams."""
    from transit_data_pipeline_spark.operators.textops import (
        text_winnowing_fingerprints,
    )

    for r in text_winnowing_fingerprints(spark, sf_dir).collect():
        assert 0 < r.n_fingerprints <= r.n_grams
        assert 0.0 < r.fingerprint_density <= 1.0


def test_matryoshka_recall_bounds(spark, sf_dir):
    """recall@5 ∈ [0,1] in 1/5 steps; top-1 agreement implies ≥ 1
    overlap."""
    from transit_data_pipeline_spark.operators.similarity import (
        embedding_matryoshka_recall,
    )

    rows = embedding_matryoshka_recall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_overlap in range(0, 6)
        assert abs(r.recall_at_5 - r.n_overlap / 5.0) < 1e-12
        if r.top1_match:
            assert r.n_overlap >= 1


def test_ivm_matches_full_recompute(spark, sf_dir):
    """Delta-maintained view ≡ full recompute, column for column."""
    from transit_data_pipeline_spark.functions import numeric as NN
    from transit_data_pipeline_spark.operators.pipelineops import (
        ivm_join_view_delta,
    )
    from transit_data_pipeline_spark.catalog import table as _t

    maintained = {
        r.nation: (r.n_orders, r.revenue)
        for r in ivm_join_view_delta(spark, sf_dir).collect()
    }
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    full = {
        r.nation: (r.n, r.rev)
        for r in o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n"), NN.dsum("o_totalprice").alias("rev"))
        .collect()
    }
    assert maintained == full


def test_point_in_time_features_never_leak(spark, sf_dir):
    """No feature may use information at or after the label timestamp:
    re-derive the click count per label row with an independent
    anti-leak join and compare."""
    from transit_data_pipeline_spark.catalog import table as _t
    from transit_data_pipeline_spark.operators.events import (
        point_in_time_features,
    )

    feat = point_in_time_features(spark, sf_dir)
    e = _t(spark, sf_dir, "events")
    labels = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("lid"),
        F.col("user_id").alias("lu"),
        F.col("ts").alias("lts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
    )
    recount = (
        labels.join(
            clicks,
            (F.col("lu") == F.col("cu"))
            & (
                (F.col("cts") < F.col("lts"))
                | ((F.col("cts") == F.col("lts")) & (F.col("cid") < F.col("lid")))
            ),
            "left",
        )
        .groupBy("lid")
        .agg(F.count("cid").alias("n"))
    )
    expected = {r.lid: r.n for r in recount.collect()}
    for r in feat.select("event_id", "f_clicks_before").collect():
        assert r.f_clicks_before == expected[r.event_id], r.event_id


def test_vocab_coverage_curve_is_monotone(spark, sf_dir):
    """Higher coverage targets need (weakly) larger vocabularies, and
    the achieved share meets the target."""
    from transit_data_pipeline_spark.operators.textops import (
        vocab_coverage_curve,
    )

    rows = sorted(
        vocab_coverage_curve(spark, sf_dir).collect(),
        key=lambda r: r.coverage_bp,
    )
    sizes = [r.vocab_size_needed for r in rows]
    assert sizes == sorted(sizes)
    for r in rows:
        assert r.share_achieved * 10000 >= r.coverage_bp - 1e-9
        assert r.vocab_size_needed <= r.total_vocab


def test_zone_map_clustered_layout_dominates(spark, sf_dir):
    """The shipdate-sorted layout must skip at least as many chunks as
    the hash-scattered one, and both scan at least the matching rows."""
    from transit_data_pipeline_spark.operators.sources import (
        zone_map_skipping_eval,
    )

    rows = {r.layout: r for r in zone_map_skipping_eval(spark, sf_dir).collect()}
    assert rows["clustered"].n_skipped >= rows["scattered"].n_skipped
    for r in rows.values():
        assert r.rows_scanned >= r.rows_matching
        assert 0.0 <= r.skip_rate <= 1.0


def test_kmv_intersection_estimates_track_exact(spark, sf_dir):
    """Union estimate can never be below either side's estimate minus
    sketch noise; exact Jaccard ∈ [0,1]; inclusion–exclusion identity
    holds exactly by construction."""
    from transit_data_pipeline_spark.operators.sketches import (
        sketch_kmv_intersection,
    )

    for r in sketch_kmv_intersection(spark, sf_dir).collect():
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert r.est_inter == (r.est_a + r.est_b) - r.est_union
        assert r.exact_inter <= min(r.exact_a, r.exact_b)


def test_forecast_backtest_mase_consistency(spark, sf_dir):
    """MASE = MAE ratio identity and all metrics non-negative."""
    from transit_data_pipeline_spark.operators.statsaudit import (
        forecast_backtest_suite,
    )

    rows = forecast_backtest_suite(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mae >= 0.0 and r.rmse >= 0.0 and r.wape >= 0.0
        # MASE is NULL when the one-step naive baseline is perfect
        # (zero denominator) — legitimate on sparse tiny fixtures.
        assert r.mase is None or r.mase >= 0.0
        assert r.n_days > 0


def test_covariate_shift_ess_bounds(spark, sf_dir):
    """ESS ≤ n_src (Cauchy–Schwarz), ess_ratio ∈ (0, 1], weights ≥ 0,
    and the clipped weight never exceeds the clip constant."""
    from transit_data_pipeline_spark.operators.mlops import (
        _CS_CLIP,
        covariate_shift_weights,
    )

    rows = covariate_shift_weights(spark, sf_dir).collect()
    assert rows
    n_src_total = sum(r.n_src for r in rows)
    for r in rows:
        assert r.weight >= 0.0
        assert 0.0 <= r.w_clip <= _CS_CLIP
        assert 0.0 < r.ess_ratio <= 1.0 + 1e-12
        assert r.ess <= n_src_total * (1.0 + 1e-12)


def test_nearest_event_join_picks_minimal_gap(spark, sf_dir):
    """gap_ns ≥ 0, direction consistent with value NULL-ness, and for a
    sampled user the chosen gap equals the true minimum |Δt| over that
    user's purchases."""
    from transit_data_pipeline_spark.catalog import table as _t
    from transit_data_pipeline_spark.operators.events import (
        nearest_event_join,
    )

    out = nearest_event_join(spark, sf_dir)
    rows = out.limit(2000).collect()
    assert rows
    for r in rows:
        assert (r.gap_ns is None) == (r.nearest_purchase_value is None)
        if r.gap_ns is not None:
            assert r.gap_ns >= 0
            assert r.direction in ("backward", "forward")
    # exhaustive check for one user with both clicks and purchases
    e = _t(spark, sf_dir, "events")
    some = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("k"))
        .filter(F.col("k") == 2)
        .limit(1)
        .collect()
    )
    if some:
        uid = some[0].user_id
        evs = (
            e.filter(F.col("user_id") == uid)
            .filter(F.col("event_type").isin("click", "purchase"))
            .select("event_id", "event_type", "ts")
            .collect()
        )
        purchases = sorted(x.ts for x in evs if x.event_type == "purchase")
        got = {
            r.event_id: r.gap_ns
            for r in out.filter(F.col("user_id") == uid).collect()
        }
        for x in evs:
            if x.event_type == "click" and purchases:
                expect = min(abs(x.ts - p) for p in purchases)
                assert got[x.event_id] == expect


def test_source_freshness_lags_nonnegative(spark, sf_dir):
    from transit_data_pipeline_spark.operators.events import (
        source_freshness_monitor,
    )

    rows = source_freshness_monitor(spark, sf_dir).collect()
    assert rows
    assert any(r.staleness_sec == 0 for r in rows)  # the watermark type
    for r in rows:
        assert r.staleness_sec >= 0
        assert 0 <= r.n_last_hour <= r.n_events
        assert r.last_hour_vs_mean_rate >= 0.0


def test_scd2_as_of_resolves_at_most_one_version_per_user(spark, sf_dir):
    from transit_data_pipeline_spark.operators.windows import (
        scd2_as_of_lookup,
    )

    rows = scd2_as_of_lookup(spark, sf_dir).collect()
    assert rows
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users))
    for r in rows:
        assert r.active_for_sec >= 0


def test_epoch_shuffle_reshuffles_and_balances(spark, sf_dir):
    """Shards cover 0..15, counts roughly balanced, and the stayed
    fraction is near 1/16 (a broken seed would pin it at 1.0)."""
    from transit_data_pipeline_spark.operators.mlprep import (
        EPOCH_SHARDS,
        epoch_shuffle_plan,
    )

    rows = epoch_shuffle_plan(spark, sf_dir).collect()
    assert {r.shard for r in rows} == set(range(EPOCH_SHARDS))
    n = sum(r.n_docs for r in rows)
    for r in rows:
        assert 0 <= r.n_stayed <= r.n_docs
        assert abs(r.frac_stayed - r.n_stayed / r.n_docs) < 1e-12
    overall_stayed = sum(r.n_stayed for r in rows) / n
    assert overall_stayed < 0.5  # uniform expectation 1/16


def test_group_kfold_has_no_customer_leakage(spark, sf_dir):
    from transit_data_pipeline_spark.operators.mlprep import (
        KFOLD_K,
        group_kfold_split,
    )

    rows = group_kfold_split(spark, sf_dir).collect()
    assert {r.fold for r in rows} <= set(range(KFOLD_K))
    for r in rows:
        assert r.max_folds_per_customer == 1
        assert r.n_customers <= r.n_orders


def test_fellegi_sunter_score_bounds(spark, sf_dir):
    """Scores stay inside the [all-disagree, all-agree] envelope and
    the match count never exceeds the pair count."""
    from transit_data_pipeline_spark.operators.dedup import (
        _FS_W,
        fellegi_sunter_linkage,
    )

    lo = sum(w[1] for w in _FS_W.values())
    hi = sum(w[0] for w in _FS_W.values())
    rows = fellegi_sunter_linkage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_matches <= r.n_pairs
        assert lo <= r.mean_score <= r.max_score <= hi


def test_acf_bounds_and_pair_counts(spark, sf_dir):
    """ACF stays in [-1, 1]; pair count shrinks by exactly one row
    per extra lag (the series is dense over the 1996 window)."""
    from transit_data_pipeline_spark.operators.timeseries import (
        ACF_MAX_LAG,
        acf_daily_orders,
    )

    rows = sorted(acf_daily_orders(spark, sf_dir).collect(), key=lambda r: r.lag)
    assert [r.lag for r in rows] == list(range(1, ACF_MAX_LAG + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_pairs == prev.n_pairs - 1
    for r in rows:
        assert -1.0 <= r.acf <= 1.0
        assert r.noise_band > 0
        assert r.significant == (abs(r.acf) > r.noise_band)


def test_gains_lift_table_invariants(spark, sf_dir):
    """Cumulative gain is monotone to 1.0; lift × base rate equals the
    decile response rate; KS statistic is the max |gap|."""
    from transit_data_pipeline_spark.operators.mlops import gains_lift_table

    rows = sorted(gains_lift_table(spark, sf_dir).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    n_all = sum(r.n for r in rows)
    resp_all = sum(r.n_responders for r in rows)
    base = resp_all / n_all
    cum = 0.0
    for r in rows:
        assert 0.0 <= r.response_rate <= 1.0
        assert r.cum_gain >= cum - 1e-12
        cum = r.cum_gain
        assert abs(r.lift * base - r.response_rate) < 1e-9
    assert abs(rows[-1].cum_gain - 1.0) < 1e-12
    ks = max(abs(r.ks_gap) for r in rows)
    assert all(abs(r.ks_statistic - ks) < 1e-15 for r in rows)


def test_propensity_att_is_treated_weighted_mean_of_strata(spark, sf_dir):
    from transit_data_pipeline_spark.operators.statsaudit import (
        propensity_strata_att,
    )

    rows = propensity_strata_att(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.stratum <= 4
        assert r.n_treated > 0 and r.n_control > 0
        assert abs(r.stratum_diff - (r.mean_treated - r.mean_control)) < 1e-9
    n_t = sum(r.n_treated for r in rows)
    att = sum(r.n_treated * r.stratum_diff for r in rows) / n_t
    assert abs(rows[0].att_overall - att) < 1e-6


def test_length_bucket_packing_pad_accounting(spark, sf_dir):
    from transit_data_pipeline_spark.operators.mlprep import (
        PACK_BATCH,
        length_bucket_packing,
    )

    rows = length_bucket_packing(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.padded_tokens >= r.real_tokens
        assert 0.0 <= r.pad_overhead < 1.0
        assert r.n_batches == -(-r.n_docs // PACK_BATCH)  # ceil div


def test_negative_sampling_plan_bounds(spark, sf_dir):
    from transit_data_pipeline_spark.operators.textops import (
        NEG_BANDS,
        negative_sampling_plan,
    )

    rows = negative_sampling_plan(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.band <= len(NEG_BANDS)
        assert 0 <= r.n_accepted <= r.n_tokens
        assert abs(r.accept_rate - r.n_accepted / r.n_tokens) < 1e-12
        assert 0.0 < r.min_w <= r.max_w
    # freq^0.75 is monotone in f, so band weight envelopes are ordered.
    rows = sorted(rows, key=lambda r: r.band)
    for prev, cur in zip(rows, rows[1:]):
        assert cur.min_w >= prev.max_w * 0.999


def test_js_divergence_is_symmetric_bounded_and_self_distinct(spark, sf_dir):
    """JS is in [0, ln2 + rounding slack], every unordered source pair
    appears exactly once, and common-term counts are sane."""
    from transit_data_pipeline_spark.operators.curation import (
        js_divergence_sources,
    )

    rows = js_divergence_sources(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert -1e-4 <= r.js_nats <= 0.6932 + 1e-3
        assert r.n_common_terms >= 0
    import math

    n_sources = (1 + math.isqrt(1 + 8 * len(rows))) // 2
    assert len(rows) == n_sources * (n_sources - 1) // 2


def test_token_budget_solver_conserves_budget_and_respects_caps(spark, sf_dir):
    from transit_data_pipeline_spark.operators.curation import (
        MIX_CAP_MILLI,
        token_budget_mix_solver,
    )

    rows = token_budget_mix_solver(spark, sf_dir).collect()
    assert rows
    budget = sum(r.tokens for r in rows)
    allocated = sum(r.alloc_final for r in rows)
    for r in rows:
        assert r.alloc_final <= r.cap_tokens + 1e-6
        assert abs(r.cap_tokens - r.tokens * MIX_CAP_MILLI / 1000.0) < 1e-6
        assert r.epochs_final <= MIX_CAP_MILLI / 1000.0 + 1e-9
        assert abs(r.unallocated_tokens - (budget - allocated)) < 1e-4
    assert allocated <= budget + 1e-6
    # waterfilling only leaves budget on the table if EVERY source is
    # capped after round 2 (refill overflow) — sanity: unallocated is
    # small relative to the budget on this near-uniform corpus.
    assert rows[0].unallocated_tokens < 0.1 * budget


def test_hierarchy_closure_covers_every_customer_once(spark, sf_dir):
    """Pointer-doubling closure: roots are exactly custkeys 0..6,
    subtree sizes partition the customer set, and each root's
    max_depth matches the arithmetic div-7 walk."""
    from transit_data_pipeline_spark.operators.pipelineops import (
        HIER_FANOUT,
        hierarchy_closure_rollup,
    )
    from transit_data_pipeline_spark.catalog import table as _table

    rows = hierarchy_closure_rollup(spark, sf_dir).collect()
    n_customers = _table(spark, sf_dir, "customer").count()
    assert {r.root for r in rows} <= set(range(HIER_FANOUT))
    assert sum(r.subtree_size for r in rows) == n_customers

    def walk(k):
        d = 0
        while k >= HIER_FANOUT:
            k //= HIER_FANOUT
            d += 1
        return k, d

    by_root = {}
    for k in range(n_customers):
        root, d = walk(k)
        by_root.setdefault(root, [0, 0])
        by_root[root][0] += 1
        by_root[root][1] = max(by_root[root][1], d)
    for r in rows:
        assert by_root[r.root][0] == r.subtree_size
        assert by_root[r.root][1] == r.max_depth


def test_event_pattern_automaton_matches_python_dfa(spark, sf_dir):
    """The distributed DFA fold agrees with a serial Python automaton
    over the raw events, and the share/total bookkeeping is exact."""
    from transit_data_pipeline_spark.operators.events import (
        event_pattern_automaton,
    )
    from transit_data_pipeline_spark.catalog import table as _table

    rows = event_pattern_automaton(spark, sf_dir).collect()
    total_users = sum(r.n_users for r in rows)
    assert all(abs(r.user_share - r.n_users / total_users) < 1e-12 for r in rows)
    assert rows[0].total_matches == sum(r.n_matches * r.n_users for r in rows)

    ev = (
        _table(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_time", "event_type")
        .collect()
    )
    per_user = {}
    for r in sorted(ev, key=lambda r: (r.event_time, r.event_id)):
        per_user.setdefault(r.user_id, []).append(r.event_type)
    dist = {}
    for types in per_user.values():
        state = cnt = 0
        for t in types:
            if t == "error":
                state = 0
            elif t == "view":
                state = max(state, 1)
            elif t == "click":
                state = 2 if state >= 1 else 0
            elif t == "purchase":
                if state == 2:
                    cnt += 1
                state = 0
        dist[cnt] = dist.get(cnt, 0) + 1
    assert {r.n_matches: r.n_users for r in rows} == dist


def test_gap_fill_linear_interp_brackets_and_exact_on_observed(spark, sf_dir):
    from transit_data_pipeline_spark.operators.timeseries import (
        _daily,
        gap_fill_linear_interp,
    )

    rows = gap_fill_linear_interp(spark, sf_dir).collect()
    assert rows and all(r.y_filled is not None for r in rows)
    observed = {
        (r.o_orderpriority, r.d.isoformat()): r.n_orders
        for r in _daily(spark, sf_dir).select(
            "o_orderpriority", "d", "n_orders"
        ).collect()
    }
    by_prio = {}
    for r in sorted(rows, key=lambda r: (r.o_orderpriority, r.order_day)):
        by_prio.setdefault(r.o_orderpriority, []).append(r)
    for prio, seq in by_prio.items():
        assert not seq[0].is_gap and not seq[-1].is_gap
        for r in seq:
            key = (prio, r.order_day)
            if not r.is_gap:
                assert r.y_filled == observed[key]
            else:
                assert key not in observed
        lo = min(observed[k] for k in observed if k[0] == prio)
        hi = max(observed[k] for k in observed if k[0] == prio)
        for r in seq:
            assert lo - 1e-9 <= r.y_filled <= hi + 1e-9


def test_time_decay_attribution_shares_and_bounds(spark, sf_dir):
    from transit_data_pipeline_spark.operators.events import (
        time_decay_attribution,
    )
    from transit_data_pipeline_spark.catalog import table as _table

    rows = time_decay_attribution(spark, sf_dir).collect()
    assert {r.event_type for r in rows} <= {"view", "click"}
    assert abs(sum(r.credit_share for r in rows) - 1.0) < 1e-12
    n_purchases = (
        _table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .count()
    )
    for r in rows:
        assert r.credited_value > 0
        assert 0 < r.n_conversions_touched <= n_purchases
        assert r.n_touches >= r.n_conversions_touched


def test_topk_two_level_merge_certificate_is_sound(spark, sf_dir):
    """When the certificate says exact, the result IS the true global
    top-k (verified against a full aggregate); ranks and counts are
    properly ordered either way."""
    from pyspark.sql import functions as F
    from transit_data_pipeline_spark.operators.sketches import (
        TOPK_K,
        topk_two_level_merge,
    )
    from transit_data_pipeline_spark.catalog import table as _table

    rows = sorted(topk_two_level_merge(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, TOPK_K + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert prev.global_count >= cur.global_count
    for r in rows:
        assert r.row_provably_top == (r.global_count >= r.unseen_bound)
    if rows[0].topk_provably_exact:
        truth = (
            _table(spark, sf_dir, "documents")
            .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("term"))
            .groupBy("term")
            .count()
            .orderBy(F.col("count").desc(), "term")
            .limit(TOPK_K)
            .collect()
        )
        assert [(r.term, r.global_count) for r in rows] == [
            (t.term, t["count"]) for t in truth
        ]


def test_ridge_closed_form_matches_numpy_solve(spark, sf_dir):
    """Cramer's-rule coefficients agree with numpy solving the same
    ridge normal equations built from the raw rows."""
    import numpy as np
    from transit_data_pipeline_spark.operators.mlops import (
        RIDGE_LAMBDA,
        ridge_regression_closed_form,
    )
    from transit_data_pipeline_spark.catalog import table as _table

    row = ridge_regression_closed_form(spark, sf_dir).collect()[0]
    li = (
        _table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    X = np.array([[r.l_quantity, r.l_discount, 1.0] for r in li])
    y = np.array([r.l_extendedprice for r in li])
    A = X.T @ X + RIDGE_LAMBDA * np.eye(3)
    w = np.linalg.solve(A, X.T @ y)
    assert row.n_rows == len(li)
    assert abs(row.w_qty - w[0]) < 1e-6 * max(1, abs(w[0]))
    assert abs(row.w_disc - w[1]) < 1e-4 * max(1, abs(w[1]))
    assert abs(row.w_0 - w[2]) < 1e-6 * max(1, abs(w[2]))
    assert 0.0 < row.r_squared <= 1.0


def test_jl_projection_distortion_is_centred(spark, sf_dir):
    """±1 JL: per-pair ratios straddle 1, the aggregate distortion is
    inside the per-pair envelope and near 1 (k=16 gives loose but
    real concentration)."""
    from transit_data_pipeline_spark.operators.similarity import (
        JL_K,
        JL_SIGNS,
        jl_random_projection,
    )

    assert len(JL_SIGNS) == JL_K and all(len(r) == 64 for r in JL_SIGNS)
    assert all(s in (-1, 1) for r in JL_SIGNS for s in r)
    row = jl_random_projection(spark, sf_dir).collect()[0]
    assert row.n_pairs > 0
    assert 0.0 <= row.min_ratio <= row.agg_distortion <= row.max_ratio
    assert 0.4 < row.agg_distortion < 1.6
    assert 0.0 <= row.frac_within_50 <= 1.0


def test_decision_stump_gain_bookkeeping(spark, sf_dir):
    from transit_data_pipeline_spark.operators.mlops import (
        decision_stump_gain,
    )

    rows = decision_stump_gain(spark, sf_dir).collect()
    assert rows
    assert sum(1 for r in rows if r.is_best) == 1
    best = max(r.info_gain for r in rows)
    assert any(r.is_best and r.info_gain == best for r in rows)
    n_all = rows[0].n_left + rows[0].n_right
    pos_all = rows[0].pos_left + rows[0].pos_right
    for r in rows:
        assert r.n_left + r.n_right == n_all
        assert r.pos_left + r.pos_right == pos_all
        assert 0 < r.n_left < n_all
        assert r.info_gain > -1e-3  # exact-math IG ≥ 0; ln rounded at 4dp


def test_shapley_attribution_efficiency_axiom(spark, sf_dir):
    from transit_data_pipeline_spark.operators.events import (
        shapley_channel_attribution,
    )

    rows = shapley_channel_attribution(spark, sf_dir).collect()
    assert {r.channel for r in rows} == {"view", "click", "signup"}
    assert abs(sum(r.phi_share for r in rows) - 1.0) < 1e-9
    for r in rows:
        # v is monotone (subset-sum of non-negative cents), so every
        # marginal contribution — hence every φ — is non-negative.
        assert r.phi_value >= 0
        assert -1e-12 <= r.phi_share <= 1 + 1e-12


def test_pmi_collocations_ranked_and_consistent(spark, sf_dir):
    """Top-k is rank-ordered by (pmi desc, a, b), counts respect the
    min-count floor, and PMI matches a direct recomputation from raw
    token streams."""
    import math
    from pyspark.sql import functions as F
    from transit_data_pipeline_spark.operators.textops import (
        PMI_MIN_COUNT,
        PMI_TOP_K,
        pmi_collocations,
        tokens_col,
    )
    from transit_data_pipeline_spark.catalog import table as _table

    rows = sorted(pmi_collocations(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert 0 < len(rows) <= PMI_TOP_K
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert (
            prev.pmi > cur.pmi
            or (prev.pmi == cur.pmi and (prev.term_a, prev.term_b) < (cur.term_a, cur.term_b))
        )
    docs = _table(spark, sf_dir, "documents").select(
        tokens_col().alias("w")
    ).collect()
    uni, big = {}, {}
    for d in docs:
        w = d.w
        for t in w:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(w, w[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n, m = sum(uni.values()), sum(big.values())
    for r in rows:
        c_ab = big[(r.term_a, r.term_b)]
        assert c_ab == r.n_bigram >= PMI_MIN_COUNT
        expect = round(
            math.log(c_ab * n * n / (m * uni[r.term_a] * uni[r.term_b])), 4
        )
        assert abs(r.pmi - expect) < 5e-4


def test_cdc_apply_conserves_rowcounts(spark, sf_dir):
    """Merged rowcount = base − applied deletes + inserts; tallies are
    identical on every row."""
    from transit_data_pipeline_spark.operators.pipelineops import (
        cdc_apply_changes,
    )
    from transit_data_pipeline_spark.catalog import table as _table

    rows = cdc_apply_changes(spark, sf_dir).collect()
    assert rows
    tallies = {(r.n_inserted, r.n_updated, r.n_deleted) for r in rows}
    assert len(tallies) == 1
    n_ins, n_upd, n_del = tallies.pop()
    o = _table(spark, sf_dir, "orders").select("o_orderkey").collect()
    keys = [r.o_orderkey for r in o]
    base = [k for k in keys if k % 10 != 0]
    assert n_ins == sum(1 for k in keys if k % 10 == 0)
    assert n_del == sum(1 for k in base if k % 13 == 0)
    assert n_upd == sum(1 for k in base if k % 13 != 0 and k % 7 == 0)
    assert sum(r.n_rows for r in rows) == len(base) - n_del + n_ins


def test_bitmap_intersection_equals_direct_scan(spark, sf_dir):
    from transit_data_pipeline_spark.operators.sources import (
        bitmap_index_intersect,
    )

    row = bitmap_index_intersect(spark, sf_dir).collect()[0]
    assert row.bitmap_agrees
    assert row.matched_via_bitmap == row.matched_direct
    assert row.n_shared_words <= min(row.n_words_status, row.n_words_priority)


def test_dp_quantile_utility_accounting(spark, sf_dir):
    from transit_data_pipeline_spark.operators.curation import (
        DPQ_BINS,
        dp_quantile_exponential,
    )

    row = dp_quantile_exponential(spark, sf_dir).collect()[0]
    assert 0 <= row.chosen_bin < DPQ_BINS
    assert row.utility_loss2 == row.chosen_err2 - row.best_err2 >= 0
    assert row.best_err2 >= 0


def test_holm_stepdown_never_rejects_more_than_naive(spark, sf_dir):
    """Holm is uniformly more conservative than per-test α; the
    step-down property holds (a non-rejected rank blocks all later
    ones) and critical values shrink with rank."""
    from transit_data_pipeline_spark.operators.statsaudit import (
        holm_stepdown_ab_tests,
    )

    rows = sorted(
        holm_stepdown_ab_tests(spark, sf_dir).collect(),
        key=lambda r: r.abs_rank,
    )
    assert rows
    for r in rows:
        assert not (r.reject_holm and not r.reject_naive)
        assert r.n_a >= 2 and r.n_b >= 2
    for prev, cur in zip(rows, rows[1:]):
        assert abs(prev.z) >= abs(cur.z)
        assert prev.crit >= cur.crit  # fewer remaining tests → smaller crit
        assert not (cur.reject_holm and not prev.reject_holm)


def test_bh_stepup_dominates_holm(spark, sf_dir):
    """BH (FDR) rejects a SUPERSET of Holm (FWER) on the same z table
    — the textbook dominance relation — and the step-up property
    holds: every rank up to the largest passing one is rejected."""
    from transit_data_pipeline_spark.operators.statsaudit import (
        bh_fdr_control,
        holm_stepdown_ab_tests,
    )

    bh = {r.nation: r for r in bh_fdr_control(spark, sf_dir).collect()}
    holm = {
        r.nation: r for r in holm_stepdown_ab_tests(spark, sf_dir).collect()
    }
    assert set(bh) == set(holm) and bh
    for nation, h in holm.items():
        if h.reject_holm:
            assert bh[nation].reject_bh, f"Holm rejected {nation}, BH did not"
    rows = sorted(bh.values(), key=lambda r: r.abs_rank)
    rejected = [r.reject_bh for r in rows]
    if any(rejected):
        k_star = max(i for i, x in enumerate(rejected) if x)
        assert all(rejected[: k_star + 1]), "step-up must reject a prefix"


def test_bfs_hops_triangle_consistency(spark, sf_dir):
    """BFS distances: source is 0; every reachable node's hop count is
    positive and within the bound; reachability flag is consistent."""
    from transit_data_pipeline_spark.operators.graphops import (
        _BFS_HOPS,
        bfs_shortest_hops,
    )

    rows = bfs_shortest_hops(spark, sf_dir).collect()
    by_key = {r.nationkey: r for r in rows}
    assert by_key[0].hops == 0
    for r in rows:
        assert r.reachable == (r.hops is not None)
        if r.hops is not None:
            assert 0 <= r.hops <= _BFS_HOPS


def test_kcore_membership_is_internally_consistent(spark, sf_dir):
    """Every in-core node has in-core degree >= k; initial degree
    bounds the in-core degree."""
    from transit_data_pipeline_spark.operators.graphops import (
        _CORE_K,
        kcore_trade_graph,
    )

    rows = kcore_trade_graph(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.in_core:
            assert r.degree_in_core >= _CORE_K
            assert r.degree_in_core <= r.degree_initial
        else:
            assert r.degree_in_core is None


def test_ddsketch_within_relative_error(spark, sf_dir):
    """The DDSketch estimate respects the α relative-error guarantee
    (with rank-rounding slack ≤ 2α) against the exact percentile."""
    from transit_data_pipeline_spark.operators.sketches import (
        _DD_ALPHA,
        sketch_ddsketch_quantiles,
    )

    rows = sketch_ddsketch_quantiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.rel_err <= 2 * _DD_ALPHA, r


def test_permutation_test_pvalue_bounds(spark, sf_dir):
    """Add-one permutation p-value is inside ((0, 1]]; extreme count
    is bounded by the replica count."""
    from transit_data_pipeline_spark.operators.statsaudit import (
        _PERM_REPS,
        permutation_test_means,
    )

    r = permutation_test_means(spark, sf_dir).collect()[0]
    assert 0 <= r.n_extreme <= _PERM_REPS
    assert 0.0 < r.p_value <= 1.0
    assert r.reject_05 == (r.p_value < 0.05)


def test_lttb_keeps_anchors_and_one_point_per_bucket(spark, sf_dir):
    """LTOB emits exactly one point per non-empty bucket and always
    keeps both series endpoints (bucket 0 and B+1)."""
    from transit_data_pipeline_spark.operators.timeseries import (
        _LTOB_BUCKETS,
        downsample_lttb,
    )

    rows = downsample_lttb(spark, sf_dir).collect()
    buckets = [r.bucket for r in rows]
    assert len(buckets) == len(set(buckets))
    assert 0 in buckets and (_LTOB_BUCKETS + 1) in buckets
    assert all(0 <= b <= _LTOB_BUCKETS + 1 for b in buckets)


def test_sorted_neighborhood_flags_exact_duplicates(spark, sf_dir):
    """Identical documents share a normalized key, land adjacent in
    rank order, and must verify as duplicates with Jaccard 1.0."""
    from pyspark.sql import functions as F

    from transit_data_pipeline_spark.operators.dedup import (
        dedup_sorted_neighborhood,
    )
    from transit_data_pipeline_spark.catalog import table

    d = table(spark, sf_dir, "documents")
    dup_groups = (
        d.groupBy("text").count().filter(F.col("count") >= 2).count()
    )
    pairs = dedup_sorted_neighborhood(spark, sf_dir)
    perfect = pairs.filter(
        (F.col("jaccard") == 1.0) & F.col("is_dup")
    ).count()
    if dup_groups > 0:
        assert perfect > 0
    for r in pairs.filter(F.col("jaccard").isNotNull()).collect():
        assert 0.0 <= r.jaccard <= 1.0
        assert r.is_dup == (r.jaccard >= 0.5)


def test_mann_kendall_detects_monotone_trend(spark, sf_dir):
    """Sanity on the statistic itself, two ways: (a) a strictly
    increasing synthetic series through the operator's own arithmetic
    (_mann_kendall_from_daily) must give S = n(n-1)/2, zero tied
    groups, and verdict 'increasing'; (b) fixture output obeys the
    |S| bound, positive variance, and z-sign/verdict consistency."""
    import datetime as _dt

    from transit_data_pipeline_spark.operators.timeseries import (
        _mann_kendall_from_daily,
        mann_kendall_trend,
    )

    n = 30
    synth = spark.createDataFrame(
        [
            ("SYNTH", _dt.date(2024, 1, 1) + _dt.timedelta(days=i), i + 1)
            for i in range(n)
        ],
        "o_orderpriority string, d date, n_orders int",
    )
    (row,) = _mann_kendall_from_daily(synth).collect()
    assert row.s_stat == n * (n - 1) // 2
    assert row.n_tied_groups == 0
    assert row.trend == "increasing"
    assert row.z > 0

    rows = mann_kendall_trend(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.s_stat) <= r.n_days * (r.n_days - 1) // 2
        assert r.var_s > 0
        if r.trend == "increasing":
            assert r.z > 0
        if r.trend == "decreasing":
            assert r.z < 0


def test_survivorship_field_rules(spark, sf_dir):
    """Canonical id is the min member id; the longest representative's
    length bounds every member; modal support <= cluster size."""
    from transit_data_pipeline_spark.operators.curation import (
        survivorship_merge,
    )

    rows = survivorship_merge(spark, sf_dir).collect()
    for r in rows:
        assert r.n_members >= 2
        assert r.canonical_doc_id <= r.longest_doc_id
        assert 1 <= r.lang_support <= r.n_members
        assert 1 <= r.n_distinct_langs <= r.n_members


def test_kneser_ney_probability_bounds(spark, sf_dir):
    """KN probabilities are in (0, 1]; the discounted MLE term never
    exceeds raw MLE; continuation counts are positive."""
    from transit_data_pipeline_spark.operators.textops import (
        text_kneser_ney_bigram,
    )

    rows = text_kneser_ney_bigram(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.p_kn <= 1.0
        assert 0.0 < r.p_mle <= 1.0
        assert r.n_cont_fw >= 1 and r.n_cont_bw >= 1
        assert r.c12 <= r.c1


def test_wilson_interval_brackets_rate(spark, sf_dir):
    """Wilson bounds bracket the point rate and stay inside [0, 1]."""
    from transit_data_pipeline_spark.operators.statsaudit import (
        wilson_ci_conversion,
    )

    rows = wilson_ci_conversion(spark, sf_dir).collect()
    assert rows
    eps = 1e-12  # at p = 1 the closed form is exactly 1 but FP gives 1-1ulp
    for r in rows:
        assert -eps <= r.wilson_lo <= r.rate + eps
        assert r.rate - eps <= r.wilson_hi <= 1.0 + eps


def test_dynamic_session_windows_are_disjoint_per_user(spark, sf_dir):
    """Sessions never overlap within a user and every session has
    end > start (gap-extended)."""
    from transit_data_pipeline_spark.operators.events import (
        session_window_dynamic_gap,
    )

    rows = session_window_dynamic_gap(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        assert r.session_end > r.session_start
        by_user.setdefault(r.user_id, []).append(
            (r.session_start, r.session_end)
        )
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 >= e1, "sessions overlap"


def test_rolling_kmv_tracks_exact_within_tolerance(spark, sf_dir):
    """KMV k=32 has ~1/sqrt(k) ≈ 18% relative error; assert a loose
    3-sigma band (or exact equality on the small-cardinality branch)."""
    from transit_data_pipeline_spark.operators.sketches import (
        _RKMV_K,
        sketch_kmv_rolling_distinct,
    )

    rows = sketch_kmv_rolling_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.exact_users_7d < _RKMV_K:
            assert r.kmv_estimate == float(r.exact_users_7d)
        else:
            assert (
                abs(r.kmv_estimate - r.exact_users_7d) / r.exact_users_7d
                <= 0.6
            ), r


def test_recursive_cte_equals_pointer_doubling(spark, sf_dir):
    """The native WITH RECURSIVE hierarchy resolution and the
    pointer-doubling implementation are the same operator — their
    results must be identical row for row."""
    from transit_data_pipeline_spark.operators.pipelineops import (
        hierarchy_closure_rollup,
        recursive_cte_hierarchy,
    )

    a = {
        r.root: (r.subtree_size, r.subtree_balance, r.max_depth)
        for r in hierarchy_closure_rollup(spark, sf_dir).collect()
    }
    b = {
        r.root: (r.subtree_size, r.subtree_balance, r.max_depth)
        for r in recursive_cte_hierarchy(spark, sf_dir).collect()
    }
    assert a == b and a


def test_scripting_pow2_cap_is_tight(spark, sf_dir):
    """The WHILE loop's cap is the smallest power of two strictly
    above the max price."""
    from transit_data_pipeline_spark.catalog import table
    from transit_data_pipeline_spark.operators.pipelineops import (
        sql_scripting_batch,
    )
    from pyspark.sql import functions as F

    rows = sql_scripting_batch(spark, sf_dir).collect()
    cap = rows[0].pow2_cap
    assert cap & (cap - 1) == 0, "not a power of two"
    mx = (
        table(spark, sf_dir, "orders")
        .agg(F.max("o_totalprice"))
        .first()[0]
    )
    assert cap > mx >= cap / 2


def test_binary_quantization_recall_bounds(spark, sf_dir):
    from transit_data_pipeline_spark.operators.similarity import (
        _K_EVAL,
        embedding_binary_quantization,
    )

    rows = embedding_binary_quantization(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_bq == _K_EVAL
        assert 0 <= r.best_hamming <= 64
        assert 0.0 <= r.recall_at_5 <= 1.0
        assert r.n_overlap <= _K_EVAL


def test_retention_drop_keeps_only_recent_months(spark, sf_dir):
    from transit_data_pipeline_spark.operators.sources import (
        partition_retention_drop,
    )

    rows = partition_retention_drop(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.month >= "1997-01-01"


def test_stickiness_is_a_proper_ratio(spark, sf_dir):
    """avg DAU can never exceed WAU (daily distinct ⊆ weekly
    distinct), so stickiness is in (0, 1]."""
    from transit_data_pipeline_spark.operators.events import (
        dau_wau_stickiness,
    )

    rows = dau_wau_stickiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_days <= 7
        assert r.avg_dau <= r.wau + 1e-9
        assert 0.0 < r.stickiness <= 1.0 + 1e-9


def test_span_corruption_spans_never_overlap(spark, sf_dir):
    from transit_data_pipeline_spark.operators.mlprep import (
        span_corruption_plan,
    )

    rows = span_corruption_plan(spark, sf_dir).collect()
    by_doc: dict = {}
    for r in rows:
        assert 0 <= r.span_start
        assert r.span_start + r.span_len <= r.n_tokens
        by_doc.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_start + r.span_len)
        )
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 >= e1, "spans overlap"


def test_two_phase_rank_branch_consistency_at_scale(spark):
    """Regression for the r7 ×64 finding: the local-window branch and
    the summary branch of two_phase_rank each consume the range
    exchange through DIFFERENTLY-PRUNED subtrees, so ReuseExchange
    cannot dedupe them, and RangePartitioner seeds its boundary
    sampling with the RDD id — two executions can pick different
    boundaries. At fixture scale the sampler sees ~the whole input and
    the bug never fires; at 320K rows with 64-way duplicate key ties
    it produced duplicate and out-of-range global ranks (NTILE buckets
    off by hundreds, sometimes an 11th bucket). The lazy
    localCheckpoint of the partitioned frame pins one physical
    assignment; this test replays the failing shape: heavy-tie sort
    key, an extra payload column (so the branches prune differently),
    and an NTILE aggregation — rank must be a permutation and every
    tile exactly n/10, across repeated executions."""
    from transit_data_pipeline_spark.functions.ranking import (
        ntile_from_rank,
        two_phase_rank,
    )

    n = 320_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # 5000 distinct scores × 64 copies each — the ×64-corpus tie
        # profile that exposed the divergence.
        (F.col("id") % 5000).cast("double").alias("q"),
        (F.col("id") % 7 == 0).alias("keep"),  # payload → branch pruning differs
    )
    r = two_phase_rank(df, ("q", "doc_id"), rank_col="_rn", n_col="_nd")
    dec = r.withColumn("decile", ntile_from_rank(F.col("_rn"), F.col("_nd"), 10))
    for trial in range(2):
        got = {
            row["decile"]: row["n"]
            for row in dec.groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == {i: n // 10 for i in range(1, 11)}, (trial, got)
        stats = r.agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("_rn").alias("d"),
            F.max("_rn").alias("mx"),
        ).collect()[0]
        assert (stats["rows"], stats["d"], stats["mx"]) == (n, n, n), (
            trial,
            stats,
        )


def test_two_phase_rank_matches_serial_window(spark):
    """functions/ranking.two_phase_rank must be value-identical to the
    serial single-partition window under a total order — global
    row_number, running decimal sum, grand total, and grand count —
    including heavy ties on the primary sort key spread across many
    range partitions."""
    import random
    from decimal import Decimal

    from pyspark.sql.window import Window as W

    from transit_data_pipeline_spark.functions.ranking import (
        two_phase_rank,
    )

    rnd = random.Random(20260815)
    rows = [
        (i, rnd.randrange(20), Decimal(rnd.randrange(1, 100000)) / 100)
        for i in range(2000)
    ]
    df = spark.createDataFrame(
        rows, "id long, k int, v decimal(18,4)"
    ).repartition(16)
    order = (F.col("k").desc(), "id")

    got = {
        r["id"]: r
        for r in two_phase_rank(
            df,
            order,
            partitions=8,
            rank_col="rn",
            cum={"cv": F.col("v")},
            totals={"tv": F.col("v")},
            n_col="nn",
        ).collect()
    }
    w = W.orderBy(*order)
    exp = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.sum("v")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cv"),
    ).collect()
    total = sum(v for _, _, v in rows)
    assert len(got) == len(exp) == 2000
    for e in exp:
        g = got[e["id"]]
        assert g["rn"] == e["rn"]
        assert g["cv"] == e["cv"]
        assert g["tv"] == total
        assert g["nn"] == 2000


def test_sorted_neighbors_matches_serial_lead(spark):
    """functions/ranking.sorted_neighbors must reproduce the serial
    LEAD(1..w) pair set exactly — including pairs that straddle range-
    partition boundaries (the ghost-row overlap) and heavy key ties."""
    import random

    from pyspark.sql.window import Window as W

    from transit_data_pipeline_spark.functions.ranking import (
        sorted_neighbors,
    )

    rnd = random.Random(20260815)
    width = 5
    rows = [(i, f"k{rnd.randrange(40):02d}") for i in range(1500)]
    # Adversarial duplicate-heavy tail (the ADVICE r6 scenario): one
    # dense key absorbs most rows, so sampled range boundaries leave
    # 1-2-row partitions whose cross-boundary neighbors a single-
    # boundary ghost overlap would silently drop. The multi-boundary
    # ghosting must still reproduce the serial pair set exactly.
    dense = [(10_000 + i, "kDD") for i in range(1400)]
    sparse = [(20_000 + i, f"z{i:04d}") for i in range(40)]
    for case_rows, parts in [
        (rows, 64),
        (rows + dense + sparse, 64),
        (rows, 7),
        (rows + dense + sparse, 256),
    ]:
        df = spark.createDataFrame(
            case_rows, "id long, k string"
        ).repartition(16)
        order = ("k", "id")

        frame, is_real, w = sorted_neighbors(
            df, order, width, partitions=parts
        )
        leads = F.array(
            *[F.lead("id", o).over(w) for o in range(1, width + 1)]
        )
        got = sorted(
            (r["id"], tuple(r["nbrs"]))
            for r in frame.select(
                "id", leads.alias("nbrs"), is_real.alias("ok")
            )
            .filter("ok")
            .collect()
        )

        sw = W.orderBy(*order)
        sleads = F.array(
            *[F.lead("id", o).over(sw) for o in range(1, width + 1)]
        )
        exp = sorted(
            (r["id"], tuple(r["nbrs"]))
            for r in df.select("id", sleads.alias("nbrs")).collect()
        )
        assert len(got) == len(exp) == len(case_rows)
        assert got == exp, f"parts={parts} n={len(case_rows)}"


def test_ntile_from_rank_matches_native_ntile(spark):
    """functions/ranking.ntile_from_rank must equal Spark's NTILE(n)
    for every n across uneven splits — including total < n (every row
    its own tile) and total % n != 0 (first r tiles one row deeper)."""
    from pyspark.sql.window import Window as W

    from transit_data_pipeline_spark.functions.ranking import (
        ntile_from_rank,
    )

    for total, n in [(97, 10), (10, 10), (7, 10), (1, 4), (100, 7), (23, 4)]:
        df = spark.range(1, total + 1).select(F.col("id").alias("k"))
        w = W.orderBy("k")
        cmp = df.select(
            "k",
            F.ntile(n).over(w).alias("native"),
            ntile_from_rank(
                F.row_number().over(w), F.lit(total).cast("long"), n
            ).alias("rebuilt"),
        )
        bad = cmp.filter(F.col("native") != F.col("rebuilt")).count()
        assert bad == 0, (total, n)

    # Integer-exactness near 2^53 (double division would round): check
    # selected ranks of a huge synthetic total against Python's exact
    # integer formula — no native NTILE reference possible at this
    # scale, the formula IS the spec.
    total = (1 << 53) + 12345
    n = 7
    q, r = divmod(total, n)

    def py_ntile(rank: int) -> int:
        big = r * (q + 1)
        if rank <= big:
            return (rank - 1) // (q + 1) + 1
        return r + (rank - big - 1) // q + 1

    probe_ranks = [
        1,
        q + 1,
        q + 2,
        r * (q + 1),
        r * (q + 1) + 1,
        total - 1,
        total,
    ]
    probe = spark.createDataFrame(
        [(rk,) for rk in probe_ranks], "rank long"
    ).select(
        "rank",
        ntile_from_rank(
            F.col("rank"), F.lit(total).cast("long"), n
        ).alias("tile"),
    )
    got = {r2["rank"]: r2["tile"] for r2 in probe.collect()}
    for rk in probe_ranks:
        assert got[rk] == py_ntile(rk), (rk, got[rk], py_ntile(rk))


def test_pid_prefix_offsets_exclusive_counts(spark):
    """pid_prefix_offsets: off = rows in all earlier partitions,
    n_total = grand count — with gaps in the pid domain (empty range
    partitions drop out of the summary)."""
    from transit_data_pipeline_spark.functions.ranking import (
        pid_prefix_offsets,
    )

    counts = spark.createDataFrame(
        [(0, 5), (2, 3), (5, 7), (6, 1)], "pid int, cnt long"
    )
    rows = {r["pid"]: r for r in pid_prefix_offsets(counts).collect()}
    assert rows[0]["off"] == 0 and rows[2]["off"] == 5
    assert rows[5]["off"] == 8 and rows[6]["off"] == 15
    assert all(r["n_total"] == 16 for r in rows.values())


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # event_type id
            # seconds clustered around hour boundaries so bucket-edge
            # cases (off == 0, off == 3599, t-3599 in an empty bucket)
            # are common, plus dense ties on identical seconds
            st.integers(min_value=0, max_value=5) ,
            st.integers(min_value=-2, max_value=2),
            # NULL-valued rows (ADVICE r8): the frame SUM must stay
            # NULL when every value in the trailing window is NULL —
            # including the case where the previous bucket's suffix is
            # all-NULL while its excluded prefix held non-null values.
            st.booleans(),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_rolling_hour_two_pass_matches_sliding_frame(spark, rows):
    """The bucketed two-pass decomposition (events.py: own-bucket
    prefix + previous-bucket suffix via ghost probes) must equal
    Spark's own declarative sliding RANGE frame on arbitrary data —
    including hour-boundary offsets, per-second ties, and empty
    previous buckets."""
    from pyspark.sql.window import Window

    data = [
        (
            i,  # event_id — every row sampled (id % 20 hits row 0 etc.)
            f"t{t}",
            # hours 0-5 with offsets hugging the bucket edges
            h * 3600 + {-2: 0, -1: 1, 0: 1799, 1: 3598, 2: 3599}[o],
            None if isnull else float(i % 7) / 4.0,
        )
        for i, (t, h, o, isnull) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, event_type string, sec long, value double"
    )
    # Reference: the declarative sliding frame (correct by definition,
    # quadratic at scale — which is why the operator decomposes it).
    w = Window.partitionBy("event_type").orderBy("sec").rangeBetween(-3599, 0)
    want = {
        r["event_id"]: (r["n"], r["v"])
        for r in df.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum(F.col("value").cast(N.DEC)).over(w).cast("double").alias("v"),
        ).collect()
    }
    # The decomposition is inlined here, mirroring
    # events.events_rolling_hour_range exactly but sampling EVERY row
    # (the operator's %20 output filter is orthogonal to the window
    # arithmetic under test, and the operator itself reads parquet).
    ev = df.select(
        "event_id",
        "event_type",
        "value",
        "sec",
        (F.col("sec") - F.col("sec") % 3600).alias("hr"),
        (F.col("sec") % 3600).alias("off"),
    )
    real = ev.select(
        "event_id", "event_type", "sec", "hr",
        (F.col("off") * 2).alias("k"),
        F.lit(1).alias("w_n"),
        F.col("value").cast(N.DEC).alias("w_v"),
        F.col("value").isNotNull().cast("int").alias("w_nn"),
        F.lit(False).alias("is_ghost"),
    )
    ghosts = ev.select(
        "event_id", "event_type", "sec",
        (F.col("hr") - 3600).alias("hr"),
        (F.col("off") * 2 + 1).alias("k"),
        F.lit(0).alias("w_n"),
        F.lit(None).cast(N.DEC).alias("w_v"),
        F.lit(0).alias("w_nn"),
        F.lit(True).alias("is_ghost"),
    )
    wcum = (
        Window.partitionBy("event_type", "hr")
        .orderBy("k")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("event_type", "hr")
    cum = real.unionByName(ghosts).select(
        "event_id", "is_ghost",
        F.sum("w_n").over(wcum).alias("pre_n"),
        F.sum("w_v").over(wcum).alias("pre_v"),
        F.sum("w_nn").over(wcum).alias("pre_nn"),
        F.sum("w_n").over(wtot).alias("tot_n"),
        F.sum("w_v").over(wtot).alias("tot_v"),
        F.sum("w_nn").over(wtot).alias("tot_nn"),
    )
    own = cum.filter(~F.col("is_ghost")).select(
        "event_id",
        F.col("pre_n").alias("own_n"), F.col("pre_v").alias("own_v"),
    )
    zero = F.lit(0).cast(N.DEC)
    rem = cum.filter(F.col("is_ghost")).select(
        "event_id",
        (F.col("tot_n") - F.col("pre_n")).alias("rem_n"),
        F.when(
            F.col("tot_nn") - F.col("pre_nn") == 0, F.lit(None).cast(N.DEC)
        )
        .otherwise(F.col("tot_v") - F.coalesce(F.col("pre_v"), zero))
        .alias("rem_v"),
    )
    got = {
        r["event_id"]: (r["n"], r["v"])
        for r in own.join(rem, "event_id").select(
            "event_id",
            (F.col("own_n") + F.col("rem_n")).alias("n"),
            F.when(
                F.col("own_v").isNull() & F.col("rem_v").isNull(),
                F.lit(None).cast(N.DEC),
            )
            .otherwise(
                F.coalesce(F.col("own_v"), zero) + F.coalesce(F.col("rem_v"), zero)
            )
            .cast("double")
            .alias("v"),
        ).collect()
    }
    assert got == want


def test_dravg_half_up_tie_matches_duckdb(spark):
    """dravg: half-up round of the exact mean in integer arithmetic —
    must agree with sql_dravg bitwise INCLUDING at ties, where
    ROUND(double, 4) of the two engines diverges (the ×8 campaign's
    text_bigram_perplexity find: exact mean 3.35795 → Spark 3.3579,
    DuckDB 3.358)."""
    import duckdb

    from transit_data_pipeline_spark.functions import numeric as N

    con = duckdb.connect()
    cases = [
        [3.3579, 3.3580],            # tie from a just-below double
        [-3.3579, -3.3580],          # negative: half away from zero
        [3.3579] * 7 + [3.3580] * 7, # tie at larger n
        [1.0, 1.0, 2.0],             # non-terminating mean
        [0.0001, 0.0002],            # tie at the smallest scale step
        [12345.6789] * 3,            # exact mean, no rounding motion
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = df.agg(N.dravg("x").alias("r")).first()["r"]
        lst = ",".join(f"({v!r})" for v in vals)
        want = con.execute(
            f"SELECT {N.sql_dravg('x')} AS r FROM (VALUES {lst}) t(x)"
        ).fetchone()[0]
        assert got == want, (vals, got, want)
    # the literal tie from the campaign
    tie = spark.createDataFrame([(3.3579,), (3.3580,)], "x double")
    assert tie.agg(N.dravg("x")).first()[0] == 3.358


@settings(**_SETTINGS)
@given(
    st.lists(
        # 4-decimal-quantized values (the DEC grid) spanning sign and
        # magnitude, biased so sums frequently land on round ties
        st.integers(min_value=-10_000_000, max_value=10_000_000),
        min_size=1,
        max_size=25,
    )
)
def test_dravg_matches_duckdb_on_arbitrary_decimal_grids(spark, units):
    """Property form of the tie test: for ANY 4dp-quantized inputs the
    Spark dravg and DuckDB sql_dravg doubles are identical (the engine
    pair disagrees on ROUND(double,4) ties; dravg must not)."""
    import duckdb

    from transit_data_pipeline_spark.functions import numeric as N

    vals = [u / 10_000.0 for u in units]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(N.dravg("x").alias("r")).first()["r"]
    lst = ",".join(f"({v!r})" for v in vals)
    con = duckdb.connect()
    want = con.execute(
        f"SELECT {N.sql_dravg('x')} AS r FROM (VALUES {lst}) t(x)"
    ).fetchone()[0]
    con.close()
    assert got == want, (vals, got, want)

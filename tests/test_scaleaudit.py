"""Round-5 session-3 additions: the scale-audit trio (key skew, output
file planning, IVF cell balance), A-ES weighted sampling, and the
BM25 retrieval-quality eval. Invariant tests; DuckDB value parity is
covered by the correctness gate (tools/check_correctness.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from capstone_etl_spark.operators.doc_similarity import BM25_QUERIES, BM25_TOP_K, retrieval_mrr
from capstone_etl_spark.operators.sampling import WEIGHTED_K, weighted_sample
from capstone_etl_spark.operators.scaleaudit import (
    FILE_TARGET_BYTES,
    KEYSPACES,
    ivf_cell_balance,
    key_skew_audit,
    output_file_plan,
)
from capstone_etl_spark.sources.tables import load_table

SF_001 = "/root/testdata/sf0.01"


def test_key_skew_audit_invariants(spark, sf_dir):
    rows = {r.keyspace: r for r in key_skew_audit(spark, sf_dir).collect()}
    assert set(rows) == {name for name, _, _ in KEYSPACES}
    for r in rows.values():
        assert 1 <= r.n_keys <= r.n_rows
        assert 1 <= r.max_cnt <= r.n_rows
        assert r.hot_key is not None
        # max/avg is >= 1 by definition, and max_cnt/n_rows bounds it
        assert r.skew_ratio >= 1.0 - 1e-9
        assert r.skew_ratio <= r.max_cnt + 1e-9


def test_key_skew_hot_key_is_argmax(spark, sf_dir):
    """The reported hot key must actually own max_cnt rows."""
    audit = {r.keyspace: r for r in key_skew_audit(spark, sf_dir).collect()}
    for name, table, col in KEYSPACES:
        r = audit[name]
        got = (
            load_table(spark, sf_dir, table)
            .filter(F.col(col).cast("long") == r.hot_key)
            .count()
        )
        assert got == r.max_cnt


def test_output_file_plan_covers_corpus(spark, sf_dir):
    plan = output_file_plan(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in plan) == docs.count()
    assert sum(r.total_bytes for r in plan) == (
        docs.agg(F.sum("n_chars")).collect()[0][0]
    )
    for r in plan:
        assert r.target_files >= 1
        # files are never smaller than necessary nor docs left unassigned
        assert r.docs_per_file * r.target_files >= r.n_docs
        # a plan never asks for more files than a one-doc-per-file write
        assert r.target_files <= max(
            r.n_docs, r.total_bytes // FILE_TARGET_BYTES + 1
        )


def test_ivf_cell_balance_partitions_corpus(spark, sf_dir):
    cells = ivf_cell_balance(spark, sf_dir).collect()
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.pop for r in cells) == n_vec          # every vector assigned once
    assert all(r.pop >= 1 for r in cells)              # a seed owns at least itself
    assert abs(sum(r.share for r in cells) - 1.0) < 1e-3
    # the scale contract the quantizer fix established (VERDICT r4 #2):
    # no Voronoi cell past 4·√N on the fixture corpus
    assert not any(r.over_cap for r in cells), [r.cell for r in cells if r.over_cap]


def test_weighted_sample_deterministic_and_biased(spark):
    s1 = weighted_sample(spark, SF_001).collect()
    s2 = weighted_sample(spark, SF_001).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    docs = load_table(spark, SF_001, "documents")
    assert len(s1) == min(WEIGHTED_K, docs.count())
    # inclusion probability ∝ n_chars ⇒ the sampled mean length must
    # exceed the corpus mean (deterministic draw — stable assertion)
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = sum(r.n_chars for r in s1) / len(s1)
    assert sample_mean > corpus_mean


def test_weighted_sample_small_corpus_returns_all(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    got = weighted_sample(spark, sf_dir).collect()
    assert len(got) == min(WEIGHTED_K, n)


def test_retrieval_mrr_metric_identities(spark, sf_dir):
    rows = {r.query_id: r for r in retrieval_mrr(spark, sf_dir).collect()}
    assert set(rows) == {qid for qid, _ in BM25_QUERIES}
    for r in rows.values():
        assert 0 <= r.hits_at_k <= min(BM25_TOP_K, max(r.n_rel, 0))
        assert 0 <= r.first_rel_rank <= BM25_TOP_K
        if r.first_rel_rank > 0:
            assert abs(r.rr - round(1.0 / r.first_rel_rank, 6)) < 1e-9
            assert r.hits_at_k >= 1
        else:
            assert r.rr == 0.0 and r.hits_at_k == 0


def test_retrieval_mrr_relevance_is_term_containment(spark, sf_dir):
    """Spot-check: every top-ranked relevant doc really contains all
    query terms as whitespace tokens."""
    from capstone_etl_spark.operators.doc_similarity import bm25_topk

    terms = dict(BM25_QUERIES)
    mrr = {r.query_id: r for r in retrieval_mrr(spark, sf_dir).collect()}
    topk = bm25_topk(spark, sf_dir).collect()
    docs = {
        r.doc_id: set(r.text.split())
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for qid, r in mrr.items():
        if r.first_rel_rank == 0:
            continue
        hit = next(
            t.doc_id for t in topk if t.query_id == qid and t.rnk == r.first_rel_rank
        )
        assert set(terms[qid]) <= docs[hit]


def test_zorder_layout_covers_and_localizes(spark, sf_dir):
    from capstone_etl_spark.operators.scaleaudit import (
        Z_BITS,
        Z_FILES,
        zorder_file_layout,
    )

    rows = zorder_file_layout(spark, sf_dir).collect()
    ev_n = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_rows for r in rows) == ev_n            # every event filed
    assert all(0 <= r.file_id < Z_FILES for r in rows)
    side = 1 << Z_BITS
    for r in rows:
        assert 0 <= r.user_span < side and 0 <= r.day_span < side
    # THE z-order property: each file covers a narrow band of BOTH
    # dimensions simultaneously — a file's z-range of size 2^16/Z_FILES
    # spans at most ~sqrt(range) per dimension (here 32 of 256 values,
    # plus one boundary step).
    max_side = (1 << (2 * Z_BITS)) // Z_FILES
    import math

    bound = 2 * int(math.sqrt(max_side))
    assert all(r.user_span <= bound and r.day_span <= bound for r in rows), [
        (r.file_id, r.user_span, r.day_span) for r in rows
    ]


def test_event_scd_intervals_tile_history(spark, sf_dir):
    """Intervals per user must tile: ordered, non-overlapping,
    valid_to = next valid_from, exactly one open (is_current) interval
    per user, and n_events must sum to the user's event count."""
    from capstone_etl_spark.operators.events import scd_intervals

    per_user: dict[int, list] = {}
    for r in scd_intervals(spark, sf_dir).collect():
        per_user.setdefault(r.user_id, []).append(r)
    ev = load_table(spark, sf_dir, "events")
    counts = {r.user_id: r.cnt for r in ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    assert set(per_user) == set(counts)
    for uid, rs in per_user.items():
        rs.sort(key=lambda r: r.valid_from)
        assert sum(r.n_events for r in rs) == counts[uid]
        assert sum(1 for r in rs if r.is_current) == 1
        assert rs[-1].is_current and rs[-1].valid_to is None
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from            # tiling, no gaps
            # consecutive runs always change type — same-type neighbors
            # would have been one island
            assert a.event_type != b.event_type


def test_zorder_pruning_beats_linear_off_axis(spark, sf_dir):
    """The measured claim: under linear (user, day) sort, day probes
    barely prune (every file spans most days); under z-order BOTH
    dimensions prune, and total touched files drop."""
    from capstone_etl_spark.operators.scaleaudit import zorder_pruning_gain

    rows = {(r.layout, r.probe_dim): r for r in zorder_pruning_gain(spark, sf_dir).collect()}
    assert set(rows) == {("linear", "user"), ("linear", "day"), ("zorder", "user"), ("zorder", "day")}
    for r in rows.values():
        assert 0.0 <= r.prune_fraction <= 1.0
        assert r.files_touched <= r.n_files * r.n_probes
    # z-order's worst dimension must beat linear's worst dimension
    z_worst = min(rows[("zorder", "user")].prune_fraction, rows[("zorder", "day")].prune_fraction)
    lin_worst = min(rows[("linear", "user")].prune_fraction, rows[("linear", "day")].prune_fraction)
    assert z_worst > lin_worst

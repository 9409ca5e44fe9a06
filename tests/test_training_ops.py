"""Round-5 training-pipeline additions: embedding calibration stats /
covariance, skip-gram pair extraction, robust MAD outliers, and the
deterministic training shuffle. Invariant tests; the DuckDB value
parity is covered by the correctness gate (tools/check_correctness.py).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from capstone_etl_spark.operators.quality import MAD_K, MAD_SIGMA, mad_outliers
from capstone_etl_spark.operators.sampling import N_SHARDS, training_shuffle
from capstone_etl_spark.operators.similarity import (
    DIM,
    embedding_covariance,
    embedding_dim_stats,
)
from capstone_etl_spark.operators.textstats import (
    SKIPGRAM_MIN_COUNT,
    SKIPGRAM_WINDOW,
    skipgram_pairs,
)


def test_embedding_dim_stats_shape_and_bounds(spark, sf_dir):
    rows = embedding_dim_stats(spark, sf_dir).collect()
    assert len(rows) == DIM
    assert sorted(r.d for r in rows) == list(range(DIM))
    for r in rows:
        assert r.vmin <= r.mean <= r.vmax
        assert r.variance >= 0.0
        # variance can't exceed the square of the half-range
        half = (r.vmax - r.vmin) / 2
        assert r.variance <= half * half + 1e-9


def test_embedding_covariance_diag_matches_dim_stats(spark, sf_dir):
    """cov(i,i) must equal the per-dimension variance (same exact
    integer sums combined by the same double expression)."""
    stats = {r.d: r.variance for r in embedding_dim_stats(spark, sf_dir).collect()}
    cov = embedding_covariance(spark, sf_dir).collect()
    assert len(cov) == DIM * (DIM + 1) // 2
    for r in cov:
        assert r.i <= r.j
        if r.i == r.j:
            assert math.isclose(r.cov, stats[r.i], abs_tol=1e-6)
    # Cauchy-Schwarz: |cov(i,j)| <= sqrt(var_i * var_j) (rounding slack)
    for r in cov:
        bound = math.sqrt(max(stats[r.i], 0) * max(stats[r.j], 0))
        assert abs(r.cov) <= bound + 1e-5


def test_skipgram_pairs_invariants(spark, sf_dir):
    rows = skipgram_pairs(spark, sf_dir).collect()
    assert rows, "sf0.001 corpus must produce frequent pairs"
    assert all(r.cnt >= SKIPGRAM_MIN_COUNT for r in rows)
    assert {r.dist for r in rows} <= set(range(1, SKIPGRAM_WINDOW + 1))
    # adjacent (dist=1) mass must dominate or equal dist=2 row count is
    # not guaranteed, but every dist=1 pair of a 3+-token doc implies
    # tokens exist; sanity: no empty tokens ever appear
    assert all(r.center != "" and r.context != "" for r in rows)


def test_skipgram_window_offsets_exact(spark):
    """One known doc → exact directional pair set."""
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    from capstone_etl_spark.functions.text import tokenize

    got = (
        df.select(tokenize("text").alias("t"))
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, F.size("t") - 1).alias("c"),
                    F.slice("t", 2, F.size("t") - 1).alias("x"),
                )
            ).alias("p")
        )
        .select("p.c", "p.x")
        .collect()
    )
    assert {(r.c, r.x) for r in got} == {("a", "b"), ("b", "c"), ("c", "d")}


def test_mad_outliers_flags_planted_outlier(spark, tmp_path):
    """A corpus of uniform-length docs plus one monster doc: exactly the
    monster is flagged; mad==0 fallback path also exercised."""
    uniform = [(i, "tok " * 10) for i in range(20)]
    docs = uniform + [(99, "tok " * 500)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out_dir = str(tmp_path / "docs")
    df.write.parquet(out_dir + "/documents.parquet")
    rows = mad_outliers(spark, str(out_dir)).collect()
    flagged = {r.doc_id for r in rows if r.is_outlier}
    # every uniform doc has dev 0; mad == 0 → fallback flags any dev > 0
    assert flagged == {99}
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].median_tok == 10.0 and by_id[0].mad_tok == 0.0
    assert by_id[99].robust_z is None  # mad==0 → no z, flag via fallback


def test_mad_outliers_robust_z_sanity(spark, sf_dir):
    rows = mad_outliers(spark, sf_dir).collect()
    by_flag = [r for r in rows if r.is_outlier]
    for r in rows:
        if r.robust_z is not None and r.mad_tok > 0:
            expect = (r.n_tok - r.median_tok) / (MAD_SIGMA * r.mad_tok)
            assert math.isclose(r.robust_z, expect, abs_tol=1e-5)
            assert r.is_outlier == (abs(expect) > MAD_K)
    # flags are a subset, never the whole corpus
    assert len(by_flag) < len(rows)


def test_pca_power_iteration_eigen_pair(spark, sf_dir):
    """The returned (vector, eigenvalue) must approximately satisfy
    A·v = λ·v for the actual covariance matrix, and λ must be the
    dominant eigenvalue (>= every diagonal variance)."""
    import numpy as np

    from capstone_etl_spark.operators.similarity import pca_power_iteration

    cov_rows = embedding_covariance(spark, sf_dir).collect()
    A = np.zeros((DIM, DIM))
    for r in cov_rows:
        A[r.i][r.j] = r.cov
        A[r.j][r.i] = r.cov
    out = pca_power_iteration(spark, sf_dir).collect()
    assert len(out) == DIM
    v = np.zeros(DIM)
    lam = out[0].eigenvalue
    for r in out:
        v[r.d] = r.component
        assert r.eigenvalue == lam  # one eigenvalue, replicated per row
    assert abs(max(v.max(), -v.min()) - 1.0) < 1e-5  # max-abs normalized
    # the estimate must bracket the true dominant eigenvalue: never
    # above it (power iteration approaches lambda_1 from below through
    # the spectrum), and within 10% after PCA_ITERS rounds even with
    # this corpus' small eigengap
    true_top = float(np.linalg.eigvalsh(A).max())
    assert lam <= true_top + 1e-4
    assert lam >= 0.9 * true_top
    # eigen-equation residual bounded relative to the spectrum spread
    resid = np.abs(A @ v - lam * v).max()
    assert resid < 0.1 * true_top
    # dominant: at least as large as any single-dimension variance
    assert lam >= max(A[d][d] for d in range(DIM)) - 1e-6


def test_feature_hashing_cancellation_and_bounds(spark, sf_dir):
    from capstone_etl_spark.operators.textstats import FH_DIM, feature_hashing_vectors

    rows = feature_hashing_vectors(spark, sf_dir).collect()
    assert rows
    assert all(0 <= r.dim < FH_DIM for r in rows)
    assert all(r.val != 0 for r in rows)  # exact-zero collisions dropped
    # L1 mass per doc is bounded by the doc's token count
    from capstone_etl_spark.functions.text import tokenize
    from capstone_etl_spark.sources.tables import load_table

    n_tok = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokenize("text")).alias("n"))
        .collect()
    }
    mass: dict[int, int] = {}
    for r in rows:
        mass[r.doc_id] = mass.get(r.doc_id, 0) + abs(r.val)
    assert all(m <= n_tok[d] for d, m in mass.items())


def test_dedup_source_matrix_consistent_with_pairs(spark, sf_dir):
    from capstone_etl_spark.operators.dedup import (
        dedup_source_matrix,
        minhash_lsh_pairs,
    )

    mat = dedup_source_matrix(spark, sf_dir).collect()
    n_pairs = sum(r.n_pairs for r in mat)
    assert n_pairs == minhash_lsh_pairs(spark, sf_dir).count()
    for r in mat:
        assert r.source_a <= r.source_b
        assert 0.0 < r.mean_jaccard <= 1.0


def test_embedding_whitening_standardizes(spark, sf_dir):
    """Whitened dimensions must have ~zero mean and ~unit variance
    (up to the 6-dp rounding of the stats and outputs)."""
    from capstone_etl_spark.operators.similarity import embedding_whitening

    rows = embedding_whitening(spark, sf_dir).collect()
    by_dim: dict[int, list[float]] = {}
    for r in rows:
        if r.z is not None:
            by_dim.setdefault(r.d, []).append(r.z)
    assert len(by_dim) == DIM
    for d, zs in by_dim.items():
        n = len(zs)
        mean = sum(zs) / n
        var = sum(z * z for z in zs) / n - mean * mean
        assert abs(mean) < 1e-3
        assert abs(var - 1.0) < 1e-2


def test_doc_keywords_topk_contract(spark, sf_dir):
    from capstone_etl_spark.operators.textstats import KEYWORDS_K, doc_keywords

    rows = doc_keywords(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        ranks = sorted(r.rnk for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= KEYWORDS_K
        # scores are non-increasing in rank
        ordered = sorted(rs, key=lambda r: r.rnk)
        for a, b in zip(ordered, ordered[1:]):
            assert a.tfidf >= b.tfidf


def test_count_min_never_undercounts(spark, sf_dir):
    from capstone_etl_spark.operators.sketches import CM_MIN_COUNT, count_min_error

    rows = count_min_error(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.true_cnt >= CM_MIN_COUNT
        assert r.est_cnt >= r.true_cnt          # the CM guarantee
        assert r.overestimate == r.est_cnt - r.true_cnt


def test_bpe_learn_merges_table(spark, sf_dir):
    from capstone_etl_spark.operators.textstats import (
        BPE_MERGES,
        bpe_apply_merge,
        bpe_learn_merges,
    )

    rows = sorted(bpe_learn_merges(spark, sf_dir).collect(), key=lambda r: r.round)
    assert [r.round for r in rows] == list(range(1, BPE_MERGES + 1))
    assert [r.merged_symbol for r in rows] == ["A", "B", "C", "D"][:BPE_MERGES]
    assert all(r.cnt > 0 for r in rows)
    assert len({r.merge_pair for r in rows}) == BPE_MERGES  # no pair learned twice
    # round 1 must agree with the single-step operator on the same data
    one = bpe_apply_merge(spark, sf_dir).select("merge_pair").first()
    assert rows[0].merge_pair == one.merge_pair


def test_length_quartiles_ordering(spark, sf_dir):
    from capstone_etl_spark.operators.textstats import length_quartiles_per_source

    rows = length_quartiles_per_source(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.q25 <= r.q50 <= r.q75
        assert abs(r.iqr - (r.q75 - r.q25)) < 1e-9
        assert r.n_docs > 0


def test_stream_count_min_equals_batch_counters(spark, sf_dir):
    """The drained streaming counter table must equal the batch-built
    Count-Min counters cell-for-cell (cell-wise addition is
    associative — micro-batching cannot change the sums)."""
    from capstone_etl_spark.functions.hashing import md5_hash60
    from capstone_etl_spark.functions.text import tokenize
    from capstone_etl_spark.operators.sketches import CM_D, CM_W
    from capstone_etl_spark.operators.streaming_queries import stream_count_min
    from capstone_etl_spark.sources.tables import load_table

    got = {(r.d, r.bucket): r.c for r in stream_count_min(spark, sf_dir).collect()}
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(tokenize("text")).alias("token")
    )
    buckets = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (md5_hash60(F.concat(F.lit(f"cm{d}:"), F.col("token"))) % CM_W).alias("bucket"),
            )
            for d in range(CM_D)
        ]
    )
    want = {
        (r.d, r.bucket): r.c
        for r in tok.select(F.explode(buckets).alias("b"))
        .groupBy("b.d", "b.bucket")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert got == want


def test_curation_verdict_composition(spark, sf_dir):
    """keep_final must equal keep AND NOT is_outlier row-for-row, and
    every document appears exactly once."""
    from capstone_etl_spark.operators.quality import curation_verdict
    from capstone_etl_spark.sources.tables import load_table

    rows = curation_verdict(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    for r in rows:
        assert r.keep_final == (r.keep and not r.is_outlier)
        # zero-token docs carry no LM row (left join) — others must
        if r.n_tokens is not None:
            assert r.nll_nats is not None


def test_source_quality_summary_consistent(spark, sf_dir):
    from capstone_etl_spark.operators.quality import (
        curation_verdict,
        source_quality_summary,
    )

    rows = source_quality_summary(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    v = curation_verdict(spark, sf_dir).collect()
    assert total == len(v)
    assert sum(r.n_keep_final for r in rows) == sum(1 for x in v if x.keep_final)
    for r in rows:
        assert 0 <= r.n_keep_final <= r.n_keep_rules <= r.n_docs
        assert abs(r.keep_rate - r.n_keep_final / r.n_docs) < 1e-6


def test_training_shuffle_is_a_permutation(spark, sf_dir):
    rows = training_shuffle(spark, sf_dir).collect()
    n = len(rows)
    # global positions are exactly 0..n-1
    assert sorted(r.global_pos for r in rows) == list(range(n))
    # per-shard positions are exactly 0..count-1 within each shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < N_SHARDS
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))
    # global order is shard-major: all of shard s precedes shard s+1
    max_by_shard = {s: max(p) for s, p in by_shard.items()}
    ordered = sorted(rows, key=lambda r: r.global_pos)
    seen_shards = [r.shard for r in ordered]
    assert seen_shards == sorted(seen_shards)


def test_training_shuffle_deterministic_across_partitionings(spark, sf_dir):
    a = {r.doc_id: (r.shard, r.shard_pos, r.global_pos) for r in training_shuffle(spark, sf_dir).collect()}
    # rerun with a different shuffle-partition setting: same assignment
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = {r.doc_id: (r.shard, r.shard_pos, r.global_pos) for r in training_shuffle(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b

"""Valuation-module tests (round-9 session: knn_shapley_values,
label_noise_audit, kcenter_coreset, mmr_diversified_topk).

Strategy: every operator is checked against an INDEPENDENT reference
implementation (numpy / itertools re-derivations, not the Spark code
path) on deterministic fixtures — the KNN-Shapley closed form against
brute-force permutation enumeration (the strongest possible check: the
O(N!) definition itself), greedy k-center and MMR against step-by-step
reference loops, and the label screen against planted mislabels on a
clustered corpus. Cross-engine oracle parity on the REAL tables is the
gate's job (tools/check_correctness.py); one fixture-level DuckDB
parity run is included for the blocking-dependent operator."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

from capstone_etl_spark.operators.similarity import DIM, N_QUERIES
from capstone_etl_spark.operators.valuation import (
    KCENTER_K,
    MMR_CANDS,
    MMR_K,
    MMR_LAMBDA,
    MMR_MU,
    NOISE_MIN_VOTES,
    SHAP_K,
    kcenter_coreset,
    knn_shapley_values,
    label_noise_audit,
    mmr_diversified_topk,
)
from capstone_etl_spark.session import release_caches


def _write_embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def _det_vec(seed: int) -> list[float]:
    return [math.sin(0.31 * seed * (d + 3)) + 0.1 * math.cos(1.7 * d + seed) for d in range(DIM)]


def _cos6(a, b) -> float:
    # the parquet column is array<float>: quantize through float32
    # exactly as the stored table does, then vectors.quantized_cosine's
    # fixed-point grid — exact integer dot/norms, sqrt/mul/div on
    # exact inputs (the family's de-fragilized rank key)
    a = np.asarray(a, dtype=np.float32).astype(np.float64)
    b = np.asarray(b, dtype=np.float32).astype(np.float64)
    qa = [math.floor(float(x) * 10000.0 + 0.5) for x in a]
    qb = [math.floor(float(x) * 10000.0 + 0.5) for x in b]
    n2a = sum(x * x for x in qa)
    n2b = sum(x * x for x in qb)
    if n2a <= 0 or n2b <= 0:
        return None
    return float(sum(x * y for x, y in zip(qa, qb))) / (
        math.sqrt(float(n2a)) * math.sqrt(float(n2b))
    )


# ---------------------------------------------------------------- shapley

def test_knn_shapley_matches_permutation_enumeration(spark, tmp_path):
    """The closed-form recurrence equals the O(N!) Shapley definition:
    6 train points, 2 test points, all 720 permutations enumerated with
    the KNN utility v(S) = (1/K)·Σ_{j<=min(K,|S|)} 1[label match]."""
    rows = [(i, _det_vec(i), i % 3) for i in (0, 1)]  # test points
    train_ids = [10, 11, 12, 13, 14, 15]
    rows += [(i, _det_vec(i), i % 3) for i in train_ids]
    sf = _write_embeddings(spark, tmp_path, rows)
    got = {
        r["vec_id"]: r["shap_value"]
        for r in knn_shapley_values(spark, sf).collect()
    }
    release_caches()

    vecs = {i: v for i, v, _ in rows}
    labels = {i: l for i, _, l in rows}
    expected = {i: 0.0 for i in train_ids}
    for t in (0, 1):
        order = sorted(
            train_ids, key=lambda i: (-_cos6(vecs[t], vecs[i]), i)
        )
        agree = {i: int(labels[i] == labels[t]) for i in train_ids}

        def utility(subset: frozenset) -> float:
            sel = [i for i in order if i in subset][:SHAP_K]
            return sum(agree[i] for i in sel) / SHAP_K if sel else 0.0

        shap = {i: 0.0 for i in train_ids}
        perms = list(itertools.permutations(train_ids))
        for perm in perms:
            seen: set[int] = set()
            prev = 0.0
            for i in perm:
                seen.add(i)
                cur = utility(frozenset(seen))
                shap[i] += cur - prev
                prev = cur
        for i in train_ids:
            expected[i] += shap[i] / len(perms)
    for i in train_ids:
        expected[i] /= 2  # mean over the two test points
        assert got[i] == pytest.approx(expected[i], abs=1e-9), i


def test_knn_shapley_efficiency_sum(spark, tmp_path):
    """Efficiency axiom: per test point the values sum to the full-set
    utility; averaged over tests, Σ_train shap = mean_t v_t(D)."""
    rows = [(i, _det_vec(7 * i + 1), i % 4) for i in range(40)]
    sf = _write_embeddings(spark, tmp_path, rows)
    out = knn_shapley_values(spark, sf).collect()
    release_caches()
    total = sum(r["shap_value"] for r in out)

    vecs = {i: v for i, v, _ in rows}
    labels = {i: l for i, _, l in rows}
    train_ids = [i for i in range(40) if i >= N_QUERIES]
    vt = []
    for t in range(N_QUERIES):
        order = sorted(train_ids, key=lambda i: (-_cos6(vecs[t], vecs[i]), i))
        vt.append(
            sum(int(labels[i] == labels[t]) for i in order[:SHAP_K]) / SHAP_K
        )
    assert total == pytest.approx(sum(vt) / len(vt), abs=1e-8)


# ---------------------------------------------------------------- kcenter

def test_kcenter_matches_reference_greedy(spark, tmp_path):
    """Pick-for-pick equality with an independent greedy loop, and the
    covering radius is weakly decreasing."""
    rows = [(i, _det_vec(3 * i + 2), 0) for i in range(60)]
    sf = _write_embeddings(spark, tmp_path, rows)
    got = sorted(
        ((r["rnd"], r["vec_id"], r["radius"]) for r in kcenter_coreset(spark, sf).collect())
    )
    release_caches()

    vecs = {i: np.asarray(v, dtype=np.float64) for i, v, _ in rows}
    sel = [min(vecs)]
    exp = [(1, sel[0], None)]
    for r in range(2, KCENTER_K + 1):
        best = None
        for i in sorted(vecs):
            if i in sel:
                continue
            mind = min(1.0 - _cos6(vecs[i], vecs[s]) for s in sel)
            if best is None or mind > best[0] or (mind == best[0] and i < best[1]):
                best = (mind, i)
        sel.append(best[1])
        exp.append((r, best[1], round(best[0], 6)))
    assert got == exp
    radii = [x[2] for x in got if x[2] is not None]
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def test_kcenter_covers_clusters(spark, tmp_path):
    """On KCENTER_K well-separated clusters the greedy picks land one
    per cluster — the farthest-point rule never doubles a covered
    cluster while another is uncovered."""
    rows = []
    for i in range(KCENTER_K * 10):
        k = i % KCENTER_K
        # orthogonal one-hot centers: inter-cluster cosine ~0, intra ~1
        center = [1.0 if d == 8 * k else 0.0 for d in range(DIM)]
        noise = [((i * 37 + d * 11) % 101) / 101.0 * 0.01 for d in range(DIM)]
        rows.append((i, [float(c + x) for c, x in zip(center, noise)], k))
    sf = _write_embeddings(spark, tmp_path, rows)
    picks = kcenter_coreset(spark, sf).collect()
    release_caches()
    clusters = {r["vec_id"] % KCENTER_K for r in picks}
    assert len(picks) == KCENTER_K
    assert len(clusters) == KCENTER_K


def test_coreset_coverage_partitions_corpus(spark, tmp_path):
    """The audit's populations partition the corpus; every center's
    max_d is within the fixture geometry (orthogonal clusters →
    in-cluster distance << cross-cluster), and shares sum to 1."""
    from capstone_etl_spark.operators.valuation import coreset_coverage_audit

    rows = []
    n = KCENTER_K * 10
    for i in range(n):
        k = i % KCENTER_K
        center = [1.0 if d == 8 * k else 0.0 for d in range(DIM)]
        noise = [((i * 37 + d * 11) % 101) / 101.0 * 0.01 for d in range(DIM)]
        rows.append((i, [float(c + x) for c, x in zip(center, noise)], k))
    sf = _write_embeddings(spark, tmp_path, rows)
    out = coreset_coverage_audit(spark, sf).collect()
    release_caches()
    assert len(out) == KCENTER_K
    assert sum(r["pop"] for r in out) == n
    assert sum(r["share"] for r in out) == pytest.approx(1.0, abs=1e-12)
    for r in out:
        assert 0.0 <= r["mean_d"] <= r["max_d"]
        # a center covers only its own orthogonal cluster here
        assert r["max_d"] < 0.1


def test_embedding_shift_detects_planted_dim_shift(spark, tmp_path):
    """Shift one dimension of every DELTA vector by +0.5: that dim's
    std_shift dominates and the untouched dims stay near zero."""
    from capstone_etl_spark.operators.dedup import _is_delta
    from capstone_etl_spark.operators.valuation import embedding_shift_audit
    from pyspark.sql import functions as F

    ids = spark.createDataFrame([(i,) for i in range(500)], "vec_id long")
    delta_ids = {
        r["vec_id"] for r in ids.filter(_is_delta(F.col("vec_id"))).collect()
    }
    rows = []
    for i in range(500):
        v = [math.sin(0.13 * i * (d + 1)) * 0.3 for d in range(DIM)]
        if i in delta_ids:
            v[7] += 0.5
        rows.append((i, v, 0))
    sf = _write_embeddings(spark, tmp_path, rows)
    out = {r["d"]: r for r in embedding_shift_audit(spark, sf).collect()}
    release_caches()
    assert len(out) == DIM
    assert out[7]["std_shift"] > 1.5, out[7]
    others = [abs(r["std_shift"]) for d, r in out.items() if d != 7]
    assert max(others) < 0.5
    assert all(r["n_base"] + r["n_delta"] == 500 for r in out.values())


# ---------------------------------------------------------------- mmr

def test_mmr_matches_reference_loop(spark, tmp_path):
    """Round-for-round equality with an independent MMR loop over the
    same candidate lists (λ=0.7, μ=0.3, quantized-cosine ranking)."""
    rows = [(i, _det_vec(5 * i + 3), 0) for i in range(50)]
    sf = _write_embeddings(spark, tmp_path, rows)
    got = {
        (r["query_id"], r["rnd"]): (r["neighbor_id"], r["score"])
        for r in mmr_diversified_topk(spark, sf).collect()
    }
    release_caches()

    vecs = {i: v for i, v, _ in rows}
    for q in range(N_QUERIES):
        rel = {
            i: _cos6(vecs[q], vecs[i]) for i in vecs if i != q
        }
        cand = sorted(rel, key=lambda i: (-rel[i], i))[:MMR_CANDS]
        sel = [max(cand, key=lambda i: (rel[i], -i))]
        assert got[(q, 1)] == (sel[0], pytest.approx(rel[sel[0]], abs=0))
        for k in range(2, MMR_K + 1):
            best = None
            for c in cand:
                if c in sel:
                    continue
                ms = max(_cos6(vecs[c], vecs[s]) for s in sel)
                score = round(MMR_LAMBDA * rel[c] - MMR_MU * ms, 6)
                if best is None or score > best[0] or (score == best[0] and c < best[1]):
                    best = (score, c)
            sel.append(best[1])
            assert got[(q, k)] == (best[1], pytest.approx(best[0], abs=0)), (q, k)


def test_mmr_prefers_diversity_over_redundancy(spark, tmp_path):
    """Queries whose top-relevance list is a clone pile: pure top-K
    would return MMR_K near-duplicates; MMR must pull in the distinct
    moderately-relevant item by round 2."""
    # explicit geometry: q = e0+e1; clones hug e0 (rel ~0.707, mutual
    # sim ~1.0); the diverse item hugs e1 (rel just below the clones,
    # near-orthogonal to them). Pure top-K returns the clone pile; MMR
    # round 2's redundancy term (-0.3 * ~1.0) must flip to the e1 item.
    def _e(d0, eps_d=None, eps=0.0):
        v = [0.0] * DIM
        v[d0] = 1.0
        if eps_d is not None:
            v[eps_d] = eps
        return v

    rows = [(0, _e(0, 1, 1.0), 0)]  # the query: e0 + e1
    for j, i in enumerate(range(10, 16)):
        clone = _e(0, 2 + j, 0.001)
        clone[1] = 0.05  # small e1 boost: rel ~0.742 > the e1 item's
        rows.append((i, clone, 0))  # clones of e0 (mutual sim ~1.0)
    rows.append((20, _e(1, None), 0))  # the diverse e1 item, rel ~0.707
    # filler: low-relevance directions + the rest of the query set
    rows += [(i, _e(10 + i, None), 0) for i in range(1, 10)]
    sf = _write_embeddings(spark, tmp_path, rows)
    out = [
        (r["rnd"], r["neighbor_id"])
        for r in mmr_diversified_topk(spark, sf).collect()
        if r["query_id"] == 0
    ]
    release_caches()
    picked = [nid for _, nid in sorted(out)]
    assert picked[0] in range(10, 16)  # round 1 = pure relevance
    assert 20 in picked, "MMR never surfaced the diverse item"
    top_rel = [nid for nid in picked if nid in range(10, 16)]
    assert len(top_rel) < MMR_K, "MMR returned only the clone pile"


def test_double_ewma_trend_on_planted_ramp(spark, tmp_path):
    """On a linear daily ramp the double smooth lags the single smooth
    (e2 < e1), the trend estimate is positive and the one-step
    forecast exceeds the level — Brown's smoothing reading the ramp."""
    import datetime as dt

    from capstone_etl_spark.operators.events import event_double_ewma

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(days=i), 1, "view", 100.0 + 10.0 * i, "{}")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = sorted(
        event_double_ewma(spark, str(tmp_path)).collect(), key=lambda r: r["day"]
    )
    assert len(out) == 20
    # after the warm-up window the ramp is in steady state
    for r in out[8:]:
        assert r["ewma2"] < r["ewma1"], r
        assert r["trend"] > 0, r
        assert r["forecast_next"] > r["level"], r
        assert r["level"] > r["ewma1"], r
    # steady-state one-step forecast tracks the next day's value
    last = out[-1]
    assert abs(last["forecast_next"] - (100.0 + 10.0 * 20)) < 15.0


# ---------------------------------------------------------------- noise

def test_label_noise_flags_planted_mislabels(spark, tmp_path):
    """20 tight clusters with consistent labels + 5 planted mislabels:
    the planted rows are flagged suspect, clean rows are not."""
    rows = []
    planted = {3, 117, 431, 640, 888}
    n_clusters, per = 20, 50
    for i in range(n_clusters * per):
        k = i % n_clusters
        center = [math.sin(0.7 * k * (d + 1)) for d in range(DIM)]
        noise = [((i * 131 + d * 17) % 101) / 101.0 * 0.02 - 0.01 for d in range(DIM)]
        label = (k + 7) % n_clusters if i in planted else k
        rows.append((i, [float(c + x) for c, x in zip(center, noise)], label))
    sf = _write_embeddings(spark, tmp_path, rows)
    out = {r["vec_id"]: r for r in label_noise_audit(spark, sf).collect()}
    release_caches()
    assert len(out) == n_clusters * per
    voted = [r for r in out.values() if r["n_votes"] >= NOISE_MIN_VOTES]
    assert voted, "blocking produced no multi-member cells"
    for i in planted:
        if out[i]["n_votes"] >= NOISE_MIN_VOTES:
            assert out[i]["suspect"], f"planted mislabel {i} not flagged"
    clean_flagged = [
        r["vec_id"]
        for r in voted
        if r["suspect"] and r["vec_id"] not in planted
    ]
    # cluster-pure cells: a clean row's neighbors share its label
    assert len(clean_flagged) <= len(voted) * 0.02, clean_flagged[:10]


def test_label_noise_incremental_votes_from_base_only(spark, tmp_path):
    """Delta-vs-base semantics: every verdict row is a delta vector,
    and on a planted fixture the delta mislabels are flagged by their
    base cluster-mates."""
    from capstone_etl_spark.operators.dedup import _is_delta
    from capstone_etl_spark.operators.valuation import label_noise_incremental
    from pyspark.sql import functions as F

    rows = []
    n_clusters, per = 10, 60
    for i in range(n_clusters * per):
        k = i % n_clusters
        center = [1.0 if d == 6 * k else 0.0 for d in range(DIM)]
        noise = [((i * 131 + d * 17) % 101) / 101.0 * 0.02 - 0.01 for d in range(DIM)]
        rows.append((i, [float(c + x) for c, x in zip(center, noise)], k))
    sf = _write_embeddings(spark, tmp_path, rows)
    # which ids are delta under the engine's salted predicate
    emb = spark.createDataFrame(
        [(i,) for i, _, _ in rows], "vec_id long"
    )
    delta_ids = {
        r["vec_id"]
        for r in emb.filter(_is_delta(F.col("vec_id"))).collect()
    }
    # plant mislabels on a few DELTA ids (rewrite the fixture)
    planted = sorted(delta_ids)[:4]
    rows = [
        (i, v, (l + 3) % n_clusters if i in planted else l) for i, v, l in rows
    ]
    sf = _write_embeddings(spark, tmp_path, rows)
    out = {r["vec_id"]: r for r in label_noise_incremental(spark, sf).collect()}
    release_caches()
    assert set(out) == delta_ids
    for i in planted:
        if out[i]["n_votes"] >= NOISE_MIN_VOTES:
            assert out[i]["suspect"], f"planted delta mislabel {i} not flagged"


def test_stream_label_noise_equals_batch(spark, tmp_path):
    """Drain-equality: the ingest twin's output equals the batch
    delta-vs-base screen row-for-row on a clustered fixture."""
    from capstone_etl_spark.operators.streaming_queries import stream_label_noise
    from capstone_etl_spark.operators.valuation import label_noise_incremental

    rows = []
    for i in range(400):
        k = i % 8
        center = [1.0 if d == 8 * k else 0.0 for d in range(DIM)]
        noise = [((i * 53 + d * 29) % 97) / 97.0 * 0.03 for d in range(DIM)]
        rows.append((i, [float(c + x) for c, x in zip(center, noise)], k % 3))
    sf = _write_embeddings(spark, tmp_path, rows)
    batch = sorted(
        map(tuple, label_noise_incremental(spark, sf).collect())
    )
    release_caches()
    stream = sorted(map(tuple, stream_label_noise(spark, sf).collect()))
    release_caches()
    assert stream == batch
    assert batch, "fixture produced no delta verdicts"


def test_curation_manifest_composes_its_gates(spark, tmp_path):
    """The manifest's flags equal the standalone operators' outputs
    (shared-subtree composition changes the plan, not the semantics),
    and keep_final/reason follow the documented gate order."""
    from capstone_etl_spark.operators.valuation import (
        embedding_curation_manifest,
        knn_shapley_values,
        label_noise_audit,
    )
    from capstone_etl_spark.operators.similarity import semantic_dedup_hier

    rows = []
    for i in range(200):
        k = i % 5
        center = [1.0 if d == 11 * k else 0.0 for d in range(DIM)]
        noise = [((i * 67 + d * 19) % 83) / 83.0 * 0.04 for d in range(DIM)]
        label = (k + 2) % 5 if i in (40, 91) else k  # two planted mislabels
        rows.append((i, [float(c + x) for c, x in zip(center, noise)], label))
    sf = _write_embeddings(spark, tmp_path, rows)
    man = {r["vec_id"]: r for r in embedding_curation_manifest(spark, sf).collect()}
    release_caches()
    sem = {r["vec_id"]: r for r in semantic_dedup_hier(spark, sf).collect()}
    release_caches()
    noise_out = {r["vec_id"]: r for r in label_noise_audit(spark, sf).collect()}
    release_caches()
    shap = {r["vec_id"]: r["shap_value"] for r in knn_shapley_values(spark, sf).collect()}
    release_caches()
    assert len(man) == 200
    for i, r in man.items():
        assert r["sem_keep"] == sem[i]["keep"], i
        assert r["dup_of"] == sem[i]["dup_of"], i
        assert r["suspect"] == noise_out[i]["suspect"], i
        assert r["shap_value"] == shap.get(i), i
        expected_keep = (
            r["sem_keep"]
            and not r["suspect"]
            and (r["shap_value"] is None or r["shap_value"] >= 0)
        )
        assert r["keep_final"] == expected_keep, i
        if not r["sem_keep"]:
            assert r["reason"] == "near_duplicate"
        elif r["suspect"]:
            assert r["reason"] == "label_suspect"
        elif r["shap_value"] is not None and r["shap_value"] < 0:
            assert r["reason"] == "negative_value"
        else:
            assert r["reason"] is None
    # the planted mislabels fail the label gate (if they got votes)
    for i in (40, 91):
        if man[i]["sem_keep"] and noise_out[i]["n_votes"] >= NOISE_MIN_VOTES:
            assert man[i]["suspect"], i


def test_stream_twins_equal_batch(spark, tmp_path):
    """Drain-equality for the two aggregate ingest twins: the drift
    screen (DIM-row state) and the coverage dashboard (K-row state)
    equal their batch operators row-for-row."""
    from capstone_etl_spark.operators.streaming_queries import (
        stream_coreset_coverage,
        stream_embedding_shift,
    )
    from capstone_etl_spark.operators.valuation import (
        coreset_coverage_audit,
        embedding_shift_audit,
    )

    rows = []
    for i in range(300):
        k = i % 6
        center = [1.0 if d == 9 * k else 0.0 for d in range(DIM)]
        noise = [((i * 41 + d * 13) % 89) / 89.0 * 0.05 for d in range(DIM)]
        rows.append((i, [float(c + x) for c, x in zip(center, noise)], k))
    sf = _write_embeddings(spark, tmp_path, rows)
    for batch_fn, stream_fn in (
        (embedding_shift_audit, stream_embedding_shift),
        (coreset_coverage_audit, stream_coreset_coverage),
    ):
        batch = sorted(map(tuple, batch_fn(spark, sf).collect()))
        release_caches()
        stream = sorted(map(tuple, stream_fn(spark, sf).collect()))
        release_caches()
        assert stream == batch, batch_fn.__name__
        assert batch, batch_fn.__name__


def test_label_noise_oracle_parity_on_fixture(spark, tmp_path):
    """Fixture-level DuckDB parity for the blocking-dependent operator
    (the sf0.01 gate covers the real tables; this pins agreement on
    CLUSTERED data where cells are highly populated)."""
    import duckdb

    from capstone_etl_spark.operators.valuation import LABEL_NOISE_AUDIT_SQL
    from tools.check_correctness import compare

    rows = []
    for i in range(300):
        k = i % 10
        center = [math.sin(0.8 * k * (d + 2)) for d in range(DIM)]
        noise = [((i * 53 + d * 29) % 97) / 97.0 * 0.03 for d in range(DIM)]
        rows.append((i, [float(c + x) for c, x in zip(center, noise)], k % 4))
    sf = _write_embeddings(spark, tmp_path, rows)
    spdf = label_noise_audit(spark, sf).toPandas()
    release_caches()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    ddf = con.execute(LABEL_NOISE_AUDIT_SQL).df()
    assert compare("label_noise_audit", spdf, ddf) == []

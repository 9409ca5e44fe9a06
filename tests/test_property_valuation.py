"""Property-based parity for the valuation family: Spark plans vs
pure-Python models on random tiny inputs (the test_property_round9.py
recipe — tmp parquet per example, one Spark job per example).
Generators deliberately include DUPLICATE vectors (tied similarities →
the id tiebreak path everywhere), duplicate labels, corpora smaller
than the query-set / coreset constants (empty train sets, starved
greedy rounds), and singleton corpora.

Model float discipline: the model uses the IDENTICAL double sequence —
exact-integer quantized dot/norm folds, quotient of sqrt products
(vectors.quantized_cosine) — and mirrors the DECIMAL(20,12) snap with Decimal(str(x)) quantized
HALF_UP (Spark's double→decimal cast goes through Double.toString,
Python's repr is the same shortest-roundtrip string)."""

from __future__ import annotations

import decimal
import hashlib
import math

from hypothesis import given, settings, strategies as st

from capstone_etl_spark.operators.valuation import (
    KCENTER_K,
    MMR_CANDS,
    MMR_K,
    MMR_LAMBDA,
    MMR_MU,
    NOISE_K,
    NOISE_MIN_VOTES,
    SHAP_K,
)

N_Q = 10  # similarity.N_QUERIES


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _write(tmp_path_factory, vecs, labels):
    import pandas as pd

    d = tmp_path_factory.mktemp("prop_val")
    rows = [
        (i, [float(x) for x in v], int(l))
        for i, (v, l) in enumerate(zip(vecs, labels))
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    pdf["vec_id"] = pdf["vec_id"].astype("int64")
    pdf["label"] = pdf["label"].astype("int32")
    pdf.to_parquet(str(d / "embeddings.parquet"))
    return str(d)


def _nonzero(v):
    return v if any(x != 0 for x in v) else [0.01] + v[1:]


VEC = st.lists(
    st.integers(-40, 40).map(lambda x: x / 100.0), min_size=8, max_size=8
).map(_nonzero)
LABELS = st.integers(0, 3)


def _qz(v):
    """quantize_fp's grid: floor(x·1e4 + 0.5) per element."""
    return [math.floor(x * 10000.0 + 0.5) for x in v]


def _qcos(a, b):
    """vectors.quantized_cosine's exact double sequence: exact integer
    dot and squared norms (any summation order — they're ints), then
    sqrt/mul/div, each IEEE-correctly-rounded on exact inputs."""
    qa, qb = _qz(a), _qz(b)
    n2a = sum(x * x for x in qa)
    n2b = sum(x * x for x in qb)
    if n2a <= 0 or n2b <= 0:
        return None
    return float(sum(x * y for x, y in zip(qa, qb))) / (
        math.sqrt(float(n2a)) * math.sqrt(float(n2b))
    )


def _r6(x: float) -> float:
    """Spark's F.round on a double: BigDecimal(Double.toString(d))
    .setScale(6, HALF_UP). Python's builtin round is binary half-even
    and diverges when the shortest repr terminates exactly on the
    half boundary (hypothesis found one: -0.3321035)."""
    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _dec12(x: float) -> decimal.Decimal:
    return decimal.Decimal(repr(x)).quantize(
        decimal.Decimal("1e-12"), rounding=decimal.ROUND_HALF_UP
    )


# --- knn_shapley_values ------------------------------------------------------


def _model_knn_shapley(vecs, labels):
    n_all = len(vecs)
    tests = [i for i in range(n_all) if i < N_Q]
    train = [i for i in range(n_all) if i >= N_Q]
    if not train or not tests:
        return {}
    sums = {i: decimal.Decimal(0) for i in train}
    for t in tests:
        order = sorted(train, key=lambda i: (-_qcos(vecs[t], vecs[i]), i))
        agree = [int(labels[i] == labels[t]) for i in order]
        n = len(order)
        base = _dec12(agree[-1] / n)
        g = [
            _dec12(
                (agree[j] - agree[j + 1]) * min(SHAP_K, j + 1) / float(SHAP_K * (j + 1))
            )
            for j in range(n - 1)
        ] + [decimal.Decimal(0)]
        suf = decimal.Decimal(0)
        s = [decimal.Decimal(0)] * n
        for j in range(n - 1, -1, -1):
            suf += g[j]
            s[j] = suf + base
        for j, i in enumerate(order):
            sums[i] += s[j]
    return {i: float(sums[i]) / len(tests) for i in train}


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(VEC, LABELS), min_size=1, max_size=24))
def test_knn_shapley_matches_python_model(spark, tmp_path_factory, rows):
    from capstone_etl_spark.operators.valuation import knn_shapley_values
    from capstone_etl_spark.session import release_caches

    vecs = [v for v, _ in rows]
    labels = [l for _, l in rows]
    sf = _write(tmp_path_factory, vecs, labels)
    got = {r.vec_id: r.shap_value for r in knn_shapley_values(spark, sf).collect()}
    release_caches()
    assert got == _model_knn_shapley(vecs, labels)


# --- kcenter_coreset ---------------------------------------------------------


def _model_kcenter(vecs):
    n = len(vecs)
    if n == 0:
        return []
    sel = [min(range(n))]
    out = [(sel[0], 1, None)]
    for r in range(2, KCENTER_K + 1):
        best = None
        for i in range(n):
            if i in sel:
                continue
            mind = min(1.0 - _qcos(vecs[i], vecs[s]) for s in sel)
            if best is None or mind > best[0] or (mind == best[0] and i < best[1]):
                best = (mind, i)
        if best is None:
            break
        sel.append(best[1])
        out.append((best[1], r, _r6(best[0])))
    return sorted(out)


@settings(max_examples=5, deadline=None)
@given(st.lists(VEC, min_size=1, max_size=24))
def test_kcenter_matches_python_model(spark, tmp_path_factory, vecs):
    from capstone_etl_spark.operators.valuation import kcenter_coreset
    from capstone_etl_spark.session import release_caches

    sf = _write(tmp_path_factory, vecs, [0] * len(vecs))
    got = sorted(
        (r.vec_id, r.rnd, r.radius) for r in kcenter_coreset(spark, sf).collect()
    )
    release_caches()
    assert got == _model_kcenter(vecs)


# --- mmr_diversified_topk ----------------------------------------------------


def _model_mmr(vecs):
    n = len(vecs)
    out = []
    for q in range(min(n, N_Q)):
        rel = {i: _qcos(vecs[q], vecs[i]) for i in range(n) if i != q}
        cand = sorted(rel, key=lambda i: (-rel[i], i))[:MMR_CANDS]
        if not cand:
            continue
        sel = [min(cand, key=lambda i: (-rel[i], i))]
        out.append((q, 1, sel[0], rel[sel[0]]))
        for k in range(2, MMR_K + 1):
            best = None
            for c in cand:
                if c in sel:
                    continue
                ms = max(_qcos(vecs[c], vecs[s]) for s in sel)
                score = _r6(MMR_LAMBDA * rel[c] - MMR_MU * ms)
                if best is None or score > best[0] or (
                    score == best[0] and c < best[1]
                ):
                    best = (score, c)
            if best is None:
                break
            sel.append(best[1])
            out.append((q, k, best[1], best[0]))
    return sorted(out)


@settings(max_examples=5, deadline=None)
@given(st.lists(VEC, min_size=1, max_size=24))
def test_mmr_matches_python_model(spark, tmp_path_factory, vecs):
    from capstone_etl_spark.operators.valuation import mmr_diversified_topk
    from capstone_etl_spark.session import release_caches

    sf = _write(tmp_path_factory, vecs, [0] * len(vecs))
    got = sorted(
        (r.query_id, r.rnd, r.neighbor_id, r.score)
        for r in mmr_diversified_topk(spark, sf).collect()
    )
    release_caches()
    assert got == _model_mmr(vecs)


# --- label_noise_audit -------------------------------------------------------


def _model_hier_assign(q):
    """similarity.hier_assign's python model: hash-sampled seeds, the
    tighter N^(3/4) branch threshold (both with min-hash fallbacks),
    seed→branch argmin routing, per-vector top-BRANCH_PROBES branch
    descent, argmin over the routed branches' seeds — every key an
    exact integer with id tiebreaks."""
    from capstone_etl_spark.operators.similarity import BRANCH_PROBES

    n = len(q)
    hs = {i: _h60(str(i)) for i in range(n)}
    thresh = math.floor(2.0**60 / math.sqrt(max(n, 1)))
    mh = min(range(n), key=lambda i: (hs[i], i))
    seeds = sorted(i for i in range(n) if hs[i] < thresh or i == mh)

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    nv = float(max(n, 1))
    thresh_b = math.floor(2.0**60 / (math.sqrt(nv) * math.sqrt(math.sqrt(nv))))
    mh_b = min(seeds, key=lambda s: (hs[s], s))
    branches = sorted(s for s in seeds if hs[s] < thresh_b or s == mh_b)
    seed_route = {
        s: min(branches, key=lambda b: (d2(q[s], q[b]), b)) for s in seeds
    }
    assign = {}
    for i in range(n):
        routed = sorted(branches, key=lambda b: (d2(q[i], q[b]), b))[:BRANCH_PROBES]
        cand = [s for s in seeds if seed_route[s] in routed]
        assign[i] = min(cand, key=lambda s: (d2(q[i], q[s]), s))
    return assign, d2


def _micro_ratio(na: int, nv: int):
    """_noise_verdict_cols' exact ratio: integer micro-units rounded
    half-up, then ONE IEEE division by 10⁶."""
    if not nv:
        return None
    return float((na * 2_000_000 + nv) // (2 * nv)) / 1e6


def _model_label_noise(vecs, labels):
    n = len(vecs)
    q = [[math.floor(x * 10_000 + 0.5) for x in v] for v in vecs]
    assign, d2 = _model_hier_assign(q)
    out = []
    for i in range(n):
        mates = [j for j in range(n) if j != i and assign[j] == assign[i]]
        # r11 rank key: exact integer squared L2 asc, id asc — no
        # float anywhere in the rank path
        ranked = sorted(mates, key=lambda j: (d2(q[i], q[j]), j))[:NOISE_K]
        nv = len(ranked)
        na = sum(int(labels[j] == labels[i]) for j in ranked)
        suspect = nv >= NOISE_MIN_VOTES and na * 2 < nv
        out.append((i, labels[i], assign[i], nv, na, _micro_ratio(na, nv), suspect))
    return sorted(out)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(VEC, LABELS), min_size=1, max_size=24))
def test_label_noise_matches_python_model(spark, tmp_path_factory, rows):
    from capstone_etl_spark.operators.valuation import label_noise_audit
    from capstone_etl_spark.session import release_caches

    vecs = [v for v, _ in rows]
    labels = [l for _, l in rows]
    sf = _write(tmp_path_factory, vecs, labels)
    got = sorted(
        (r.vec_id, r.label, r.cell, r.n_votes, r.n_agree, r.agree_ratio, r.suspect)
        for r in label_noise_audit(spark, sf).collect()
    )
    release_caches()
    assert got == _model_label_noise(vecs, labels)

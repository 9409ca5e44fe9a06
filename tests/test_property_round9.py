"""Property-based parity for the round-9 operators: Spark plans vs
pure-Python models on random tiny inputs (the test_property_round7.py
recipe — tmp parquet per example, one Spark job per batch). Generators
deliberately include duplicate vectors (tied routing distances through
BOTH quantizer levels), single-vector corpora (the min-hash branch
fallback), heavily skewed per-source counts (KLL levels 0 and >0 in one
corpus), and duplicate values (rank-cut ties in the quantile sketch)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings, strategies as st


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _write_emb(tmp_path_factory, vecs):
    import pandas as pd

    d = tmp_path_factory.mktemp("prop_r9")
    rows = [(i, [float(x) for x in v], "x") for i, v in enumerate(vecs)]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    pdf["vec_id"] = pdf["vec_id"].astype("int64")
    pdf.to_parquet(str(d / "embeddings.parquet"))
    return str(d)


VEC = st.lists(
    st.integers(-40, 40).map(lambda x: x / 100.0), min_size=8, max_size=8
)


# --- two-level quantizer assignment -----------------------------------------


def _model_hier_assign(vecs):
    """Pure-Python mirror of similarity.hier_assign on 8-dim vectors."""
    n = len(vecs)
    q = [[math.floor(x * 10_000 + 0.5) for x in v] for v in vecs]
    hs = {i: _h60(str(i)) for i in range(n)}
    t_seed = math.floor(2.0**60 / math.sqrt(max(n, 1)))
    mh = min(range(n), key=lambda i: (hs[i], i))
    seeds = sorted(i for i in range(n) if hs[i] < t_seed or i == mh)
    t_branch = math.floor(
        2.0**60 / (math.sqrt(max(n, 1)) * math.sqrt(math.sqrt(max(n, 1))))
    )
    mhs = min(seeds, key=lambda c: (_h60(str(c)), c))
    branches = sorted(c for c in seeds if _h60(str(c)) < t_branch or c == mhs)

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def route(v, k):
        return [b for _, b in sorted((d2(v, q[b]), b) for b in branches)[:k]]

    seed_branch = {s: route(q[s], 1)[0] for s in seeds}
    assign = {}
    for i in range(n):
        cand = [s for s in seeds if seed_branch[s] in route(q[i], 2)]
        assign[i] = min(cand, key=lambda s: (d2(q[i], q[s]), s))
    return assign


@settings(max_examples=5, deadline=None)
@given(st.lists(VEC, min_size=1, max_size=24))
def test_hier_assign_matches_python_model(spark, tmp_path_factory, vecs):
    from pyspark.sql import functions as F

    from capstone_etl_spark.operators.similarity import hier_assign, quantize_fp

    sf = _write_emb(tmp_path_factory, vecs)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    emb_q = emb.select("vec_id", quantize_fp().alias("vq"))
    got = {r.vec_id: r.cell for r in hier_assign(emb_q).collect()}
    assert got == _model_hier_assign(vecs)


# --- KLL level-subsample sketch ----------------------------------------------


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(1, 500), min_size=1, max_size=40),
    st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=40),
)
def test_kll_sketch_matches_python_model(spark, tmp_path_factory, lens, srcs):
    import pandas as pd

    from capstone_etl_spark.operators.sketches import (
        KLL_K,
        KLL_QS,
        kll_quantile_sketch,
    )

    m = min(len(lens), len(srcs))
    lens, srcs = lens[:m], srcs[:m]
    d = tmp_path_factory.mktemp("prop_r9_kll")
    pd.DataFrame(
        [(i, "w", "en", srcs[i], lens[i]) for i in range(m)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).astype({"doc_id": "int64", "n_chars": "int64"}).to_parquet(
        str(d / "documents.parquet")
    )
    got = {
        (r.source, r.q): (r.n, r.level, r.target_rank, r.est_quantile, r.exact_quantile)
        for r in kll_quantile_sketch(spark, str(d)).collect()
    }
    # python model
    by_src: dict[str, list[tuple[int, int]]] = {}
    for i in range(m):
        by_src.setdefault(srcs[i], []).append((i, lens[i]))
    for src, rows in by_src.items():
        n = len(rows)
        t = -(-n // KLL_K)
        lvl = 0 if t <= 1 else (t - 1).bit_length()
        w = 1 << lvl
        samp = sorted(v for i, v in rows if _h60(f"kll:{i}") % w == 0)
        vals = sorted(v for _, v in rows)
        for qq in KLL_QS:
            r = math.ceil(qq * n)
            # cumulative weight over sorted sample values
            est = None
            for j, v in enumerate(samp):
                if (j + 1) * w >= r:
                    est = float(v)
                    break
            if est is None and samp:
                est = float(samp[-1])
            exact = float(next(v for j, v in enumerate(vals) if j + 1 >= r))
            key = (src, qq)
            if not samp:
                assert key not in got  # no survivors -> no release row
                continue
            gn, glvl, gr, gest, gexact = got[key]
            assert (gn, glvl, gr) == (n, lvl, r), key
            assert gest == est and gexact == exact, (key, gest, est)

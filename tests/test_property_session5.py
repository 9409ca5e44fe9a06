"""Property-based parity for the round-7 session-5 operators: Spark
plans vs pure-Python models on random tiny inputs (the
test_property_round7.py recipe — tmp parquet per example, one Spark
job per batch). Generators deliberately include duplicate texts (tied
tf ranks in the sampler table), single-source corpora (the LOSO
denominator's N−N_s → 0 edge), same-timestamp event ties and
all-one-variant user sets (the A/B NULL-stat branches), and constant
values (the PSI zero-width reference grid)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
from collections import Counter

from hypothesis import given, settings, strategies as st


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _write_docs(tmp_path_factory, texts, sources):
    import pandas as pd

    d = tmp_path_factory.mktemp("prop_s5")
    rows = [
        (i, t, "en", s, len(t)) for i, (t, s) in enumerate(zip(texts, sources))
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int64"}).to_parquet(
        str(d / "documents.parquet")
    )
    return str(d)


WORDS = st.sampled_from(["ant", "bee", "cat", "dog", "elk", "fox"])
TEXTS = st.lists(
    st.lists(WORDS, min_size=0, max_size=8).map(" ".join), min_size=1, max_size=10
)


# --- rendezvous sharding -------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=30, unique=True))
def test_rendezvous_ledger_matches_python_model(spark, tmp_path_factory, doc_ids):
    from capstone_etl_spark.operators.scaleaudit import (
        HRW_SALT,
        HRW_SHARDS,
        HRW_SHARDS_AFTER,
        rendezvous_sharding,
    )

    sf = _write_docs(
        tmp_path_factory, ["w"] * len(doc_ids), ["web"] * len(doc_ids)
    )
    # rewrite doc ids to the drawn set
    import pandas as pd

    pdf = pd.read_parquet(f"{sf}/documents.parquet")
    pdf["doc_id"] = pd.Series(doc_ids, dtype="int64")
    pdf.to_parquet(f"{sf}/documents.parquet")

    def owner(doc_id: int, n: int) -> int:
        return min((-_h60(f"{HRW_SALT}{s}:{doc_id}"), s) for s in range(n))[1]

    before = Counter(owner(i, HRW_SHARDS) for i in doc_ids)
    after = Counter(owner(i, HRW_SHARDS_AFTER) for i in doc_ids)
    moved_out = Counter(
        owner(i, HRW_SHARDS)
        for i in doc_ids
        if owner(i, HRW_SHARDS) != owner(i, HRW_SHARDS_AFTER)
    )
    got = {r.shard: r for r in rendezvous_sharding(spark, sf).collect()}
    for s in range(HRW_SHARDS_AFTER):
        assert got[s].n_before == before.get(s, 0)
        assert got[s].n_after == after.get(s, 0)
        assert got[s].n_out == moved_out.get(s, 0)
        expect_in = after.get(s, 0) - before.get(s, 0) + moved_out.get(s, 0)
        assert got[s].n_in == expect_in


# --- negative-sampling table ---------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_negative_sampling_tiles_grid_on_random_corpora(
    spark, tmp_path_factory, texts
):
    from capstone_etl_spark.operators.textstats import (
        NEG_TABLE_SLOTS,
        negative_sampling_table,
    )

    sf = _write_docs(tmp_path_factory, texts, ["web"] * len(texts))
    rows = sorted(
        negative_sampling_table(spark, sf).collect(), key=lambda r: (-r.tf, r.token)
    )
    tf = Counter(w for t in texts for w in t.split() if w)
    assert Counter({r.token: r.tf for r in rows}) == tf
    if not rows:
        return
    assert rows[0].slot_lo == 0
    assert rows[-1].slot_hi == NEG_TABLE_SLOTS
    for a, b in zip(rows, rows[1:]):
        assert a.slot_hi == b.slot_lo


# --- LOSO influence ------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(
    TEXTS,
    st.lists(st.sampled_from(["web", "books", "code"]), min_size=10, max_size=10),
)
def test_loso_matches_python_model(spark, tmp_path_factory, texts, srcs):
    from capstone_etl_spark.operators.corpus import LOSO_ALPHA, source_loso_influence

    sources = srcs[: len(texts)]
    sf = _write_docs(tmp_path_factory, texts, sources)
    cst: dict[str, Counter] = {}
    for t, s in zip(texts, sources):
        for w in t.split():
            if w:
                cst.setdefault(s, Counter())[w] += 1
    ct = Counter()
    for c in cst.values():
        ct.update(c)
    n, v, a = sum(ct.values()), len(ct), LOSO_ALPHA
    got = {r.source: r for r in source_loso_influence(spark, sf).collect()}
    assert set(got) == {s for s, c in cst.items() if c}
    for s, c in cst.items():
        if not c:
            continue
        n_s = sum(c.values())
        nll_self = -sum(k * math.log((ct[t] + a) / (n + a * v)) for t, k in c.items()) / n_s
        nll_held = -sum(
            k * math.log((ct[t] - k + a) / (n - n_s + a * v)) for t, k in c.items()
        ) / n_s
        assert abs(got[s].nll_self - nll_self) < 1e-4
        assert abs(got[s].nll_holdout - nll_held) < 1e-4
        assert got[s].novelty >= -1e-6


# --- A/B readout + PSI ---------------------------------------------------------

EVENT = st.tuples(
    st.integers(1, 5),                                   # user
    st.sampled_from(["view", "purchase", "click"]),      # type
    st.integers(0, 100),                                 # ts offset sec
    st.integers(-3, 3),                                  # value
)


def _write_events(tmp_path_factory, events):
    import pandas as pd

    d = tmp_path_factory.mktemp("prop_s5_ev")
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off), u, t, float(val), "{}")
        for i, (u, t, off, val) in enumerate(events)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).astype({"event_id": "int64", "user_id": "int64", "value": "float64"})
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(d / "events.parquet"))
    return str(d)


@settings(max_examples=5, deadline=None)
@given(st.lists(EVENT, min_size=1, max_size=25))
def test_ab_readout_matches_python_model(spark, tmp_path_factory, events):
    from capstone_etl_spark.operators.events import (
        AB_SALT,
        AB_VARIANTS,
        ab_test_analysis,
    )

    sf = _write_events(tmp_path_factory, events)
    first_view: dict[int, int] = {}
    for u, t, off, _ in events:
        if t == "view" and (u not in first_view or off < first_view[u]):
            first_view[u] = off
    converted = {
        u
        for u, t, off, _ in events
        if t == "purchase" and u in first_view and off > first_view[u]
    }
    n, c = Counter(), Counter()
    for u in first_view:
        var = _h60(f"{AB_SALT}{u}") % AB_VARIANTS
        n[var] += 1
        c[var] += u in converted
    got = {r.variant: r for r in ab_test_analysis(spark, sf).collect()}
    assert set(got) == set(n)
    for var in n:
        assert got[var].n_exposed == n[var]
        assert got[var].n_converted == c[var]
    if 0 in n and 1 in n:
        p0, p1 = c[0] / n[0], c[1] / n[1]
        assert abs(got[0].abs_lift - (p1 - p0)) < 1e-6
    else:  # one-variant exposure: every cross-variant stat is NULL
        assert all(r.abs_lift is None and r.z_score is None for r in got.values())


@settings(max_examples=5, deadline=None)
@given(st.lists(EVENT, min_size=1, max_size=25))
def test_psi_nonnegative_on_random_streams(spark, tmp_path_factory, events):
    from capstone_etl_spark.operators.events import event_psi_drift

    sf = _write_events(tmp_path_factory, events)
    rows = event_psi_drift(spark, sf).collect()
    assert rows
    for r in rows:
        assert r.psi >= 0.0
        assert r.n_ref + r.n_cur >= 1


# --- Kaplan-Meier conversion survival -------------------------------------------


@settings(max_examples=5, deadline=None)
@given(st.lists(EVENT, min_size=1, max_size=25))
def test_conversion_survival_matches_python_km(spark, tmp_path_factory, events):
    from capstone_etl_spark.operators.events import (
        KM_BUCKET_US,
        conversion_survival,
    )

    sf = _write_events(tmp_path_factory, events)
    us = lambda off: off * 1_000_000  # noqa: E731
    fv: dict[int, int] = {}
    last: dict[int, int] = {}
    for u, t, off, _ in events:
        last[u] = max(last.get(u, us(off)), us(off))
        if t == "view":
            fv[u] = min(fv.get(u, us(off)), us(off))
    conv: dict[int, int] = {}
    for u, t, off, _ in events:
        if t == "purchase" and u in fv and us(off) > fv[u]:
            conv[u] = min(conv.get(u, us(off)), us(off))
    d, c = Counter(), Counter()
    for u, f in fv.items():
        end = conv.get(u, last[u])
        (d if u in conv else c)[(end - f) // KM_BUCKET_US] += 1
    rows = sorted(conversion_survival(spark, sf).collect(), key=lambda r: r.dur_min)
    if not fv:
        assert rows == []
        return
    assert [r.dur_min for r in rows] == sorted(set(d) | set(c))
    total, seen, s, absorbed = len(fv), 0, 1.0, False
    for r in rows:
        n_risk = total - seen
        assert (r.n_risk, r.n_conv, r.n_censored) == (
            n_risk, d.get(r.dur_min, 0), c.get(r.dur_min, 0)
        )
        if r.n_conv == n_risk:
            absorbed = True
        if absorbed:
            s = 0.0
        elif r.n_conv:
            s *= 1.0 - r.n_conv / n_risk
        assert abs(r.survival - s) < 1e-6
        seen += r.n_conv + r.n_censored


# --- token Gini -----------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_token_gini_matches_python_on_random_corpora(spark, tmp_path_factory, texts):
    from capstone_etl_spark.operators.textstats import token_gini

    sf = _write_docs(tmp_path_factory, texts, ["web"] * len(texts))
    xs = sorted(len([w for w in t.split() if w]) for t in texts)
    n, tot = len(xs), sum(xs)
    row = token_gini(spark, sf).collect()[0]
    assert row.n_docs == n and row.total_tokens == tot
    if tot == 0:
        assert row.gini is None
        return
    want = (2.0 * sum((i + 1) * x for i, x in enumerate(xs))) / (n * tot) - (n + 1) / n
    assert abs(row.gini - want) < 1e-6
    assert 0.0 <= row.gini < 1.0

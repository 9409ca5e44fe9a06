"""Property-based parity for the round-7 session-2 operators: Spark
plans vs pure-Python models of the pinned semantics on random tiny
inputs (the test_property_round7.py recipe — tmp parquet per example,
one Spark job per batch). The generators deliberately include
all-equal-length corpora (every quantile rank in one histogram bin)
and same-second event writes (the CDC argmax tiebreak)."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

from hypothesis import given, settings, strategies as st

from capstone_etl_spark.operators.events import CDC_DELETE_TYPE, changelog_apply
from capstone_etl_spark.operators.sketches import HQ_QS, HQ_W, histogram_quantiles


def _snap6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


# --- histogram_quantiles -------------------------------------------------------

LENGTHS = st.lists(st.integers(0, 60), min_size=1, max_size=20)


def _write_docs(tmp_path_factory, lengths):
    import pandas as pd

    d = tmp_path_factory.mktemp("prop_hist")
    rows = [(i, "x" * ln, "en", "web", ln) for i, ln in enumerate(lengths)]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int64"}).to_parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def _model_hist(lengths):
    n = len(lengths)
    mn, mx = min(lengths), max(lengths)
    span = mx - mn + 1
    bins = Counter((v - mn) * HQ_W // span for v in lengths)
    cum, c = {}, 0
    for b in sorted(bins):
        c += bins[b]
        cum[b] = c
    vals = Counter(lengths)
    vcum, c = {}, 0
    for v in sorted(vals):
        c += vals[v]
        vcum[v] = c
    bw = span / HQ_W
    out = {}
    for q in HQ_QS:
        r = math.ceil(q * float(n))
        b = min(b for b in cum if cum[b] >= r)
        cumprev = cum[b] - bins[b]
        est = _snap6(float(mn) + float(b) * bw + bw * ((r - cumprev) / bins[b]))
        exact = float(min(v for v in vcum if vcum[v] >= r))
        out[q] = (r, est, exact, _snap6(abs(est - exact)))
    return out


@settings(max_examples=5, deadline=None)
@given(LENGTHS)
def test_histogram_quantiles_matches_python_model(spark, tmp_path_factory, lengths):
    sf = _write_docs(tmp_path_factory, lengths)
    got = {
        r.q: (r.target_rank, r.est_quantile, r.exact_quantile, r.abs_error)
        for r in histogram_quantiles(spark, sf).collect()
    }
    assert got == _model_hist(lengths)


# --- cms_join_size -------------------------------------------------------------

import hashlib


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


CMS_EVENT = st.tuples(st.integers(1, 4), st.sampled_from(["click", "view", "error"]))
CMS_EVENTS = st.lists(CMS_EVENT, min_size=1, max_size=15)


def _write_cms_events(tmp_path_factory, events):
    import pandas as pd

    d = tmp_path_factory.mktemp("prop_cms")
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), u, t, 1.0, "{}")
        for i, (u, t) in enumerate(events)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).astype({"event_id": "int64", "user_id": "int64", "value": "float64"})
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(d / "events.parquet"))
    return str(d)


def _model_cms(events):
    from collections import Counter

    from capstone_etl_spark.operators.sketches import JS_D, JS_W

    ca = Counter(u for u, t in events if t == "click")
    cb = Counter(u for u, t in events if t == "view")
    exact = sum(ca[u] * cb[u] for u in ca if u in cb)
    if not any(u in cb for u in ca):
        exact = None
    ests = []
    for d in range(JS_D):
        ba, bb = Counter(), Counter()
        for u, c in ca.items():
            ba[_h60(f"jsz{d}:{u}") % JS_W] += c
        for u, c in cb.items():
            bb[_h60(f"jsz{d}:{u}") % JS_W] += c
        common = [k for k in ba if k in bb]
        if common:
            ests.append(sum(ba[k] * bb[k] for k in common))
    est = min(ests) if ests else None
    if exact is None or est is None:
        return (exact, est, None, None)
    over = est - exact
    return (exact, est, over, _snap6(over / exact))


@settings(max_examples=5, deadline=None)
@given(CMS_EVENTS)
def test_cms_join_size_matches_python_model(spark, tmp_path_factory, events):
    sf = _write_cms_events(tmp_path_factory, events)
    from capstone_etl_spark.operators.sketches import cms_join_size

    r = cms_join_size(spark, sf).first()
    assert (r.exact_size, r.cms_estimate, r.overestimate, r.rel_error) == _model_cms(
        events
    )


# --- k_anonymity_audit ---------------------------------------------------------

CUSTOMER = st.tuples(
    st.integers(0, 2),  # nation
    st.sampled_from(["BUILDING", "MACHINERY"]),  # segment
    st.floats(min_value=-2000.0, max_value=5000.0, allow_nan=False),  # acctbal
)
CUSTOMERS = st.lists(CUSTOMER, min_size=1, max_size=12)


def _write_customers(tmp_path_factory, customers):
    import pandas as pd

    d = tmp_path_factory.mktemp("prop_kanon")
    rows = [
        (i + 1, f"Customer#{i + 1}", nat, bal, seg)
        for i, (nat, seg, bal) in enumerate(customers)
    ]
    pdf = pd.DataFrame(
        rows, columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    ).astype({"c_custkey": "int64", "c_nationkey": "int32", "c_acctbal": "float64"})
    pdf.to_parquet(str(d / "customer.parquet"))
    return str(d)


def _model_kanon(customers):
    from collections import Counter

    from capstone_etl_spark.operators.privacy import K_ANON_BAND, K_ANON_THRESHOLDS

    groups = Counter(
        (nat, seg, math.floor(bal / K_ANON_BAND)) for nat, seg, bal in customers
    )
    n_groups, n_rows = len(groups), sum(groups.values())
    out = {}
    for k in K_ANON_THRESHOLDS:
        gb = sum(1 for g in groups.values() if g < k)
        rb = sum(g for g in groups.values() if g < k)
        out[k] = (n_groups, n_rows, gb, rb, _snap6(rb / n_rows))
    return out


@settings(max_examples=5, deadline=None)
@given(CUSTOMERS)
def test_k_anonymity_matches_python_model(spark, tmp_path_factory, customers):
    sf = _write_customers(tmp_path_factory, customers)
    from capstone_etl_spark.operators.privacy import k_anonymity_audit

    got = {
        r.k: (r.n_groups, r.n_rows, r.groups_below, r.rows_below, r.pct_rows_below)
        for r in k_anonymity_audit(spark, sf).collect()
    }
    assert got == _model_kanon(customers)


# --- changelog_apply -----------------------------------------------------------

# dyadic values only: the snapshot emits the raw double, compared exactly
EVENT = st.tuples(
    st.integers(0, 50),  # ts (epoch seconds; small range forces ties)
    st.integers(1, 3),  # user_id
    st.sampled_from(["click", "view", "purchase", CDC_DELETE_TYPE]),
    st.sampled_from([0.0, 1.5, -2.25, 1e9]),
)
EVENTS = st.lists(EVENT, min_size=1, max_size=12)


def _write_events(tmp_path_factory, events):
    import pandas as pd

    d = tmp_path_factory.mktemp("prop_cdc")
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts), u, t, v, "{}")
        for i, (ts, u, t, v) in enumerate(events)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).astype({"event_id": "int64", "user_id": "int64", "value": "float64"})
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(d / "events.parquet"))
    return str(d)


def _model_cdc(events):
    base = int(dt.datetime(2024, 1, 1).timestamp())
    by_user: dict[int, list] = {}
    for eid, (ts, u, t, v) in enumerate(events):
        by_user.setdefault(u, []).append((base + ts, eid, t, v))
    out = {}
    for u, evs in by_user.items():
        last = max(evs)  # (ts, event_id) is a total order; t/v never compared
        if last[2] != CDC_DELETE_TYPE:
            out[u] = (
                last[0],
                last[1],
                last[2],
                last[3],
                len(evs),
                sum(1 for e in evs if e[2] == CDC_DELETE_TYPE),
            )
    return out


@settings(max_examples=5, deadline=None)
@given(EVENTS)
def test_changelog_apply_matches_python_model(spark, tmp_path_factory, events):
    sf = _write_events(tmp_path_factory, events)
    got = {
        r.user_id: (
            r.last_ts,
            r.last_event_id,
            r.last_type,
            r.last_value,
            r.n_changes,
            r.n_deletes,
        )
        for r in changelog_apply(spark, sf).collect()
    }
    assert got == _model_cdc(events)

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

"""Sessionization on crafted events + fingerprint order sensitivity."""

from __future__ import annotations

import datetime as dt

from capstone_etl_spark.operators.textstats import doc_fingerprint_df
from capstone_etl_spark.operators.events import SESSION_GAP_SEC


def test_sessionize_gap_split(spark):
    from pyspark.sql import functions as F
    from capstone_etl_spark.operators import events as ev_ops

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, "click", t0),
        (1, "view", t0 + dt.timedelta(minutes=10)),          # same session
        (1, "click", t0 + dt.timedelta(minutes=50)),         # gap 40min > 30 → new
        (2, "view", t0),                                     # other user
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")

    # reuse the operator's internals through a monkeypatched loader
    import capstone_etl_spark.operators.events as mod

    orig = mod._events
    mod._events = lambda spark, sf_dir: df
    try:
        out = {(r.user_id, r.session_seq): r for r in mod.sessionize(spark, "ignored").collect()}
    finally:
        mod._events = orig
    assert out[(1, 0)].n_events == 2
    assert out[(1, 1)].n_events == 1
    assert out[(2, 0)].n_events == 1
    assert out[(1, 0)].duration_sec == 600


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma"), (2, "gamma beta alpha")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.fingerprint for r in doc_fingerprint_df(df).collect()}
    assert fps[0] == fps[1]      # same content+order → same fingerprint
    assert fps[0] != fps[2]      # reordered tokens → different fingerprint

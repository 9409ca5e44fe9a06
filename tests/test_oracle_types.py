"""Static type audit of every registered DuckDB oracle.

The label_noise trio was driver-red for two rounds (r9-r10) because its
oracles' `n_agree` column was SUM(INTEGER) — DuckDB returns that as
HUGEINT, pandas renders HUGEINT as float64, and the driver's
stringified-value hash saw '2.0' against Spark's '2' while every
numeric comparison (including this repo's local gate before r11)
passed. A DESCRIBE scan showed those three queries were the ONLY
HUGEINT emitters in the registry; this test keeps it that way — a new
oracle with an un-CAST integer SUM fails here, at authoring time, not
two driver rounds later.

DESCRIBE only binds and plans (no execution), so the full 330-oracle
scan runs in seconds with no Spark session.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"

# DuckDB types whose pandas rendering diverges from the BIGINT/DOUBLE
# dtypes Spark produces for the same values. HUGEINT -> float64 ('2.0'
# vs '2') is the proven driver-red class. DECIMAL converts to float64
# too, which IS driver-safe when the Spark side is DOUBLE (three
# driver-green precedents: event_value_histogram r4,
# stream_quantile_sketch r8, conformal_coverage r9), so DECIMAL is
# allowed; the unsigned and nested-hugeint forms are not.
FORBIDDEN = ("HUGEINT", "UHUGEINT")


def test_no_hugeint_oracle_outputs():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    bad: dict[str, list[tuple[str, str]]] = {}
    errors: dict[str, str] = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 - surface as a failure below
            errors[name] = str(e)[:200]
            continue
        hits = [
            (col, typ)
            for col, typ, *_ in desc
            if any(typ == f or typ.startswith(f + "[") for f in FORBIDDEN)
            or "HUGEINT" in typ
        ]
        if hits:
            bad[name] = hits
    assert errors == {}, f"oracles that fail to bind: {errors}"
    assert bad == {}, (
        "oracles emitting HUGEINT (CAST the aggregate to BIGINT — "
        f"pandas renders HUGEINT as float64 and the driver hash sees "
        f"'2.0' vs Spark's '2'): {bad}"
    )


@pytest.mark.parametrize("probe", ["SUM(1::INTEGER)", "SUM(1::BIGINT)"])
def test_duckdb_integer_sum_is_hugeint(probe):
    """Pin the engine behavior the audit exists for: if a DuckDB
    upgrade ever changes SUM's return type to BIGINT, this fails and
    the FORBIDDEN scan above can be revisited."""
    con = duckdb.connect()
    (typ,) = [t for _, t, *_ in con.execute(f"DESCRIBE SELECT {probe} AS s").fetchall()]
    assert typ == "HUGEINT"

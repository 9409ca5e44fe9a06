"""Degenerate STAR-SCHEMA cross-engine sweep — the relational
counterpart of the documents/embeddings/events sweeps: all 35
relational queries run Spark-vs-DuckDB on a pathological 8-row
lineitem star. Stresses the edges a uniform generator never produces:
a customer with zero orders, an order with zero line items, a nation
with no customers, exact REVENUE TIES across customers/orders (top-k
tiebreak discipline), discount/tax at 0 and the max, quantity at both
interesting-literal boundaries, ship dates exactly ON query cutoff
literals, negative account balances (the Q22 avg filter), and
near-duplicate part names (the fuzzy-join band)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

import __spark_entry__ as entrymod
from capstone_etl_spark.operators import relational
from tools.check_correctness import compare

D = dt.datetime

REGION = [(0, "AMERICA"), (1, "ASIA")]
NATION = [(0, "BRAZIL", 0), (1, "JAPAN", 1), (2, "PERU", 0)]  # PERU: no customers
# custkey 4: zero orders, NEGATIVE balance; 1 and 2 tie on revenue
CUSTOMER = [
    (1, "Customer#1", 0, 100.0, "BUILDING", ),
    (2, "Customer#2", 1, 100.0, "BUILDING"),
    (3, "Customer#3", 0, 0.0, "MACHINERY"),
    (4, "Customer#4", 1, -999.99, "AUTOMOBILE"),
]
SUPPLIER = [(1, "Supplier#1", 0, 10.0), (2, "Supplier#2", 1, 10.0), (3, "Supplier#3", 2, -5.0)]
# near-duplicate names (fuzzy band), 'bolt' + PROMO literals, size extremes
PART = [
    (1, "large bolt", "Brand#1", "PROMO", 1, 100.0),
    (2, "large bolts", "Brand#1", "PROMO", 50, 100.0),
    (3, "cold widget", "Brand#2", "ECONOMY", 25, 50.0),
    (4, "cold widget", "Brand#3", "STANDARD", 25, 0.01),  # duplicate name
]
# order 50: no lineitems; orders 10/20 tie on totalprice; dates hit
# year boundaries and the pricing-summary cutoff window
ORDERS = [
    (10, 1, "O", 1000.0, D(1995, 1, 1), "1-URGENT"),
    (20, 2, "O", 1000.0, D(1995, 12, 31), "1-URGENT"),
    (30, 1, "F", 500.0, D(1996, 1, 1), "5-LOW"),
    (40, 3, "P", 0.01, D(1998, 9, 2), "3-MEDIUM"),
    (50, 3, "F", 750.0, D(2001, 8, 1), "2-HIGH"),
]
# orders 10 and 20 get IDENTICAL line items → exact revenue tie;
# discount 0 and 0.1, tax 0; qty at 1 and 50; returnflag R rows;
# one ship date exactly 1998-09-02 (the <= cutoff)
LINEITEM = [
    (10, 1, 1, 1, 10.0, 500.0, 0.0, 0.0, "N", "O", D(1995, 2, 1)),
    (10, 3, 2, 2, 1.0, 500.0, 0.1, 0.05, "R", "F", D(1995, 3, 1)),
    (20, 1, 1, 1, 10.0, 500.0, 0.0, 0.0, "N", "O", D(1996, 2, 1)),
    (20, 3, 2, 2, 1.0, 500.0, 0.1, 0.05, "R", "F", D(1996, 3, 1)),
    (30, 2, 2, 1, 50.0, 250.0, 0.05, 0.08, "A", "F", D(1996, 6, 1)),
    (30, 4, 3, 2, 50.0, 250.0, 0.05, 0.08, "A", "F", D(1996, 6, 2)),
    (40, 4, 3, 1, 25.0, 0.01, 0.0, 0.0, "N", "O", D(1998, 9, 2)),
    (40, 2, 1, 2, 25.0, 100.0, 0.02, 0.01, "R", "O", D(1998, 9, 1)),
]

NAMES = sorted(n for n in relational.QUERIES if n != "cooccurrence_triangles")
# cooccurrence_triangles included separately: it is the heaviest (cached
# iterative graph build) but still runs in seconds on 8 rows.
NAMES.append("cooccurrence_triangles")
# customer-shaped privacy audit: the NEGATIVE acctbal must floor to a
# negative balance band identically in both engines, and with 4 rows
# every QI group is below every k threshold
NAMES.append("k_anonymity_audit")


@pytest.fixture(scope="module")
def degen_star_sf(tmp_path_factory):
    import pandas as pd

    d = tmp_path_factory.mktemp("degen_star")
    tables = {
        "region": (REGION, ["r_regionkey", "r_name"], {"r_regionkey": "int32"}),
        "nation": (NATION, ["n_nationkey", "n_name", "n_regionkey"], {"n_nationkey": "int32", "n_regionkey": "int32"}),
        "customer": (CUSTOMER, ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"], {"c_custkey": "int64", "c_nationkey": "int32"}),
        "supplier": (SUPPLIER, ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"], {"s_suppkey": "int64", "s_nationkey": "int32"}),
        "part": (PART, ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"], {"p_partkey": "int64", "p_size": "int32"}),
        "orders": (ORDERS, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"], {"o_orderkey": "int64", "o_custkey": "int64"}),
        "lineitem": (
            LINEITEM,
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
             "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"],
            {"l_orderkey": "int64", "l_partkey": "int64", "l_suppkey": "int64", "l_linenumber": "int32"},
        ),
    }
    for name, (rows, cols, casts) in tables.items():
        pdf = pd.DataFrame(rows, columns=cols).astype(casts)
        for c in pdf.columns:
            # Spark's parquet reader rejects TIMESTAMP(NANOS); write µs
            if str(pdf[c].dtype).startswith("datetime64"):
                pdf[c] = pdf[c].astype("datetime64[us]")
        pdf.to_parquet(str(d / f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck(degen_star_sf):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{degen_star_sf}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", NAMES)
def test_degenerate_star_matches_oracle(spark, degen_star_sf, duck, name):
    from capstone_etl_spark.session import release_caches

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    try:
        spark_pdf = qs[name](spark, degen_star_sf).toPandas()
    finally:
        release_caches()
    duck_pdf = duck.execute(oracles[name]).df()
    assert compare(name, spark_pdf, duck_pdf) == []

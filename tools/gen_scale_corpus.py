"""Generate an R× scale-up of an existing testdata dir by replication
with per-replica decorrelation — the measured-scale-point harness
(VERDICT r7, item 2: every 100 TB claim extrapolated from one sf0.1
point; this makes a second, larger point measurable).

    python tools/gen_scale_corpus.py [--sf-dir SRC] [--out DST] [--reps R]

Default: 10× of /root/testdata/sf0.1 → /tmp/spark_graft_scale/sf1.0
(≈ sf1.0-equivalent row counts). The source testdata is read-only and
never modified; output lives under /tmp (scratch — the committed
artifacts are the generator, BENCH_scale_*.json, and SCALE.md).

Replication model (and what it does/doesn't measure):
- Fixed dimensions (region, nation) are copied once — like real TPC-H,
  a bigger corpus still has 25 nations.
- Fact/entity tables replicate R× with per-table key strides
  (key' = key + k·(max+1)) applied consistently to foreign keys, so
  referential integrity holds and per-key densities (orders/customer,
  lineitems/order, events/user) stay constant — the realistic growth
  mode where MORE entities arrive, not fatter ones.
- documents: Heaps-law-honest shared-vocabulary growth (VERDICT r8,
  item 4 — the old per-replica salt multiplied the type count
  LINEARLY with R, making every token-distinct-keyed exponent at the
  second decade a generator artifact). Replica 0 keeps the original
  text; in replica k>0 every token t gets the suffix
  'zr' || (hash(t, k) mod T) with tag-space T = round(√R), so:
  * each base type grows into ≈T(1-(1-1/T)^R) ≈ √R variants — the
    global type count scales ~N^0.5 (Heaps' β ≈ 0.5);
  * each variant appears in ≈R/T ≈ √R replicas — the grown
    vocabulary is SHARED across replicas and keeps the base Zipf
    shape (every variant's frequency = base frequency × R/T);
  * the tag depends only on (token, replica), so within one replica
    the salting is an exact isomorphic rename: TF vectors, df
    profiles and near-dup pairs inside each replica are preserved
    exactly;
  * cross-replica shingle collisions need all w tokens of a shingle
    to draw matching tags — probability T^(-w) ≈ 0 at w = 5 — so
    replicas still contribute no spurious near-dup pairs while
    common-shingle df grows mildly, as in a real corpus.
  n_chars is recomputed from the salted text.
- embeddings: deterministic per-(replica, vec, dim) jitter of ±0.05
  decorrelates replicas (no degenerate all-ties ANN distances) while
  keeping the cluster structure; labels are preserved.
- events: user_id strides (R× users at the same per-user rate over
  the same window — an R× event rate), timestamps unchanged.
"""

from __future__ import annotations

import argparse
import os

import duckdb

TABLES_COPY = ["region", "nation"]


def stride(con: duckdb.DuckDBPyConnection, src: str, table: str, col: str) -> int:
    return con.execute(f"SELECT MAX({col}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_scale/sf1.0")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    src, out, R = args.sf_dir, args.out, args.reps
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")

    for t in TABLES_COPY:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    c_n = stride(con, src, "customer", "c_custkey")
    s_n = stride(con, src, "supplier", "s_suppkey")
    p_n = stride(con, src, "part", "p_partkey")
    o_n = stride(con, src, "orders", "o_orderkey")
    e_n = stride(con, src, "events", "event_id")
    u_n = stride(con, src, "events", "user_id")
    d_n = stride(con, src, "documents", "doc_id")
    v_n = stride(con, src, "embeddings", "vec_id")

    rep = f"(SELECT unnest(range({R})) AS k)"

    def emit(table: str, select: str) -> None:
        con.execute(
            f"COPY (SELECT {select} FROM '{src}/{table}.parquet', {rep} r) "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    emit("customer", f"c_custkey + k * {c_n} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
    emit("supplier", f"s_suppkey + k * {s_n} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    emit("part", f"p_partkey + k * {p_n} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
    emit(
        "orders",
        f"o_orderkey + k * {o_n} AS o_orderkey, o_custkey + k * {c_n} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    emit(
        "lineitem",
        f"l_orderkey + k * {o_n} AS l_orderkey, l_partkey + k * {p_n} AS l_partkey, "
        f"l_suppkey + k * {s_n} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate",
    )
    emit(
        "events",
        f"event_id + k * {e_n} AS event_id, ts, user_id + k * {u_n} AS user_id, "
        "event_type, value, props",
    )
    # replica 0 keeps the original text; replica k>0 suffixes every
    # whitespace token t with a lowercase alphanumeric tag drawn from a
    # round(sqrt(R))-sized space via hash(t, k) — the tag survives the
    # engine's tokenize (lowercase + [^a-z0-9 ] strip), depends only on
    # (token, replica) so each replica is an exact isomorphic rename,
    # and the shared tag space makes the global type count grow ~sqrt(R)
    # (Heaps-honest) instead of linearly. See the module docstring.
    T = max(1, round(R**0.5))
    salted = (
        "array_to_string(list_transform(string_split(text, ' '), "
        "t -> CASE WHEN t = '' THEN t ELSE t || 'zr' || "
        f"CAST(hash(t || '|' || CAST(k AS VARCHAR)) % {T} AS VARCHAR) END), ' ')"
    )
    emit(
        "documents",
        f"""doc_id + k * {d_n} AS doc_id,
        CASE WHEN k = 0 THEN text ELSE {salted} END AS text,
        lang, source,
        CASE WHEN k = 0 THEN n_chars ELSE length({salted}) END AS n_chars""",
    )
    # deterministic ±0.05 jitter per (replica, vec, dim): decorrelates
    # replicas without moving cluster structure.
    emit(
        "embeddings",
        f"""vec_id + k * {v_n} AS vec_id,
        CASE WHEN k = 0 THEN embedding
             ELSE list_transform(
               list_zip(embedding, range(1, len(embedding) + 1)),
               z -> CAST(z[1] + ((CAST(hash(vec_id * 1000 + CAST(z[2] AS BIGINT) * 17 + k)
                                        % 2001 AS BIGINT) - 1000) * 0.00005) AS FLOAT))
        END AS embedding,
        label""",
    )
    print(f"wrote {out} at {R}x of {src}")


if __name__ == "__main__":
    main()

"""Dump `.explain("formatted")` for named queries to files.

    python tools/dump_query_plan.py OUTDIR SUFFIX q1 q2 ...

Writes OUTDIR/<query>_<SUFFIX>.txt for each query (e.g.
plans/r11/lm_greedy_decode_before.txt). Uses the same session shape as
tools/dump_plans.py (8 cores, sf0.01 by default) so plan captures are
comparable across rounds.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from capstone_etl_spark.session import get_spark, release_caches


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plandump", cpus=8, shuffle_partitions=8)
    qs = entrymod.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        release_caches()
        print(f"# wrote {path} ({len(txt.splitlines())} lines)", file=sys.stderr)


if __name__ == "__main__":
    main()

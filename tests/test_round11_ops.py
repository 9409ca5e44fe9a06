"""Round-11 pins: the bitext per-source candidate cap.

The r11 scale campaign measured the uncapped within-cell pair relation
at decade-2 exponent 1.41 (BENCH_scale_r11.json) — Σ popA·popB is
≈N^1.5 in aggregate even though each cell is bounded — and replaced it
with _bitext_capped_pairs: each source keeps its top-BITEXT_C
within-cell cosines, scored in-row against per-cell target posting
arrays. These tests pin the two properties the fix rests on:

1. the cap actually bounds the relation (≤C rows per source), and
2. the in-row array form is EXACTLY the windowed ROW_NUMBER form the
   DuckDB oracle runs (same sims, same (sim desc, tgt asc) tiebreak,
   NULL sims dropped) — the equivalence that keeps the operator
   oracle-green while never materializing the N^1.5 relation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_bitext_capped_pairs_bounds_and_matches_window_form(spark, sf_dir):
    from capstone_etl_spark.operators.similarity import (
        BITEXT_C,
        _bitext_capped_pairs,
        hier_assign,
        qcosine,
        quantize_fp,
    )
    from capstone_etl_spark.session import release_caches
    from capstone_etl_spark.sources.tables import load_table

    try:
        emb = load_table(spark, sf_dir, "embeddings")
        emb_q = emb.select("vec_id", quantize_fp().alias("vq"))
        assign = hier_assign(emb_q).select("vec_id", "cell")
        withe = assign.join(emb.select("vec_id", "embedding"), "vec_id")
        a = withe.filter(F.col("vec_id") % 2 == 0).select(
            F.col("vec_id").alias("src_id"), "cell", F.col("embedding").alias("qe")
        )
        b = withe.filter(F.col("vec_id") % 2 == 1).select(
            F.col("vec_id").alias("tgt_id"), "cell", F.col("embedding").alias("ne")
        )
        capped = {
            (r.src_id, r.tgt_id): r.sim
            for r in _bitext_capped_pairs(a, b).collect()
        }
        # 1. bound: no source exceeds BITEXT_C candidates
        per_src: dict[int, int] = {}
        for (s, _t) in capped:
            per_src[s] = per_src.get(s, 0) + 1
        assert per_src and max(per_src.values()) <= BITEXT_C

        # 2. equivalence with the oracle's windowed form over the full
        # within-cell pair relation
        w = Window.partitionBy("src_id").orderBy(F.desc("sim"), F.asc("tgt_id"))
        windowed = {
            (r.src_id, r.tgt_id): r.sim
            for r in (
                a.join(b, "cell")
                .select("src_id", "tgt_id", F.round(qcosine("qe", "ne"), 6).alias("sim"))
                .filter(F.col("sim").isNotNull())
                .withColumn("crk", F.row_number().over(w))
                .filter(F.col("crk") <= BITEXT_C)
                .drop("crk")
            ).collect()
        }
        assert capped == windowed
    finally:
        release_caches()

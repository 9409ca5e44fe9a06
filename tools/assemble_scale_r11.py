"""Assemble BENCH_scale_r11.json from the round-11 scale-point logs.

Reads the JSON lines produced by tools/run_scale_point.py at sf0.1
(/tmp/scale_sf01.out), sf1.0 (/tmp/scale_sf1.out) and sf10
(/tmp/scale_sf10.out), merges them and computes per-decade exponents.
One-shot helper; the committed artifact is BENCH_scale_r11.json.

Round-11 measurement goals (VERDICT r10 asks #2 and #4):
- the label_noise family re-measured after its re-block onto the
  two-level hier router (flat assignment measured decade-2 1.34 in
  r10 — the last superlinear family member);
- first decade-2 points for the two heaviest streaming compositions,
  stream_bitext_mining and stream_training_manifest, with the
  memory-sink harness caps raised (SPARK_GRAFT_MAX_RESULT=12g,
  SPARK_GRAFT_STREAM_TIMEOUT_SEC=3600 — the drain is a TEST-harness
  collect; a deployment writes a real sink).
"""

from __future__ import annotations

import json
import math
import re


def from_log(path: str) -> dict[str, float]:
    out: dict[str, float] = {}
    txt = open(path, errors="replace").read()
    m = re.findall(r'\{"sf_dir".*\}', txt)
    if m:
        out.update(json.loads(m[-1])["queries"])
    for name, sec in re.findall(r"# ([a-z0-9_]+): ([0-9.]+)s \(", txt):
        out.setdefault(name, float(sec))
    return out


def main() -> None:
    sf01 = from_log("/tmp/scale_sf01.out")
    sf1 = from_log("/tmp/scale_sf1.out")
    # the sf10 run is split: the first attempt raised the result cap
    # (SPARK_GRAFT_MAX_RESULT=12g) ABOVE the default 8g driver heap
    # and OOM'd — local[32] puts all 32 executor threads plus the
    # driver in one JVM, so the heap must dominate the result cap.
    # Parts A (label_noise family) and B (streaming compositions)
    # re-ran with SPARK_GRAFT_DRIVER_MEM=24g.
    sf10 = from_log("/tmp/scale_sf10a.out")
    sf10.update(from_log("/tmp/scale_sf10b.out"))
    # bitext re-measured AFTER the same-session fix: the uncapped
    # candidate relation measured decade-2 exponent 1.41 (2007.0 s at
    # sf10, stream) — the within-cell pair stage shuffled ≈N^1.5 rows
    # and the streaming twin drained them all through the memory sink.
    # The shipped code caps each source at its top-BITEXT_C within-cell
    # cosines (the CCMatrix FAISS-retrieval semantic), scored in-row
    # against per-cell target arrays; these logs replace the uncapped
    # bitext points so the artifact reflects the shipped operator.
    for log, d in (
        ("/tmp/rescale_sf01.out", sf01),
        ("/tmp/rescale_sf1.out", sf1),
        ("/tmp/rescale_sf10.out", sf10),
        # stream_training_manifest sf10 re-measured at 96g after the
        # 64g point (986.3 s) logged repeated TaskMemoryManager
        # page-allocation failures: 725.7 s with ZERO allocation
        # failures — the properly-provisioned harness point (the 26%
        # gap is single-JVM memory pressure, confirmed by experiment,
        # not operator shape).
        ("/tmp/retest_manifest96.out", sf10),
    ):
        d.update(from_log(log))
    exps1 = {q: round(math.log10(sf1[q] / sf01[q]), 2) for q in sf01 if q in sf1}
    exps2 = {q: round(math.log10(sf10[q] / sf1[q]), 2) for q in sf1 if q in sf10}
    doc = {
        "exponents": {
            "decade1_sf0.1_to_sf1.0": exps1,
            "decade2_sf1.0_to_sf10": exps2,
        },
        "sf0.1": {"queries": {k: round(v, 3) for k, v in sf01.items()}},
        "sf1.0": {"queries": {k: round(v, 3) for k, v in sf1.items()}},
        "sf10": {"queries": {k: round(v, 3) for k, v in sf10.items()}},
        "note": (
            "round-11 measured scale points: same host, local[32], "
            "back-to-back runs via tools/run_scale_point.py (bench-grade "
            "forcing; scale corpora regenerated deterministically by "
            "tools/gen_scale_corpus.py). The label_noise family is "
            "re-measured after its re-block onto the two-level hier "
            "router + exact integer squared-L2 vote rank (r11); "
            "stream_bitext_mining and stream_training_manifest carry "
            "their FIRST decade-2 points, run with the memory-sink "
            "harness caps raised (SPARK_GRAFT_MAX_RESULT, "
            "SPARK_GRAFT_STREAM_TIMEOUT_SEC, SPARK_GRAFT_DRIVER_MEM) — "
            "the drained result collect is a TEST-harness artifact; a "
            "deployment writes a real sink. The bitext rows are the "
            "SHIPPED per-source-capped candidate form (BITEXT_C), "
            "re-measured same-session after the uncapped relation "
            "measured decade-2 exponent 1.41 (2007.0 s at sf10, stream; "
            "3.8x slower than shipped) — SCALE.md round-11 section "
            "tells the full story."
        ),
    }
    json.dump(doc, open("BENCH_scale_r11.json", "w"), indent=1)
    print(json.dumps(doc["exponents"], indent=1))


if __name__ == "__main__":
    main()

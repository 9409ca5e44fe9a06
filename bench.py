"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced by hashing EVERY output column into a 1-row
aggregate (xxhash64 over string-cast columns, summed). A bare count()
would let Catalyst prune unreferenced projections (decimal sums, tfidf
logs would never execute) and under-measure; the hash forces every
value to materialize while still collecting only one row.

Cross-round comparability: BENCH_r01 was taken with count() forcing
(per-round ADVICE flagged it as under-measuring — e.g. pricing_summary's
decimal sums were pruned entirely) and a 10-query headline set; from r2
on, timings are full-materialization over 11 queries (wikibooks_docs —
the reference's entire job — added). r2+ totals are therefore higher AND
more honest than r1's; compare per-query, not totals, across that line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from capstone_etl_spark.session import get_spark, release_caches
from pyspark.sql import functions as F

# Headline set: the reference-parity text pipeline end-to-end plus the
# heavy relational queries (fact-fact join, multi-join, window rank).
# wikibooks_docs is the reference's ENTIRE job in one query (hierarchy +
# counts + tokens + norms composed per page) — the throughput number to
# hold against BASELINE.md's ≤1,000 rows/s structural ceiling.
HEADLINE = [
    "tf_per_doc",
    "doc_stats",
    "inverted_index",
    "sparse_vectors",
    "tf_idf",
    "wikibooks_docs",
    "pricing_summary",
    "top_customers",
    "revenue_by_nation",
    "orders_per_customer_rank",
    "order_date_rollup",
    # r3+: the LLM-layer flagships, so dedup-family perf is tracked
    # round-over-round, not just the reference-parity core. The first
    # 11 queries are unchanged — compare per-query across rounds.
    "dedup_minhash_lsh",
    "corpus_pipeline",
    # r4+: packing and semantic dedup join the tracked set (first
    # tracked round — no prior to compare; the gate skips them).
    "sequence_packing_greedy",
    "semantic_dedup",
    # r4 continuation: quality gating, the unigram-LM score, and the
    # KMV sketch — the new families' perf tracked from day one.
    "quality_filter_funnel",
    "unigram_logprob",
    "kmv_distinct_shingles",
    # r5: the bigram LM (heaviest new textstat) and the Q2 shape
    # (heaviest new relational join) join the tracked set.
    "bigram_lm_perplexity",
    "min_cost_supplier",
    # r5 training-pipeline batch: the iterative linear algebra, the
    # vocabulary-free vectorizer, and the epoch shuffle (dense-id
    # machinery under a second consumer) — tracked from day one.
    "pca_power_iteration",
    "feature_hashing_vectors",
    "training_shuffle",
    # r5 session 2: the pointer-doubling rollup (heaviest new join
    # chain), the DSIR scorer, and the wedge-closing triangle join —
    # tracked from day one.
    "hierarchy_rollup",
    "dsir_importance",
    "cooccurrence_triangles",
    # r5 session 4: the privacy scrub passes (scan-speed canaries —
    # pii_redaction is the zero-exchange map-only specimen), the CCNet
    # line-dedup audit, the IVF-PQ composition (heaviest new ANN), and
    # the SCD gaps-and-islands chain — tracked from day one.
    "pii_redaction",
    "boilerplate_lines",
    "ann_ivf_pq_topk",
    "event_scd_intervals",
    # r6: the BT preference fit (iterative MM over bucket-champion
    # duels — the checkpoint-per-round loop's cost canary), the
    # structural template miner (map + one groupBy specimen), and the
    # double-brute Matryoshka eval — tracked from day one.
    "bt_source_ratings",
    "template_extraction",
    "matryoshka_recall",
    # r7: the full BPE learn->encode arc (corpus-shuffle + iterative
    # vocab loop + encode join) and the unigram-LM Viterbi DP —
    # tracked from day one.
    "bpe_encode",
    "unigram_tokenizer",
    # r7: the composed admission chain (corpus_pipeline + benchmark
    # screen + shard manifest) — the heaviest new composition.
    "training_manifest",
    # r7 session 2: the CDC argmax apply (one-shuffle MERGE canary),
    # the unthresholded candidate sweep (the production pair join's
    # cost, measured without its filter), and the shared-Lloyd
    # silhouette (two assignment rounds + runner-up window) — tracked
    # from day one.
    "event_changelog_apply",
    "dedup_threshold_sweep",
    "kmeans_silhouette",
    # r7 session 3: the multi-grain CUBE inventory (grouping-sets
    # shuffle specimen) and the perceptual-hash image dedup (per-byte
    # explode + pigeonhole block join) — tracked from day one.
    "corpus_cube",
    "multimodal_phash_dedup",
    # r7 session 3: sorted-neighborhood blocking (global range sort +
    # rank-window expansion + candidate-bounded verify — the linear-
    # candidate dedup specimen) — tracked from day one.
    "dedup_sorted_neighborhood",
    # r7 session 4: bipartite LSH decontamination (bucket join across
    # the train/bench cut + cosine verify + argmax rollup) and the
    # curriculum order (difficulty deciles → dense-id global sort +
    # 10-row offset recovery) — tracked from day one.
    "semantic_decontamination",
    "curriculum_schedule",
    # r7 session 5: the LOSO data-valuation pass (two token-keyed
    # shuffles + leave-one-out column math on the source×token spine),
    # the cell-medoid coreset (quantizer assignment + Σpop² bounded
    # within-cell pairwise), and the Heaps'-law growth fit (first-seen
    # trick: cumulative distinct counts from ONE groupBy + a 10-row
    # checkpoint join, never a rescan per prefix) — tracked from day
    # one.
    "source_loso_influence",
    "ivf_cell_medoids",
    # r9: the two-level coarse quantizer — the production mitigation
    # for the measured flat-IVF N^1.5 assignment frontier (SCALE.md);
    # benched beside the flat-assignment family (ann_ivf_pq_topk,
    # ivf_cell_medoids) so the crossover is tracked per round.
    "ann_hivf_topk",
    # r9: the medoid release with BOTH measured N^1.5 terms paid down
    # (two-level assignment + sampled-candidate medoid, O(N*M) pairwise)
    "hivf_cell_medoids",
    # r9: the rank-adaptive mergeable quantile sketch (level-subsample,
    # ~K survivors per source) + its ingest twin, and the flagship
    # admission chain composed as one streaming query.
    "kll_quantile_sketch",
    "kll_sketch_merge",
    "stream_kll_sketch",
    "stream_training_manifest",
    # r9 (cont.): SemDeDup on the two-level router, the serving twin,
    # the index health audit, and the margin bitext miner — tracked
    # from day one.
    "semantic_dedup_hier",
    "stream_ann_hivf_topk",
    "hivf_cell_balance",
    "bitext_mining",
    # r9 (cont.): the per-subspace two-level PQ encode — the last
    # measured flat-quantizer N^1.5 term paid down.
    "pq_hier_distortion_audit",
    # r10: the production serving shape with NO flat O(N*sqrt(N)) term —
    # the two-level coarse router composed with per-subspace hier codes
    # and ADC ranking; benched beside ann_ivf_pq_topk for the crossover.
    "ann_hivf_pq_topk",
    "stream_ann_hivf_pq_topk",
    "heaps_law_fit",
    # r7 session 5 (cont.): the train-LM split scoring (token-shuffle
    # bound), the bounded-pair basket miner, and the fixed-round LP
    # community loop (the iterative-graph specimen alongside
    # hierarchy_rollup) — tracked from day one.
    "split_perplexity_gap",
    "association_rules",
    "label_propagation",
    # r8: the remaining session-5 operators join the tracked set so the
    # per-query regression gate covers every round-7 family (VERDICT r7
    # item 4): corpus concentration (token_gini), the KM curve
    # (conversion_survival), the chi-square load shape
    # (event_seasonality), the contrastive sampling table, the
    # rendezvous shard assignment, and the l-diversity audit.
    "token_gini",
    "conversion_survival",
    "event_seasonality",
    "negative_sampling_table",
    "rendezvous_sharding",
    "l_diversity_audit",
    # r8: first streaming queries in the tracked set — each runs a real
    # Structured Streaming job (stage → replay → drain), so their
    # seconds measure the ingest-time path end-to-end, not a batch
    # plan; PLANS.md carries no plan dump for them (streaming sinks
    # have no stable batch plan to record).
    "stream_ab_test",
    # r8 additions — tracked from day one.
    "dedup_clusters_incremental",
    "stream_conversion_survival",
    # r8 session 2 — tracked from day one: the sequential-pattern
    # census, the sessionized next-event examples, the T5 span masks,
    # the KN-smoothed LM, the per-source datasheet, the DP median, and
    # the streaming quantile sketch.
    "event_frequent_sequences",
    "next_event_examples",
    "span_corruption_masks",
    "kneser_ney_bigram",
    "dataset_card",
    "dp_quantile_release",
    "stream_quantile_sketch",
    # r8 session 3 — tracked from day one: the IVF probe sweep, the
    # sketch set-difference, the streaming PSI monitor, the Group-DRO
    # mixer, and chunk-level BM25 retrieval.
    "ivf_probe_recall_curve",
    "kmv_set_difference",
    "stream_psi_drift",
    "group_dro_weights",
    "rag_chunk_retrieval",
    # r8 session 4 — tracked from day one: the CLIP-style pair
    # admission filter and the ingest-time Group-DRO mixer.
    "multimodal_caption_pairs",
    "stream_group_dro",
    # r8 session 5 — tracked from day one: the U-shaped attribution
    # rollup (two user-window passes), the bot-regularity screen (one
    # LAG window + user agg), and the in-engine logistic GD trainer
    # (LOGIT_ROUNDS scalar aggregates over one cached feature pass —
    # the per-round-driver-work cost canary for supervised loops).
    "event_attribution_credit",
    "event_bot_score",
    "logistic_conversion_model",
    # r8 session 5 (cont.): the in-engine Naive Bayes source
    # classifier — two token-keyed shuffles + an argmax window, the
    # learned-classifier cost canary next to the heuristic language_id.
    "naive_bayes_source_model",
    # r8 session 5 (cont.): the two-sample KS drift audit — the
    # distinct-length-domain window specimen (one hash agg + a
    # |sources|-row grid broadcast, never an N-row window).
    "ks_source_drift",
    # r8 session 5 (cont.): the KS audit at ingest — bounded
    # (source, length-domain) streaming state + the shared ECDF tail.
    "stream_ks_drift",
    # r8 session 5 (cont.): the WoE/IV feature screen — shares the
    # logistic trainer's cached feature pass; one 4*B-key hash agg.
    "woe_feature_bins",
    # r8 session 5 (cont.): the reliability readout — _fit_logit's
    # full 15-round trainer plus one CAL_BINS-key hash agg, so the
    # trained-model arc's cost is tracked end-to-end.
    "conversion_model_calibration",
    # r8 session 5 (cont.): cross-source quantile calibration — the
    # dense-id global ranking under a third consumer plus a rank-keyed
    # equi-join.
    "quantile_normalization",
    # r8 session 5 (cont.): the Markov next-event baseline eval — one
    # lag+rank window pass + a |types|-row broadcast eval join.
    "markov_next_accuracy",
    # r8 session 5 (cont.): greedy LM inference in-engine — one shared
    # tokenize pass + DECODE_STEPS 1-row probe joins.
    "lm_greedy_decode",
    # r8 session 5 (cont.): the PQ codebook health audit — reuses the
    # subspace-distance fold; one PQ_M-key hash agg on top.
    "pq_distortion_audit",
    # r8 session 5 (cont.): RFM cohorting — three with_dense_ids
    # global rankings over the user relation + three user-keyed joins.
    "rfm_segments",
    # r8 session 5 (cont.): RFM at ingest — order-free per-user state
    # + the shared ranking tail on the drained snapshot.
    "stream_rfm_segments",
    # r8 session 5 (cont.): the classifier trained at ingest —
    # Heaps-bounded (token, source) streaming state + the shared
    # nb_release scoring tail against the static held-out docs.
    "stream_naive_bayes",
    # r8 session 5 (cont.): the Poisson bootstrap — xBOOT_B map-side
    # explode + one B-key agg; the scale-out resampling shape.
    "bootstrap_ci",
    # r8 session 5 (cont.): split-conformal prediction — the train-only
    # chain + one dense-id order statistic + one broadcast comparison.
    "conformal_coverage",
    # r8 session 5 (cont.): CUPED — one user-keyed pre/post agg + a
    # 1-row pooled-theta broadcast over the 2-row variant rollup.
    "event_cuped_adjustment",
    # r8 session 5 (cont.): CUPED at ingest — order-free per-user
    # pre/post decimal state + the shared theta/variance tail.
    "stream_cuped",
    # r8 session 5 (cont.): the skyline operator — per-length maxima +
    # a distinct-length-domain cumulative-max window, never O(N^2).
    "pareto_frontier_docs",
    # r8 session 5 (cont.): the skyline at ingest — length-domain MAX
    # state + the shared cumulative-max tail on the drained maxima.
    "stream_pareto_frontier",
    # r8 session 5 (cont.): the Poisson-assumption audit — two hash
    # aggs, exact integer moments.
    "event_overdispersion",
    # r9 valuation: closed-form KNN-Shapley (eval-bounded brute scan +
    # one suffix-window pass) and the within-cell K-NN label screen
    # (semantic_dedup's blocking law).
    "knn_shapley_values",
    "label_noise_audit",
    # r9 valuation (cont.): greedy k-center coreset (K fixed linear
    # passes) and MMR diversification (retrieve once, then rounds over
    # the C-candidate lists only).
    "kcenter_coreset",
    "mmr_diversified_topk",
    # r9 valuation (cont.): the delta-vs-base label screen and its
    # stateless ingest twin (per-row routing against the static index).
    "label_noise_incremental",
    "stream_label_noise",
    # r9 valuation (cont.): the coreset's assignment-health audit and
    # the per-dimension encoder-drift screen (one DIM-group aggregate).
    "coreset_coverage_audit",
    "embedding_shift_audit",
    # r9 valuation (cont.): the drift screen and coverage dashboard at
    # ingest — DIM-row and KCENTER_K-row state stores respectively.
    "stream_embedding_shift",
    "stream_coreset_coverage",
    # r9 valuation flagship: the composed keep/drop manifest — one
    # shared quantizer assignment feeds the SemDeDup and label-vote
    # gates, the Shapley gate joins in.
    "embedding_curation_manifest",
    # r9: Brown's double exponential smoothing — trend + one-step
    # forecast over the calendar-bounded daily relation, exact integer
    # kernels in both passes.
    "event_double_ewma",
]


def _latest_round_no() -> int:
    """Highest N among driver-recorded BENCH_r{N}.json files (0 when
    none exist). The current run is therefore round N+1."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [0]
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds)


def _prior_round_doc() -> dict:
    """Payload of the most recent benchmark round, for the regression
    gate. Prefers this repo's own full-fidelity BENCH_full_r{N}.json
    (written by main() below — the driver's BENCH_r{N}.json keeps only
    a 2000-char stdout tail, which the 95-query map outgrew in round 8,
    leaving `parsed: null`); falls back to the driver artifact's parsed
    payload. Empty dict when nothing prior exists or nothing parses —
    never raises (VERDICT r8: `parsed: null` must not crash the bench)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds: dict[int, dict[str, str]] = {}
    for kind, pat in (("full", "BENCH_full_r*.json"), ("driver", "BENCH_r*.json")):
        for path in glob.glob(os.path.join(here, pat)):
            m = re.search(r"BENCH(?:_full)?_r(\d+)\.json$", path)
            if m:
                rounds.setdefault(int(m.group(1)), {})[kind] = path
    if not rounds:
        return {}
    # Only rounds the DRIVER has recorded (a BENCH_r{N}.json exists)
    # are eligible priors: bench.py writes BENCH_full_r{N+1} for the
    # CURRENT round before the driver records it, and the driver's own
    # extra runs land there too (the r12 slot held the driver's 8-core
    # scaling run) — without this guard the regression gate would
    # baseline against this round's own partial artifacts instead of
    # the last completed round (VERDICT r11: baselines must be one
    # comparable run's output).
    cur = _latest_round_no()
    eligible = {n: v for n, v in rounds.items() if n <= cur}
    if not eligible:
        return {}
    latest = eligible[max(eligible)]
    for kind in ("full", "driver"):
        path = latest.get(kind)
        if not path:
            continue
        try:
            with open(path) as f:
                doc = json.load(f)
            payload = (doc.get("parsed") or doc) if isinstance(doc, dict) else None
            if isinstance(payload, dict) and payload:
                return payload
        except (OSError, ValueError, TypeError, AttributeError):
            continue
    return {}


def _prior_round_timings() -> dict[str, float]:
    """Per-query seconds from the most recent benchmark round, for the
    regression gate. Empty dict when no prior round exists."""
    q = _prior_round_doc().get("queries")
    return dict(q) if isinstance(q, dict) else {}


def _prior_round_sf() -> float | None:
    """The sf the most recent benchmark round was taken at (None when no
    prior round exists or it carries no sf)."""
    v = _prior_round_doc().get("sf")
    try:
        return float(v) if v is not None else None
    except (ValueError, TypeError):
        return None


def _noted_regressions() -> set[str]:
    """Queries PLANS.md explicitly allows to regress (lines of the form
    `regression-ok: <query> — reason`)."""
    import re

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md")
    try:
        with open(path) as f:
            return set(re.findall(r"^regression-ok:\s*(\S+)", f.read(), re.M))
    except OSError:
        return set()


# Per-query regression gate vs the prior round (VERDICT r3 #6): warn at
# >1.25x, fail at >1.5x unless PLANS.md carries a regression-ok note for
# the query. Sub-second priors are skipped (scheduling jitter dominates).
#
# Ratios are HOST-NORMALIZED: rounds run on whatever machine the driver
# lands on, and a slower host moves every query by the same factor — raw
# wall-clock compare would fail the whole round on a hardware change
# (observed r3→r4: a uniform ~1.5x across pure scans and shuffles
# alike). The host factor is calibrated from a FIXED PROBE — a
# spark.range workload of built-ins that never touches engine code, so
# its round-over-round ratio measures the machine, not the engine
# (ADVICE r4 #2: the previous median-of-ratios normalization would
# absorb a uniform engine-wide regression into the 'host factor'; the
# probe cannot). The probe time is emitted in the bench JSON
# (probe_sec) so the next round can ratio against it. Fallback when
# the prior round has no probe (≤ r4): median per-query ratio, CAPPED
# at HOST_FACTOR_BOUND so even the fallback cannot silently absorb a
# >2x uniform regression.
WARN_RATIO = 1.25
FAIL_RATIO = 1.5
MIN_PRIOR_SEC = 0.5
HOST_FACTOR_BOUND = 2.0
# Absolute floor for FAILING (warns still print): per-query cold wall
# includes ~1-2s of codegen compile + scheduling jitter regardless of
# query size, so a ratio on a small delta is noise, not signal.
MIN_FAIL_DELTA_SEC = 2.0


def _exec_totals(spark) -> dict | None:
    """Cumulative deterministic execution counters from the
    AppStatusStore (VERDICT r11 #2: put counters in the bench contract
    so perf verdicts stop hinging on the host probe): jobs, stages,
    tasks, shuffle read/write bytes. Cheap by construction — two
    list-size calls plus the per-executor totals (one object in local
    mode), never a per-element iteration, so capturing between queries
    costs microseconds and nothing inside the timed region. Returns
    None if the py4j surface drifts (counters then just drop out of
    the JSON — additions-only contract)."""
    try:
        store = spark._jsc.sc().statusStore()
        n_jobs = store.jobsList(None).size()
        # Spark 4.1 stageList has no default-arg form in bytecode:
        # (statuses, details, withSummaries, unsortedQuantiles, taskStatus)
        jvm = spark._jvm
        n_stages = store.stageList(
            jvm.java.util.ArrayList(),
            False,
            False,
            spark.sparkContext._gateway.new_array(jvm.double, 0),
            jvm.java.util.ArrayList(),
        ).size()
        tasks = shuf_r = shuf_w = 0
        eit = store.executorList(False).iterator()
        while eit.hasNext():
            e = eit.next()
            tasks += e.completedTasks()
            shuf_r += e.totalShuffleRead()
            shuf_w += e.totalShuffleWrite()
        return {
            "jobs": n_jobs,
            "stages": n_stages,
            "tasks": tasks,
            "shuffle_read": shuf_r,
            "shuffle_write": shuf_w,
        }
    except Exception:
        return None


def _host_probe(spark) -> float:
    """Fixed engine-independent workload (range → hash → groupBy →
    sort): its wall-clock depends on the machine only, so the ratio to
    the prior round's probe_sec IS the host factor. Min of two runs to
    damp scheduling jitter."""
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df = spark.range(2_000_000).select(
            (F.col("id") % 1000).alias("k"),
            F.md5(F.col("id").cast("string")).alias("s"),
        )
        df.groupBy("k").agg(
            F.sum(F.xxhash64("s").cast("decimal(38,0)")).alias("h")
        ).orderBy("k").collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _prior_probe_sec() -> float | None:
    v = _prior_round_doc().get("probe_sec")
    try:
        return float(v) if v else None
    except (ValueError, TypeError):
        return None


def _host_factor(timings: dict[str, float], probe_sec: float, emit: bool = True) -> float:
    import statistics

    prior = _prior_round_timings()
    raw = {
        name: now / prior[name]
        for name, now in timings.items()
        if prior.get(name) and prior[name] >= MIN_PRIOR_SEC
    }
    median = statistics.median(raw.values()) if len(raw) >= 5 else 1.0
    prior_probe = _prior_probe_sec()
    if prior_probe:
        host = probe_sec / prior_probe
        if emit:
            print(
                f"# host factor {host:.2f}x (probe {prior_probe:.2f}s -> {probe_sec:.2f}s)",
                file=sys.stderr,
            )
            if median > host * WARN_RATIO:
                print(
                    f"# warn: median query ratio {median:.2f}x exceeds probe-derived "
                    f"host factor {host:.2f}x — engine-wide slowdown, not hardware",
                    file=sys.stderr,
                )
    else:
        # ≤ r4 BENCH files carry no probe — median fallback, bounded so a
        # uniform engine regression beyond 2x cannot pass as 'hardware'
        host = min(median, HOST_FACTOR_BOUND)
        if emit and median > HOST_FACTOR_BOUND:
            print(
                f"# warn: median ratio {median:.2f}x exceeds HOST_FACTOR_BOUND "
                f"{HOST_FACTOR_BOUND}x — treating the excess as a regression",
                file=sys.stderr,
            )
    return max(host, 1.0)  # a faster host never excuses a regression


def _fail_candidates(
    timings: dict[str, float], probe_sec: float, host: float | None = None
) -> list[str]:
    """Queries whose timing would trip the FAIL gate. Run BEFORE the
    JSON line is printed, so main() can re-measure each candidate once
    and keep the min — a one-off host stall (GC pause, page-cache
    eviction, a co-tenant burst) lands on one observation of one
    query, so a transient cannot strike the same query twice, while a
    genuine plan regression reproduces on the immediate re-run
    (VERDICT r6: a mid-sequence stall timed revenue_by_nation at 8.64s
    vs a clean 1.44s and failed the whole round). `host` lets main()
    pin ONE host-factor snapshot across the screen and the final gate
    — on the no-probe median fallback, retiming shifts the median, and
    a gate recomputing host post-retime could fail a query the screen
    never offered a re-measure."""
    prior = _prior_round_timings()
    noted = _noted_regressions()
    if host is None:
        host = _host_factor(timings, probe_sec, emit=False)
    out = []
    for name, now in timings.items():
        was = prior.get(name)
        if not was or was < MIN_PRIOR_SEC:
            continue
        ratio = (now / was) / host
        if ratio > FAIL_RATIO and (now - was) > MIN_FAIL_DELTA_SEC and name not in noted:
            out.append(name)
    return out


def _regression_gate(
    timings: dict[str, float], probe_sec: float, host: float | None = None
) -> int:
    prior = _prior_round_timings()
    noted = _noted_regressions()
    if host is None:
        host = _host_factor(timings, probe_sec, emit=True)
    if host > 1.0:
        print(f"# host factor {host:.2f}x applied", file=sys.stderr)
    failures = 0
    for name, now in timings.items():
        was = prior.get(name)
        if not was or was < MIN_PRIOR_SEC:
            continue
        ratio = (now / was) / host
        if ratio > FAIL_RATIO and (now - was) > MIN_FAIL_DELTA_SEC and name not in noted:
            print(
                f"# REGRESSION {name}: {was:.3f}s -> {now:.3f}s ({ratio:.2f}x) "
                f"— add a `regression-ok: {name}` note to PLANS.md if intended",
                file=sys.stderr,
            )
            failures += 1
        elif ratio > WARN_RATIO:
            print(
                f"# warn {name}: {was:.3f}s -> {now:.3f}s ({ratio:.2f}x)",
                file=sys.stderr,
            )
    return failures


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [n for n in sys.argv[1:] if n in qs]

    # Warm the JVM before timing: parquet footer reads, whole-stage
    # codegen compilation, one shuffle exchange and one broadcast —
    # otherwise the first measured query absorbs one-time startup cost
    # that is not query work.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    warm = spark.range(100_000).select(
        (F.col("id") % 97).alias("k"), F.md5(F.col("id").cast("string")).alias("s")
    )
    warm.groupBy("k").agg(F.count("*"), F.sum(F.xxhash64("s").cast("decimal(38,0)"))).collect()
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).count()

    # the host-calibration probe runs warmed, before the timed queries
    probe_sec = _host_probe(spark)

    # Warm the FIRST headline query's exact lineage untimed: the
    # generic warmup above compiles range/join codegen but NOT the
    # parquet+tokenize+explode classes the first real query needs —
    # the r5 driver run charged ~6s of that one-time compilation to
    # tf_per_doc and doc_stats (raw 9.16s vs 3.2s expected from the
    # probe-normalized local run) and tripped the regression gate on a
    # measurement artifact, not a plan change.
    if names:
        w = qs[names[0]](spark, sf_dir)
        w.agg(
            F.sum(
                F.xxhash64(*[F.col(c).cast("string") for c in w.columns]).cast("decimal(38,0)")
            )
        ).collect()
        release_caches()

    # Streaming-machinery warmup (r11, guide §1: don't charge one-time
    # engine compilation to the first measured query): the first
    # stream_* query in the sequence used to absorb the one-time
    # micro-batch-planner / state-store / streaming-codegen compilation
    # — measured ~6-9 s of stream_ab_test's cold time vs its own warm
    # re-run — exactly the class of cost the batch warmups above
    # already keep out of the timed region. A 20-row 2-file stream with
    # one stateful aggregation compiles that path untimed. Prior
    # rounds' stream numbers keep their meaning: the cost was one-time
    # per session, not per-query (see OPTIMIZATION_r11.md).
    if any(n.startswith("stream_") for n in names):
        import shutil
        import tempfile

        from capstone_etl_spark.streaming import run_to_memory

        wdir = tempfile.mkdtemp(prefix="bench_stream_warm_")
        try:
            spark.range(20).select(
                (F.col("id") % 3).alias("k"), F.col("id").alias("v")
            ).repartition(2).write.mode("overwrite").parquet(f"{wdir}/src")
            schema = spark.read.parquet(f"{wdir}/src").schema
            sdf = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{wdir}/src")
                .groupBy("k")
                .agg(F.count("*").alias("c"))
            )
            run_to_memory(
                sdf, f"{wdir}/ckpt", output_mode="complete", name="bench_stream_warm"
            ).collect()
        finally:
            shutil.rmtree(wdir, ignore_errors=True)

    def _time_query(name: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: long would overflow under ANSI mode
            F.sum(
                F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        sec = round(time.perf_counter() - t0, 3)
        # release query-scoped caches/checkpoints outside the timed
        # section — each query is measured cold, memory stays flat
        release_caches()
        return sec, row.n

    timings: dict[str, float] = {}
    # per-query deterministic counters (jobs/stages/tasks/shuffle
    # bytes): captured OUTSIDE the timed window, before/after each
    # query; host-noise-free evidence the next round's PERF compare
    # can attribute deltas to plan changes vs hardware (VERDICT r11
    # produced 4 phantom regressions from a probe that swung 2.6x).
    counters: dict[str, dict[str, int]] = {}
    prev_tot = _exec_totals(spark)
    for name in names:
        timings[name], n_rows = _time_query(name)
        now_tot = _exec_totals(spark)
        if prev_tot is not None and now_tot is not None:
            counters[name] = {k: now_tot[k] - prev_tot[k] for k in now_tot}
        prev_tot = now_tot
        print(f"# {name}: {timings[name]:.3f}s ({n_rows} rows)", file=sys.stderr)

    # transient screen (VERDICT r6): any query that would FAIL the
    # regression gate is re-measured once and the min kept — a host
    # transient lands on one observation and won't strike the same
    # query twice; a real plan regression reproduces immediately. Runs
    # BEFORE the JSON line so the recorded timings are the screened
    # ones (next round's gate compares against honest numbers). The
    # host factor is pinned from the PRE-retime snapshot and reused by
    # the final gate: on the no-probe median fallback, retiming moves
    # the median, and a recomputed host could fail a query the screen
    # never offered its re-measure.
    # the regression gate compares like with like: when this run's sf
    # differs from the prior round's (a scale-point run against a
    # generated 10× corpus — tools/gen_scale_corpus.py), the prior
    # timings are not a baseline and the retime/gate machinery is
    # skipped entirely.
    same_sf = _prior_round_sf() in (None, sf)
    host = _host_factor(timings, probe_sec, emit=same_sf) if same_sf else 1.0
    if same_sf:
        for name in _fail_candidates(timings, probe_sec, host=host):
            resec, _ = _time_query(name)
            print(
                f"# retime {name}: {timings[name]:.3f}s -> {resec:.3f}s (min kept)",
                file=sys.stderr,
            )
            timings[name] = min(timings[name], resec)
    total = round(sum(timings.values()), 3)
    # Full-fidelity artifact: the driver keeps only a 2000-char stdout
    # tail, which a 95-query map outgrows (round 8's BENCH_r08.json came
    # back `parsed: null`). The complete per-query map therefore goes to
    # a committed BENCH_full_r{N}.json (N = latest driver round + 1);
    # the stdout JSON line stays small — totals plus the top-10 slowest.
    full_doc = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "probe_sec": probe_sec,
        "n_queries": len(timings),
    }
    if counters:
        # additions-only: a sibling key, never new entries in the
        # `queries` seconds map (the driver reads that map as per-query
        # seconds for its round-over-round speedups)
        full_doc["counters"] = counters
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"BENCH_full_r{_latest_round_no() + 1}.json",
    )
    try:
        with open(full_path, "w") as f:
            json.dump(full_doc, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as exc:  # read-only checkout: still emit stdout line
        print(f"# BENCH_full write failed: {exc}", file=sys.stderr)
    slowest = dict(
        sorted(((k, round(v, 2)) for k, v in timings.items()), key=lambda kv: -kv[1])[:10]
    )
    line_doc = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "sf": sf,
        "probe_sec": round(probe_sec, 3),
        "n_queries": len(timings),
        "full": os.path.basename(full_path),
    }
    if counters:
        # compact counters for the top-10 only — the driver keeps a
        # bounded stdout tail, so the line must stay small; the full
        # per-query map lives in BENCH_full_r{N}.json. Array order:
        # [jobs, stages, tasks, shuffle_read, shuffle_write].
        line_doc["counters"] = {
            k: [
                counters[k]["jobs"],
                counters[k]["stages"],
                counters[k]["tasks"],
                counters[k]["shuffle_read"],
                counters[k]["shuffle_write"],
            ]
            for k in slowest
            if k in counters
        }
    print(json.dumps(line_doc))
    # after the JSON line (driver contract kept): nonzero exit on an
    # unexplained per-query regression vs the prior round
    failures = _regression_gate(timings, probe_sec, host=host) if same_sf else 0
    if failures and os.environ.get("SPARK_GRAFT_BENCH_GATE", "1") != "0":
        sys.exit(2)


if __name__ == "__main__":
    main()

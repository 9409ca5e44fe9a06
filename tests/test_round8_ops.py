"""Round-8 operator tests: shared-relation seams and the incremental /
streaming additions' structural contracts."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_shingle_seams_preserve_semantics(spark, sf_dir):
    """corpus_pipeline and benchmark_decontamination must return the
    SAME rows whether they tokenize internally or receive the shared
    capped shingle relation (training_manifest's one-tokenize-subtree
    plan) — the seam moves the plan, never the answer."""
    from capstone_etl_spark.operators.corpus import MIN_CHARS, corpus_pipeline
    from capstone_etl_spark.operators.dedup import (
        benchmark_decontamination,
        shingles,
    )
    from capstone_etl_spark.session import cached
    from capstone_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(F.col("n_chars") >= MIN_CHARS)
    kept_sh = cached(shingles(kept))
    full_sh = cached(shingles(docs))

    got = sorted(
        r.asDict().items() for r in corpus_pipeline(spark, sf_dir, sh=kept_sh).collect()
    )
    want = sorted(r.asDict().items() for r in corpus_pipeline(spark, sf_dir).collect())
    assert got == want

    got_d = sorted(
        r.asDict().items()
        for r in benchmark_decontamination(spark, sf_dir, sh=full_sh).collect()
    )
    want_d = sorted(
        r.asDict().items() for r in benchmark_decontamination(spark, sf_dir).collect()
    )
    assert got_d == want_d


def test_training_manifest_single_tokenize_subtree(spark, sf_dir):
    """The composed manifest plan must carry exactly ONE tokenize
    subtree: the analyzed plan's regexp_replace sites (tokenize's
    char-class strip) all live inside the one shared cached token
    relation, so the un-cached portion of the plan contains none."""
    from capstone_etl_spark.operators.corpus import training_manifest

    df = training_manifest(spark, sf_dir)
    # every tokenize site in the plan text must be a reprint of the ONE
    # shared cached token projection (doc_id, n_chars, tokenize(text))
    # — the InMemoryRelation's stored plan is echoed at each of its
    # scan sites, so the line COUNT is >1 by construction, but a leg
    # that re-tokenized on its own would show a DIFFERENT projection
    # shape (e.g. corpus_pipeline's old (doc_id, toks)-only form)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    tok_lines = [ln for ln in plan.splitlines() if "regexp_replace" in ln]
    assert tok_lines, "expected the shared tokenize subtree in the plan"
    strays = [
        ln for ln in tok_lines if not ("doc_id#" in ln and "n_chars#" in ln)
    ]
    assert strays == [], strays

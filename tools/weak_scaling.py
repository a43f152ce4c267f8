#!/usr/bin/env python
"""Weak-scaling harness for SCALE.md's measured table.

Builds an 8x (configurable) replica of the sf0.1 documents table with
per-copy token remapping — each copy's tokens get a copy-local prefix,
so duplicate DENSITY stays constant while volume grows (copies never
near-dup against each other; the honest way to scale a dedup bench) —
then times the named queries warm at 1x and Nx and prints the ratios.

Usage:
    python tools/weak_scaling.py [query ...]   # default: the SCALE.md set
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geoparquet_python_spark import registry  # noqa: E402
from geoparquet_python_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "q_exact_dedup",
    "q_token_pack_nextfit",
    "q_length_bucketed_batches",
    "q_minhash_lsh_neardup",
    "q_simhash_wide_blocked_pairs",
    "q_simhash_wide240_blocked_pairs",
    "q_leakage_safe_split",
    "q_pmi_collocations",
    "q_cdc_merge_upsert",
    # Vector family (replicated embeddings with per-copy rotation):
    "q_ann_topk_blocked",
    "q_ann_topk_ivf",
    "q_hyperplane_lsh_neardup",
    "q_semdedup_dropped",
    # Round-6 additions. (Historical note: streaming queries were
    # excluded through round 11 because the replica corpus writes
    # documents.parquet as a DIRECTORY and the old
    # pathGlobFilter="documents.parquet" readers matched no files
    # there; round 12's layout-aware read_table_stream fixed that and
    # the ingest gates joined the set — see the round-12 block below.)
    "q_hybrid_rrf_topk",
    "q_token_budget_selection",
    "q_psi_value_drift",
    "q_hard_negative_mining",
    "q_mixture_temperature_weights",
    "q_shingle_containment_pairs",
    "q_global_sample_index",
    # Round-6 (late): span dedup, BPE induction, IVFADC, quota sample.
    "q_duplicate_ngram_spans",
    "q_duplicate_span_doc_stats",
    "q_bpe_merge_rounds",
    "q_ann_topk_ivfpq",
    "q_stratified_quota_sample",
    "q_containment_prefix_filter_pairs",
    "q_ann_topk_filtered",
    "q_ivfpq_cell_store_search",
    "q_curation_pipeline_v3",
    # Round-6 (final): data selection, tokenizer eval, modality dedup,
    # interval join, divergence. The kNN-graph family
    # (q_knn_label_propagation / q_knn_two_hop_homophily) is measured
    # under BOTH fixed-K and K-scaled protocols in SCALE.md — the
    # fixed-K default here shows the documented quadratic; scale K
    # with the corpus (kmeans._K) for the honest ratio.
    "q_dsir_importance_selection",
    "q_vocab_oov_rate",
    "q_bpe_batch_merge_round",
    "q_image_ahash_dedup",
    "q_interval_overlap_join",
    "q_source_divergence_matrix",
    # Round-6 (linkage batch): mutual-kNN shares the cell-kNN build, so
    # the fixed-K vs K-scaled protocol note above applies to it too;
    # the weighted stratified sample is documents-only map+window.
    # The fuzzy-linkage queries run over `part` (not replicated here)
    # — their scale posture is the blocking argument in SCALE.md.
    "q_mutual_knn_pairs",
    "q_weighted_stratified_sample",
    # Exact EWMA + OLS trend + rolling median: events-based (8x users).
    "q_events_ewma_halflife",
    "q_user_value_trend",
    "q_events_rolling_median",
    # Round-7: Bloom runtime filters, spectral ops, novelty, robust
    # stats, the encode path, the cross-modal funnel, and the capped
    # hyperplane/semdedup forms (measured table in SCALE.md Round-7).
    "q_bloom_filter_semi_join",
    "q_bloom_pruned_revenue",
    "q_ngram_novelty",
    "q_winsorized_price_stats",
    "q_pca_power_iteration",
    "q_jl_distortion_audit",
    "q_events_anomaly_mad",
    "q_session_top_paths",
    "q_bpe_encode_heldout",
    "q_curation_pipeline_v4",
    # Round-8: robust trend (events-based), RAG chunking, positional
    # phrase match, ClusterClip (embeddings-based), epoch planning.
    "q_theil_sen_trend",
    "q_rag_window_chunks",
    "q_phrase_match_stats",
    "q_cluster_clip_sample",
    "q_epoch_repeat_plan",
    "q_ks_length_drift",
    "q_mannwhitney_auc_contam",
    "q_bm25_ndcg_audit",
    "q_normalized_exact_dedup",
    "q_dedup_layer_agreement",
    "q_k_anonymity_audit",
    "q_funnel_conversion",
    "q_lsh_index_probe",
    # Round-9: the two-level (coarse x fine) SemDeDup gear — the
    # registered shape for corpora past the K cap.
    "q_semdedup_two_level",
    # Round-11 continuation: closed-form modeling (documents-based) —
    # the linear-model fit is one map-side-combinable moment pass and
    # chi2 rides the distinct-(doc,term) explode, so both should ride
    # the flat/near-flat band; any superlinear drift here would mean
    # the moment/contingency aggregation stopped combining map-side.
    "q_quality_linear_model",
    "q_chi2_term_label_assoc",
    "q_conformal_interval_coverage",
    "q_huber_robust_model",
    # Round-12 (VERDICT r11 item 4): the REST of the modeling family —
    # ridge rides the same momd frame k+1 times (one pass, k+1 solves),
    # residual-outliers re-scores the corpus against broadcast betas,
    # per-lang fits one moment row per language, and the two logistic
    # queries run the 2-step IRLS (two corpus passes + values-sized
    # AUC window). All should sit in the same flat moment-pass band as
    # q_quality_linear_model.
    "q_ridge_shrinkage_path",
    "q_model_residual_outliers",
    "q_per_lang_token_char_model",
    "q_logistic_quality_model",
    "q_logistic_score_auc",
    # Round-12 additions: the banding health audit (embeddings-based,
    # signature pass + 12·n-row aggregate — should be near-flat) and
    # the certified histogram quantiles (documents-based; two map-side
    # combinable passes).
    "q_hyperplane_band_occupancy_audit",
    "q_histogram_quantiles",
    # Round-12: the streaming ingest gates, runnable on replica corpora
    # since the layout-aware stream readers (availableNow drains — the
    # batch-parity harness; isolated 1×/8×/27×/64× legs recorded in
    # WEAK_r12_super.json before these joined the default set).
    "q_stream_learned_quality_gate",
    "q_stream_bloom_dedup_gate",
    "q_stream_neardup_screen",
    "q_stream_hot_term_gate",
    # Round-12 continuation: calibration (rides the logistic pipeline
    # + a 20-row bin grid — should match the IRLS queries' band) and
    # the DP release (one count aggregate + O(|langs|) decoration —
    # flat by construction). q_approx_percentile_certified is
    # lineitem-based (not replicated here) and stays in the bench
    # headline instead.
    "q_calibration_bins_ece",
    "q_isotonic_calibration",
    "q_dp_noisy_counts",
]

COPIES = int(os.environ.get("WEAK_COPIES", "8"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(spark, out_dir: str) -> None:
    """COPIES replicas of documents AND events; copy i>0 prefixes every
    document token with c{i}_ (disjoint vocabularies => no cross-copy
    near-dups) and offsets doc_id by i*10^7; event copies get fresh
    user_id/event_id key spaces (same time range — weak-scaling a
    time-series table grows the KEY population, the realistic axis:
    more users, not a longer history). Other tables are symlinked."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    parts = []
    for i in range(COPIES):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        if i > 0:
            c = c.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x: F.concat(F.lit(f"c{i}_"), x),
                    ),
                    " ",
                ),
            )
        parts.append(c)
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    eparts = [
        events.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
        .withColumn("event_id", F.col("event_id") + F.lit(i * 1_000_000_000))
        for i in range(COPIES)
    ]
    ebig = eparts[0]
    for p in eparts[1:]:
        ebig = ebig.unionByName(p)
    ebig.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    # Embeddings: fresh vec_ids per copy plus a per-copy deterministic
    # ROTATION (circular shift of the dimension axis by i). A shared
    # permutation of dimensions preserves norms and every in-copy dot
    # product exactly — copy-local neighbor structure is untouched —
    # while cross-copy dots decay to the vectors' autocorrelation at
    # lag i (noise for these embeddings), so copies don't collapse
    # into cross-copy near-dup clusters (which would grow SemDeDup
    # cells and ANN candidate sets superlinearly and fake a scaling
    # failure the real corpus wouldn't have).
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vparts = []
    for i in range(COPIES):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        if i > 0:
            c = c.withColumn(
                "embedding",
                F.expr(
                    f"concat(slice(embedding, {i + 1}, "
                    f"size(embedding) - {i}), slice(embedding, 1, {i}))"
                ),
            )
        vparts.append(c)
    vbig = vparts[0]
    for p in vparts[1:]:
        vbig = vbig.unionByName(p)
    vbig.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    for name in os.listdir(SF_DIR):
        if name not in (
            "documents.parquet",
            "events.parquet",
            "embeddings.parquet",
        ):
            os.symlink(f"{SF_DIR}/{name}", f"{out_dir}/{name}")


def time_query(spark, name: str, sf_dir: str, runs: int = 3) -> float:
    fn = registry.QUERIES[name]
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def _previous_walls() -> dict[str, float]:
    """Nx walls from the newest committed WEAK record, so each full run
    flags 8x-WALL regressions mechanically. Ratios deliberately do NOT
    participate (VERDICT r8 item 4 / SCALE.md r8 caveat: removing a
    CONSTANT shrinks the 1x denominator, so a ratio can RISE while both
    absolute walls improve — walls are the auditable quantity).

    Only records measured under the SAME protocol participate (ADVICE
    r10): a WEAK_COPIES=27 super-leg or a different sf_dir produces
    walls that are not comparable to the 8x/sf0.1 baseline — comparing
    across protocols would flag phantom regressions (or mask real
    ones), so mismatched records are skipped, not scaled."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(here, "WEAK_r*.json")))
    paths.append(os.path.join(here, "WEAK_LAST.json"))
    for path in reversed(paths):
        try:
            with open(path) as f:
                prev = json.load(f)
            if prev.get("copies") != COPIES or prev.get("sf_dir") != SF_DIR:
                continue
            qs = prev.get("queries") or {}
            if qs:
                return {n: float(v["tN"]) for n, v in qs.items() if "tN" in v}
        except (OSError, ValueError, KeyError, TypeError):
            continue
    return {}


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    registry.load_all()
    spark = get_spark("weak-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = tempfile.mkdtemp(prefix="weak8_")
    results: dict[str, dict[str, float]] = {}
    try:
        build_corpus(spark, out_dir)
        spark.range(1_000_000).selectExpr("sum(id) AS s").write.mode(
            "overwrite"
        ).format("noop").save()
        for qi, name in enumerate(names):
            # Between-query gc (same hygiene as tools/drive_driver.py,
            # round 9): a 64-query single session accumulates
            # localCheckpoint/broadcast blocks the local-mode JVM only
            # frees after a GC notices the dropped handles; under that
            # heap pressure heavy queries DEGRADE before anything
            # crashes (measured: hyperplane 8x read 43.7 s mid-suite
            # vs 7.3 s fresh-process — a 6x phantom). Poking the
            # collector between queries keeps walls honest.
            if qi:
                import gc

                gc.collect()
                try:
                    spark._jvm.System.gc()
                except Exception:
                    pass
                # Deterministic dead-checkpoint release (round 12):
                # between-query only — see exact.release_dead_checkpoints.
                from geoparquet_python_spark.functions.exact import (
                    release_dead_checkpoints,
                )

                release_dead_checkpoints()
            t1 = time_query(spark, name, SF_DIR)
            t8 = time_query(spark, name, out_dir)
            results[name] = {"t1": round(t1, 2), "tN": round(t8, 2)}
            print(
                f"{name}: 1x={t1:.1f}s {COPIES}x={t8:.1f}s "
                f"ratio={t8 / t1:.1f}x"
            )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    # Machine-readable record (VERDICT r8 item 4): per-query 1x/Nx
    # WALLS plus a regression list on the Nx wall — same two-sided rule
    # as bench.py (>1.3x AND >0.5s absolute) so sub-second Python-task
    # dispersion can't flap the list.
    prev = _previous_walls()
    regressions = sorted(
        n
        for n, r in results.items()
        if n in prev and r["tN"] > prev[n] * 1.3 and r["tN"] - prev[n] > 0.5
    )
    record = {
        "metric": "weak_scaling_walls",
        "unit": "sec",
        "copies": COPIES,
        "sf_dir": SF_DIR,
        "queries": results,
        "regressions_vs_prev": regressions,
    }
    print(json.dumps(record))
    # Full runs persist the record (next run's regression baseline;
    # committed per-round as WEAK_r{N}.json). Subset runs never
    # overwrite it — a partial baseline would null the other walls.
    if not sys.argv[1:]:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "WEAK_LAST.json"), "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()

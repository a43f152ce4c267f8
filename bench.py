#!/usr/bin/env python
"""Headline benchmark: runs representative queries from every engine area
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with a noop-format write (all
partitions computed, nothing collected to the driver — the same shape a
cluster job has; `.count()` would let Spark prune work, `.collect()`
would bottleneck on the driver).
"""

from __future__ import annotations

import gc
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geoparquet_python_spark import registry  # noqa: E402
from geoparquet_python_spark.session import get_spark  # noqa: E402

# One query per engine area (SURVEY.md §2): scan+agg, join chains,
# windows, set/sort, dedup (exact + MinHash-LSH), vector top-k, text,
# as-of, streaming.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_revenue",
    "q18_large_orders",
    "q_top3_orders_per_status",
    "q_cumulative_daily_revenue",
    "q_percentile_prices",
    "q_exact_dedup",
    "q_minhash_lsh_neardup",
    # Wide-signature blocked SimHash, 240-bit form (15 20-bit blocks):
    # exact same pair set as the brute all-pairs q_simhash_near_pairs
    # but equi-join banded (no BroadcastNestedLoopJoin). Round 7 retired
    # the 120-bit form from the headline (still registered + oracle-
    # checked): its 8-bit blocks saturate at ~2^8 values (4.2× at 8×,
    # SCALE.md) — a ceiling already demonstrated and superseded here.
    "q_simhash_wide240_blocked_pairs",
    "q_ann_topk_blocked",
    "q_hyperplane_lsh_neardup",
    "q_corpus_clean_pipeline",
    "q_tfidf_top_terms",
    "q_asof_purchase_click",
    "q_geo_grid_distance_join",
    "q_geoparquet_roundtrip_window",
    "q_stream_tumbling_counts",
    # Round-2 additions: corpus hygiene, sequence packing, quantization.
    "q_repetition_signals",
    "q_token_pack_nextfit",
    "q_embedding_quantize_int8",
    # Round-4: composition showcase — near-dup components feeding a
    # cluster-keyed (leakage-safe) split decision.
    "q_leakage_safe_split",
    # Round-5: retrieval + time-series regularization.
    "q_bm25_topk",
    "q_events_gapfill_hourly",
    "q_events_ohlc_hourly",
    # Round-5 (late): CDC changelog compaction + MERGE INTO.
    "q_cdc_merge_upsert",
    # Round-6: hybrid retrieval fusion + two-phase budget selection.
    "q_hybrid_rrf_topk",
    "q_token_budget_selection",
    # Round-6 (late): duplicated-span dedup + composed IVFADC search
    # + the span-aware curation funnel.
    "q_duplicate_ngram_spans",
    "q_ann_topk_ivfpq",
    "q_curation_pipeline_v3",
    # Round-6 (final): DSIR data selection + the all-corpus kNN-graph
    # label audit — the two heaviest new corpus-pass families.
    "q_dsir_importance_selection",
    "q_knn_label_propagation",
    # Round-6 (linkage batch): entity resolution end-to-end (blocked
    # fuzzy pairs → star-contraction components) + the mutual-kNN
    # symmetric-evidence gate over the shared cell-kNN build.
    "q_fuzzy_entity_clusters",
    "q_mutual_knn_pairs",
    # Round-6 (statistics batch): shift-resistant chunk dedup + the
    # one-pass Poisson-bootstrap corpus CI.
    "q_cdc_chunk_dedup",
    "q_bootstrap_mean_ci",
    # Round-7: Bloom-pruned fact join (the runtime-filter pattern),
    # matrix-free fixed-point PCA, and the stateless streaming Bloom
    # ingest gate. (q_bpe_encode_heldout ~7 s stays correctness-
    # registered only — the training rounds it replays are already
    # timed via q_bpe_merge_rounds.)
    "q_bloom_pruned_revenue",
    "q_pca_power_iteration",
    "q_stream_bloom_dedup_gate",
    # Round-8: the cross-modal funnel joins the headline (VERDICT r7
    # item 7) after the zip-with shingle rewrite + single-pass shingle
    # stats fusion took it ~13 s -> ~3.3 s at sf0.1; plus the round's
    # new operator families (robust trend, RAG chunking, positional
    # phrase match).
    "q_curation_pipeline_v4",
    "q_theil_sen_trend",
    "q_rag_window_chunks",
    "q_phrase_match_stats",
    # Round-8 (late): the exact-statistics/governance family's two
    # cheapest representatives (sub-second; the heavier nDCG/AUC stay
    # correctness-registered — their shingle-label stage is already
    # timed via the decontamination headline path).
    "q_ks_length_drift",
    "q_k_anonymity_audit",
    # Round-11 continuation: the closed-form modeling family's
    # heaviest representative (three corpus passes: integer moments,
    # latticed weighted moments, accuracy scoring + two Cramer
    # solves). The OLS/ridge/chi2 queries share its machinery and
    # stay correctness-registered.
    "q_logistic_quality_model",
    # Round-12 (VERDICT r11 item 4): the modeling family's two other
    # distinct plan shapes — conformal (three disjoint splits, order
    # statistics on the distinct-score frame) and Huber (three corpus
    # passes with a data-driven threshold between them). The remaining
    # regression queries share q_logistic_quality_model's machinery.
    "q_conformal_interval_coverage",
    "q_huber_robust_model",
    # Round-12 continuation: isotonic recalibration (the PAV minimax
    # on top of the full logistic pipeline — the calibration family's
    # heaviest representative; the ECE query shares its probs pass and
    # stays correctness-registered) and the GK-certified percentile
    # (the C5 sketch path with its exact-order-statistic certificate).
    "q_isotonic_calibration",
    "q_approx_percentile_certified",
]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _previous_times(cpus: int) -> dict[str, float]:
    """Per-query times from the most recent comparable record, so each
    run emits round-over-round deltas and >1.3x regressions are flagged
    mechanically instead of by eyeballing two JSON files.

    Comparable = SAME CORE COUNT (optimization r13, VERDICT r12 item 2):
    the driver also runs the suite at a lower core count to measure
    scaling, and that leg's record landing in BENCH_LAST_FULL.json made
    the next 32-core run's deltas (and the drift guard) compare against
    8-core times — phantom ratios on every query. Records are stamped
    with "cpus" (bench's own record carries it inline; driver wrappers
    carry it at the top level); a record at a different core count is
    skipped. Legacy unstamped records were all 32-core runs and are
    accepted only when this run is itself at 32."""
    here = os.path.dirname(os.path.abspath(__file__))
    # Prefer the per-core-count baseline, then bench.py's own full
    # record (written every run — immune to the driver's 2000-byte
    # stdout truncation that nulled the parsed field of BENCH_r04/r05),
    # then walk the driver records newest-first.
    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    paths.append(os.path.join(here, "BENCH_LAST_FULL.json"))
    paths.append(os.path.join(here, f"BENCH_LAST_FULL_c{cpus}.json"))
    for path in reversed(paths):
        try:
            with open(path) as f:
                prev = json.load(f)
        except (OSError, ValueError):
            continue
        queries = _comparable_times(prev, cpus)
        if queries:  # skip failure records (no per-query times)
            return queries
    return {}


def _comparable_times(prev: dict, cpus: int) -> dict[str, float]:
    """Per-query times from one record IF it is comparable to a run at
    ``cpus`` cores; {} otherwise. Pure (unit-tested in
    tests/test_bench_guard.py)."""
    try:
        rec_cpus = prev.get("cpus")
        # Driver records wrap the bench line under "parsed"; accept
        # both that shape and a raw bench line.
        if isinstance(prev.get("parsed"), dict):
            prev = prev["parsed"]
            if rec_cpus is None:
                rec_cpus = prev.get("cpus")
        if rec_cpus is not None and int(rec_cpus) != cpus:
            return {}
        if rec_cpus is None and cpus != 32:
            return {}
        return dict(prev.get("queries") or {})
    except (ValueError, TypeError, AttributeError):
        return {}


def _ambient_drift(deltas: dict[str, float]) -> tuple[float | None, bool]:
    """(median per-query ratio vs the previous record, drifted?).

    Ambient host contention inflates the WHOLE suite in the same
    direction (round 11: an idle-box 55.9 s record was overwritten by
    a contended 62.1 s driver run whose untouched round-1 TPC-H joins
    drifted 1.4-1.7x on unchanged plans); a real regression moves a
    few queries, not the median. A full-suite record whose MEDIAN
    ratio exceeds 1.3x is therefore a poisoned baseline, and writing
    it over BENCH_LAST_FULL.json would make every next run's deltas
    read as phantom speedups. Needs >= 8 comparable queries so a
    subset/bring-up run can't trip the guard on a thin sample."""
    if len(deltas) < 8:
        return None, False
    s = sorted(deltas.values())
    n = len(s)
    med = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
    return round(med, 3), med > 1.3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    registry.load_all()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up JVM/codegen/Python-worker pools so per-query times measure
    # the plan, not first-start overhead.
    _force(spark.range(1_000_000).selectExpr("sum(id) AS s"))

    # Idle/contention gate (round-4 lesson: four same-direction 1.3-1.6x
    # TPC-H drifts in one run, plus a 2.61x phantom on a sub-second
    # query, all traced to box load and cold JIT — not plans): re-run q1
    # until two consecutive times agree within 10% before timing anything.
    prev_t = None
    for _ in range(5):
        t0 = time.perf_counter()
        _force(registry.QUERIES["q1_pricing_summary"](spark, sf_dir))
        t = time.perf_counter() - t0
        if prev_t is not None and abs(t - prev_t) / max(t, prev_t) < 0.10:
            break
        prev_t = t

    # Local-iteration subset (comma-separated names). Subset runs are
    # for DEVELOPMENT timing only — the driver's recorded run never
    # sets this, so BENCH_r*.json always carries the full suite.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    headline = (
        [n for n in HEADLINE if n in set(only.split(","))]
        if only
        else HEADLINE
    )

    # Session-accumulation note (round 9): localCheckpoint/broadcast
    # blocks pile up across a 47-query × best-of-5 session and can
    # inflate MID-SUITE queries vs their isolated walls (measured:
    # q_bloom_pruned_revenue 2.8 s mid-suite vs 2.2 s in a subset run
    # on the same idle box). The correctness/weak-scaling harnesses
    # fix this with a between-query System.gc() poke — but HERE the
    # poke measurably backfired (+4 s suite wall, broad 1.1-1.8×
    # drifts: 47 forced full GCs bleed concurrent-cycle work into the
    # timed runs), so bench accepts the mid-suite inflation and the
    # regressions double-guard absorbs the dispersion. Judge bench
    # numbers per-query against BENCH history, and isolated walls via
    # SPARK_GRAFT_BENCH_ONLY subset runs.
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for qi, name in enumerate(headline):
        # Bounded session hygiene (round 11, continuation): the pure
        # accept-the-inflation stance above stopped holding — one full
        # suite measured q_theil_sen_trend at 16.3 s best-of-5 late in
        # the session vs 0.56 s in a fresh-session subset on the SAME
        # idle box (localCheckpoint/broadcast blocks from ~40 queries ×
        # 5 runs squeezing the unified memory pool). Per-query
        # System.gc() remains off (the measured +4 s backfire) — but a
        # Python-side gc.collect() per query is ~ms and releases the
        # py4j handles so the ContextCleaner CAN clean, and one JVM
        # poke every 12 queries bounds the accumulation window at ~4
        # pokes per suite (the drive_driver/weak-scaling harnesses use
        # the same pattern at period 16 and show no late-suite drift).
        gc.collect()
        # Deterministic dead-checkpoint release (round 12): the async
        # ContextCleaner cannot keep up with 50 queries × best-of-5 ×
        # 1-3 localCheckpoints per construction — the r12 first-attempt
        # record showed 9 of 11 regressions clustered at suite
        # positions 39-47 (late-suite storage/GC pressure) while the
        # early TPC-H canaries ran at 0.7-1.0×. Explicitly unpersisting
        # dead checkpoint blocks between queries removes the
        # accumulation at its source instead of hoping a GC poke
        # drains the reference queue in time.
        from geoparquet_python_spark.functions.exact import (
            release_dead_checkpoints,
        )

        release_dead_checkpoints()
        if qi and qi % 12 == 0:
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
        fn = registry.QUERIES[name]
        best = float("inf")
        runs = 0
        # Timing policy for trained/derived intermediates (optimization
        # r13, VERDICT r12 item 6): the module-level caches of IVFPQ
        # encodings, kNN edges and k-means/PQ centroids are cleared
        # before EVERY timed repetition, so each rep pays the declared
        # end-to-end computation (train + search), not
        # query-over-prebuilt-index. Under the previous policy the
        # best-of-N minimum always reflected the warm-cache path for
        # q_ann_topk_ivfpq, q_knn_label_propagation, q_mutual_knn_pairs
        # — those queries' r13+ numbers are therefore NOT comparable to
        # r12-and-earlier records (documented in OPTIMIZATION_r13.md).
        # The clear runs OUTSIDE the timed region; the paired
        # release_dead_checkpoints() frees the checkpoint blocks the
        # dropped cache entries held so storage stays bounded.
        # Best-of-3, extended to best-of-5 for sub-5s queries. The
        # threshold was 2s through round 6; round 7 measured three
        # consecutive IDLE full-suite runs flagging three DIFFERENT
        # 2-4s queries (minhash 2.66->4.02->2.50, fuzzy-clusters,
        # hybrid-rrf 2.77->2.50->3.60) — Python-task-heavy queries in
        # that band carry ~±1s run-to-run dispersion, and a best-of-3
        # minimum is not a tight enough estimator for a 1.3x flag.
        # Two extra samples cost ~2 min of suite wall and stop the
        # regressions list from flapping on noise.
        while runs < 3 or (best < 5.0 and runs < 5):
            registry.clear_derived_caches()
            release_dead_checkpoints()
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
            runs += 1
        times[name] = round(best, 3)
        # Row count per query (untimed extra run): lets round-over-round
        # comparisons detect silent result shrinkage behind a "speedup".
        rows[name] = fn(spark, sf_dir).count()

    # Round-over-round per-query deltas vs the newest BENCH_r*.json:
    # ratio >1.3x lands in "regressions" so a slow query is a line in
    # the output, not an archaeology exercise.
    prev = _previous_times(cpus)
    deltas = {
        n: round(times[n] / prev[n], 2)
        for n in times
        if n in prev and prev[n] > 0
    }
    # A regression needs BOTH a >1.3x ratio AND >0.5s absolute growth:
    # sub-second queries (especially applyInPandas ones, whose Python
    # task scheduling shows ±0.2-0.3s dispersion even warm — measured
    # in SCALE.md's bench-protocol caveats) can trip a ratio-only flag
    # on pure noise, which buries the real multi-second regressions
    # the list exists to surface.
    regressions = sorted(
        n
        for n, r in deltas.items()
        if r > 1.3 and times[n] - prev[n] > 0.5
    )

    total = round(sum(times.values()), 3)
    ambient, drifted = _ambient_drift(deltas)
    record = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "rows": rows,
        "deltas_vs_prev": deltas,
        "regressions": regressions,
        "ambient_drift_median": ambient,
        "drifted": drifted,
        "cpus": cpus,
        "sf": sf,
    }
    print(json.dumps(record))
    # Durable full record (next run's delta baseline even when the
    # driver's truncated stdout capture can't hold the full line).
    # Subset runs (SPARK_GRAFT_BENCH_ONLY) never overwrite it — a
    # partial baseline would null out every other query's delta.
    # Drifted runs (median ratio >1.3x = ambient contention, see
    # _ambient_drift) are side-filed instead of clobbering the idle-box
    # baseline (VERDICT r11 item 3: the round-11 driver run overwrote
    # the adjudicated 55.9 s record with a contended 62.1 s one).
    here = os.path.dirname(os.path.abspath(__file__))
    if not only:
        target = (
            "BENCH_LAST_FULL_DRIFTED.json" if drifted
            else "BENCH_LAST_FULL.json"
        )
        with open(os.path.join(here, target), "w") as f:
            json.dump(record, f)
        # Per-core-count baseline (optimization r13): a full run at a
        # non-default core count (the driver's scaling leg) must not be
        # the only surviving baseline for the next main run — keep the
        # freshest non-drifted record PER core count so _previous_times
        # always finds a like-for-like comparison.
        if not drifted:
            with open(
                os.path.join(here, f"BENCH_LAST_FULL_c{cpus}.json"), "w"
            ) as f:
                json.dump(record, f)
    # The driver keeps only the LAST 2000 bytes of stdout; the full
    # line above has outgrown that (BENCH_r04/r05 landed parsed:null).
    # Emit a compact trailing line that still carries the PER-QUERY
    # times (VERDICT r6 item 6: every BENCH round record should parse
    # with value + queries): 2-decimal times for ~38 queries fit in
    # ~1.4 KB. If the suite ever grows past the 2000-byte capture, the
    # queries dict is dropped from the tail (never the headline value)
    # — the full detail always survives in BENCH_LAST_FULL.json.
    # deltas_vs_prev must survive in the PARSED record too (VERDICT r7
    # item 5 / r8 item 2: at 47 queries the verbose wrapper pushed the
    # line past the cap and the old fallback deleted the deltas first —
    # exactly the field the fallback existed to protect). The compact
    # form therefore carries deltas as "d": a ratio ARRAY aligned to
    # the queries dict's key order (JSON keeps object order; null = no
    # previous time), 1-decimal — the regressions list is computed from
    # full precision above, so the array is for reading trends, not for
    # thresholding. If the suite outgrows the cap anyway, degrade the
    # DENSEST fields first and the deltas LAST: 1-decimal times, then
    # a leading-"q_" key strip (marked by "key_prefix" so readers can
    # restore names), then — only then — the old drop-fields ladder.
    compact = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
        "queries": {n: round(t, 2) for n, t in times.items()},
        "d": [None if n not in deltas else round(deltas[n], 1) for n in times],
        "regressions": regressions,
        "drifted": drifted,
    }
    line = json.dumps(compact)
    if len(line) > 1900:
        compact["queries"] = {n: round(t, 1) for n, t in times.items()}
        line = json.dumps(compact)
    if len(line) > 1900 and all(n.startswith("q_") for n in compact["queries"]):
        # ADVICE r10: the strip is all-or-nothing — if ANY key lacked
        # the prefix, a reader restoring names by prepending "q_" to
        # every key would corrupt the exceptions, so the rung only
        # fires when the marker's inverse is exact for every key.
        compact["key_prefix"] = "q_"
        compact["queries"] = {n[2:]: t for n, t in compact["queries"].items()}
        line = json.dumps(compact)
    if len(line) > 1900:
        del compact["d"]
        line = json.dumps(compact)
    if len(line) > 1900:
        del compact["queries"]
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()

"""Partition-count invariance: the determinism contract says results
are identical regardless of parallelism (fixed-point/decimal
accumulation, content-addressed sampling). Certify it by running
representative queries under two different shuffle-partition settings
and comparing full sorted results — the property that makes the
sf0.01 oracle gate transfer to a 100k-partition cluster."""

from __future__ import annotations

import pytest

from geoparquet_python_spark import registry
from geoparquet_python_spark.operators import kmeans as kmeans_mod
from geoparquet_python_spark.operators import pq as pq_mod

registry.load_all()

CASES = [
    "q_kmeans_centroids",  # driver-loop training, int fixed point
    "q_pq_codes",  # per-subspace codebooks + packed codes
    "q_minhash_lsh_neardup",  # banded LSH + refine
    "q_token_entropy",  # fixed-point ln accumulation
    "q_hash_split_stats",  # content-addressed membership
    # round-5 operators with float scoring / tie-breaks
    "q_bm25_topk",  # fixed-point BM25 contributions + int64 rank order
    "q_mmr_diverse_topk",  # greedy argmax with (score, vec_id) tie-break
    "q_events_gapfill_hourly",  # (ts, event_id) bucket-last + LOCF window
    "q_jaccard_prefix_filter_pairs",  # rarity-ordered prefixes, exact refine
    # round-5 (late) operators
    "q_semdedup_dropped",  # trained cells + Arrow fixed-point refine
    "q_cdc_merge_upsert",  # (ts, event_id) total-order compaction
    "q_pmi_collocations",  # integer probability-ratio ranking
    "q_pagerank_neardup",  # unrolled int64 power iterations
    "q_weighted_priority_sample",  # A-ES keys, 1e-6-rounded ln, top-k
    "q_maxsim_late_interaction",  # int64 1e-9 max/sum interaction
]


@pytest.mark.parametrize("name", CASES)
def test_partition_count_invariance(spark, sf_dir, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for parts in ("7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            # training caches memoize across runs — clear so each
            # parallelism level actually retrains
            kmeans_mod._CENT_CACHE.clear()
            pq_mod._PQ_CACHE.clear()
            rows = registry.QUERIES[name](spark, sf_dir).collect()
            results.append(sorted(map(tuple, rows)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert results[0] == results[1], (
        f"{name} changed results under a different shuffle partition count"
    )


def test_release_dead_checkpoints_frees_only_dead(spark):
    """The dead-checkpoint sweeper (round 12) must free blocks whose
    Python wrapper is gone and must NOT touch a live wrapper (the
    module-cache contract: _ENC_CACHE/_KNN_EDGE_CACHE hold the
    materialized DataFrame itself). A live frame must stay queryable
    after the sweep — its blocks were never unpersisted."""
    from geoparquet_python_spark.functions.exact import (
        materialize,
        release_dead_checkpoints,
    )

    release_dead_checkpoints()  # drain whatever earlier tests left
    live = materialize(spark.range(1000).selectExpr("id", "id * 2 AS y"))
    dead = materialize(spark.range(1000).selectExpr("id", "id * 3 AS z"))
    del dead
    freed = release_dead_checkpoints()
    assert freed >= 1, "the dropped wrapper's blocks were not released"
    # live survived the sweep and is still fully queryable
    assert live.count() == 1000
    freed_again = release_dead_checkpoints()
    assert freed_again == 0, "sweep freed a still-live checkpoint"
    del live
    assert release_dead_checkpoints() >= 1


def test_spread_skips_exchange_when_splits_suffice(spark):
    """The r12 spread() guard: a source that already plans >= default
    parallelism partitions passes through untouched (no round-robin
    exchange), while a narrow source is still repartitioned up."""
    from geoparquet_python_spark.functions.exact import spread

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, 1, numPartitions=par * 2)
    assert spread(wide) is wide
    narrow = spark.range(0, 10_000, 1, numPartitions=1)
    out = spread(narrow)
    assert out is not narrow
    assert out.rdd.getNumPartitions() == par
    assert out.agg({"id": "sum"}).collect()[0][0] == narrow.agg(
        {"id": "sum"}
    ).collect()[0][0]

"""Property/behavior tests for the LLM-pipeline operators beyond the
oracle diff: LSH recall vs exact pairs, approx-distinct error bounds,
multimodal decode determinism."""

from __future__ import annotations

from geoparquet_python_spark import registry

registry.load_all()


def test_minhash_lsh_recall(spark, sf_dir):
    """Every exact Jaccard-pair the banding *should* find (per its own
    probability model at j≥0.6 recall ≈ 0.999) must be found; overall
    recall vs the exact inverted-index result must be high."""
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry.QUERIES["q_ngram_jaccard_pairs"](spark, sf_dir).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["q_minhash_lsh_neardup"](spark, sf_dir).collect()
    }
    assert lsh <= set(exact), "LSH must never invent pairs (refine is exact)"
    strong = {p for p, j in exact.items() if j >= 0.6}
    assert strong <= lsh, f"missed high-similarity pairs: {strong - lsh}"
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.7, f"LSH recall too low: {recall:.2f}"


def test_approx_count_distinct_error(spark, sf_dir):
    rows = registry.QUERIES["q_approx_distinct_parts"](spark, sf_dir).collect()
    from geoparquet_python_spark.io import load_table
    from pyspark.sql import functions as F

    exact = {
        r.l_returnflag: (r.p, r.o)
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("p"),
            F.countDistinct("l_orderkey").alias("o"),
        )
        .collect()
    }
    for r in rows:
        ep, eo = exact[r.l_returnflag]
        assert abs(r.approx_parts - ep) / ep < 0.05
        assert abs(r.approx_orders - eo) / eo < 0.05


def test_multimodal_decode_deterministic(spark, sf_dir):
    """The stub decoder is deterministic and consistent with a local
    recomputation from the same payload bytes."""
    import hashlib

    rows = (
        registry.QUERIES["q_multimodal_decode_features"](spark, sf_dir)
        .where("doc_id < 5")
        .collect()
    )
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id < 5")
        .collect()
    }
    assert len(rows) == 5
    for r in rows:
        payload = hashlib.md5(docs[r.doc_id].encode()).digest()
        assert r.payload_len == 16
        assert r.width == payload[0] % 64 + 1
        assert r.height == payload[1] % 64 + 1
        assert abs(r.mean_byte - sum(payload) / len(payload)) < 1e-12


def test_simhash_near_pairs_capture_planted_dups(spark, sf_dir):
    """Docs that are trigram-near-duplicates have near-identical word
    sets, so their SimHashes must collide within the Hamming budget."""
    exact = registry.QUERIES["q_ngram_jaccard_pairs"](spark, sf_dir).collect()
    strong = {(r.doc_a, r.doc_b) for r in exact if r.jaccard >= 0.8}
    sim = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["q_simhash_near_pairs"](spark, sf_dir).collect()
    }
    missed = strong - sim
    assert not missed, f"SimHash missed near-identical pairs: {missed}"

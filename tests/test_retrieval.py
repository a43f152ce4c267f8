"""BM25 retrieval + RAG chunking invariants (operators/retrieval.py).

Oracle equality is covered by the registered DuckDB oracles; these
tests pin the semantic invariants the oracle alone does not spell out
(self-exclusion, ranking order, chunk tiling) and the plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoparquet_python_spark import registry
from geoparquet_python_spark.operators.retrieval import (
    _CHUNK_S,
    _CHUNK_W,
    _TOPK,
)

registry.load_all()


def test_bm25_excludes_self_and_ranks_densely(spark, sf_dir):
    rows = registry.QUERIES["q_bm25_topk"](spark, sf_dir).collect()
    assert rows, "no queries matched doc_id % 101 = 7"
    by_query: dict[int, list] = {}
    for r in rows:
        assert r.doc_id != r.query_id, "query doc retrieved itself"
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rs in by_query.items():
        ranks = [r.rank for r in rs]
        assert ranks == list(range(1, len(rs) + 1)), f"ranks not dense: {qid}"
        assert len(rs) <= _TOPK
        scores = [r.score_fp for r in rs]
        assert scores == sorted(scores, reverse=True), f"not score-ordered: {qid}"


def test_bm25_plan_broadcasts_query_side(spark, sf_dir):
    df = registry.QUERIES["q_bm25_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # every query-side attach is a broadcast: the corpus is never
    # shuffled on anything except the vocabulary-restricted postings
    assert "BroadcastHashJoin" in plan


def test_chunks_tile_documents(spark, sf_dir):
    """Chunk starts advance by the stride, consecutive chunks overlap
    by W-S tokens, and the union of chunks covers [0, n_tokens)."""
    from geoparquet_python_spark.functions.text import tokens
    from geoparquet_python_spark.io import load_table

    chunks = registry.QUERIES["q_doc_chunks_overlap"](spark, sf_dir)
    lens = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokens("text")).alias("n"))
        .collect()
    }
    per_doc: dict[int, list] = {}
    for r in chunks.collect():
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(lens)
    for doc_id, rs in per_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        n = lens[doc_id]
        covered_to = 0
        for i, r in enumerate(rs):
            assert r.chunk_idx == i
            assert r.start_tok == i * _CHUNK_S
            assert r.start_tok < n
            assert r.n_chunk_tokens == min(_CHUNK_W, n - r.start_tok)
            assert r.start_tok <= covered_to  # no gap
            covered_to = max(covered_to, r.start_tok + r.n_chunk_tokens)
        assert covered_to == n, f"doc {doc_id} not fully covered"


def test_mmr_prefers_diverse_over_nearest_duplicate(spark, tmp_path):
    """Plant one label where the two most relevant candidates are
    exact clones: plain top-2 would return both, but MMR's λ·max-sim
    penalty must demote the clone below a less-relevant-but-diverse
    vector. Geometry (e0/e1 plane): seed=(1,0); v1=v2=(0.9,0.436)
    (rel 0.9, mutual cos 1 ⇒ clone score 0.4); v3=(0.6,-0.8)
    (rel 0.6, cos to v1 ≈ 0.19 ⇒ score ≈ 0.504 > 0.4)."""
    import numpy as np
    import pandas as pd

    vecs = {
        0: [1.0, 0.0],  # seed (min vec_id)
        1: [0.9, 0.43589],
        2: [0.9, 0.43589],  # exact clone of 1
        3: [0.6, -0.8],
    }
    d = str(tmp_path)
    pd.DataFrame(
        {
            "vec_id": list(vecs),
            "embedding": [np.array(v + [0.0, 0.0], dtype="float32") for v in vecs.values()],
            "label": np.zeros(len(vecs), dtype="int32"),
        }
    ).to_parquet(f"{d}/embeddings.parquet")

    rows = registry.QUERIES["q_mmr_diverse_topk"](spark, d).collect()
    order = [(r.rank, r.vec_id) for r in rows]
    assert order == [(1, 1), (2, 3), (3, 2)], order
    by_rank = {r.rank: r for r in rows}
    assert abs(by_rank[1].score - 0.9) < 1e-6
    assert by_rank[2].score > by_rank[3].score
    # the clone's selection-time score carries the full λ penalty
    assert abs(by_rank[3].score - 0.4) < 1e-6

"""Behavioral properties of the retrieval + semantic/substring dedup tier
(plans/retrieval.py, plans/semantic_dedup.py): ranking laws and span
geometry the row-hash oracles can't state as invariants — BM25's term
coverage and length normalization, SemDeDup's keep-lowest-id contract,
and the stride-1 span pass catching SHIFTED copies that chunk alignment
misses."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

from steam_prices_data_engineering_spark.plans.retrieval import bm25_search_topk
from steam_prices_data_engineering_spark.plans.semantic_dedup import (
    _SEM_TAU,
    _SPAN_W,
    semdedup_prune,
    substring_dup_spans,
)


def _write_docs(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "sf")
    docs.coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def test_bm25_coverage_and_length_normalization(spark, tmp_path):
    """Doc with all three query-0 terms outranks a one-term doc; between
    two docs with identical tf for every query term, the SHORTER one
    scores higher (b > 0 length normalization)."""
    filler = "x y z w v u t s r q p o n m l k"
    out = _write_docs(
        spark,
        tmp_path,
        [
            (1, "hash join scan"),              # all terms, short
            (2, "hash join scan " + filler),    # all terms, long
            (3, "hash " + filler),              # one term
            (4, filler),                        # no terms
        ],
    )
    rows = {
        (r.q_id, r.doc_id): r for r in bm25_search_topk(spark, out).collect()
    }
    assert (0, 4) not in rows  # no-hit docs never appear
    assert rows[(0, 1)].n_hit_terms == 3 and rows[(0, 3)].n_hit_terms == 1
    assert rows[(0, 1)].score > rows[(0, 2)].score > rows[(0, 3)].score
    assert rows[(0, 1)].rank == 1


def test_bm25_ranks_dense_on_fixture(spark):
    rows = bm25_search_topk(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_semdedup_keeps_lowest_id_of_duplicate_group(spark, tmp_path):
    """Two identical vectors land in the same cluster; the higher vec_id
    is pruned with max_cos_lower == 1.0, the lower survives."""
    import random

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    other = [rng.uniform(-1, 1) for _ in range(64)]
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(64)], 0) for i in range(8)]
    vecs += [(100, base, 1), (101, base, 1), (102, other, 2)]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    out = str(tmp_path / "sf")
    emb.coalesce(1).write.parquet(f"{out}/embeddings.parquet")
    rows = {r.vec_id: r for r in semdedup_prune(spark, out).collect()}
    assert len(rows) == 11
    assert rows[100].cluster == rows[101].cluster
    assert rows[100].is_kept and not rows[101].is_kept
    assert rows[101].max_cos_lower == pytest.approx(1.0)
    # every pruned vector's offending cosine clears the threshold
    for r in rows.values():
        if not r.is_kept:
            assert r.max_cos_lower >= _SEM_TAU


def test_substring_spans_catch_shifted_copy_and_merge(spark, tmp_path):
    """A W+4-token run copied into doc 2 at a DIFFERENT token offset is
    found (stride-1 windows are shift-invariant), reported once per doc
    as one maximal span of exactly W+4 tokens at the right positions."""
    run = " ".join(f"t{i}" for i in range(_SPAN_W + 4))  # 16 shared tokens
    pad = " ".join(f"a{i}" for i in range(5))
    pad2 = " ".join(f"b{i}" for i in range(9))
    out = _write_docs(
        spark,
        tmp_path,
        [
            (1, f"{pad} {run}"),          # run at offset 6
            (2, f"{pad2} {run} {pad}"),   # run at offset 10
            (3, pad + " " + pad2),        # no dup material
        ],
    )
    spans = {r.doc_id: r for r in substring_dup_spans(spark, out).collect()}
    assert set(spans) == {1, 2}
    assert spans[1].span_start == 6 and spans[1].span_tokens == _SPAN_W + 4
    assert spans[2].span_start == 10 and spans[2].span_tokens == _SPAN_W + 4
    # maximal merge: the 5 overlapping hit windows collapse to ONE span
    assert spans[1].span_idx == 1 and spans[1].n_windows == 5


def test_substring_spans_split_on_gap(spark, tmp_path):
    """Two shared runs separated by more than W unique tokens in the same
    doc come back as TWO spans, not one over-merged span."""
    run_a = " ".join(f"t{i}" for i in range(_SPAN_W))
    run_b = " ".join(f"u{i}" for i in range(_SPAN_W))
    gap = " ".join(f"g{i}" for i in range(_SPAN_W + 3))
    out = _write_docs(
        spark,
        tmp_path,
        [
            (1, f"{run_a} {gap} {run_b}"),
            (2, run_a),
            (3, run_b),
        ],
    )
    spans = [
        r
        for r in substring_dup_spans(spark, out).collect()
        if r.doc_id == 1
    ]
    spans.sort(key=lambda r: r.span_start)
    assert len(spans) == 2
    assert spans[0].span_start == 1 and spans[0].span_tokens == _SPAN_W
    assert spans[1].span_tokens == _SPAN_W


def test_bm25_panel_broadcasts_and_scans_corpus_once(spark):
    """The query panel and df/global stats must broadcast — a shuffle
    there would carry the corpus token stream keyed by term. And the
    corpus tokenizes ONCE (r8): both the (N, avgdl) globals and the
    token stream read the cached corpus_tokens projection, so the plan
    shows exactly ONE parquet scan — the InMemoryRelation's own
    cache-build child — and 2 in-memory reads of the cached tokenize."""
    from steam_prices_data_engineering_spark.plans.retrieval import (
        _bm25_ranked,
    )

    # plan shape is pinned on the UNCACHED inner builder — the public
    # query wraps it in a result cache (r10), which would hide the tree.
    # An earlier test in this session may already have registered that
    # result cache, in which case CacheManager would substitute it at
    # the TOP of even this inner plan — drop all cache entries first so
    # the assertions see the real tree.
    spark.catalog.clearCache()
    df = _bm25_ranked(spark, SF_DIR)
    explained = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in explained
    # formatted explain prints each node in the tree AND the detail list;
    # count the "(n) Scan parquet" detail headers = distinct scan nodes
    import re

    assert len(re.findall(r"^\(\d+\) Scan parquet", explained, re.M)) == 1
    assert (
        len(re.findall(r"^\(\d+\) InMemoryTableScan", explained, re.M)) == 2
    )
    # r10 cross-call stage reuse: the public query caches the bounded
    # ranked result, and because the panel is a VALUES local relation
    # (panel_df) — not a LogicalRDD — a SECOND builder invocation's plan
    # sameResult-matches and reads the in-memory ranking instead of
    # re-running the token explode (this is what hands rm3 / hybrid
    # fusion their lexical input for free within a session).
    cached = bm25_search_topk(spark, SF_DIR)
    cached.count()  # materialize the cache
    again = bm25_search_topk(spark, SF_DIR)
    explained2 = again._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the TOP of the substituted plan is the in-memory read (the
    # formatted dump still prints the cacheBuilder's child subtree,
    # parquet scan included, so a zero-scan assertion would be wrong)
    assert re.search(
        r"InMemoryTableScan \(1\)", explained2
    ), explained2.splitlines()[:4]
    cached.unpersist()


def test_lsh_recall_single_documents_scan(spark):
    """Stage-reuse census (VERDICT r6 task 3): every stage of
    lsh_recall_empirical — candidates, verify, the exact truth index —
    derives from the ONE cached hashed-shingle frame, so the whole plan
    contains exactly one parquet scan. The r6 shape re-shingled the
    corpus for the truth set (a second scan + a second hash chain)."""
    import re

    from steam_prices_data_engineering_spark.plans import registry

    df = registry.queries()["lsh_recall_empirical"](spark, SF_DIR)
    explained = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert len(re.findall(r"^\(\d+\) Scan parquet", explained, re.M)) == 1

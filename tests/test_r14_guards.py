"""r13-advice hardening + r14 cache-boundedness pins.

- kmeans expr path: an empty mini-batch carries the previous centroids
  forward (mini-batch Lloyd semantics) instead of feeding a zero-arg
  least() to the next assignment; _assign_expr refuses an empty
  centroid list at the API boundary.
- BPE: the declared bench corpora never run out of adjacent pairs
  before _BPE_ITERS (the early-break regime is untested against the
  oracle's unrolled CTEs, which would emit an EMPTY vocab there — the
  assertion documents that the engines only agree outside it), and the
  dry-corpus unit behavior is pinned: empty rules, vocab unchanged.
- q_bfs_khop storage boundedness: repeated invocations reuse the
  plan-matched cache entries instead of accumulating new ones — the
  persisted population after N runs equals the population after 1.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def test_update_rows_empty_batch_carries_centroids_forward(spark):
    from pulsar_sync_java_spark.queries.clustering import _update_rows
    from pulsar_sync_java_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cent = [(0, [0.0] * 64), (1, [1.0] * 64)]
    out = _update_rows(e.filter("vec_id < 0"), cent)  # empty batch
    assert out == cent


def test_assign_expr_refuses_empty_centroids():
    from pulsar_sync_java_spark.queries.clustering import _assign_expr

    with pytest.raises(ValueError, match="empty centroid list"):
        _assign_expr([])


def test_bpe_learn_dry_corpus_keeps_vocab_and_emits_no_rules(spark):
    from pulsar_sync_java_spark.queries.pipeline import _bpe_learn

    d = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "b c a", "en")], "doc_id long, text string, lang string"
    )
    rules, vocab = _bpe_learn(d)
    # single-char words have no adjacent symbol pairs: training finds
    # nothing to merge and the char-split vocabulary passes through
    assert rules == []
    rows = {r["word"]: list(r["arr"]) for r in vocab.collect()}
    assert rows == {"a": ["a"], "b": ["b"], "c": ["c"]}


def test_bench_corpus_never_hits_the_bpe_dry_break(spark):
    from pulsar_sync_java_spark.queries.pipeline import _BPE_ITERS, _bpe_learn
    from pulsar_sync_java_spark.sources.tables import load_table

    rules, _ = _bpe_learn(load_table(spark, SF_DIR, "documents"))
    assert len(rules) == _BPE_ITERS  # every declared iteration merged


def test_bfs_khop_storage_population_is_bounded_across_invocations(spark):
    from pulsar_sync_java_spark.queries import all_queries

    q = all_queries()["q_bfs_khop"]
    q(spark, SF_DIR).count()
    jsc = spark.sparkContext._jsc.sc()
    after_one = len(
        [s for s in jsc.getRDDStorageInfo()]
    )
    for _ in range(3):
        q(spark, SF_DIR).count()
    after_four = len([s for s in jsc.getRDDStorageInfo()])
    # plan-matched CacheManager dedup: re-invocations REUSE the edge +
    # frontier entries — the population must not grow with invocations
    # (the r13-advice "accumulates per invocation" concern is bounded
    # by plan matching, not by an unpersist)
    assert after_four == after_one

"""Incremental near-dup against a persisted MinHash index."""

import pyspark.sql.functions as F


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_matches_full_batch_cross_pairs(spark, tmp_path):
    """Index corpus A, then check increment B against it: the pairs
    must equal the cross-corpus subset of a full-batch LSH run over
    A union B with the same parameters (same sketches, same banding —
    the incremental path is a re-plumbing, not a new algorithm)."""
    from tl_spark.cache import unpersist_handles
    from tl_spark.operators.dedup import minhash_lsh_candidates
    from tl_spark.operators.dedup_index import (
        incremental_neardup,
        write_minhash_index,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "jumping through the long afternoon sun without any rest"
    )
    corpus = _corpus(
        spark,
        [
            (1, base),
            (2, "completely different text about spark query engines"),
            (3, "a third unrelated document mentioning nothing shared"),
        ],
    )
    increment = _corpus(
        spark,
        [
            (101, base + " extra tail"),  # near-dup of doc 1
            (102, "novel content with zero overlap whatsoever"),
        ],
    )
    path = str(tmp_path / "mh_index")
    report = write_minhash_index(corpus, path)
    assert report["docs_indexed"] == 3

    inc = incremental_neardup(increment, path, threshold=0.0)
    got = {
        (r["id_new"], r["id_index"]): r["est_jaccard"]
        for r in inc.collect()
    }
    unpersist_handles(inc)

    full = minhash_lsh_candidates(
        corpus.unionByName(increment), n_hashes=32, bands=8
    )
    cross = {}
    for r in full.collect():
        a, b = r["id_a"], r["id_b"]
        if (a > 100) != (b > 100):  # one from each side
            new, idx = (a, b) if a > 100 else (b, a)
            cross[(new, idx)] = r["est_jaccard"]
    unpersist_handles(full)

    assert got == cross
    assert (101, 1) in got and got[(101, 1)] >= 0.5
    assert all(k[0] != 102 for k in got)  # novel doc matches nothing


def test_incremental_threshold_and_meta_params(spark, tmp_path):
    """The increment reads sketch parameters from the index meta (a
    non-default n_hashes/bands round-trips), and the threshold filter
    applies to est_jaccard."""
    from tl_spark.cache import unpersist_handles
    from tl_spark.operators.dedup_index import (
        incremental_neardup,
        write_minhash_index,
    )

    doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    corpus = _corpus(spark, [(1, doc), (2, "other words here entirely")])
    path = str(tmp_path / "idx2")
    write_minhash_index(corpus, path, n_hashes=64, bands=16)
    inc_df = _corpus(spark, [(201, doc)])  # exact duplicate
    inc = incremental_neardup(inc_df, path, threshold=0.99)
    rows = inc.collect()
    unpersist_handles(inc)
    assert [(r["id_new"], r["id_index"], r["est_jaccard"]) for r in rows] == [
        (201, 1, 1.0)
    ]
    # the signature length follows meta (64), not the default (32):
    # a wrong length would make est_jaccard of an exact dup != 1.0


def test_incremental_neardup_broadcasts_the_increment(spark, tmp_path):
    """Plan pin for the scale claim: the candidate join must be a
    BroadcastHashJoin with the INCREMENT side broadcast — the index
    bucket table is scanned map-only, never shuffled."""
    from tl_spark.cache import unpersist_handles
    from tl_spark.operators.dedup_index import (
        incremental_neardup,
        write_minhash_index,
    )

    corpus = _corpus(
        spark, [(i, f"corpus document number {i} with words") for i in range(20)]
    )
    path = str(tmp_path / "idx3")
    write_minhash_index(corpus, path)
    inc = _corpus(spark, [(100, "corpus document number 3 with words")])
    out = incremental_neardup(inc, path, threshold=0.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    unpersist_handles(out)
    lines = plan.splitlines()
    # the candidate join is the BroadcastHashJoin on (band, bh)
    cand = [
        i for i, l in enumerate(lines)
        if "BroadcastHashJoin" in l and "band#" in l
    ]
    assert cand, "candidate (band, bh) broadcast join missing from plan"
    # the index bucket table feeds it as the STREAMED side: the first
    # parquet FileScan under the join arrives with no shuffle Exchange
    # in between (tmp paths get truncated out of Location, so match
    # structurally, not by path)
    after = lines[cand[0] + 1 :]
    scan_at = next(
        i for i, l in enumerate(after) if "FileScan parquet" in l
    )
    assert not any(
        "Exchange hashpartitioning" in l for l in after[:scan_at]
    ), after[: scan_at + 1]
    # and the increment side is the broadcast build
    assert any("BroadcastExchange" in l for l in after[scan_at:])

"""Winnowing fingerprints: independent reference + MOSS guarantee."""

import numpy as np


def _ref_fingerprints(text, k, w):
    """Independent reference: naive O(n*k) k-gram hashing (plain
    multiply-add loop, no cumulative-sum trick) + O(m*w) window
    minima."""
    data = text.encode("utf-8")
    if len(data) < k:
        return []
    hashes = []
    for j in range(len(data) - k + 1):
        h = 0
        for byte in data[j : j + k]:
            h = (h * 1000003 + byte) % (1 << 64)
        hashes.append(h)
    if len(hashes) <= w:
        sel = {min(hashes)}
    else:
        sel = {min(hashes[j : j + w]) for j in range(len(hashes) - w + 1)}
    return sorted(np.array(sorted(sel), dtype=np.uint64).view(np.int64).tolist())


def test_winnow_matches_independent_reference(spark):
    """The vectorized kernel equals the naive per-doc reference on a
    mixed corpus including unicode, short docs, and empties."""
    from tl_spark.operators.winnow import winnow_fingerprints

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "café naïve résumé — unicode bytes too"),
        (3, "tiny"),
        (4, ""),
        (5, "aaaaaaaaaaaaaaaaaaaaaaa"),  # degenerate: all k-grams equal
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["fps"])
        for r in winnow_fingerprints(df, k=8, window=4).collect()
    }
    for i, t in docs:
        assert got[i] == _ref_fingerprints(t, 8, 4), i


def test_winnow_guarantee_and_overlap_pairs(spark):
    """MOSS guarantee: two docs sharing a substring of length >=
    window + k - 1 share >= 1 fingerprint; substring_overlap_pairs
    surfaces exactly the planted pair and nothing else."""
    from tl_spark.operators.winnow import (
        substring_overlap_pairs,
        winnow_fingerprints,
    )

    shared = "this exact licensing boilerplate paragraph is repeated verbatim"
    docs = [
        (1, "first document intro. " + shared + " first doc outro."),
        (2, "totally different framing text. " + shared + " and more."),
        (3, "no overlap with anybody else at all in this one, none."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in winnow_fingerprints(df, k=8, window=4).collect()
    }
    assert len(fps[1] & fps[2]) >= 1  # the guarantee
    pairs = substring_overlap_pairs(
        df, k=8, window=4, min_shared=2
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["n_shared"] >= 2


def test_winnow_bucket_cap_drops_boilerplate_fp(spark):
    """A fingerprint shared by more docs than max_bucket_size is
    dropped before the self-join (worst-case bound), so an all-same
    corpus yields no pairs at cap 2 but does at a higher cap."""
    from tl_spark.operators.winnow import substring_overlap_pairs

    text = "identical boilerplate content everywhere repeated again"
    df = spark.createDataFrame(
        [(i, text) for i in range(4)], "doc_id long, text string"
    )
    none = substring_overlap_pairs(df, min_shared=1, max_bucket_size=2)
    assert none.count() == 0
    some = substring_overlap_pairs(df, min_shared=1, max_bucket_size=10)
    assert some.count() == 6  # all C(4,2) pairs

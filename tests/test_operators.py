"""Dedup / similarity / text-analysis operators over the driver tables."""

import pyspark.sql.functions as F
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_exact_dedup(spark, documents):
    from tl_spark.operators.dedup import exact_dedup

    out = exact_dedup(documents).collect()
    n_distinct = documents.select("text").distinct().count()
    assert len(out) == n_distinct
    assert sum(r["n_dups"] for r in out) == documents.count()


def test_minhash_lsh_finds_dups(spark, documents):
    from tl_spark.operators.dedup import minhash_lsh_candidates

    # plant near-duplicates: doc_id + 100000 with one word changed
    dupes = documents.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    corpus = documents.select("doc_id", "text").unionByName(dupes)
    cands = minhash_lsh_candidates(corpus, n_hashes=32, bands=8).collect()
    found = {(r["id_a"], r["id_b"]) for r in cands}
    for i in [r["doc_id"] for r in documents.limit(5).collect()]:
        assert (i, i + 100000) in found, f"planted near-dup {i} not found"
    # high estimated jaccard for planted pairs
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in cands}
    for i in [r["doc_id"] for r in documents.limit(5).collect()]:
        assert est[(i, i + 100000)] > 0.5


def test_ngram_jaccard_verification(spark, documents):
    from tl_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    dupes = documents.limit(3).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.col("text"),
    )
    corpus = documents.select("doc_id", "text").unionByName(dupes)
    cands = minhash_lsh_candidates(corpus)
    verified = ngram_jaccard_pairs(corpus, cands, threshold=0.99).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified}
    for i in [r["doc_id"] for r in documents.limit(3).collect()]:
        assert pairs.get((i, i + 100000)) == 1.0  # identical text


def test_simhash(spark, documents):
    from tl_spark.operators.dedup import simhash_signatures

    base = documents.select("doc_id", "text")
    sigs = {r["id"]: r["simhash"] for r in simhash_signatures(base).collect()}
    assert len(sigs) == base.count()
    # identical text => identical signature
    twin = base.limit(1).select(
        (F.col("doc_id") + 500000).alias("doc_id"), F.col("text")
    )
    both = simhash_signatures(base.limit(1).unionByName(twin)).collect()
    assert both[0]["simhash"] == both[1]["simhash"]


def test_cosine_topk_and_lsh(spark, embeddings):
    from tl_spark.operators.similarity import (
        cosine_topk_bruteforce,
        lsh_bucket_candidates,
    )

    q = embeddings.limit(1).collect()[0]
    query = [float(x) for x in q["embedding"]]
    top = cosine_topk_bruteforce(embeddings, query, k=5).collect()
    assert top[0]["id"] == q["vec_id"]  # self is most similar
    assert abs(top[0]["cosine"] - 1.0) < 1e-4
    sims = [r["cosine"] for r in top]
    assert sims == sorted(sims, reverse=True)

    ann = lsh_bucket_candidates(embeddings, query, n_planes=8, k=5).collect()
    assert ann, "query's own bucket must not be empty"
    assert ann[0]["id"] == q["vec_id"]


def test_text_stats(spark, documents):
    from tl_spark.functions.text import with_text_stats

    out = with_text_stats(documents).limit(50).collect()
    for r in out:
        toks = [t for t in r["text"].split() if t]
        assert r["n_tokens"] == len(toks)
        assert r["n_chars_computed"] == len(r["text"])
        assert 0.0 <= r["quality"] <= 1.0
        assert r["lang_guess"] in ("en", "de", "fr", "es", "und")
    # fingerprint is order-insensitive
    from tl_spark.functions.text import fingerprint

    df = spark.createDataFrame(
        [("a b c",), ("c b a",), ("a b d",)], "text string"
    ).select(fingerprint(F.col("text")).alias("fp"))
    fps = [r["fp"] for r in df.collect()]
    assert fps[0] == fps[1] != fps[2]


def test_streaming_extraction(spark, tmp_path):
    from tl_spark.sources.transcripts import synth_transcripts, write_transcripts
    from tl_spark.streaming.extract_stream import run_streaming_extraction

    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df = synth_transcripts(spark, n_convs=20, median_turns=5, skew_mult=10)
    write_transcripts(df, inp)
    run_streaming_extraction(spark, inp, outp, ckpt)
    got = spark.read.parquet(outp)
    assert got.count() == df.count()
    assert "extracted_text" in got.columns


def test_minhash_deterministic_across_partitioning(spark, documents):
    from tl_spark.operators.dedup import minhash_signatures

    base = documents.select("doc_id", "text")
    a = {r["id"]: tuple(r["sig"]) for r in minhash_signatures(base.repartition(1)).collect()}
    b = {r["id"]: tuple(r["sig"]) for r in minhash_signatures(base.repartition(13)).collect()}
    assert a == b

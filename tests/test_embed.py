"""Feature-hashing embeddings: reference parity + retrieval loop."""

import numpy as np
import pyspark.sql.functions as F


def test_hashed_embedding_matches_local_reference(spark):
    """Spark vectors equal a local reference built from the SAME
    xxhash64 values (exported as columns, so the reference shares
    only the hash primitive, not the pipeline)."""
    from tl_spark.operators.embed import hashed_embedding

    docs = [
        (1, "the quick brown fox"),
        (2, "jumps over the lazy dog"),
        (3, ""),
        (4, "THE QUICK the quick"),
    ]
    dim = 32
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: np.array(r["embedding"], dtype=np.float32)
        for r in hashed_embedding(df, dim=dim).collect()
    }
    # export the JVM hash values for each distinct token
    toks = sorted(
        {w.lower() for _, t in docs for w in t.split() if w}
    )
    tok_df = spark.createDataFrame([(t,) for t in toks], "tok string")
    hrows = tok_df.select(
        "tok",
        F.pmod(F.xxhash64("tok"), F.lit(dim)).cast("int").alias("slot"),
        (F.pmod(F.xxhash64("tok", F.lit("sign-salt")), F.lit(2)) * 2 - 1)
        .cast("double")
        .alias("sign"),
    ).collect()
    hmap = {r["tok"]: (r["slot"], r["sign"]) for r in hrows}
    for doc_id, text in docs:
        v = np.zeros(dim)
        for w in text.split():
            s, sg = hmap[w.lower()]
            v[s] += sg
        n = np.linalg.norm(v)
        if n > 0:
            v = v / n
        assert np.allclose(got[doc_id], v, atol=1e-6), doc_id
    assert len(got) == 4 and np.all(got[3] == 0)  # empty doc -> zeros


def test_hashed_embedding_closes_the_retrieval_loop(spark):
    """text -> hashed vectors -> exact cosine top-k: each doc's
    nearest neighbor (excluding itself) is its planted paraphrase,
    not an unrelated doc — the model-free retrieval path end to end."""
    from tl_spark.operators.embed import hashed_embedding
    from tl_spark.operators.similarity import cosine_topk_bruteforce

    pairs = [
        ("database engine query optimizer join index scan plan",
         "query optimizer plan for database join index scan engine"),
        ("deep learning neural network training gradient descent",
         "training a neural network with gradient descent learning"),
        ("sailing ships across the ocean with strong winds tonight",
         "ships sailing the ocean tonight with strong winds blowing"),
    ]
    rows = []
    for i, (a, b) in enumerate(pairs):
        rows.append((2 * i, a))
        rows.append((2 * i + 1, b))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hashed_embedding(df, dim=64).select(
        F.col("id").alias("vec_id"), "embedding"
    )
    for i in range(len(pairs)):
        probe = [
            r["embedding"]
            for r in emb.filter(F.col("vec_id") == 2 * i).collect()
        ][0]
        top = cosine_topk_bruteforce(emb, probe, k=2).collect()
        ids = [r["id"] for r in top]
        assert ids[0] == 2 * i  # itself
        assert ids[1] == 2 * i + 1, (i, ids)  # its paraphrase


def test_hashed_embedding_md5_leg_matches_python_reference(spark):
    """The md5 hash leg (the driver-oracle-expressible variant) must
    equal a local reference computed with hashlib: slot from the
    first 8 hex chars, sign from the next 8 — same md5, zero Spark
    primitives shared."""
    import hashlib

    from tl_spark.operators.embed import hashed_embedding

    docs = [
        (1, "the quick brown fox"),
        (2, "jumps over the lazy dog dog dog"),
        (3, ""),
        (4, "Unicode töken café café"),
    ]
    dim = 16
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: np.array(r["embedding"], dtype=np.float32)
        for r in hashed_embedding(df, dim=dim, hash_fn="md5").collect()
    }
    for doc_id, text in docs:
        v = np.zeros(dim)
        for w in text.split():
            h = hashlib.md5(w.lower().encode("utf-8")).hexdigest()
            slot = int(h[:8], 16) % dim
            sign = 1.0 if int(h[8:16], 16) % 2 == 1 else -1.0
            v[slot] += sign
        n = np.linalg.norm(v)
        if n > 0:
            v = v / n
        assert np.allclose(got[doc_id], v, atol=1e-6), doc_id
    assert np.all(got[3] == 0)


def test_hashed_embedding_rejects_unknown_hash(spark):
    import pytest

    from tl_spark.operators.embed import hashed_embedding

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        hashed_embedding(df, hash_fn="sha1")


def test_hashed_embedding_arrow_leg_bit_equal(spark):
    """The round-8 Arrow md5 leg must be BIT-equal to the JVM
    expression chain — incl. zero-token docs (zero vector), repeated
    tokens, >55-byte tokens (hashlib fallback path) and mixed case."""
    from tl_spark.operators.embed import hashed_embedding

    rows = [
        (1, "alpha beta alpha GAMMA gamma"),
        (2, ""),
        (3, "   "),
        (4, "x" * 80 + " yy zz " + "x" * 80),
        (5, "The quick brown fox jumps over the lazy dog"),
        (6, "dup dup dup dup dup dup"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for dim in (16, 64):
        jvm = {
            r["id"]: r["embedding"]
            for r in hashed_embedding(df, dim=dim, hash_fn="md5").collect()
        }
        arrow = {
            r["id"]: r["embedding"]
            for r in hashed_embedding(
                df, dim=dim, hash_fn="md5", impl="arrow"
            ).collect()
        }
        assert set(jvm) == set(arrow)
        for k in jvm:
            assert jvm[k] == arrow[k], (dim, k, jvm[k], arrow[k])
    # and on the sf0.01 corpus
    corpus = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select("doc_id", "text")
    jvm = {
        r["id"]: r["embedding"]
        for r in hashed_embedding(corpus, dim=16, hash_fn="md5").collect()
    }
    arrow = {
        r["id"]: r["embedding"]
        for r in hashed_embedding(
            corpus, dim=16, hash_fn="md5", impl="arrow"
        ).collect()
    }
    assert jvm == arrow

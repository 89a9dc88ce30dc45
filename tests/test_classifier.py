"""Trainable quality classifier: separability, determinism, parity,
plan shape."""

import numpy as np
import pyspark.sql.functions as F
import pytest


def _corpus(spark, seed=0):
    """Planted separable corpus: positive docs use 'quality' markers,
    negative docs use 'spam' markers, both over a shared base vocab."""
    import random

    rng = random.Random(seed)
    base = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    posw = ["insight", "research", "thorough", "citation"]
    negw = ["clickbait", "viagra", "winner", "prize"]
    rows_p, rows_n = [], []
    for i in range(300):
        words = [rng.choice(base) for _ in range(10)] + [
            rng.choice(posw) for _ in range(4)
        ]
        rng.shuffle(words)
        rows_p.append((i, " ".join(words)))
        words = [rng.choice(base) for _ in range(10)] + [
            rng.choice(negw) for _ in range(4)
        ]
        rng.shuffle(words)
        rows_n.append((1000 + i, " ".join(words)))
    schema = "doc_id long, text string"
    return (
        spark.createDataFrame(rows_p, schema),
        spark.createDataFrame(rows_n, schema),
    )


def test_classifier_separates_planted_corpus(spark):
    from tl_spark.operators.classifier import (
        classify_quality,
        train_text_classifier,
    )

    pos, neg = _corpus(spark, seed=0)
    model = train_text_classifier(pos, neg, dim=512, epochs=80)
    # held-out docs from the same generator, different seed
    pos_h, neg_h = _corpus(spark, seed=1)
    kp = classify_quality(pos_h, model).filter("keep").count()
    kn = classify_quality(neg_h, model).filter("keep").count()
    assert kp >= 0.95 * pos_h.count(), kp
    assert kn <= 0.05 * neg_h.count(), kn


def test_classifier_training_is_partition_independent(spark):
    from tl_spark.operators.classifier import train_text_classifier

    pos, neg = _corpus(spark)
    m1 = train_text_classifier(
        pos.repartition(2), neg.repartition(3), dim=256, epochs=20
    )
    m2 = train_text_classifier(
        pos.repartition(7), neg.repartition(1), dim=256, epochs=20
    )
    assert m1["b"] == m2["b"]
    assert m1["w"] == m2["w"]


def test_classifier_matches_local_numpy_reference(spark):
    """End-to-end parity: the same GD on locally-computed hashlib-md5
    features must give the same model (md5 leg shares only the hash
    primitive with the JVM side)."""
    import hashlib

    from tl_spark.operators.classifier import train_text_classifier

    pos, neg = _corpus(spark)
    dim, epochs, lr, l2 = 128, 15, 2.0, 1e-4
    model = train_text_classifier(
        pos, neg, dim=dim, epochs=epochs, lr=lr, l2=l2, hash_fn="md5"
    )

    def feats(text):
        v = np.zeros(dim)
        for wtok in text.split():
            h = hashlib.md5(wtok.lower().encode()).hexdigest()
            s = int(h[:8], 16) % dim
            v[s] += 1.0 if int(h[8:16], 16) % 2 == 1 else -1.0
        nrm = np.linalg.norm(v)
        return (v / nrm if nrm > 0 else v).astype(np.float32)

    # replicate the deterministic sample order: xxhash64(id) asc —
    # compute via Spark (the only JVM dependence left)
    def sample_ids(df):
        return [
            r["doc_id"]
            for r in df.select(
                "doc_id", F.xxhash64(F.col("doc_id")).alias("h")
            )
            .orderBy("h", "doc_id")
            .collect()
        ]

    texts = {
        r["doc_id"]: r["text"]
        for r in pos.unionByName(neg).collect()
    }
    rows = [feats(texts[i]) for i in sample_ids(pos)] + [
        feats(texts[i]) for i in sample_ids(neg)
    ]
    X = np.array(rows, np.float64)
    n_p = pos.count()
    n = len(rows)
    y = np.r_[np.ones(n_p), np.zeros(n - n_p)]
    sw = np.r_[np.full(n_p, 0.5 / n_p), np.full(n - n_p, 0.5 / (n - n_p))]
    w = np.zeros(dim)
    b = 0.0
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        err = (p - y) * sw
        w -= lr * (X.T @ err + l2 * w)
        b -= lr * float(err.sum())
    got = np.asarray(model["w"])
    assert np.allclose(got, w, atol=1e-9), np.abs(got - w).max()
    assert abs(model["b"] - b) < 1e-9


def test_classifier_scoring_plan_is_map_only_after_embedding(spark):
    """Scoring adds NO exchange beyond hashed_embedding's own id
    shuffle: equal Exchange counts in the embedding plan and the
    scoring plan."""
    from tl_spark.operators.classifier import classifier_scores
    from tl_spark.operators.embed import hashed_embedding

    df = spark.createDataFrame(
        [(i, f"alpha beta doc{i}") for i in range(50)],
        "doc_id long, text string",
    )
    model = {"w": [0.0] * 64, "b": 0.1, "dim": 64, "hash_fn": "xxhash64"}
    emb_plan = (
        hashed_embedding(df, 64)._jdf.queryExecution().executedPlan().toString()
    )
    score_plan = (
        classifier_scores(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert score_plan.count("Exchange") == emb_plan.count("Exchange")
    # and the constant model scores exactly sigmoid(b) for every doc
    got = {r["id"]: r["score"] for r in classifier_scores(df, model).collect()}
    want = round(1.0 / (1.0 + np.exp(-0.1)), 6)
    assert all(v == want for v in got.values())


def test_classifier_input_validation(spark):
    from tl_spark.operators.classifier import (
        classifier_scores,
        train_text_classifier,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    empty = df.filter("doc_id < 0")
    with pytest.raises(ValueError):
        train_text_classifier(df, empty, dim=64, epochs=2)
    with pytest.raises(ValueError):
        train_text_classifier(df, df, dim=1)
    with pytest.raises(ValueError):
        classifier_scores(df, {"w": [0.0] * 3, "b": 0.0, "dim": 64})

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


# ------------------------------------------------- round-2 additions

def test_minhash_short_docs_have_null_sig_and_no_candidates(spark):
    """Docs shorter than shingle_k carry NO signature (not a shared
    fallback), so unrelated short docs are never est=1.0 candidates."""
    from tl_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    rows = [(1, "ab"), (2, "xy"), (3, "q"), (4, "a normal length document")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["id"]: r["sig"] for r in minhash_signatures(df).collect()}
    assert sigs[1] is None and sigs[2] is None and sigs[3] is None
    assert sigs[4] is not None and len(sigs[4]) == 32
    cands = minhash_lsh_candidates(df).collect()
    assert cands == []  # the old fallback made (1,2),(1,3),(2,3) est=1.0


def test_ann_multiprobe_returns_k_and_planted_recall(spark, embeddings):
    """Planted scaled-query needles are found with a SMALL probe budget
    (they share the query's first-probed bucket by construction)."""
    from tl_spark.operators.similarity import ann_multiprobe_topk

    query = [((i * 37 + 11) % 97) / 97.0 - 0.5 for i in range(64)]
    qlit = "array(" + ",".join(f"cast({x!r} as float)" for x in query) + ")"
    needles = spark.range(10).select(
        (F.col("id") + 2000000).alias("vec_id"),
        F.expr(
            f"cast(transform({qlit}, x -> x * (1.0 + cast(id as double)/10.0))"
            " as array<float>)"
        ).alias("embedding"),
    )
    corpus = embeddings.select("vec_id", "embedding").unionByName(needles)
    out = ann_multiprobe_topk(
        corpus, query, n_planes=8, k=10, min_candidates=40
    ).collect()
    assert len(out) == 10
    assert {r["id"] for r in out} == {2000000 + i for i in range(10)}
    assert all(r["cosine"] == 1.0 for r in out)


def test_ann_multiprobe_recall_vs_bruteforce(spark, embeddings):
    """Recall >= 0.9 vs the exact scan on the natural (uniform-random)
    embeddings — sign-LSH's worst case, hence the large probe budget;
    clustered corpora reach the same recall with far smaller budgets
    (see the planted test above)."""
    from tl_spark.operators.similarity import (
        ann_multiprobe_topk,
        cosine_topk_bruteforce,
    )

    query = [((i * 37 + 11) % 97) / 97.0 - 0.5 for i in range(64)]
    exact = {r["id"] for r in cosine_topk_bruteforce(embeddings, query, k=20).collect()}
    approx_df = ann_multiprobe_topk(
        embeddings, query, n_planes=8, k=20, min_candidates=450
    )
    approx = {r["id"] for r in approx_df.collect()}
    assert len(approx) == 20
    recall = len(exact & approx) / 20
    assert recall >= 0.9, f"recall {recall}"


def test_ann_multiprobe_budget_tradeoff(spark, embeddings):
    """More probing -> recall never decreases (monotone tradeoff)."""
    from tl_spark.operators.similarity import (
        ann_multiprobe_topk,
        cosine_topk_bruteforce,
    )

    query = [((i * 37 + 11) % 97) / 97.0 - 0.5 for i in range(64)]
    exact = {r["id"] for r in cosine_topk_bruteforce(embeddings, query, k=10).collect()}
    recalls = []
    for budget in (20, 150, 500):
        got = {
            r["id"]
            for r in ann_multiprobe_topk(
                embeddings, query, n_planes=8, k=10, min_candidates=budget
            ).collect()
        }
        recalls.append(len(exact & got) / 10)
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0  # full probe == exact scan


def test_embedding_neardup_planted_precision_recall(spark, embeddings):
    """Perturbed twins (tiny deterministic rotation toward a fixed
    direction) are recovered: recall == 1 on the planted set and no
    false positives from the natural corpus."""
    from tl_spark.operators.similarity import embedding_neardup_pairs

    base = embeddings.select("vec_id", "embedding").limit(50)
    # twin = 0.999 * v + 0.001 * ones: cosine(v, twin) ~ 0.9999+
    twins = base.select(
        (F.col("vec_id") + 500000).alias("vec_id"),
        F.expr(
            "cast(transform(embedding, x -> x * cast(0.999 as float)"
            " + cast(0.001 as float)) as array<float>)"
        ).alias("embedding"),
    )
    corpus = embeddings.select("vec_id", "embedding").unionByName(twins)
    pairs = embedding_neardup_pairs(corpus, threshold=0.99).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    expected = {(r["vec_id"], r["vec_id"] + 500000) for r in base.collect()}
    assert got == expected
    assert all(r["cosine"] >= 0.99 for r in pairs)


def test_cosine_bruteforce_matches_numpy(spark, embeddings):
    """The vectorized pandas-UDF cosine equals a straight numpy
    reference on the same rows (guards the matmul path)."""
    import numpy as np

    from tl_spark.operators.similarity import cosine_topk_bruteforce

    query = [((i * 37 + 11) % 97) / 97.0 - 0.5 for i in range(64)]
    rows = embeddings.select("vec_id", "embedding").collect()
    m = np.array([r["embedding"] for r in rows], dtype=np.float32).astype(np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = np.asarray(query)
    cos = (m @ q) / (np.sqrt((m * m).sum(1)) * np.sqrt(q @ q))
    order = np.lexsort((ids, -np.round(cos, 6)))[:20]
    expected = [(int(ids[i]), round(float(cos[i]), 6)) for i in order]
    got = [
        (r["id"], r["cosine"])
        for r in cosine_topk_bruteforce(embeddings, query, k=20).collect()
    ]
    assert got == expected


def test_minhash_shingle_sampling_still_finds_planted_dups(spark, documents):
    """sample_mod=4 cuts the exploded shingle volume ~4x but identical
    texts still collide in every band (content-hash sampling is
    consistent across docs)."""
    from tl_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    base = documents.select("doc_id", "text")
    twins = base.limit(10).select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text"
    )
    corpus = base.unionByName(twins)
    cands = minhash_lsh_candidates(corpus, sample_mod=4).collect()
    found = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in cands}
    for i in [r["doc_id"] for r in base.limit(10).collect()]:
        assert found.get((i, i + 300000)) == 1.0
    # sampling really reduces work: exploded shingle rows shrink ~4x
    import pyspark.sql.functions as SF
    full = minhash_signatures(base).count()
    sampled = minhash_signatures(base, sample_mod=4).count()
    assert sampled <= full  # docs with no sampled shingle may drop out
    n_sh_full = base.select(
        SF.sum(SF.greatest(SF.length("text") - 4, SF.lit(0)))
    ).collect()[0][0]
    n_sh_sampled = base.select(
        SF.sum(
            SF.size(
                SF.expr(
                    "filter(transform(sequence(1, greatest(length(text)-4,1)),"
                    " i -> substring(text, i, 5)),"
                    " s -> pmod(xxhash64(s, 9173), 4) = 0)"
                )
            )
        )
    ).collect()[0][0]
    assert n_sh_sampled < n_sh_full * 0.45  # ~0.25 expected, generous bound


def test_ann_prebuilt_index_matches_inline(spark, embeddings):
    """Probing a persisted prebuilt index returns the identical result
    to inline signaturing (and signatures the corpus only once)."""
    from tl_spark.operators.similarity import (
        ann_multiprobe_topk,
        build_ann_index,
    )

    query = [((i * 37 + 11) % 97) / 97.0 - 0.5 for i in range(64)]
    inline = ann_multiprobe_topk(
        embeddings, query, n_planes=8, k=10, min_candidates=100
    ).collect()
    idx = build_ann_index(embeddings, n_planes=8).persist()
    try:
        via_index = ann_multiprobe_topk(
            None, query, n_planes=8, k=10, min_candidates=100, index=idx
        ).collect()
        assert [tuple(r) for r in inline] == [tuple(r) for r in via_index]
    finally:
        idx.unpersist()


def test_simhash_neardup_banded_recall_is_exact(spark, documents):
    """Banded-Hamming candidates == brute-force pairs (pigeonhole:
    r=3 flipped bits cannot spoil all 8 bands), verified against a
    local numpy brute force over the collected signatures."""
    from tl_spark.operators.dedup import (
        simhash_neardup_pairs,
        simhash_signatures,
    )

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_neardup_pairs(documents, max_hamming=3).collect()
    }
    sigs = {r["id"]: r["simhash"] for r in simhash_signatures(documents).collect()}
    ids = sorted(sigs)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                expect[(a, b)] = h
    assert got == expect


def test_operators_handle_empty_input(spark):
    """Every sketch/similarity operator degrades to an empty result on
    an empty table (no UDF crashes on zero-row Arrow batches)."""
    from tl_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_candidates,
        simhash_neardup_pairs,
        simhash_signatures,
    )
    from tl_spark.operators.similarity import (
        ann_multiprobe_topk,
        cosine_topk_bruteforce,
        embedding_neardup_pairs,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(docs).count() == 0
    assert minhash_lsh_candidates(docs).count() == 0
    assert simhash_signatures(docs).count() == 0
    assert simhash_neardup_pairs(docs).count() == 0

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    q = [0.1] * 8
    assert cosine_topk_bruteforce(emb, q, k=5).count() == 0
    assert ann_multiprobe_topk(emb, q, n_planes=4, k=5).count() == 0
    assert embedding_neardup_pairs(emb, threshold=0.9).count() == 0


def test_minhash_handles_null_and_empty_text(spark):
    """NULL and empty texts get null signatures and never pair."""
    from tl_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a real document with content")],
        "doc_id long, text string",
    )
    sigs = {r["id"]: r["sig"] for r in minhash_signatures(df).collect()}
    assert sigs[1] is None and sigs[2] is None and sigs[3] is not None
    assert minhash_lsh_candidates(df).count() == 0


def test_ngram_contamination_flags_planted_overlap(spark):
    from tl_spark.operators.dedup import ngram_contamination

    bench = spark.createDataFrame(
        [(0, "the secret benchmark passage nobody should train on")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "clean document with completely original content here"),
            (2, "contains the secret benchmark passage nobody spotted"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    hits = {r["id"]: r["n_hits"] for r in ngram_contamination(corpus, bench).collect()}
    assert 2 in hits and hits[2] > 0
    assert 1 not in hits and 3 not in hits


def test_ngram_contamination_counts_distinct_hits_once(spark):
    """A benchmark shingle occurring twice in one doc counts once
    (n_hits = DISTINCT matched n-grams) — the invariant the post-join
    count_distinct preserves after dropping the corpus pre-distinct."""
    from tl_spark.operators.dedup import ngram_contamination

    bench = spark.createDataFrame(
        [(0, "abcdefghijklm")], "doc_id long, text string"  # one 13-gram
    )
    corpus = spark.createDataFrame(
        [(1, "xx abcdefghijklm yy abcdefghijklm zz")],
        "doc_id long, text string",
    )
    rows = ngram_contamination(corpus, bench).collect()
    assert len(rows) == 1 and rows[0]["n_hits"] == 1


def test_contamination_plan_no_corpus_shuffle(spark):
    """The corpus side of the decontamination semi-join must be
    map-only: raw exploded shingles feed the BroadcastHashJoin with no
    Exchange between the parquet scan and the join (the benchmark side
    is the BroadcastExchange; the only hash Exchange sits ABOVE the
    join, over the tiny matched set)."""
    from tl_spark.operators.dedup import ngram_contamination

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = corpus.limit(5).select("doc_id", "text")
    out = ngram_contamination(corpus, bench)
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    join_idx = next(
        i for i, l in enumerate(lines) if "BroadcastHashJoin" in l
    )
    bcast_idx = next(
        i
        for i, l in enumerate(lines)
        if i > join_idx and "BroadcastExchange" in l
    )
    corpus_branch = lines[join_idx + 1 : bcast_idx]
    assert any("Scan parquet" in l or "FileScan" in l for l in corpus_branch), plan
    assert not any("Exchange hashpartitioning" in l for l in corpus_branch), (
        "corpus side of the contamination semi-join must be map-only:\n" + plan
    )


def _persisted_rdd_ids(spark):
    return {
        int(x)
        for x in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def test_sketch_caches_released_by_handle_protocol(spark, documents, embeddings):
    """Every operator that persists a signature table hands the cache
    back via the tl_spark.cache handle protocol: after materializing
    and calling unpersist_handles, no NEW persistent RDD survives
    (delta-based: the session is shared across the suite)."""
    from tl_spark.cache import carried_handles, unpersist_handles
    from tl_spark.operators.dedup import (
        minhash_lsh_candidates,
        simhash_neardup_pairs,
    )
    from tl_spark.operators.similarity import embedding_neardup_pairs

    # plans are made unique (filters other tests don't use) so the
    # persisted-RDD delta isn't confused by caches of the SAME plan
    # persisted (and leaked) by earlier tests in the shared session
    docs = documents.filter(F.col("doc_id") % 7 != 3)
    emb = embeddings.filter(F.col("vec_id") % 7 != 3)
    cases = [
        lambda: minhash_lsh_candidates(docs),
        lambda: embedding_neardup_pairs(emb, threshold=0.99),
    ]
    for make in cases:
        before = _persisted_rdd_ids(spark)
        out = make()
        assert carried_handles(out), "operator must expose its cache handle"
        out.collect()
        assert _persisted_rdd_ids(spark) - before, "cache was never used?"
        unpersist_handles(out)
        assert _persisted_rdd_ids(spark) == before, (
            "persisted sketch cache leaked past unpersist_handles"
        )
        assert not carried_handles(out)  # idempotent release
    # round 8: simhash_neardup_pairs no longer persists anything — the
    # signature rides the band shuffle and verification happens inside
    # the bucket, so there is no re-read to cache. The invariant is
    # now the ABSENCE of persistent state.
    before = _persisted_rdd_ids(spark)
    out = simhash_neardup_pairs(docs, max_hamming=3)
    assert not carried_handles(out)
    out.collect()
    assert _persisted_rdd_ids(spark) == before, (
        "simhash_neardup_pairs should not persist anything"
    )


def test_curate_releases_all_caches_including_child_sig_table(spark, tmp_path):
    """curate(persist=True) rebinds `stats` after persisting — the
    handle protocol must capture the EXACT persisted plan (uncache
    matches by sameResult) AND propagate the MinHash child's signature
    cache, so run_curation_job leaves zero persistent RDDs behind."""
    from tl_spark.curation import run_curation_job
    from tl_spark.sources.transcripts import synth_transcripts

    inp = str(tmp_path / "in")
    synth_transcripts(
        spark, n_convs=40, median_turns=6, skew_mult=5, seed=5
    ).write.parquet(inp)
    before = _persisted_rdd_ids(spark)
    report = run_curation_job(spark, inp, str(tmp_path / "out"))
    assert report["rows_curated"] > 0
    assert _persisted_rdd_ids(spark) == before, (
        "run_curation_job leaked persisted DataFrames"
    )


def test_embedding_neardup_selfjoin_carries_no_vectors(spark, embeddings):
    """The sign-bucket self-join must shuffle only (_sig, id): the
    first projection feeding the join's left side excludes the vector
    column (vectors are re-attached by id-joins AFTER pairing)."""
    from tl_spark.cache import unpersist_handles
    from tl_spark.operators.similarity import embedding_neardup_pairs

    out = embedding_neardup_pairs(embeddings)
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    join_idx = next(
        i
        for i, l in enumerate(lines)
        if "Join [_sig" in l and "<" in l
    )
    # left subtree = subsequent lines carrying the ':' branch prefix
    left = []
    for l in lines[join_idx + 1 :]:
        if not l.lstrip().startswith(":"):
            break
        left.append(l)
    top_project = next(l for l in left if "Project [" in l)
    scan = next(l for l in left if "InMemoryTableScan [" in l)
    assert "v#" not in top_project, top_project
    assert "v#" not in scan, scan  # cache scan prunes the vector too
    unpersist_handles(out)


def test_simhash_neardup_hot_bucket_cap(spark):
    """Documented cap behavior: when EVERY band bucket of a clique
    exceeds max_bucket_size, its pairs are dropped (the exactness
    precondition fails) — and simhash_cap_report names exactly those
    buckets; raising the cap restores brute-force equality."""
    from tl_spark.cache import unpersist_handles
    from tl_spark.operators.dedup import (
        simhash_cap_report,
        simhash_neardup_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "identical templated document body text") for i in range(4)],
        "doc_id long, text string",
    )
    capped = simhash_neardup_pairs(docs, max_hamming=3, max_bucket_size=2)
    assert capped.count() == 0  # all 8 band buckets hold 4 > 2 members
    unpersist_handles(capped)
    report = simhash_cap_report(docs, max_bucket_size=2).collect()
    assert len(report) == 8 and all(r["n_members"] == 4 for r in report)

    ok = simhash_neardup_pairs(docs, max_hamming=3, max_bucket_size=4)
    assert ok.count() == 6  # all C(4,2) identical pairs
    unpersist_handles(ok)
    assert simhash_cap_report(docs, max_bucket_size=4).count() == 0


def test_simhash_driver_params_within_cap_precondition(spark):
    """The driver oracle for dedup_simhash_neardup asserts equality
    with brute force — valid only under the documented precondition
    that no band bucket exceeds the cap AT THE QUERY'S PARAMETERS
    (bands=4, cap=512). Pin it at both driver scales; also pin WHY the
    operator-default bands=8 was rejected for the query (8-bit pieces
    have 256 possible values, so sf0.1 structurally overflows)."""
    from tl_spark.operators.dedup import simhash_cap_report

    for sf in ("sf0.01", "sf0.1"):
        docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        assert (
            simhash_cap_report(docs, bands=4, max_bucket_size=512).count() == 0
        ), f"{sf}: exactness precondition violated at the driver params"
    docs_big = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    assert simhash_cap_report(docs_big, bands=8, max_bucket_size=256).count() > 0


def test_minhash_arrow_and_jvm_impls_agree_on_behavior(spark, documents):
    """The two signature impls are different hash FAMILIES but must
    agree on every behavioral contract: null-sig rows, signature
    length, per-impl determinism, and planted-twin recall (identical
    texts -> identical signatures -> est 1.0 in every band)."""
    from tl_spark.operators.dedup import minhash_signatures

    rows = [
        (1, "a normal length document body"),
        (2, "a normal length document body"),   # exact twin of 1
        (3, "zz"),                               # shorter than k -> null
        (4, None),                               # null text -> null
        (5, ""),                                 # empty -> null
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for impl in ("arrow", "jvm"):
        sigs = {
            r["id"]: r["sig"]
            for r in minhash_signatures(df, impl=impl).collect()
        }
        assert sigs[3] is None and sigs[4] is None and sigs[5] is None, impl
        assert sigs[1] is not None and len(sigs[1]) == 32, impl
        assert sigs[1] == sigs[2], f"{impl}: twins must share a signature"
        again = {
            r["id"]: r["sig"]
            for r in minhash_signatures(df.repartition(3), impl=impl).collect()
        }
        assert again == sigs, f"{impl}: not deterministic across partitioning"


def test_minhash_components_past_64_not_duplicated_either_impl(spark):
    """ADVICE r3: xor-rotate mixing repeats with period 64, so
    n_hashes > 64 silently duplicated signature slots (component
    i == i+64) in BOTH impls. Each 64-block now draws fresh base
    hashes; block 0 stays byte-identical so n<=64 oracles hold."""
    from tl_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    for impl in ("arrow", "jvm"):
        s96 = minhash_signatures(df, n_hashes=96, impl=impl).collect()[0]["sig"]
        s32 = minhash_signatures(df, n_hashes=32, impl=impl).collect()[0]["sig"]
        assert s96[:32] == s32, f"{impl}: block-0 family changed"
        assert s96[:32] != s96[64:96], f"{impl}: block 1 duplicates block 0"


def test_minhash_arrow_boundary_windows_never_leak(spark):
    """Byte windows straddling document boundaries in the concatenated
    batch must not contribute: a doc whose text is a PREFIX of the
    next doc's start would otherwise steal its neighbor's minima.
    Construct adjacent docs engineered so any cross-boundary window
    would alter the minimum, and compare against each doc hashed in
    ISOLATION (one doc per DataFrame -> no neighbors by construction)."""
    from tl_spark.operators.dedup import minhash_signatures

    texts = ["aaaaabbbbb", "bbbbbaaaaa", "ababababab", "zzzzz", "aaaaa"]
    together = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["id"]: r["sig"] for r in minhash_signatures(together).collect()
    }
    for i, t in enumerate(texts):
        alone = spark.createDataFrame([(0, t)], "doc_id long, text string")
        ref = minhash_signatures(alone).collect()[0]["sig"]
        assert got[i] == ref, f"doc {i} contaminated by batch neighbors"


def test_minhash_arrow_sample_mod_contracts(spark):
    """MOD-sampling on the arrow impl: content-keyed (twins stay
    identical), subsetting (sampled signature of a doc uses only a
    subset of its shingle hashes), and a doc with NO sampled shingle
    gets a null signature instead of a fallback."""
    from tl_spark.operators.dedup import minhash_signatures

    long_a = "the quick brown fox jumps over the lazy dog " * 4
    rows = [(1, long_a), (2, long_a), (3, "tiny.")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {r["id"]: r["sig"] for r in minhash_signatures(df).collect()}
    sampled = {
        r["id"]: r["sig"]
        for r in minhash_signatures(df, sample_mod=4).collect()
    }
    assert sampled[1] == sampled[2]              # content-keyed
    assert sampled[1] is not None and len(sampled[1]) == 32
    # min over a SUBSET of shingles can only be >= the full min
    # (compare in the unsigned order the minima are taken in)
    u = lambda x: (x + (1 << 64)) % (1 << 64)
    assert all(u(s) >= u(f) for s, f in zip(sampled[1], full[1]))
    # a 5-char doc has exactly ONE shingle; sample_mod huge -> almost
    # surely unsampled -> null (deterministic for this fixed text)
    big = {r["id"]: r["sig"] for r in minhash_signatures(df, sample_mod=10**9).collect()}
    assert big[3] is None


def test_streaming_curation_matches_batch_semantics(spark, tmp_path):
    """The streaming curation pipeline (extract -> dedup-in-horizon ->
    quality/length filters -> PII redact) agrees with the equivalent
    batch projection on a drained availableNow run: same kept rows,
    same redacted text, no boilerplate, no duplicate texts."""
    from pyspark.sql import functions as F

    from tl_spark.functions.extract import extract_main_content
    from tl_spark.functions.text import pii_redact, quality_score, token_count
    from tl_spark.sources.transcripts import synth_transcripts, write_transcripts
    from tl_spark.streaming.extract_stream import run_streaming_curation

    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    df = synth_transcripts(spark, n_convs=25, median_turns=6, skew_mult=4)
    write_transcripts(df, inp)
    run_streaming_curation(
        spark, inp, outp, str(tmp_path / "ckpt"), quality_min=0.0, min_tokens=1
    )
    got = spark.read.parquet(outp)
    # no duplicate texts survive (availableNow drains within horizon)
    assert got.count() == got.select("extracted_text").distinct().count()
    assert got.filter(F.col("extracted_text").contains("chrome nav")).count() == 0
    # batch-equivalent projection: first-arrival dedup + filters + redact
    ex = extract_main_content(
        spark.read.parquet(inp),
        passthrough=["conv_id", "turn_idx", "role", "ts"],
    ).withColumn("extracted_text", F.coalesce("extracted_text", F.lit("")))
    c = F.col("extracted_text")
    batch = (
        ex.dropDuplicates(["extracted_text"])
        .withColumn("n_tokens", token_count(c))
        .withColumn("quality", quality_score(c))
        .filter((F.col("quality") >= 0.0) & (F.col("n_tokens") >= 1))
        .withColumn("extracted_text", pii_redact(c))
    )
    assert sorted(r["extracted_text"] for r in got.collect()) == sorted(
        r["extracted_text"] for r in batch.collect()
    )


def test_ivf_index_and_probe(spark, embeddings):
    """IVF-Flat variant (task brief): planted scaled-query needles are
    exactly the top-k at nprobe=1 (they share the query's nearest
    list — identical direction => identical centroid assignment);
    nprobe=n_lists degrades to the exact scan; assignment is
    deterministic across partitionings."""
    from tl_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk_bruteforce,
        ivf_topk,
    )

    query = [((i * 37 + 11) % 97) / 97.0 - 0.5 for i in range(64)]
    qlit = "array(" + ",".join(f"cast({x!r} as float)" for x in query) + ")"
    needles = spark.range(10).select(
        (F.col("id") + 3000000).alias("vec_id"),
        F.expr(
            f"cast(transform({qlit}, x -> x * (1.0 + cast(id as double)/10.0))"
            " as array<float>)"
        ).alias("embedding"),
    )
    corpus = embeddings.select("vec_id", "embedding").unionByName(needles)
    index, cent = build_ivf_index(corpus, n_lists=16, seed=7)
    assert cent.shape == (16, 64)

    top = ivf_topk(index, cent, query, k=10, nprobe=1).collect()
    assert {r["id"] for r in top} == {3000000 + i for i in range(10)}
    assert all(r["cosine"] == 1.0 for r in top)

    # nprobe = n_lists == exact brute force
    full = ivf_topk(index, cent, query, k=20, nprobe=16).collect()
    exact = cosine_topk_bruteforce(corpus, query, k=20).collect()
    assert [(r["id"], r["cosine"]) for r in full] == [
        (r["id"], r["cosine"]) for r in exact
    ]

    # deterministic assignment across partitionings
    a = {r["id"]: r["_list"] for r in index.collect()}
    index2, cent2 = build_ivf_index(corpus.repartition(7), n_lists=16, seed=7)
    assert (cent2 == cent).all()
    b = {r["id"]: r["_list"] for r in index2.collect()}
    assert a == b


def test_ivf_recall_vs_bruteforce_uniform(spark, embeddings):
    """Worst-case corpus (uniform directions, where coarse quantization
    carries the least signal): the FAISS-style recall/latency dial —
    recall@10 >= 0.8 at half the lists probed, monotone in nprobe,
    exact at nprobe = n_lists (everything deterministic: seeded
    k-means over a canonically-sorted sample)."""
    from tl_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk_bruteforce,
        ivf_topk,
    )

    query = [((i * 29 + 5) % 83) / 83.0 - 0.5 for i in range(64)]
    exact = {r["id"] for r in cosine_topk_bruteforce(embeddings, query, k=10).collect()}
    index, cent = build_ivf_index(embeddings, n_lists=8, seed=11)
    recalls = []
    for nprobe in (4, 6, 8):
        got = {
            r["id"]
            for r in ivf_topk(index, cent, query, k=10, nprobe=nprobe).collect()
        }
        recalls.append(len(got & exact) / 10)
    assert recalls[0] >= 0.8
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0  # full probe == exact scan


def test_ivf_index_persists_with_real_partition_pruning(spark, embeddings, tmp_path):
    """VERDICT r3 item 4: the docstring's scale claim ("file-pruned
    when partitioned by _list") must be exercised, not asserted.
    write_ivf_index lays the index out as _list=<c>/ partition dirs;
    a probed read must (a) round-trip centroids and results exactly,
    (b) show the probe as a PartitionFilter on the scan (directory
    pruning — zero data filters), (c) actually read only the probed
    lists' files."""
    from tl_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        read_ivf_index,
        write_ivf_index,
    )

    import numpy as np

    path = str(tmp_path / "ivf")
    corpus = embeddings.select("vec_id", "embedding")
    index, cent = build_ivf_index(corpus, n_lists=8, seed=11)
    write_ivf_index(index, cent, path)
    index2, cent2 = read_ivf_index(spark, path)
    assert np.allclose(cent, cent2)

    query = [((i * 29 + 5) % 83) / 83.0 - 0.5 for i in range(64)]
    probed = ivf_topk(index2, cent2, query, k=10, nprobe=2)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters: [_list" in scan and " IN (" in scan, scan
    assert "DataFilters: []" in scan, scan

    # the probed result equals the same probe over the live index
    want = [
        (r["id"], r["cosine"])
        for r in ivf_topk(index, cent, query, k=10, nprobe=2).collect()
    ]
    assert [(r["id"], r["cosine"]) for r in probed.collect()] == want

    # EXECUTED scan metrics: only the 2 probed partition dirs were read
    # (inputFiles() reports the relation pre-pruning, so it can't pin
    # this; the runtime metric can)
    leaves = probed._jdf.queryExecution().executedPlan().collectLeaves()
    scans = [
        leaves.apply(i)
        for i in range(leaves.size())
        if "Scan" in leaves.apply(i).nodeName()
    ]
    assert len(scans) == 1
    assert scans[0].metrics().apply("numPartitions").value() == 2
    total_lists = index.select("_list").distinct().count()
    assert total_lists > 2  # pruning actually skipped partitions


def test_pq_index_encodes_compact_and_finds_planted(spark, embeddings):
    """Product quantization (FAISS-style PQ, the compression leg of
    IVF-PQ): codes are m bytes per vector (32x smaller than the 64-dim
    float payload); planted scaled-query needles rank top under pure
    ADC scoring (their subvectors quantize to the same centroids as
    the query's); encoding is deterministic across partitionings."""
    from tl_spark.operators.similarity import build_pq_index, pq_topk

    query = [((i * 37 + 11) % 97) / 97.0 - 0.5 for i in range(64)]
    qlit = "array(" + ",".join(f"cast({x!r} as float)" for x in query) + ")"
    needles = spark.range(10).select(
        (F.col("id") + 4000000).alias("vec_id"),
        F.expr(
            f"cast(transform({qlit}, x -> x * (1.0 + cast(id as double)/10.0))"
            " as array<float>)"
        ).alias("embedding"),
    )
    corpus = embeddings.select("vec_id", "embedding").unionByName(needles)
    codes, books = build_pq_index(corpus, m=8, nbits=8, seed=7)
    assert books.shape == (8, 256, 8)
    sample = codes.limit(20).collect()
    assert all(len(r["_code"]) == 8 for r in sample)  # 8 bytes vs 256

    top = pq_topk(codes, books, query, k=10).collect()
    assert {r["id"] for r in top} == {4000000 + i for i in range(10)}

    a = {r["id"]: r["_code"] for r in codes.collect()}
    codes2, books2 = build_pq_index(corpus.repartition(7), m=8, nbits=8, seed=7)
    assert (books2 == books).all()
    b = {r["id"]: r["_code"] for r in codes2.collect()}
    assert a == b


def test_pq_adc_recall_and_exact_rerank(spark, embeddings):
    """Worst-case corpus (uniform random directions): pure-ADC
    recall@10 is meaningfully above chance, and the standard exact
    re-rank of a 50-candidate ADC shortlist recovers recall >= 0.8 —
    while reading full vectors for only the shortlist."""
    from tl_spark.operators.similarity import (
        build_pq_index,
        cosine_topk_bruteforce,
        pq_topk,
    )

    query = [((i * 29 + 5) % 83) / 83.0 - 0.5 for i in range(64)]
    exact = {
        r["id"]
        for r in cosine_topk_bruteforce(embeddings, query, k=10).collect()
    }
    codes, books = build_pq_index(embeddings, m=8, nbits=8, seed=11)
    adc_only = {r["id"] for r in pq_topk(codes, books, query, k=10).collect()}
    assert len(adc_only & exact) >= 3  # chance on 1k vectors ~ 0.1
    reranked = {
        r["id"]
        for r in pq_topk(
            codes, books, query, k=10, rerank=50, df=embeddings
        ).collect()
    }
    assert len(reranked & exact) / 10 >= 0.8


def test_bigram_lm_score_edge_cases(spark):
    """Hand-computed add-one bigram LM: corpus 'a b a b' + 'a b' + 'x'.
    Prefix counts C(a)=3 C(b)=1, bigrams C(a,b)=3 C(b,a)=1, V=3.
    Doc 1 bigrams: (a,b) (b,a) (a,b); doc 2: (a,b); doc 3 (single
    token) must be ABSENT, as must the empty and null docs."""
    import math

    from tl_spark.operators.lm import bigram_lm_scores

    rows = [(1, "a b a b"), (2, "a b"), (3, "x"), (4, ""), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["lm_score"], r["n_bigrams"])
        for r in bigram_lm_scores(df).collect()
    }
    p_ab = math.log((3 + 1) / (3 + 3))
    p_ba = math.log((1 + 1) / (1 + 3))
    assert set(got) == {1, 2}
    assert got[1] == (round((2 * p_ab + p_ba) / 3, 6), 3)
    assert got[2] == (round(p_ab, 6), 1)


def test_pack_documents_invariants(spark, documents):
    """Sequence packing: every doc exactly once; no shared pack exceeds
    capacity; oversize docs sit alone and flagged; pack ids and
    positions are deterministic across input partitioning."""
    from tl_spark.operators.packing import pack_documents, pack_summary

    CAP = 256
    packed = pack_documents(documents, capacity=CAP, n_buckets=8)
    rows = packed.collect()
    assert len(rows) == documents.count()
    assert len({r["doc_id"] for r in rows}) == len(rows)

    by_pack = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pid, members in by_pack.items():
        total = sum(r["n_tokens"] for r in members)
        if any(r["oversize"] for r in members):
            assert len(members) == 1, f"oversize pack {pid} is shared"
            assert members[0]["n_tokens"] > CAP
        else:
            assert total <= CAP, f"pack {pid} over capacity: {total}"
            assert sorted(r["pack_pos"] for r in members) == list(
                range(len(members))
            )

    again = {
        (r["doc_id"], r["pack_id"], r["pack_pos"])
        for r in pack_documents(
            documents.repartition(13), capacity=CAP, n_buckets=8
        ).collect()
    }
    assert again == {(r["doc_id"], r["pack_id"], r["pack_pos"]) for r in rows}

    summ = pack_summary(packed, CAP)
    fills = [r["fill"] for r in summ.filter(~F.col("pack_id").isNull()).collect()]
    assert fills  # summary runs


def test_pack_documents_hand_case(spark):
    """capacity 10, one bucket: docs of 4,4,3,12,5 tokens in id order
    pack as [4,4] | [3] (12 forces a break) | oversize [12] | [5]."""
    from tl_spark.operators.packing import pack_documents

    rows = [
        (1, "a b c d"),
        (2, "e f g h"),
        (3, "i j k"),
        (4, " ".join(f"t{i}" for i in range(12))),
        (5, "u v w x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["pack_id"] & 0xFFFFFFFF, r["pack_pos"], r["oversize"])
        for r in pack_documents(df, capacity=10, n_buckets=1).collect()
    }
    assert got[1] == (0, 0, False)
    assert got[2] == (0, 1, False)
    assert got[3] == (1, 0, False)
    assert got[4] == (2, 0, True)
    assert got[5] == (3, 0, False)


def test_pack_documents_zero_token_docs_before_oversize(spark):
    """ADVICE r4 (low): zero-token docs occupy positions without
    raising cur_fill, so the oversize break must check occupancy
    (cur_pos), not fill — an oversize doc after only zero-token docs
    gets its OWN pack, and pack_pos stays unique within the pack."""
    from tl_spark.operators.packing import pack_documents

    rows = [
        (1, ""),          # 0 tokens
        (2, "   "),       # 0 tokens (whitespace only)
        (3, " ".join(f"t{i}" for i in range(12))),  # oversize (cap 10)
        (4, "a b"),       # 2 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["pack_id"] & 0xFFFFFFFF, r["pack_pos"], r["oversize"])
        for r in pack_documents(df, capacity=10, n_buckets=1).collect()
    }
    assert got[1] == (0, 0, False)
    assert got[2] == (0, 1, False)
    assert got[3][2] is True
    assert got[3][0] != got[1][0], "oversize doc shares a pack"
    # every (pack_id, pack_pos) pair unique
    pairs = [(p, pos) for (p, pos, _) in got.values()]
    assert len(set(pairs)) == len(pairs)
    # doc 4 opens a fresh pack after the oversize one
    assert got[4][0] not in (got[1][0], got[3][0])
    assert got[4][1] == 0

"""Composed curation job: extract -> dedup -> near-dup -> quality."""

import pyspark.sql.functions as F


def test_curation_end_to_end(spark, tmp_path):
    from tl_spark.curation import run_curation_job
    from tl_spark.sources.transcripts import synth_transcripts, write_transcripts

    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    base = synth_transcripts(spark, n_convs=40, median_turns=6, skew_mult=5)
    # plant exact duplicates: clone conv c00000003's turns into a new conv
    clone = base.filter(F.col("conv_id") == "c00000003").select(
        F.lit("c99999999").alias("conv_id"), "turn_idx", "role", "text",
        "tool", "ts",
    )
    write_transcripts(base.unionByName(clone), inp)

    report = run_curation_job(
        spark, inp, outp, quality_min=0.0, min_tokens=1
    )
    assert report["rows_in"] == base.count() + clone.count()
    drop = report["dropped"]
    # every cloned turn must fall to exact or near dedup
    n_cloned = clone.count()
    assert drop.get("exact_dup", 0) >= n_cloned
    assert report["rows_curated"] + sum(drop.values()) == report["rows_in"]

    curated = spark.read.parquet(outp)
    # curated texts are unique
    assert curated.count() == curated.select("extracted_text").distinct().count()
    # boilerplate never survives
    assert curated.filter(
        F.col("extracted_text").contains("chrome nav")
    ).count() == 0
    # schema contract
    for col in ["conv_id", "turn_idx", "extracted_text", "n_tokens",
                "quality", "lang_guess", "doc_uid"]:
        assert col in curated.columns


def test_curation_quality_and_length_filters(spark, tmp_path):
    from tl_spark.curation import curate

    rows = [
        ("c1", 0, "user", "<main><p>alpha bravo charlie delta echo foxtrot "
                          "golf hotel india juliett the a and of</p></main>", None, None),
        ("c1", 1, "user", "x", None, None),          # too short (1 token < 2)
        ("c1", 2, "user", "!!! ??? ...", None, None),  # punct-heavy, low quality
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp",
    )
    curated, dropped = curate(df, quality_min=0.5, min_tokens=2)
    kept = [r["turn_idx"] for r in curated.collect()]
    reasons = {r["doc_uid"]: r["drop_reason"] for r in dropped.collect()}
    assert kept == [0]
    assert sorted(reasons.values()) == ["low_quality", "too_short"]


def test_curation_neardup_drops_later_turn(spark):
    """The near-dup tie-break is (conv_id, turn_idx) document order,
    NOT doc_uid hash order: the earlier turn always survives."""
    from tl_spark.curation import curate

    long_a = "the quick brown fox jumps over the lazy dog " * 6
    long_b = long_a + "tail"
    rows = [
        ("a", 1, "user", long_a, None, None),
        ("a", 2, "user", long_b, None, None),   # near-dup of turn 1
        ("b", 1, "user", "completely different text about ships and the sea "
                         "sailing far away from any fox or dog entirely", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    curated, dropped = curate(df, quality_min=0.0, min_tokens=1,
                              neardup_jaccard=0.8)
    kept = {(r["conv_id"], r["turn_idx"]) for r in curated.collect()}
    assert ("a", 1) in kept and ("a", 2) not in kept
    reasons = {r["drop_reason"] for r in dropped.collect()}
    assert reasons == {"near_dup"}


def test_curation_job_single_pass(spark, tmp_path):
    """run_curation_job materializes the shared lineage once: with
    persist=True the dropped output's executed plan reads the cached
    stats (InMemoryTableScan) instead of re-running the Arrow
    extraction, and the report is aggregated from written parquet."""
    from tl_spark.curation import curate
    from tl_spark.sources.transcripts import synth_transcripts, write_transcripts

    inp = str(tmp_path / "in")
    write_transcripts(
        synth_transcripts(spark, n_convs=20, median_turns=5, skew_mult=2), inp
    )
    df = spark.read.parquet(inp)
    curated, dropped = curate(df, persist=True, quality_min=0.0, min_tokens=1)
    try:
        curated.count()  # materialize: fills both caches
        plan = dropped._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        # no LIVE second extraction: every MapInArrow in the plan text
        # must be part of a cached InMemoryRelation's *stored* child
        # (printed nested beneath it), never a live operator
        lines = plan.splitlines()

        def depth(s):
            return len(s) - len(s.lstrip(" :+-"))

        cache_depths = [
            (i, depth(l)) for i, l in enumerate(lines) if "InMemoryRelation" in l
        ]
        for i, l in enumerate(lines):
            if "MapInArrow" not in l:
                continue
            assert any(
                j < i and d < depth(l) for j, d in cache_depths
            ), f"live (uncached) extraction in dropped plan: {l}"
    finally:
        for cached in getattr(curated, "_tl_persisted", ()):
            cached.unpersist()


def test_curation_job_report_consistency(spark, tmp_path):
    from tl_spark.curation import run_curation_job
    from tl_spark.sources.transcripts import synth_transcripts, write_transcripts

    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    write_transcripts(
        synth_transcripts(spark, n_convs=25, median_turns=4, skew_mult=3), inp
    )
    n_in = spark.read.parquet(inp).count()
    report = run_curation_job(spark, inp, outp, quality_min=0.0, min_tokens=1)
    assert report["rows_in"] == n_in
    assert report["rows_curated"] == spark.read.parquet(outp).count()
    # dropped rows persisted next to the output for auditability
    dropped = spark.read.parquet(outp + "_dropped")
    assert dropped.count() == sum(report["dropped"].values())


def test_curation_benchmark_decontamination(spark):
    """Optional decontamination stage: dedup survivors sharing a 13-char
    n-gram with the benchmark set drop as 'contaminated'; precedence is
    total (a doc that is BOTH an exact dup and contaminated counts once,
    as exact_dup)."""
    from tl_spark.cache import unpersist_handles
    from tl_spark.curation import curate

    secret = "the benchmark holdout passage nobody may train on"
    rows = [
        ("c1", 0, "user", f"<main><p>{secret} plus trailing words here</p></main>",
         None, None),
        ("c1", 1, "user", f"<main><p>{secret} plus trailing words here</p></main>",
         None, None),  # exact dup of turn 0 -> exact_dup, NOT contaminated
        ("c1", 2, "user", "<main><p>completely original clean training text "
                          "alpha bravo charlie delta</p></main>", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp",
    )
    bench = spark.createDataFrame([(secret,)], "text string")
    curated, dropped = curate(
        df, quality_min=0.0, min_tokens=1, benchmark=bench
    )
    kept = sorted(r["turn_idx"] for r in curated.collect())
    reasons = sorted(r["drop_reason"] for r in dropped.collect())
    assert kept == [2]
    assert reasons == ["contaminated", "exact_dup"]
    unpersist_handles(curated)

    # without a benchmark the contaminated doc survives
    curated2, dropped2 = curate(df, quality_min=0.0, min_tokens=1)
    assert sorted(r["turn_idx"] for r in curated2.collect()) == [0, 2]
    assert [r["drop_reason"] for r in dropped2.collect()] == ["exact_dup"]
    unpersist_handles(curated2)


def test_curation_repetition_gate(spark):
    """max_dup_word_frac drops highly repetitive docs as 'repetitive';
    precedence sits between decontamination and the quality filters."""
    from tl_spark.cache import unpersist_handles
    from tl_spark.curation import curate

    rows = [
        ("c1", 0, "user", "<main><p>spam spam spam spam spam spam spam ham"
                          "</p></main>", None, None),              # dwf 6/8
        ("c1", 1, "user", "<main><p>every word here is completely distinct"
                          "</p></main>", None, None),              # dwf 0
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp",
    )
    curated, dropped = curate(
        df, quality_min=0.0, min_tokens=1, max_dup_word_frac=0.5
    )
    assert [r["turn_idx"] for r in curated.collect()] == [1]
    assert [r["drop_reason"] for r in dropped.collect()] == ["repetitive"]
    unpersist_handles(curated)

    # gate off by default
    curated2, dropped2 = curate(df, quality_min=0.0, min_tokens=1)
    assert sorted(r["turn_idx"] for r in curated2.collect()) == [0, 1]
    assert dropped2.count() == 0
    unpersist_handles(curated2)


def test_curation_normalize_stage_dedups_nfc_variants(spark):
    """normalize=True: NFC-equal variants (combining vs precomposed
    accents) become exact duplicates and dedup together; control chars
    are stripped from the surviving text."""
    from tl_spark.cache import unpersist_handles
    from tl_spark.curation import curate

    rows = [
        ("c1", 0, "user", "café text body", None, None),
        ("c1", 1, "user", "café text body", None, None),  # NFC-equal
        ("c1", 2, "user", "clean\x07 control", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    curated, dropped = curate(
        df, quality_min=0.0, min_tokens=1, normalize=True
    )
    kept = {r["turn_idx"]: r["extracted_text"] for r in curated.collect()}
    assert set(kept) == {0, 2}  # turn 1 deduped as NFC-equal to turn 0
    assert kept[0] == "café text body"
    assert kept[2] == "clean control"
    assert [r["drop_reason"] for r in dropped.collect()] == ["exact_dup"]
    unpersist_handles(curated)

    # without normalization the variants both survive
    curated2, _ = curate(df, quality_min=0.0, min_tokens=1)
    assert curated2.count() == 3
    unpersist_handles(curated2)


def test_curation_lm_gate(spark):
    """lm_score_min: the doc whose bigrams are all corpus-unique (low
    avg log-prob) drops as low_lm; the repeated-phrase docs (high
    probability bigrams) survive; precedence sits between repetitive
    and low_quality."""
    from tl_spark.cache import unpersist_handles
    from tl_spark.curation import curate
    from tl_spark.operators.lm import bigram_lm_scores

    common = "the quick brown fox jumps over the lazy dog"
    rows = [
        ("c1", i, "user", common, None, None) for i in range(3)
    ] + [("c2", 0, "user", "zxq wvu tsr qpo nml kji", None, None)]
    # make the common docs distinct so exact-dedup keeps them all
    rows = [
        (c, t, r, f"{txt} tail{t}{c}", tool, ts)
        for (c, t, r, txt, tool, ts) in rows
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    # threshold between the two score populations, computed from the op
    scores = {
        r["id"]: r["lm_score"]
        for r in bigram_lm_scores(
            df.select(
                F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
                F.col("text"),
            )
        ).collect()
    }
    lo = min(scores.values())
    rest = [v for v in scores.values() if v != lo]
    thresh = (lo + min(rest)) / 2
    # neardup_jaccard > 1 disables the near-dup stage: the LM trains on
    # the dedup SURVIVORS, so the common docs must all reach it for the
    # precomputed full-corpus threshold to be valid
    curated, dropped = curate(
        df, quality_min=0.0, min_tokens=1, lm_score_min=thresh,
        neardup_jaccard=1.01,
    )
    assert curated.count() == 3
    assert [r["drop_reason"] for r in dropped.collect()] == ["low_lm"]
    assert {r["conv_id"] for r in curated.collect()} == {"c1"}
    unpersist_handles(curated)


def test_curation_substring_gate(spark):
    """substring_min_shared: the doc that reuses a long boilerplate
    passage from an earlier doc (but is NOT a whole-document near-dup)
    drops as substring_dup; unrelated docs survive; precedence sits
    after near_dup."""
    from tl_spark.cache import unpersist_handles
    from tl_spark.curation import curate

    boiler = (
        "this exact licensing boilerplate paragraph is repeated "
        "verbatim across otherwise different documents"
    )
    rows = [
        ("c1", 0, "user", "original framing text. " + boiler, None, None),
        (
            "c1", 1, "user",
            "completely different subject matter here. " + boiler
            + " plus extensive additional novel content that makes the "
            "whole document dissimilar at the minhash level entirely",
            None, None,
        ),
        ("c2", 0, "user", "no shared passages with anyone at all", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    curated, dropped = curate(
        df, quality_min=0.0, min_tokens=1, neardup_jaccard=1.01,
        substring_min_shared=2,
    )
    assert sorted(
        (r["conv_id"], r["turn_idx"]) for r in curated.collect()
    ) == [("c1", 0), ("c2", 0)]
    assert [r["drop_reason"] for r in dropped.collect()] == ["substring_dup"]
    unpersist_handles(curated)

    # gate off -> everything survives
    curated2, _ = curate(
        df, quality_min=0.0, min_tokens=1, neardup_jaccard=1.01
    )
    assert curated2.count() == 3
    unpersist_handles(curated2)


def test_curation_neardup_clusters_mode(spark):
    """neardup_mode='clusters' vs 'pairs' on a transitive hub: A~C and
    B~C are verified edges but A~B is below threshold. Pair mode drops
    only C (the later doc of each pair) and B SURVIVES; cluster mode
    computes the transitive component {A, B, C} and keeps only the
    earliest turn A."""
    import numpy as np

    from tl_spark.cache import unpersist_handles
    from tl_spark.curation import curate

    rng = np.random.default_rng(3)

    def words(n, tag):
        return " ".join(
            f"{tag}{rng.integers(0, 999999):06d}" for _ in range(n)
        )

    core = words(40, "core")        # ~400 distinct-shingle chars
    ta = words(6, "alpha")          # ~60-char distinct tails
    tb = words(6, "beta")
    rows = [
        ("a", 1, "user", core + " " + ta, None, None),   # A
        ("a", 2, "user", core + " " + tb, None, None),   # B
        ("a", 3, "user", core, None, None),              # C ~ both
        ("b", 1, "user", words(30, "other"), None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    pair_kept = None
    for mode, expected in (
        ("pairs", [("a", 1), ("a", 2), ("b", 1)]),     # C dropped only
        ("clusters", [("a", 1), ("b", 1)]),            # B and C dropped
    ):
        curated, dropped = curate(
            df, quality_min=0.0, min_tokens=1, neardup_jaccard=0.8,
            neardup_mode=mode,
        )
        kept = sorted(
            (r["conv_id"], r["turn_idx"]) for r in curated.collect()
        )
        assert kept == expected, (mode, kept)
        assert all(
            r["drop_reason"] == "near_dup" for r in dropped.collect()
        )
        unpersist_handles(curated)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="neardup_mode"):
        curate(df, neardup_mode="bogus")


def test_curation_totality_across_gate_combinations(spark):
    """Invariant: every input row lands in EXACTLY one output (curated
    or dropped-with-one-reason), for every combination of optional
    gates and both near-dup modes — the drop precedence really is a
    total partition of the input."""
    from tl_spark.cache import unpersist_handles
    from tl_spark.curation import curate

    base = "the quick brown fox jumps over the lazy dog once more " * 3
    rows = [
        ("c1", 0, "user", base, None, None),
        ("c1", 1, "user", base, None, None),               # exact dup
        ("c1", 2, "user", base + "tail", None, None),       # near dup
        ("c1", 3, "user", "x", None, None),                 # too short
        ("c1", 4, "user", "!!! ??? ...", None, None),       # low quality
        ("c2", 0, "user", "benchmark holdout passage here today "
         "with trailing novel words", None, None),
        ("c2", 1, "user", "spam spam spam spam spam spam spam spam",
         None, None),                                       # repetitive
        ("c2", 2, "user", "zq wv ts qp nm kj hg fd sa", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    bench = spark.createDataFrame(
        [("benchmark holdout passage here today",)], "text string"
    )
    combos = [
        dict(),
        dict(benchmark=bench),
        dict(max_dup_word_frac=0.5),
        dict(lm_score_min=-3.0),
        dict(substring_min_shared=2, normalize=True),
        dict(
            benchmark=bench, max_dup_word_frac=0.5, lm_score_min=-9.9,
            substring_min_shared=2, neardup_mode="clusters",
        ),
        # classifier gate composed with two neighbours (NOT the full
        # mega-combo: its plan graph alone OOMs the driver's listener
        # bookkeeping; pairwise composition + the dedicated gate test
        # cover the semantics)
        dict(
            max_dup_word_frac=0.5,
            classifier_model={
                "w": [0.0] * 64, "b": -1.0, "dim": 64,
                "hash_fn": "xxhash64",
            },
            classifier_min=0.3,  # constant 0.269 -> all low_score
        ),
        # round-6 gates, pairwise-composed for the same OOM reason:
        # n-gram lang allow-list (everything non-en drops wrong_lang)
        # and the SemDeDup gate threaded with the repetition gate
        dict(keep_langs=["en"], langid="ngram"),
        dict(keep_langs=["en"]),  # marker-signal leg of the gate
        dict(
            semantic_dedup_cos=0.99,
            semantic_dedup_dim=64,
            semantic_dedup_lists=4,
            max_dup_word_frac=0.5,
        ),
    ]
    n_in = len(rows)
    for kw in combos:
        curated, dropped = curate(
            df, quality_min=0.3, min_tokens=2, **kw
        )
        kept_ids = [r["doc_uid"] for r in curated.collect()]
        drop_rows = dropped.collect()
        drop_ids = [r["doc_uid"] for r in drop_rows]
        assert len(kept_ids) == len(set(kept_ids)), kw
        assert len(drop_ids) == len(set(drop_ids)), (
            kw, sorted(r["drop_reason"] for r in drop_rows),
        )
        assert len(kept_ids) + len(drop_ids) == n_in, kw
        assert not (set(kept_ids) & set(drop_ids)), kw
        unpersist_handles(curated)


def test_curation_classifier_gate(spark):
    """classifier_model: a model trained on planted good/bad markers
    drops the spammy doc as low_score and keeps the clean ones;
    precedence sits between low_lm and low_quality."""
    from tl_spark.cache import unpersist_handles
    from tl_spark.curation import curate
    from tl_spark.operators.classifier import train_text_classifier

    good = [
        (i, "thorough research citation insight alpha bravo")
        for i in range(40)
    ]
    bad = [
        (100 + i, "clickbait prize winner viagra alpha bravo")
        for i in range(40)
    ]
    pos = spark.createDataFrame(good, "doc_id long, text string")
    neg = spark.createDataFrame(bad, "doc_id long, text string")
    model = train_text_classifier(pos, neg, dim=256, epochs=60)

    rows = [
        ("c1", 0, "user", "thorough research citation insight today one",
         None, None),
        ("c1", 1, "user", "clickbait prize winner viagra now two",
         None, None),
        ("c1", 2, "user", "thorough citation research insight again three",
         None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    curated, dropped = curate(
        df, quality_min=0.0, min_tokens=1, classifier_model=model,
        neardup_jaccard=1.01,
    )
    kept = {r["turn_idx"] for r in curated.collect()}
    drops = {(r["doc_uid"], r["drop_reason"]) for r in dropped.collect()}
    assert kept == {0, 2}
    assert [d for _, d in drops] == ["low_score"]
    unpersist_handles(curated)

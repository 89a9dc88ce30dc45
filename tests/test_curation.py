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

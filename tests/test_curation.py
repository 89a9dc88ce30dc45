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

"""Deterministic synthetic multi-turn transcript table (input_hint schema).

Schema: conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp.

Everything is generated JVM-side from pure column expressions (no
driver loops, no Python UDFs), so the same (n_convs, median_turns,
skew_mult, seed) always produces the same rows at any parallelism —
this is what lets the scale proof run the identical input at local[8]
and local[32].

Skew: conversation c00000000 gets ``skew_mult`` x the median turn
count (FIXTURES.md §1 — the deliberately pathological conversation
that exercises salting in the pipeline).

Text mix: ~3/8 of turns are plain text (exercises the kernel's
tag-free fast path), the rest cycle through HTML templates drawn from
the parity corpus: nested markup, boilerplate (script/style/nav),
comments, malformed/unclosed tags, entities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliett", "kilo", "lima", "mike", "november",
]


def _payload(seed_cols, salt):
    """Deterministic word-soup payload column."""
    arr = F.array(*[F.lit(w) for w in WORDS])
    idx1 = F.pmod(F.xxhash64(*seed_cols, F.lit(salt)), F.lit(len(WORDS)))
    idx2 = F.pmod(F.xxhash64(*seed_cols, F.lit(salt + 1)), F.lit(len(WORDS)))
    idx3 = F.pmod(F.xxhash64(*seed_cols, F.lit(salt + 2)), F.lit(len(WORDS)))
    return F.concat_ws(
        " ",
        F.element_at(arr, idx1.cast("int") + 1),
        F.element_at(arr, idx2.cast("int") + 1),
        F.element_at(arr, idx3.cast("int") + 1),
    )


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    median_turns: int = 10,
    skew_mult: int = 100,
    seed: int = 42,
) -> DataFrame:
    convs = spark.range(0, n_convs).withColumn(
        "n_turns",
        F.when(F.col("id") == 0, F.lit(median_turns * skew_mult)).otherwise(
            F.lit(median_turns)
            + F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(7)).cast("int")
            - F.lit(3)
        ),
    )
    turns = convs.select(
        F.col("id").alias("conv_n"),
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    conv_id = F.format_string("c%08d", F.col("conv_n"))
    t = F.col("turn_idx")
    p1 = _payload([F.col("conv_n"), t], seed * 10)
    p2 = _payload([F.col("conv_n"), t], seed * 10 + 5)

    templates = F.array(
        # plain text x3 (fast-path majority)
        p1,
        F.concat(p1, F.lit(" "), p2),
        p2,
        # full page with boilerplate to strip
        F.concat(
            F.lit("<html><body><main><p>"), p1,
            F.lit('</p><p id="t'), t.cast("string"), F.lit('">'), p2,
            F.lit("</p></main><nav>chrome nav</nav><script>var x = \"<div>hi</div>\";</script></body></html>"),
        ),
        # nested + comment
        F.concat(
            F.lit('<div class="msg"><span>'), p1,
            F.lit("</span><!-- meta --></div>"),
        ),
        # malformed close pair
        F.concat(F.lit("<div><p>"), p1, F.lit("</div></p> tail")),
        # unclosed list + style
        F.concat(
            F.lit("<ul><li>"), p1, F.lit("<li>"), p2,
            F.lit("</ul><style>.x{color:red}</style>"),
        ),
        # entities + truncated tag
        F.concat(p1, F.lit(" &amp; more <b>bold</b")),
    )
    tmpl_idx = F.pmod(F.xxhash64("conv_n", t, F.lit(seed)), F.lit(8)).cast("int")

    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"), F.lit("system"))
    role = F.element_at(roles, F.pmod(t, F.lit(4)).cast("int") + 1)
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(F.lit("bash"), F.lit("browser")),
            F.pmod(t, F.lit(2)).cast("int") + 1,
        ),
    )

    df = turns.select(
        conv_id.alias("conv_id"),
        t.cast("int").alias("turn_idx"),
        role.alias("role"),
        F.element_at(templates, tmpl_idx + 1).alias("text"),
        tool.alias("tool"),
        F.timestamp_seconds(
            F.lit(1700000000) + F.col("conv_n") * 977 + t * 7
        ).alias("ts"),
    )
    return df


def write_transcripts(
    df: DataFrame, path: str, scramble: bool = True, n_files: int | None = None
) -> None:
    """Write transcripts parquet, deliberately OUT of (conv, turn) order
    so downstream stable ordering is actually exercised.

    ``n_files``: parquet split granularity is the ROW GROUP, and each
    output file here holds a single row group — so the file count is
    the ceiling on scan/extract parallelism no matter what
    maxPartitionBytes says. Size it to >= 4x the cores that will read
    the table.
    """
    if scramble:
        df = df.withColumn("_k", F.xxhash64("conv_id", "turn_idx"))
        if n_files:
            df = df.repartitionByRange(n_files, "_k")
        else:
            df = df.orderBy("_k")
        df = df.drop("_k")
    elif n_files:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(path)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)

"""Corpus-level n-gram language-model scoring (training-data op).

A classic data-quality signal for LLM corpus curation: score every
document by the average log-probability of its token bigrams under an
add-one-smoothed bigram model TRAINED ON THE CORPUS ITSELF. Low scores
flag boilerplate-free gibberish and OCR noise; abnormally high scores
flag templated/duplicated text — both ends are curation drop
candidates (the Gopher/C4-style pipelines use the same shape with a
pretrained LM; the self-trained variant needs no model artifact).

Scale shape (100 TB):
- bigram extraction is map-only (slice + arrays_zip + explode, no
  lambda HOFs in the hot path);
- model "training" IS two map-side-combined aggregations (counts by
  (w1,w2) and by w1) — no driver state, no collect;
- the vocabulary size joins in as a broadcast 1-row aggregate (zero
  driver actions, fully lazy);
- scoring joins the exploded bigrams against the two count tables on
  their natural keys (co-hash-partitioned by Catalyst) and reduces
  per document. Every shuffle key is a token or a doc id — skew on
  stop-word-heavy prefixes is bounded by map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tl_spark.functions.text import tokens


def bigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, lm_score, n_bigrams) — avg ln P(w2|w1) per document under
    add-one smoothing: P(w2|w1) = (C(w1,w2)+1) / (C(w1)+V), where
    C(w1) counts w1 as a bigram PREFIX and V is the distinct-token
    vocabulary size. Documents with fewer than 2 tokens are absent
    (they have no bigrams to score).
    """
    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_t")
    )
    # bigrams via two slices zipped positionally — codegen'd array ops,
    # no lambda in the per-row hot path
    bg = toks.select(
        "id",
        F.explode(
            F.expr(
                "arrays_zip(slice(_t, 1, greatest(size(_t)-1, 0)),"
                " slice(_t, 2, greatest(size(_t)-1, 0)))"
            )
        ).alias("_bg"),
    ).select("id", F.col("_bg.`0`").alias("w1"), F.col("_bg.`1`").alias("w2"))

    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_cb"))
    cu = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("_cu"))
    vocab = (
        toks.select(F.explode("_t").alias("tok"))
        .agg(F.count_distinct("tok").alias("_v"))
    )
    lp = F.log((F.col("_cb") + 1.0) / (F.col("_cu") + F.col("_v")))
    return (
        bg.join(cb, ["w1", "w2"])
        .join(cu, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.round(F.avg(lp), 6).alias("lm_score"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )

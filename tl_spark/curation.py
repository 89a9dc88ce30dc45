"""End-to-end corpus curation: the operators composed into one job.

extract -> text stats -> exact dedup -> MinHash near-dup -> quality
filter -> curated parquet + a drop-reason report. This is the
"training-data pipeline" shape the engine exists for; each stage is
the already-tested operator, composed with the same scale rules
(broadcast small sides, digest-only shuffles, map-only extraction).

Drop precedence (a row is counted once, in this order):
  exact_dup > near_dup > substring_dup > contaminated > repetitive
  > low_lm > low_score > low_quality > too_short
(the optional gates — substring_dup/contaminated/repetitive/low_lm/
low_score —
require their parameters and default off.)
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tl_spark.cache import attach_handles, carried_handles, unpersist_handles
from tl_spark.functions.extract import extract_main_content
from tl_spark.functions.text import lang_guess, quality_score, token_count
from tl_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_contamination,
    ngram_jaccard_pairs,
)


def curate(
    df: DataFrame,
    text_col: str = "text",
    quality_min: float = 0.2,
    min_tokens: int = 2,
    neardup_jaccard: float = 0.85,
    strip_tags=None,
    persist: bool = False,
    benchmark: DataFrame | None = None,
    contamination_n: int = 13,
    max_dup_word_frac: float | None = None,
    normalize: bool = False,
    lm_score_min: float | None = None,
    classifier_model: dict | None = None,
    classifier_min: float = 0.5,
    substring_min_shared: int | None = None,
    neardup_mode: str = "pairs",
    keep_langs: list[str] | None = None,
    langid: str = "markers",
    semantic_dedup_cos: float | None = None,
    semantic_dedup_dim: int = 256,
    semantic_dedup_lists: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Returns (curated, dropped) DataFrames.

    ``curated``: conv_id, turn_idx, role, ts, extracted_text, n_tokens,
    quality, lang_guess, doc_uid (+ ``lang_id`` when
    ``langid="ngram"``).
    ``dropped``: doc_uid + drop_reason (exact_dup | near_dup |
    substring_dup | semantic_dup | contaminated | repetitive | low_lm
    | low_score | wrong_lang | low_quality | too_short — drop
    precedence is total in that order, so every input row lands in
    exactly one output).

    ``langid``: which language signal to compute — "markers" (default;
    the 4-language marker-word :func:`lang_guess`, kept as the stable
    driver-oracle leg) or "ngram" (the 16-language character-n-gram
    profile classifier :mod:`tl_spark.operators.langid`, computed with
    the map-only Arrow kernel leg and added as a ``lang_id`` column).

    ``semantic_dedup_cos`` (optional): SemDeDup-shape gate — near-dup
    survivors whose hashed bag-of-words embedding
    (:func:`tl_spark.operators.embed.hashed_embedding`,
    ``semantic_dedup_dim`` slots) has cosine >= the threshold with an
    EARLIER (conv_id, turn_idx) doc in the same IVF list
    (:func:`tl_spark.operators.similarity.semantic_dedup`,
    ``semantic_dedup_lists`` clusters) drop as ``semantic_dup``;
    precedence sits between substring_dup and contaminated. Catches
    token-bag-level rewordings that character-shingle Jaccard misses.

    ``keep_langs`` (optional): language allow-list — dedup/classifier
    survivors whose language signal (``lang_id`` under
    ``langid="ngram"``, else ``lang_guess``) is not in the list drop
    as ``wrong_lang``; precedence sits between low_score and
    low_quality. Note 'und' (no signal) drops unless listed.

    ``normalize=True`` applies :func:`tl_spark.functions.text.
    normalize_text` (control-char strip + Unicode NFC) to the
    extracted text BEFORE stats/dedup, so normalization-equal variants
    deduplicate together.

    ``lm_score_min`` (optional): corpus-trained bigram-LM gate — docs
    whose :func:`tl_spark.operators.lm.bigram_lm_scores` average
    log-probability falls below the threshold drop as ``low_lm``
    (runs on dedup/contamination/repetition survivors; docs too short
    to have bigrams pass through to the later length gate).

    ``classifier_model`` (optional): a trained
    :func:`tl_spark.operators.classifier.train_text_classifier` model
    dict — dedup/LM survivors scoring below ``classifier_min`` drop as
    ``low_score`` (map-only scoring, weights in the task closure).

    ``substring_min_shared`` (optional): winnowing substring-reuse
    gate — near-dup survivors sharing at least that many winnowing
    fingerprints with an earlier doc (long verbatim boilerplate, see
    :func:`tl_spark.operators.winnow.substring_overlap_pairs`) drop
    as ``substring_dup``; precedence sits between near_dup and
    contaminated.

    ``neardup_mode``: "pairs" (default — of each verified pair the
    later (conv_id, turn_idx) drops; matches the driver oracle) or
    "clusters" — the TRANSITIVE closure of verified pairs is computed
    with :func:`tl_spark.operators.graph.connected_components` and
    only the earliest (conv_id, turn_idx) doc per duplicate cluster
    survives (A~B and B~C with no A~C edge still collapse to one
    doc). Cluster mode runs the iterative CC rounds EAGERLY at plan
    construction (bounded driver actions, O(log diameter) rounds).

    ``max_dup_word_frac`` (optional): Gopher-style repetition gate —
    docs whose fraction of repeated tokens exceeds the threshold drop
    as ``repetitive`` (pure JVM array expression, no shuffle; see
    :func:`tl_spark.functions.text.dup_word_frac`).

    ``benchmark`` (optional): a DataFrame with a ``text`` column of
    benchmark/eval documents. When given, dedup survivors sharing any
    ``contamination_n``-char n-gram with the benchmark set are dropped
    as ``contaminated`` (exact overlap, broadcast benchmark shingles —
    the corpus side stays map-only; see
    :func:`tl_spark.operators.dedup.ngram_contamination`).

    ``persist=True`` caches the two DAG nodes shared by ``curated``
    and ``dropped`` (post-extraction stats, MEMORY_AND_DISK; and the
    tiny near-dup set) so materializing BOTH outputs runs the
    extraction and the MinHash self-join exactly once.

    Cache ownership: every persisted handle — including the MinHash
    signature cache the child :func:`minhash_lsh_candidates` creates
    REGARDLESS of ``persist`` — is attached to ``curated`` via the
    tl_spark.cache protocol; materialize both outputs, then release
    with ``unpersist_handles(curated)`` (see :func:`run_curation_job`).
    Handles are captured BEFORE any rebinding so unpersist hits the
    exact plan Spark cached (CacheManager.uncacheQuery matches by
    sameResult, so a derived DataFrame would silently no-op).
    """
    from tl_spark.functions.extract import DEFAULT_STRIP_TAGS

    if langid not in ("markers", "ngram"):
        raise ValueError("langid must be markers|ngram")
    ex = extract_main_content(
        df,
        text_col=text_col,
        passthrough=["conv_id", "turn_idx", "role", "ts"],
        strip_tags=DEFAULT_STRIP_TAGS if strip_tags is None else strip_tags,
    )
    # doc_uid is a 64-bit hash of the natural key — compact enough to
    # shuffle, but at 10^12 rows birthday collisions are expected
    # (~n^2/2^65 ≈ tens of thousands): a collision can cross-wire a
    # near-dup drop between two unrelated rows. At that scale switch
    # the uid to the composite (conv_id, turn_idx) struct or a 128-bit
    # digest; the operators only require uid equality semantics.
    ex = ex.withColumn(
        "doc_uid", F.xxhash64("conv_id", "turn_idx")
    ).withColumn("extracted_text", F.coalesce("extracted_text", F.lit("")))
    if normalize:
        from tl_spark.functions.text import normalize_text

        ex = ex.withColumn(
            "extracted_text", normalize_text(F.col("extracted_text"))
        )

    c = F.col("extracted_text")
    stat_cols = [
        "conv_id", "turn_idx", "role", "ts", "extracted_text", "doc_uid",
        token_count(c).alias("n_tokens"),
        quality_score(c).alias("quality"),
        lang_guess(c).alias("lang_guess"),
    ]
    if langid == "ngram":
        from tl_spark.operators.langid import ngram_lang_id_col

        # map-only Arrow kernel leg; only the predicted code is kept
        stat_cols.append(ngram_lang_id_col(c)["lang_id"].alias("lang_id"))
    stats = ex.select(*stat_cols)
    handles: list[DataFrame] = []
    if persist:
        from pyspark import StorageLevel

        stats = stats.persist(StorageLevel.MEMORY_AND_DISK)
        handles.append(stats)  # BEFORE the _rank rebinding below

    # exact dedup: keep the first (conv_id, turn_idx) per distinct text;
    # window over the text hash — one digest shuffle
    w = Window.partitionBy(F.sha2("extracted_text", 256)).orderBy(
        "conv_id", "turn_idx"
    )
    stats = stats.withColumn("_rank", F.row_number().over(w))
    exact_dups = stats.filter(F.col("_rank") > 1).select(
        "doc_uid", F.lit("exact_dup").alias("drop_reason")
    )
    survivors = stats.filter(F.col("_rank") == 1).drop("_rank")

    # near-dup among exact-dedup survivors: LSH candidates verified by
    # character-shingle Jaccard; of each verified pair the LATER
    # (conv_id, turn_idx) is dropped — NOT the larger doc_uid, which is
    # a hash and therefore arbitrary w.r.t. document order. The pair
    # set is tiny relative to the corpus, so the two key-attach joins
    # broadcast under AQE.
    docs = survivors.select(
        F.col("doc_uid").alias("doc_id"),
        F.col("extracted_text").alias("text"),
    )
    cands = minhash_lsh_candidates(docs, n_hashes=32, bands=8)
    handles.extend(carried_handles(cands))  # the child's sig cache
    verified = ngram_jaccard_pairs(
        docs, cands, threshold=neardup_jaccard
    )
    if neardup_mode not in ("pairs", "clusters"):
        raise ValueError(f"neardup_mode must be pairs|clusters")
    keys = survivors.select("doc_uid", "conv_id", "turn_idx")
    if neardup_mode == "clusters":
        # transitive closure: only the earliest (conv, turn) per
        # duplicate CLUSTER survives (A~B~C collapses even without an
        # A~C edge). CC runs eagerly (bounded O(log diameter) driver
        # rounds); the cluster table is tiny (docs touched by pairs).
        from tl_spark.operators.graph import connected_components

        cc = connected_components(verified, "id_a", "id_b")
        # CC's final labels are a localCheckpoint: carry its handle so
        # unpersist_handles(curated) releases the RDD-level persistence
        # (after which cluster-mode outputs cannot be recomputed —
        # materialize both outputs first, as the protocol requires)
        handles.extend(carried_handles(cc))
        ranked = cc.join(
            keys.select(
                F.col("doc_uid").alias("id"), "conv_id", "turn_idx"
            ),
            "id",
        )
        wc = Window.partitionBy("component").orderBy(
            "conv_id", "turn_idx"
        )
        near_dups = (
            ranked.withColumn("_cr", F.row_number().over(wc))
            .filter(F.col("_cr") > 1)
            .select(F.col("id").alias("doc_uid"))
            .join(exact_dups.select("doc_uid"), "doc_uid", "left_anti")
            .select("doc_uid", F.lit("near_dup").alias("drop_reason"))
        )
    else:
        attached = verified.join(
            keys.select(
                F.col("doc_uid").alias("id_a"),
                F.col("conv_id").alias("_conv_a"),
                F.col("turn_idx").alias("_turn_a"),
            ),
            "id_a",
        ).join(
            keys.select(
                F.col("doc_uid").alias("id_b"),
                F.col("conv_id").alias("_conv_b"),
                F.col("turn_idx").alias("_turn_b"),
            ),
            "id_b",
        )
        a_earlier = (F.col("_conv_a") < F.col("_conv_b")) | (
            (F.col("_conv_a") == F.col("_conv_b"))
            & (F.col("_turn_a") < F.col("_turn_b"))
        )
        later_uid = F.when(a_earlier, F.col("id_b")).otherwise(
            F.col("id_a")
        )
        near_dups = (
            attached.select(later_uid.alias("doc_uid"))
            .distinct()
            .join(exact_dups.select("doc_uid"), "doc_uid", "left_anti")
            .select("doc_uid", F.lit("near_dup").alias("drop_reason"))
        )
    if persist:
        near_dups = near_dups.persist()
        handles.append(near_dups)

    kept_after_dedup = survivors.join(
        near_dups.select("doc_uid"), "doc_uid", "left_anti"
    )

    # optional winnowing substring-reuse gate (after near-dup, before
    # decontamination): docs sharing >= substring_min_shared selected
    # fingerprints with an EARLIER doc drop as substring_dup — catches
    # long verbatim boilerplate reuse between otherwise-different docs
    # (see tl_spark.operators.winnow; same later-(conv,turn)-drops
    # rule as near-dup)
    substring_dups = None
    if substring_min_shared is not None:
        from tl_spark.operators.winnow import substring_overlap_pairs

        sp = substring_overlap_pairs(
            kept_after_dedup.select(
                F.col("doc_uid").alias("doc_id"),
                F.col("extracted_text").alias("text"),
            ),
            min_shared=substring_min_shared,
        )
        sp_att = sp.join(
            keys.select(
                F.col("doc_uid").alias("id_a"),
                F.col("conv_id").alias("_conv_a"),
                F.col("turn_idx").alias("_turn_a"),
            ),
            "id_a",
        ).join(
            keys.select(
                F.col("doc_uid").alias("id_b"),
                F.col("conv_id").alias("_conv_b"),
                F.col("turn_idx").alias("_turn_b"),
            ),
            "id_b",
        )
        sp_earlier = (F.col("_conv_a") < F.col("_conv_b")) | (
            (F.col("_conv_a") == F.col("_conv_b"))
            & (F.col("_turn_a") < F.col("_turn_b"))
        )
        sp_later = F.when(sp_earlier, F.col("id_b")).otherwise(F.col("id_a"))
        substring_dups = (
            sp_att.select(sp_later.alias("doc_uid"))
            .distinct()
            .select("doc_uid", F.lit("substring_dup").alias("drop_reason"))
        )
        kept_after_dedup = kept_after_dedup.join(
            substring_dups.select("doc_uid"), "doc_uid", "left_anti"
        )

    # optional SemDeDup-shape semantic gate (after substring_dup,
    # before decontamination): hashed bag-of-words embeddings, IVF
    # cluster assignment, within-list cosine pairs; of each pair the
    # later (conv_id, turn_idx) drops — document order, NOT doc_uid
    # hash order (see tl_spark.operators.similarity.
    # semantic_neardup_pairs for the scale shape)
    semantic_dups = None
    if semantic_dedup_cos is not None:
        from tl_spark.operators.embed import hashed_embedding
        from tl_spark.operators.similarity import semantic_neardup_pairs

        emb = hashed_embedding(
            kept_after_dedup.select(
                F.col("doc_uid").alias("doc_id"),
                F.col("extracted_text").alias("text"),
            ),
            dim=semantic_dedup_dim,
        )
        sem_pairs = semantic_neardup_pairs(
            emb,
            threshold=semantic_dedup_cos,
            n_lists=semantic_dedup_lists,
            id_col="id",
        )
        sem_att = sem_pairs.join(
            keys.select(
                F.col("doc_uid").alias("id_a"),
                F.col("conv_id").alias("_conv_a"),
                F.col("turn_idx").alias("_turn_a"),
            ),
            "id_a",
        ).join(
            keys.select(
                F.col("doc_uid").alias("id_b"),
                F.col("conv_id").alias("_conv_b"),
                F.col("turn_idx").alias("_turn_b"),
            ),
            "id_b",
        )
        sem_earlier = (F.col("_conv_a") < F.col("_conv_b")) | (
            (F.col("_conv_a") == F.col("_conv_b"))
            & (F.col("_turn_a") < F.col("_turn_b"))
        )
        sem_later = F.when(sem_earlier, F.col("id_b")).otherwise(
            F.col("id_a")
        )
        semantic_dups = (
            sem_att.select(sem_later.alias("doc_uid"))
            .distinct()
            .select("doc_uid", F.lit("semantic_dup").alias("drop_reason"))
        )
        kept_after_dedup = kept_after_dedup.join(
            semantic_dups.select("doc_uid"), "doc_uid", "left_anti"
        )

    # optional benchmark decontamination (between dedup and the quality
    # filters): exact n-gram overlap against the broadcast benchmark
    # shingle set — corpus side map-only, dedup-after-join shape
    contaminated = None
    if benchmark is not None:
        hits = ngram_contamination(
            kept_after_dedup.select(
                F.col("doc_uid").alias("doc_id"),
                F.col("extracted_text").alias("text"),
            ),
            benchmark,
            n=contamination_n,
        )
        contaminated = hits.select(
            F.col("id").alias("doc_uid"),
            F.lit("contaminated").alias("drop_reason"),
        )
        kept_after_dedup = kept_after_dedup.join(
            contaminated.select("doc_uid"), "doc_uid", "left_anti"
        )

    # optional Gopher-style repetition gate (after decontamination,
    # before the quality/length filters)
    repetitive = None
    if max_dup_word_frac is not None:
        from tl_spark.functions.text import dup_word_frac

        flagged = kept_after_dedup.withColumn(
            "_dwf", dup_word_frac(F.col("extracted_text"))
        )
        repetitive = flagged.filter(
            F.col("_dwf") > max_dup_word_frac
        ).select("doc_uid", F.lit("repetitive").alias("drop_reason"))
        kept_after_dedup = flagged.filter(
            F.col("_dwf") <= max_dup_word_frac
        ).drop("_dwf")

    # optional corpus-trained bigram-LM gate (after repetition,
    # before the quality/length filters); missing scores (sub-2-token
    # docs) are NOT dropped here — the length gate owns them
    low_lm = None
    if lm_score_min is not None:
        from tl_spark.operators.lm import bigram_lm_scores

        lm = bigram_lm_scores(
            kept_after_dedup.select(
                F.col("doc_uid").alias("doc_id"),
                F.col("extracted_text").alias("text"),
            )
        ).select(F.col("id").alias("doc_uid"), "lm_score")
        low_lm = (
            lm.filter(F.col("lm_score") < lm_score_min)
            .select("doc_uid", F.lit("low_lm").alias("drop_reason"))
        )
        kept_after_dedup = kept_after_dedup.join(
            low_lm.select("doc_uid"), "doc_uid", "left_anti"
        )

    # optional trained-classifier gate (after low_lm, before the
    # heuristic quality/length filters); scoring is map-only with the
    # weight vector in the closure (operators/classifier.py)
    low_score = None
    if classifier_model is not None:
        from tl_spark.operators.classifier import classifier_scores

        cs = classifier_scores(
            kept_after_dedup.select(
                F.col("doc_uid").alias("doc_id"),
                F.col("extracted_text").alias("text"),
            ),
            classifier_model,
        ).select(F.col("id").alias("doc_uid"), "score")
        low_score = cs.filter(F.col("score") < classifier_min).select(
            "doc_uid", F.lit("low_score").alias("drop_reason")
        )
        kept_after_dedup = kept_after_dedup.join(
            low_score.select("doc_uid"), "doc_uid", "left_anti"
        )

    # optional language allow-list gate (after low_score, before the
    # quality/length filters); the signal column is already computed
    # map-side in `stats`, so this is a pure filter — no extra pass
    wrong_lang = None
    if keep_langs is not None:
        sig = F.col("lang_id" if langid == "ngram" else "lang_guess")
        wrong_lang = kept_after_dedup.filter(
            ~sig.isin(list(keep_langs))
        ).select("doc_uid", F.lit("wrong_lang").alias("drop_reason"))
        kept_after_dedup = kept_after_dedup.filter(
            sig.isin(list(keep_langs))
        )

    low_q = kept_after_dedup.filter(
        (F.col("quality") < quality_min) & (F.col("n_tokens") >= min_tokens)
    ).select("doc_uid", F.lit("low_quality").alias("drop_reason"))
    short = kept_after_dedup.filter(F.col("n_tokens") < min_tokens).select(
        "doc_uid", F.lit("too_short").alias("drop_reason")
    )

    curated = kept_after_dedup.filter(
        (F.col("quality") >= quality_min) & (F.col("n_tokens") >= min_tokens)
    )
    dropped = exact_dups.unionByName(near_dups)
    if substring_dups is not None:
        dropped = dropped.unionByName(substring_dups)
    if semantic_dups is not None:
        dropped = dropped.unionByName(semantic_dups)
    if contaminated is not None:
        dropped = dropped.unionByName(contaminated)
    if repetitive is not None:
        dropped = dropped.unionByName(repetitive)
    if low_lm is not None:
        dropped = dropped.unionByName(low_lm)
    if low_score is not None:
        dropped = dropped.unionByName(low_score)
    if wrong_lang is not None:
        dropped = dropped.unionByName(wrong_lang)
    dropped = dropped.unionByName(low_q).unionByName(short)
    # hand every persisted handle (own + child) to the caller
    attach_handles(curated, *handles)
    return curated, dropped


def run_curation_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    **kwargs,
) -> dict:
    """Single-pass job: the shared DAG prefix (extraction + stats and
    the MinHash self-join) executes ONCE — ``curate(persist=True)``
    caches it, ``dropped`` is written to parquet (not collected), and
    every report number is aggregated from the two written outputs, so
    neither the input nor the lineage is re-scanned for bookkeeping.
    """
    t0 = time.time()
    df = spark.read.parquet(input_path)
    curated, dropped = curate(df, persist=True, **kwargs)
    dropped_path = output_path.rstrip("/") + "_dropped"
    try:
        curated.write.mode("overwrite").parquet(output_path)
        dropped.write.mode("overwrite").parquet(dropped_path)
    finally:
        unpersist_handles(curated)
    dropped_out = spark.read.parquet(dropped_path)
    reasons = {
        r["drop_reason"]: r["n"]
        for r in dropped_out.groupBy("drop_reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_out = spark.read.parquet(output_path).count()
    n_dropped = sum(reasons.values())
    return {
        # every input row lands in exactly one output (drop precedence
        # is total), so rows_in needs no extra input scan
        "rows_in": n_out + n_dropped,
        "rows_curated": n_out,
        "dropped": reasons,
        "wall_s": round(time.time() - t0, 2),
    }

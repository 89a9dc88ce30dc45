"""Tests for the character-n-gram-profile language identifier
(tl_spark/operators/langid.py): three-leg parity (JVM join / Arrow
kernel / DuckDB SQL), held-out accuracy over all 16 languages, and the
curate()/classifier wiring added in round 6."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from tl_spark.operators import langid as L

SF_DIR = "/root/testdata/sf0.001"

# Held-out sentences — none appear in SEED_TEXT. Two rounds per
# language exercise different vocabulary domains.
HELD_OUT_1 = {
    "en": "she walked slowly through the quiet streets while thinking"
    " about her future plans",
    "de": "die kinder spielen gerne im garten wenn die sonne scheint"
    " und es warm ist",
    "fr": "les enfants jouent dans le jardin quand le soleil brille et"
    " il fait chaud",
    "es": "los niños juegan en el jardín cuando brilla el sol y hace"
    " calor",
    "it": "i bambini giocano volentieri in giardino quando splende il"
    " sole e fa caldo",
    "pt": "as crianças gostam de brincar no jardim quando o sol brilha"
    " e está quente",
    "nl": "de kinderen spelen graag in de tuin als de zon schijnt en"
    " het warm is",
    "sv": "barnen leker gärna i trädgården när solen skiner och det är"
    " varmt",
    "da": "børnene leger gerne i haven når solen skinner og det er"
    " varmt",
    "pl": "dzieci chętnie bawią się w ogrodzie kiedy świeci słońce i"
    " jest ciepło",
    "cs": "děti si rády hrají na zahradě když svítí slunce a je teplo",
    "ro": "copiilor le place să se joace în grădină când soarele"
    " strălucește și este cald",
    "fi": "lapset leikkivät mielellään puutarhassa kun aurinko paistaa"
    " ja on lämmin",
    "hu": "a gyerekek szívesen játszanak a kertben amikor süt a nap és"
    " meleg van",
    "tr": "çocuklar güneş parlarken ve hava sıcakken bahçede oynamayı"
    " severler",
    "id": "anak anak suka bermain di kebun ketika matahari bersinar"
    " dan cuaca hangat",
}
HELD_OUT_2 = {
    "en": "the museum opens early in the morning and closes late in"
    " the evening",
    "de": "wir müssen morgen früh zum bahnhof gehen um den zug nicht"
    " zu verpassen",
    "fr": "nous devons aller à la gare demain matin pour ne pas"
    " manquer le train",
    "es": "tenemos que ir a la estación mañana por la mañana para no"
    " perder el tren",
    "it": "dobbiamo andare alla stazione domani mattina per non"
    " perdere il treno",
    "pt": "temos que ir à estação amanhã de manhã para não perder o"
    " trem",
    "nl": "we moeten morgenochtend naar het station gaan om de trein"
    " niet te missen",
    "sv": "vi måste gå till stationen tidigt i morgon för att inte"
    " missa tåget",
    "da": "vi skal tage til stationen tidligt i morgen for ikke at gå"
    " glip af toget",
    "pl": "musimy jutro rano pojechać na dworzec żeby nie spóźnić się"
    " na pociąg",
    "cs": "zítra ráno musíme jet na nádraží abychom nezmeškali vlak",
    "ro": "trebuie să mergem mâine dimineață la gară ca să nu pierdem"
    " trenul",
    "fi": "meidän täytyy mennä asemalle huomenna aikaisin ettemme"
    " myöhästy junasta",
    "hu": "holnap reggel ki kell mennünk az állomásra hogy le ne"
    " késsük a vonatot",
    "tr": "treni kaçırmamak için yarın sabah erkenden istasyona"
    " gitmeliyiz",
    "id": "kita harus pergi ke stasiun besok pagi agar tidak"
    " ketinggalan kereta",
}

EDGE_ROWS = [
    (0, None),
    (1, ""),
    (2, "   "),
    (3, "123 456 !!"),
    (4, "a"),
    (5, "Ω Ω Ω μικρός"),  # unknown script -> und
    (6, "the the the"),
    (7, "x" * 5000),
    (8, "...!!!,,,"),
    (9, "der schnelle braune fuchs springt"),
]


def test_profile_is_deterministic_and_positive():
    p1 = L.build_profile()
    L.build_profile.cache_clear()
    p2 = L.build_profile()
    assert p1 == p2
    assert all(w > 0 for _, _, w in p1)
    assert {lang for _, lang, _ in p1} == set(L.LANGS)
    # every ngram is exactly 3 chars of letters/spaces (no quoting
    # hazards in the inline-VALUES oracle)
    assert all(len(g) == 3 and "'" not in g for g, _, _ in p1)


@pytest.mark.parametrize("held", [HELD_OUT_1, HELD_OUT_2])
def test_held_out_accuracy_all_16_languages(held):
    langs, scores = L._score_batch([held[k] for k in held])
    got = dict(zip(held, langs))
    misses = {k: got[k] for k in held if got[k] != k}
    assert not misses, f"misrouted held-out sentences: {misses}"
    assert all(s > 0 for s in scores)


def test_jvm_kernel_and_sql_legs_agree_on_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    jvm = L.ngram_lang_id(docs).orderBy("doc_id").toPandas()
    ker = (
        docs.select(
            "doc_id", L.ngram_lang_id_col(docs["text"]).alias("r")
        )
        .select("doc_id", "r.lang_id", "r.lang_score")
        .orderBy("doc_id")
        .toPandas()
    )
    assert jvm["lang_id"].equals(ker["lang_id"])
    assert (
        jvm["lang_score"]
        .astype("int64")
        .equals(ker["lang_score"].astype("int64"))
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    ddb = con.execute(L.ngram_lang_id_sql()).fetchdf()
    assert jvm["lang_id"].equals(ddb["lang_id"])
    assert (
        jvm["lang_score"]
        .astype("int64")
        .equals(ddb["lang_score"].astype("int64"))
    )
    # the word-salad corpus should be overwhelmingly English
    assert (jvm["lang_id"] == "en").mean() > 0.5


def test_three_leg_parity_on_edge_cases(spark, tmp_path):
    edge = spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
    jvm = L.ngram_lang_id(edge).orderBy("doc_id").toPandas()
    ker = (
        edge.select(
            "doc_id", L.ngram_lang_id_col(edge["text"]).alias("r")
        )
        .select("doc_id", "r.lang_id", "r.lang_score")
        .orderBy("doc_id")
        .toPandas()
    )
    assert jvm["lang_id"].equals(ker["lang_id"])
    assert (
        jvm["lang_score"]
        .astype("int64")
        .equals(ker["lang_score"].astype("int64"))
    )
    pq = str(tmp_path / "edge.parquet")
    pd.DataFrame(EDGE_ROWS, columns=["doc_id", "text"]).to_parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')"
    )
    ddb = con.execute(L.ngram_lang_id_sql()).fetchdf()
    assert jvm["lang_id"].equals(ddb["lang_id"])
    assert (
        jvm["lang_score"]
        .astype("int64")
        .equals(ddb["lang_score"].astype("int64"))
    )
    # null / empty / non-letter / unknown-script rows -> und, 0
    und = jvm.set_index("doc_id")
    for i in (0, 1, 2, 3, 5, 7, 8):
        assert und.loc[i, "lang_id"] == "und"
        assert und.loc[i, "lang_score"] == 0
    assert und.loc[6, "lang_id"] == "en"
    assert und.loc[9, "lang_id"] == "de"


def test_kernel_leg_is_batch_invariant():
    """Scoring must not depend on batch composition (rows are scored
    independently even though the kernel shares one codepoint array)."""
    texts = [HELD_OUT_1[k] for k in sorted(HELD_OUT_1)]
    all_lang, all_score = L._score_batch(texts)
    for i, t in enumerate(texts):
        solo_lang, solo_score = L._score_batch([t])
        assert solo_lang[0] == all_lang[i]
        assert solo_score[0] == all_score[i]


def test_curate_ngram_mode_adds_lang_id_and_gates_wrong_lang(spark):
    from tl_spark.curation import curate

    rows = [
        ("c1", 0, "user", None, "<html><body><p>the committee "
         "published a detailed report on renewable energy and the "
         "museum opens early in the morning</p></body></html>"),
        ("c1", 1, "assistant", None, "<html><body><p>die kinder "
         "spielen gerne im garten wenn die sonne scheint und es warm "
         "ist heute</p></body></html>"),
        ("c2", 0, "user", None, "<html><body><p>les enfants jouent "
         "dans le jardin quand le soleil brille et il fait chaud "
         "aujourd'hui</p></body></html>"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, "
        "ts timestamp, text string"
    )
    curated, dropped = curate(
        df,
        quality_min=0.0,
        min_tokens=2,
        langid="ngram",
        keep_langs=["en", "de"],
    )
    cur = curated.toPandas()
    drp = dropped.toPandas()
    assert "lang_id" in cur.columns
    assert set(cur["lang_id"]) == {"en", "de"}
    assert len(cur) == 2
    wrong = drp[drp["drop_reason"] == "wrong_lang"]
    assert len(wrong) == 1
    # totality: every input row lands in exactly one output
    assert len(cur) + len(drp) == 3
    # default marker mode unchanged: no lang_id column, no gate
    cur_def, drp_def = curate(df, quality_min=0.0, min_tokens=2)
    assert "lang_id" not in cur_def.columns
    assert len(cur_def.toPandas()) == 3


def test_curate_rejects_bad_langid():
    from tl_spark.curation import curate

    with pytest.raises(ValueError, match="langid"):
        curate(None, langid="nope")


def test_window_classifier_matches_numpy_scoring_path(spark):
    """doc_classifier_scores (JVM left-assoc fold, oracle leg) must
    agree with the production numpy scoring path
    (operators/classifier.py classifier_scores) to float tolerance."""
    import tl_spark.queries as Q
    from tl_spark.operators.classifier import classifier_scores

    jvm = Q.doc_classifier_scores(spark, SF_DIR).toPandas()
    model = {
        "w": Q._CLS_W,
        "b": Q._CLS_B,
        "dim": Q._HEMB_DIM,
        "hash_fn": "md5",
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    np_scores = (
        classifier_scores(docs, model)
        .orderBy("id")
        .toPandas()
    )
    # numpy path doesn't round slots to 6dp -> tolerance, not equality
    assert np.allclose(
        jvm["cls_score"].to_numpy(),
        np_scores["score"].to_numpy(),
        atol=1e-4,
    )


def test_window_classifier_separates_good_from_spam(spark):
    """The inlined model must cleanly separate the synthetic classes
    it was trained on (sanity that the pasted constants aren't stale
    or degenerate). Uses the exact training-corpus generator, so a
    drifted tools/train_window_classifier.py shows up here."""
    from pyspark.sql import functions as F

    import tl_spark.queries as Qm
    from tools.train_window_classifier import synth_corpora

    pos, neg = synth_corpora(spark)

    def score(df):
        from tl_spark.operators.embed import hashed_embedding

        emb = hashed_embedding(df, dim=Qm._HEMB_DIM, hash_fn="md5")
        z = F.lit(0.0)
        for i in range(Qm._HEMB_DIM):
            v = F.round(F.col("embedding")[i].cast("double"), 6)
            z = z + v * F.lit(Qm._CLS_W[i])
        z = z + F.lit(Qm._CLS_B)
        s = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        return emb.select(s.alias("s")).toPandas()["s"]

    good, bad = score(pos), score(neg)
    assert good.min() > 0.8
    assert bad.max() < 0.2

"""Character-n-gram-profile language identification (CLD-shape).

Replaces the 4-language marker-word heuristic
(:func:`tl_spark.functions.text.lang_guess`) as the engine's
first-class language signal for corpus curation (VERDICT r5 item 1).
The method is public knowledge: Cavnar & Trenkle (1994) n-gram
profiles, scored CLD-style as a sum of per-language trigram weights
(log-odds vs a uniform cross-language background), argmax over
languages. No external models or data — profiles are trained at
import time from a small embedded seed corpus (common-phrase /
UDHR-style sentences, public domain) covering 16 languages.

Three legs, pinned equal by tests/test_langid.py:

1. ``ngram_lang_id`` — pure-JVM DataFrame leg: lower + ``[^\\p{L}]+``
   normalization, padded trigram explode, broadcast profile join, one
   integer-sum aggregation per (id, lang), deterministic argmax
   (score desc, lang asc). Exactly re-expressible in ANSI SQL
   (:func:`ngram_lang_id_sql`) — this is the driver-oracle leg.
2. ``ngram_lang_id_col`` — Arrow-batch pandas UDF kernel leg:
   vectorized numpy (codepoint array -> packed trigram keys ->
   searchsorted against the flattened CSR profile). Map-only, zero
   shuffle — the 100-TB curation hot path.
3. :func:`ngram_lang_id_sql` — DuckDB oracle SQL with the profile
   inlined as VALUES; integer sums end-to-end so Spark and DuckDB
   agree bit-for-bit.

Scale shape: the profile is ~3k rows (broadcast / task closure); the
JVM leg shuffles partially-aggregated (id, lang, sum) rows only; the
kernel leg shuffles nothing. Both survive 100 TB.

Known normalization caveat (documented, not hit by any leg's tests):
Python ``str.lower`` performs full case mapping (U+0130 -> "i" +
combining dot) while Spark/DuckDB ``lower`` use simple per-codepoint
mapping — inputs containing uppercase dotted I (and similar special
casings) can differ between the kernel leg and the JVM/SQL legs.
Lower-case text (all seed profiles, normal crawl text) is unaffected.
"""

from __future__ import annotations

import math
import unicodedata
from functools import lru_cache

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------
# Embedded seed corpus: common-phrase sentences per language (public
# knowledge — pangram translations, UDHR Article 1/18-style phrasing,
# everyday sentences). ~80 words each; enough for stable trigram
# profiles over 16 languages.
# --------------------------------------------------------------------
SEED_TEXT: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog . it was the best "
        "of times and it was the worst of times . we hold these truths "
        "to be self evident that all men are created equal . this is a "
        "test of the language identification system and it should work "
        "well . there are many things that we do not know about the "
        "world . what time is it . i think that you should come with us "
        "to the park today . everyone has the right to freedom of "
        "thought and expression . the weather today is cold with a "
        "chance of rain in the afternoon ."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund . es "
        "war einmal ein kleines mädchen das in einem dorf wohnte . alle "
        "menschen sind frei und gleich an würde und rechten geboren . "
        "ich weiß nicht was soll es bedeuten dass ich so traurig bin . "
        "das wetter ist heute kalt und es wird am nachmittag regnen . "
        "wir haben viele dinge über die welt noch nicht gelernt . "
        "können sie mir bitte sagen wie spät es ist . jeder hat das "
        "recht auf freiheit der gedanken und der meinungsäußerung ."
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux . il "
        "était une fois une petite fille qui vivait dans un village . "
        "tous les êtres humains naissent libres et égaux en dignité et "
        "en droits . je ne sais pas ce que cela veut dire . le temps "
        "est froid aujourd'hui et il va pleuvoir cet après midi . nous "
        "avons encore beaucoup de choses à apprendre sur le monde . "
        "pouvez vous me dire quelle heure il est . chacun a droit à la "
        "liberté de pensée et d'expression ."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso . había "
        "una vez una niña pequeña que vivía en un pueblo . todos los "
        "seres humanos nacen libres e iguales en dignidad y derechos . "
        "no sé lo que esto quiere decir . el tiempo está frío hoy y va "
        "a llover esta tarde . todavía tenemos muchas cosas que "
        "aprender sobre el mundo . puede usted decirme qué hora es . "
        "toda persona tiene derecho a la libertad de pensamiento y de "
        "expresión ."
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro . c'era una "
        "volta una piccola bambina che viveva in un villaggio . tutti "
        "gli esseri umani nascono liberi ed eguali in dignità e "
        "diritti . non so che cosa questo voglia dire . il tempo oggi è "
        "freddo e pioverà nel pomeriggio . abbiamo ancora molte cose da "
        "imparare sul mondo . può dirmi che ora è per favore . ogni "
        "individuo ha diritto alla libertà di pensiero e di "
        "espressione ."
    ),
    "pt": (
        "a rápida raposa marrom salta sobre o cão preguiçoso . era uma "
        "vez uma menina pequena que morava numa aldeia . todos os seres "
        "humanos nascem livres e iguais em dignidade e direitos . não "
        "sei o que isso quer dizer . o tempo hoje está frio e vai "
        "chover à tarde . ainda temos muitas coisas para aprender sobre "
        "o mundo . pode me dizer que horas são por favor . toda pessoa "
        "tem direito à liberdade de pensamento e de expressão . as "
        "montanhas e os caminhos são muito bonitos nesta região . o "
        "senhor pode me ajudar a encontrar o caminho para a estação . "
        "não há nada melhor do que um bom livro à noite ."
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond . er was eens "
        "een klein meisje dat in een dorp woonde . alle mensen worden "
        "vrij en gelijk in waardigheid en rechten geboren . ik weet "
        "niet wat dit betekent . het weer is vandaag koud en het gaat "
        "vanmiddag regenen . we hebben nog veel dingen over de wereld "
        "te leren . kunt u mij zeggen hoe laat het is . iedereen heeft "
        "recht op vrijheid van gedachte en meningsuiting ."
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden . det var "
        "en gång en liten flicka som bodde i en by . alla människor är "
        "födda fria och lika i värde och rättigheter . jag vet inte vad "
        "detta betyder . vädret är kallt i dag och det kommer att regna "
        "i eftermiddag . vi har fortfarande många saker att lära oss om "
        "världen . kan du säga mig vad klockan är . var och en har rätt "
        "till tankefrihet och yttrandefrihet ."
    ),
    "da": (
        "den hurtige brune ræv springer over den dovne hund . der var "
        "engang en lille pige som boede i en landsby . alle mennesker "
        "er født frie og lige i værdighed og rettigheder . jeg ved ikke "
        "hvad dette betyder . vejret er koldt i dag og det kommer til "
        "at regne i eftermiddag . vi har stadig mange ting at lære om "
        "verden . kan du sige mig hvad klokken er . enhver har ret til "
        "tankefrihed og ytringsfrihed ."
    ),
    "pl": (
        "szybki brązowy lis skacze nad leniwym psem . była sobie raz "
        "mała dziewczynka która mieszkała we wsi . wszyscy ludzie rodzą "
        "się wolni i równi w godności i prawach . nie wiem co to "
        "znaczy . pogoda jest dzisiaj zimna i po południu będzie padać "
        "deszcz . mamy jeszcze wiele rzeczy do nauczenia się o "
        "świecie . czy może mi pan powiedzieć która jest godzina . "
        "każdy człowiek ma prawo do wolności myśli i słowa ."
    ),
    "cs": (
        "rychlá hnědá liška skáče přes líného psa . byla jednou jedna "
        "malá dívka která žila ve vesnici . všichni lidé se rodí "
        "svobodní a rovní v důstojnosti i právech . nevím co to "
        "znamená . počasí je dnes studené a odpoledne bude pršet . máme "
        "ještě mnoho věcí které se musíme o světě naučit . můžete mi "
        "prosím říci kolik je hodin . každý má právo na svobodu myšlení "
        "a projevu . přijde jaro a na louce kvetou květiny . řeka teče "
        "údolím kolem starého města . děkuji vám za pomoc a přeji vám "
        "hezký den . dnes večer půjdeme do divadla s přáteli ."
    ),
    "ro": (
        "vulpea maro rapidă sare peste câinele leneș . a fost odată o "
        "fetiță mică care trăia într un sat . toate ființele umane se "
        "nasc libere și egale în demnitate și în drepturi . nu știu ce "
        "înseamnă acest lucru . vremea este rece astăzi și va ploua "
        "după amiază . mai avem multe lucruri de învățat despre lume . "
        "puteți să mi spuneți cât este ceasul . orice om are dreptul la "
        "libertatea gândirii și a exprimării ."
    ),
    "fi": (
        "nopea ruskea kettu hyppää laiskan koiran yli . olipa kerran "
        "pieni tyttö joka asui kylässä . kaikki ihmiset syntyvät "
        "vapaina ja tasavertaisina arvoltaan ja oikeuksiltaan . en "
        "tiedä mitä tämä tarkoittaa . sää on tänään kylmä ja "
        "iltapäivällä sataa . meillä on vielä paljon asioita "
        "opittavana maailmasta . voitteko sanoa minulle paljonko kello "
        "on . jokaisella on oikeus ajatuksen ja sananvapauteen ."
    ),
    "hu": (
        "a gyors barna róka átugrik a lusta kutya felett . volt egyszer "
        "egy kislány aki egy faluban élt . minden emberi lény szabadon "
        "születik és egyenlő méltósága és joga van . nem tudom hogy ez "
        "mit jelent . az idő ma hideg és délután esni fog az eső . még "
        "sok mindent kell tanulnunk a világról . meg tudná mondani hány "
        "óra van . mindenkinek joga van a gondolat és a "
        "véleménynyilvánítás szabadságához ."
    ),
    "tr": (
        "hızlı kahverengi tilki tembel köpeğin üzerinden atlar . bir "
        "zamanlar bir köyde yaşayan küçük bir kız varmış . bütün "
        "insanlar hür haysiyet ve haklar bakımından eşit doğarlar . "
        "bunun ne anlama geldiğini bilmiyorum . hava bugün soğuk ve "
        "öğleden sonra yağmur yağacak . dünya hakkında öğrenecek daha "
        "çok şeyimiz var . bana saatin kaç olduğunu söyleyebilir "
        "misiniz . herkesin düşünce ve ifade özgürlüğüne hakkı vardır ."
    ),
    "id": (
        "rubah coklat yang cepat melompati anjing yang malas . pada "
        "suatu hari ada seorang gadis kecil yang tinggal di sebuah "
        "desa . semua orang dilahirkan merdeka dan mempunyai martabat "
        "dan hak yang sama . saya tidak tahu apa artinya ini . cuaca "
        "hari ini dingin dan sore nanti akan turun hujan . kita masih "
        "punya banyak hal untuk dipelajari tentang dunia . bisakah anda "
        "memberi tahu saya jam berapa sekarang . setiap orang berhak "
        "atas kebebasan berpikir dan menyatakan pendapat ."
    ),
}

LANGS: list[str] = sorted(SEED_TEXT)  # argmax tie-break = this order

_SCALE = 1000  # integer weight scale for log-odds


def _normalize_py(text: str) -> str:
    """Python mirror of the JVM/SQL normalization:
    lower -> non-letters (Unicode category L*) to space -> collapse
    runs -> trim. Used for profile training and nothing else."""
    lowered = text.lower()
    chars = [
        c if unicodedata.category(c).startswith("L") else " "
        for c in lowered
    ]
    return " ".join("".join(chars).split())


def _trigrams_py(text: str) -> list[str]:
    s = _normalize_py(text)
    if not s:
        return []
    s = f" {s} "
    return [s[i : i + 3] for i in range(len(s) - 2)]


@lru_cache(maxsize=None)
def build_profile(top_k: int = 400) -> tuple[tuple[str, str, int], ...]:
    """(ngram, lang, weight>0) rows: per-language trigram log-odds vs
    the mean cross-language probability, scaled to integers, top_k per
    language by (weight desc, ngram asc). Deterministic."""
    counts: dict[str, dict[str, int]] = {}
    totals: dict[str, int] = {}
    for lang, seed in SEED_TEXT.items():
        c: dict[str, int] = {}
        for g in _trigrams_py(seed):
            c[g] = c.get(g, 0) + 1
        counts[lang] = c
        totals[lang] = sum(c.values())
    all_grams = sorted({g for c in counts.values() for g in c})
    n_langs = len(LANGS)
    probs = {
        lang: {g: c / totals[lang] for g, c in counts[lang].items()}
        for lang in LANGS
    }
    bg = {
        g: sum(probs[lang].get(g, 0.0) for lang in LANGS) / n_langs
        for g in all_grams
    }
    rows: list[tuple[str, str, int]] = []
    for lang in LANGS:
        scored = []
        for g, p in probs[lang].items():
            w = round(_SCALE * math.log(p / bg[g]))
            if w > 0:
                scored.append((g, w))
        scored.sort(key=lambda t: (-t[1], t[0]))
        rows.extend((g, lang, w) for g, w in scored[:top_k])
    rows.sort()
    return tuple(rows)


# --------------------------------------------------------------------
# Leg 1: pure-JVM DataFrame leg (driver-oracle leg)
# --------------------------------------------------------------------


def _padded_trigrams(text_col) -> "F.Column":
    """array<string> of trigrams over ' '||normalized||' ' (JVM-only)."""
    norm = F.trim(
        F.regexp_replace(F.lower(text_col), r"[^\p{L}]+", " ")
    )
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    n = F.length(padded)
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(2)),
        lambda i: F.substring(padded, i, F.lit(3)),
    )
    return F.when(n >= 3, grams).otherwise(
        F.array().cast("array<string>")
    )


def profile_df(spark, top_k: int = 400) -> DataFrame:
    return spark.createDataFrame(
        list(build_profile(top_k)), "ngram string, lang string, w int"
    )


def ngram_lang_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 400,
) -> DataFrame:
    """(id_col, lang_id, lang_score) via broadcast profile join.

    Scale shape: trigram explode is map-side; the profile join is an
    explicit broadcast; the only shuffles carry partially-aggregated
    (id, lang, sum<long>) rows then (id, best) rows. Integer sums
    end-to-end -> bit-equal to the DuckDB oracle. Docs with no profile
    trigram (empty/non-letter/unknown-script text) -> ('und', 0).
    """
    spark = df.sparkSession
    prof = profile_df(spark, top_k)
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(_padded_trigrams(F.col(text_col))).alias("ngram"),
    )
    scored = (
        ex.join(F.broadcast(prof), "ngram")
        .groupBy("id", "lang")
        .agg(F.sum("w").alias("s"))
    )
    best = scored.groupBy("id").agg(
        F.min(
            F.struct((-F.col("s")).alias("ns"), F.col("lang"))
        ).alias("b")
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(best, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("b.lang"), F.lit("und")).alias("lang_id"),
            F.coalesce(-F.col("b.ns"), F.lit(0))
            .cast("long")
            .alias("lang_score"),
        )
    )


# --------------------------------------------------------------------
# Leg 2: Arrow-batch numpy kernel leg (map-only hot path)
# --------------------------------------------------------------------

_KERNEL_CACHE: dict[int, tuple] = {}


def _kernel_tables(top_k: int = 400):
    """Flattened CSR profile: sorted packed int64 trigram keys ->
    (lang_idx int8, weight int32) segments."""
    cached = _KERNEL_CACHE.get(top_k)
    if cached is not None:
        return cached
    rows = build_profile(top_k)  # sorted by (ngram, lang, w)
    lang_idx = {lang: i for i, lang in enumerate(LANGS)}

    def pack(g: str) -> int:
        a, b, c = (ord(ch) for ch in g)
        return (a << 42) | (b << 21) | c

    keys: list[int] = []
    offs: list[int] = [0]
    langs: list[int] = []
    ws: list[int] = []
    cur = None
    for g, lang, w in rows:
        if g != cur:
            if cur is not None:
                offs.append(len(langs))
            keys.append(pack(g))
            cur = g
        langs.append(lang_idx[lang])
        ws.append(w)
    offs.append(len(langs))
    tables = (
        np.array(keys, dtype=np.int64),
        np.array(offs, dtype=np.int64),
        np.array(langs, dtype=np.int8),
        np.array(ws, dtype=np.int64),
        np.array(LANGS),
    )
    _KERNEL_CACHE[top_k] = tables
    return tables


def _is_letter_mask(uniq: np.ndarray) -> np.ndarray:
    return np.array(
        [
            unicodedata.category(chr(int(u))).startswith("L")
            for u in uniq
        ],
        dtype=bool,
    )


def _score_batch(texts, top_k: int = 400):
    """Vectorized scoring of a sequence of (already-lowered) strings.
    Returns (lang array<str>, score array<int64>)."""
    keys_t, offs_t, langs_t, ws_t, lang_names = _kernel_tables(top_k)
    n = len(texts)
    if n == 0:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    blob = "".join(f" {t} " for t in texts)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens + 2)
    cp = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    uniq = np.unique(cp)
    is_letter = _is_letter_mask(uniq)[np.searchsorted(uniq, cp)]
    cp = np.where(is_letter, cp, np.int64(32))
    # collapse space runs within a row (cross-row runs impossible to
    # merge: row boundaries are kept by the same_row guard)
    is_sp = cp == 32
    prev_sp = np.empty_like(is_sp)
    prev_sp[0] = False
    prev_sp[1:] = is_sp[:-1]
    same_row = np.empty_like(is_sp)
    same_row[0] = False
    same_row[1:] = rows[1:] == rows[:-1]
    keep = ~(is_sp & prev_sp & same_row)
    cp = cp[keep]
    rows = rows[keep]
    scores = np.zeros((n, len(lang_names)), dtype=np.int64)
    if len(cp) >= 3:
        valid = rows[:-2] == rows[2:]
        keys = (cp[:-2] << 42) | (cp[1:-1] << 21) | cp[2:]
        keys = keys[valid]
        krows = rows[:-2][valid]
        pos = np.searchsorted(keys_t, keys)
        pos_c = np.minimum(pos, len(keys_t) - 1)
        hit = keys_t[pos_c] == keys
        pos = pos_c[hit]
        krows = krows[hit]
        if len(pos):
            starts = offs_t[pos]
            segs = offs_t[pos + 1] - starts
            total = int(segs.sum())
            # CSR expansion: flat indices of every (trigram, lang) hit
            flat = (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(segs) - segs, segs)
                + np.repeat(starts, segs)
            )
            erows = np.repeat(krows, segs)
            np.add.at(scores, (erows, langs_t[flat]), ws_t[flat])
    best_i = scores.argmax(axis=1)  # first max -> lang asc tie-break
    best_s = scores[np.arange(n), best_i]
    lang = np.where(best_s > 0, lang_names[best_i], "und")
    return lang, np.where(best_s > 0, best_s, 0)


def ngram_lang_id_col(text_col, top_k: int = 400):
    """struct<lang_id:string, lang_score:bigint> column — Arrow-batch
    pandas UDF, map-only (profile tables in the task closure). Pinned
    equal to :func:`ngram_lang_id` by tests/test_langid.py."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("lang_id string, lang_score long")
    def _udf(s: pd.Series) -> pd.DataFrame:
        texts = s.fillna("").str.lower().tolist()
        lang, score = _score_batch(texts, top_k)
        return pd.DataFrame({"lang_id": lang, "lang_score": score})

    return _udf(text_col)


# --------------------------------------------------------------------
# Leg 3: DuckDB oracle SQL
# --------------------------------------------------------------------


def ngram_lang_id_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 400,
) -> str:
    """ANSI-SQL (DuckDB) equivalent of :func:`ngram_lang_id`, profile
    inlined as VALUES. Trigram contents are letters+spaces only, so no
    quote escaping is needed."""
    rows = build_profile(top_k)
    values = ",\n".join(
        f"('{g}', '{lang}', {w})" for g, lang, w in rows
    )
    return f"""
WITH prof(ngram, lang, w) AS (VALUES
{values}
),
norm AS (
  SELECT {id_col} AS id,
         ' ' || trim(regexp_replace(lower({text_col}),
                                    '[^\\p{{L}}]+', ' ', 'g')) || ' '
           AS s
  FROM {table}
),
grams AS (
  -- s[i:i+2] is DuckDB's 1-based inclusive slice = 3 chars;
  -- range(1, len-1) is empty for len < 3 and NULL s yields no rows
  SELECT id, unnest([s[i:i+2] for i in range(1, length(s) - 1)]) AS ngram
  FROM norm
),
scored AS (
  SELECT id, lang, SUM(w) AS s
  FROM grams JOIN prof USING (ngram)
  GROUP BY id, lang
),
best AS (
  SELECT id, lang, s,
         row_number() OVER (PARTITION BY id
                            ORDER BY s DESC, lang ASC) AS rn
  FROM scored
)
SELECT d.{id_col},
       COALESCE(b.lang, 'und') AS lang_id,
       CAST(COALESCE(b.s, 0) AS BIGINT) AS lang_score
FROM {table} d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.{id_col} = b.id
ORDER BY d.{id_col}
"""

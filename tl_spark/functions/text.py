"""Text-analysis operators for large-scale corpus curation.

All hot-path expressions are Spark built-ins (JVM-side, whole-stage
codegen) — no Python in the row path. Each function has an equivalent
ANSI-SQL formulation used by the DuckDB oracle in __spark_entry__.py;
keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny language-marker lexicons for the n-gram/stopword language guesser;
# deliberately simple + deterministic (heuristic lang-id, not a model)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def tokens(col) -> Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def token_count(col) -> Column:
    return F.size(tokens(col))


def char_count(col) -> Column:
    return F.length(col)


def punct_count(col) -> Column:
    return F.regexp_count(col, F.lit(r"[.,;:!?]"))


def stopword_count(col) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.array_intersect(tokens(col), sw))


def quality_score(col) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword
    presence - punctuation excess. Mirrors the SQL oracle exactly."""
    n_tok = token_count(col).cast("double")
    n_chars = char_count(col).cast("double")
    punct = punct_count(col).cast("double")
    stop = stopword_count(col).cast("double")
    score = (
        F.least(n_tok / F.lit(20.0), F.lit(1.0)) * 0.4
        + F.least(stop / F.lit(2.0), F.lit(1.0)) * 0.3
        + F.when(n_chars > 0, 1.0 - F.least(punct / n_chars * 10, F.lit(1.0)))
        .otherwise(0.0)
        * 0.3
    )
    return F.round(score, 4)


def lang_guess(col) -> Column:
    """Argmax of per-language marker-word hits; 'und' when all zero.
    Ties break by the fixed language order en,de,fr,es."""
    toks = tokens(col)
    def _member_of(ws):
        # NB: the HOF lambda must be unary — PySpark dispatches on arity
        def pred(x):
            cond = x == ws[0]
            for w in ws[1:]:
                cond = cond | (x == w)
            return cond

        return pred

    hits = {
        lang: F.size(F.filter(toks, _member_of(list(words))))
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.lit("und")
    best_n = F.lit(0)
    # fold from last to first language; ">=" makes the earlier language
    # win ties (it is applied later in the fold)
    for lang in reversed(langs):
        cond = (hits[lang] > 0) & (hits[lang] >= best_n)
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, hits[lang]).otherwise(best_n)
    return best


def fingerprint(col) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted,
    lowercased, punctuation-stripped token bag."""
    norm = F.lower(F.regexp_replace(col, r"[^a-zA-Z0-9 ]", " "))
    toks = F.array_sort(tokens(norm))
    return F.md5(F.concat_ws(" ", toks))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        char_count(c).alias("n_chars_computed"),
        punct_count(c).alias("n_punct"),
        quality_score(c).alias("quality"),
        lang_guess(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )

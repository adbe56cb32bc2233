"""Text-analysis operators for training-data pipelines (driver mandate:
language-ID, quality scoring, token counting, document fingerprinting).

No reference analogue (TODS is numeric time-series only); designed
Spark-first: every op is a pure Catalyst expression over `documents`
(codegen'd, pushdown-friendly, zero Python), so they run at 100 TB as a
single scan + optional shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny marker-stopword sets per language (public common words)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "los", "que", "una", "por"],
}


def words(col="text"):
    return F.split(F.trim(F.col(col)), r"\s+")


def token_count(df: DataFrame, col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (4 chars/token
    heuristic on non-space length) — both closed-form expressions."""
    return df.withColumn("n_words", F.size(words(col))).withColumn(
        "n_subword_est",
        F.ceil(F.length(F.regexp_replace(F.col(col), r"\s+", "")) / 4).cast("int"),
    )


def quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Length / uniqueness / word-shape heuristics (the usual pretraining
    quality filters), emitted as columns + one combined score."""
    w = words(col)
    n = F.size(w)
    uniq = F.size(F.array_distinct(w))
    mean_wlen = (F.length(F.regexp_replace(F.col(col), r"\s+", "")) / n)
    ttr = uniq / n  # type-token ratio
    alpha_ratio = (
        F.length(F.regexp_replace(F.col(col), r"[^A-Za-z]", "")) /
        F.greatest(F.length(col), F.lit(1))
    )
    return (
        df.withColumn("n_words", n)
        .withColumn("ttr", F.round(ttr + F.lit(1e-9), 4))
        .withColumn("mean_word_len", F.round(mean_wlen + F.lit(1e-9), 4))
        .withColumn("alpha_ratio", F.round(alpha_ratio + F.lit(1e-9), 4))
        .withColumn(
            "quality",
            F.round(
                F.least(n / F.lit(100.0), F.lit(1.0)) * 0.4
                + ttr * 0.3
                + alpha_ratio * 0.3
                + F.lit(1e-9),
                4,
            ),
        )
    )


def lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """n-gram/marker-word heuristic language ID: score = marker hits per
    language; pick argmax, 'und' (undetermined) when nothing hits.
    Pure expression — a `when` cascade over array_intersect sizes."""
    w = F.array_distinct(words(col))
    scores = {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(m) for m in marks])))
        for lang, marks in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    guess = F.lit("und")
    # deterministic tie-break: language order en < fr < de < es by listing
    for lang in reversed(list(LANG_MARKERS)):
        guess = F.when(scores[lang] == best, F.lit(lang)).otherwise(guess)
    guess = F.when(best == 0, F.lit("und")).otherwise(guess)
    out = df
    for lang, s in scores.items():
        out = out.withColumn(f"score_{lang}", s)
    return out.withColumn("lang_guess", guess)


def fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Document fingerprints: full-text md5 plus a min-shingle rolling
    fingerprint (min over md5 of word 3-grams — one MinHash coordinate,
    enough for containment-style matching)."""
    w = words(col)
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - 3, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, 3)),
    )
    return df.withColumn("fp_md5", F.md5(col)).withColumn(
        "fp_min_shingle", F.array_min(F.transform(shingles, F.md5))
    )

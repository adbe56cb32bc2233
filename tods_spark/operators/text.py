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


def _ngrams(w, n: int):
    """Word n-grams as space-joined strings: empty array below n words.
    Pure expression — sequence + element_at, no explode."""
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + k) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _dup_frac(arr):
    """Fraction of occurrences beyond the first of each distinct element."""
    return F.when(
        F.size(arr) > 0,
        (F.size(arr) - F.size(F.array_distinct(arr))) / F.size(arr),
    ).otherwise(F.lit(0.0))


def _top_run_chars(arr):
    """count × length of the most frequent element (ties: the
    lexicographically smallest, i.e. the first max run in sorted order —
    the `>` comparison never replaces an equal best). Single linear fold
    over the sorted array: no explode, no shuffle, whole-stage codegen."""
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"),
        F.lit(0).alias("bestc"), F.lit(0).alias("bestl"),
    )

    def step(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        better = run > a["bestc"]
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(a["bestc"]).alias("bestc"),
            F.when(better, F.length(x)).otherwise(a["bestl"]).alias("bestl"),
        )

    res = F.aggregate(F.array_sort(arr), acc0, step)
    return res["bestc"] * res["bestl"]


def repetition_signals(df: DataFrame, col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1
    "repetition removal"; same rule family as NeMo-Curator / DataTrove
    heuristic filters), re-expressed as PURE Catalyst expressions — one
    scan, zero shuffles, codegen'd sorted-array folds per document:

      * dup_line_frac       — duplicate-line occurrences / lines
                              (lines split on \\n, blank lines dropped)
      * dup_line_char_frac  — chars in those duplicate occurrences / line chars
      * dup_word_frac       — duplicate-word occurrences / words
      * dup_2gram_frac      — duplicate word-2-gram occurrences / 2-grams
      * top_2gram_char_frac — count(top 2-gram) × len(top 2-gram) / len(text)
      * top_3gram_char_frac — same for 3-grams

    The top-n-gram numerator counts every occurrence at full gram length
    (the DataTrove convention), so heavily overlapping repeats can push
    the ratio past 1.0 — filter thresholds sit at ~0.2, far below. Ties
    on the top count resolve to the lexicographically smallest n-gram on
    both sides. Scale: per-doc fold cost is O(words · log words) inside
    the scan stage — no doc²/doc-cardinality structure anywhere, so the
    op runs at 100 TB as a plain projection."""
    w = words(col)
    lines = F.filter(
        F.split(F.col(col), "\n"), lambda x: F.trim(x) != F.lit("")
    )
    line_chars = F.aggregate(lines, F.lit(0), lambda a, x: a + F.length(x))
    # duplicate-line chars: fold over the sorted lines; every element equal
    # to its predecessor is an occurrence beyond the first
    acc0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("dupch"))
    dup_line_chars = F.aggregate(
        F.array_sort(lines), acc0,
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["dupch"] + F.length(x))
            .otherwise(a["dupch"]).alias("dupch"),
        ),
    )["dupch"]
    g2, g3 = _ngrams(w, 2), _ngrams(w, 3)
    nz = lambda d: F.greatest(d, F.lit(1))
    doc_chars = F.length(col)
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("dup_line_frac", _dup_frac(lines))
        .withColumn("dup_line_char_frac", dup_line_chars / nz(line_chars))
        .withColumn("n_words", F.size(w))
        .withColumn("dup_word_frac", _dup_frac(w))
        .withColumn("dup_2gram_frac", _dup_frac(g2))
        .withColumn("top_2gram_char_frac", _top_run_chars(g2) / nz(doc_chars))
        .withColumn("top_3gram_char_frac", _top_run_chars(g3) / nz(doc_chars))
    )


def tfidf_topk(df: DataFrame, k: int = 3, id_col: str = "doc_id",
               col: str = "text") -> DataFrame:
    """Top-k TF-IDF keywords per document — the corpus-statistic join-back
    pattern (keyword extraction / stopword discovery for pretraining
    corpora). tf = in-doc term count; idf = ln((N+1)/(df+1)) + 1
    (sklearn's smoothed convention); deterministic tie-break score desc,
    then word asc.

    Scale design (10⁹+ docs): term stats are VOCABULARY-keyed — the
    explode feeds two partially-aggregated shuffles (tf on (doc, word),
    df on word), so hot stopwords combine map-side instead of hot-keying
    a reducer; N arrives as a broadcast single-row aggregate (no
    driver-side collect, no global window); final top-k is a window over
    doc_id — bounded partitions (words-per-doc), never corpus-wide."""
    w = words(col)
    tok = df.select(id_col, F.explode(w).alias("word")).filter(
        F.col("word") != ""
    )
    tf = tok.groupBy(id_col, "word").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("word").agg(
        F.countDistinct(id_col).alias("df")
    )
    n = df.select(F.countDistinct(id_col).alias("n_docs"))
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    scored = (
        tf.join(dfreq, "word")
        .join(broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1.0),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy(id_col).orderBy(
            F.col("tfidf").desc(), F.col("word").asc()
        )
    )
    return (
        scored.withColumn("rank", rank)
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "word", "tf", "df", "tfidf")
    )


def word_entropy(df: DataFrame, col: str = "text") -> DataFrame:
    """Per-document Shannon entropy over the word-frequency distribution
    (a standard gibberish / boilerplate signal in pretraining quality
    filters: low entropy = repeated words, high ~ log2(n) = all-distinct).

        H = -sum_x (c_x / n) * log2(c_x / n)   over distinct words x
        norm_entropy = H / log2(u)             (u distinct words; 0 if u<=1)

    Spark-first shape: ONE codegen'd fold over the sorted word array per
    row (the `_top_run_chars` run-length idiom) — each run of equal words
    closes with its -p*log2(p) term. No explode, no shuffle; the op is a
    pure projection and scales as O(words log words) inside the scan
    stage at any corpus size."""
    w = words(col)
    n = F.size(w).cast("double")
    u = F.size(F.array_distinct(w))

    def term(c):
        p = c / n
        return p * F.log2(p)

    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0.0).alias("run"),
        F.lit(0.0).alias("acc"),
    )

    def step(a, x):
        is_run = x == a["prev"]
        run = F.when(is_run, a["run"] + 1.0).otherwise(F.lit(1.0))
        acc = F.when(is_run | (a["run"] == 0.0), a["acc"]).otherwise(
            a["acc"] + term(a["run"])
        )
        return F.struct(x.alias("prev"), run.alias("run"), acc.alias("acc"))

    res = F.aggregate(F.array_sort(w), acc0, step)
    ent = -(
        res["acc"]
        + F.when(res["run"] > 0.0, term(res["run"])).otherwise(F.lit(0.0))
    )
    return (
        df.withColumn("n_words", F.size(w))
        .withColumn("n_distinct", u)
        .withColumn("entropy", ent)
        .withColumn(
            "norm_entropy",
            F.when(u > 1, ent / F.log2(u.cast("double"))).otherwise(F.lit(0.0)),
        )
    )


def ngram_topk(df: DataFrame, n: int = 3, k: int = 20,
               col: str = "text") -> DataFrame:
    """Corpus-wide top-k most frequent word n-grams (boilerplate /
    template discovery over a pretraining corpus). Deterministic
    tie-break: count desc, then gram asc.

    Scale shape: vocabulary-keyed partial+final hash aggregate (hot grams
    combine map-side — no doc-keyed shuffle), then a global top-k that
    Spark plans as TakeOrderedAndProject: each task keeps k rows, the
    driver merges k*tasks — no global sort, no single-partition exchange."""
    grams = df.select(F.explode(_ngrams(words(col), n)).alias("gram"))
    counts = grams.groupBy("gram").agg(F.count("*").alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("gram").asc()).limit(k)


def token_len_histogram(df: DataFrame, bucket: int = 64,
                        col: str = "text") -> DataFrame:
    """Per-source histogram of estimated token lengths (the packing /
    curriculum diagnostic): bucket = floor(n_subword_est / bucket_width).
    One partial+final hash aggregate over (source, bucket) — bounded
    cardinality both keys, map-side combine absorbs the hot source."""
    est = F.ceil(
        F.length(F.regexp_replace(F.col(col), r"\s+", "")) / 4
    ).cast("int")
    b = F.floor(est / F.lit(bucket)).cast("long")
    return (
        df.select(F.col("source"), b.alias("len_bucket"), est.alias("est"))
        .groupBy("source", "len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("est").alias("min_tok"),
            F.max("est").alias("max_tok"),
        )
    )


def quality_gate(
    df: DataFrame, col: str = "text",
    min_quality: float = 0.5, max_dup_word_frac: float = 0.3,
    min_words: int = 5, max_words: int = 100_000,
) -> DataFrame:
    """Per-source pass rates of a composite pretraining quality filter
    (the deploy-shape of the per-doc signals: quality_score >= q_min AND
    duplicate-word fraction <= d_max AND word count in [lo, hi]).

    The predicate is evaluated on UNROUNDED doubles with the identical
    expression order on both engines (IEEE arithmetic is deterministic,
    so the booleans agree bit-for-bit). One scan + one bounded-key
    aggregate; the filter itself never shuffles."""
    w = words(col)
    n = F.size(w)
    uniq = F.size(F.array_distinct(w))
    alpha_ratio = (
        F.length(F.regexp_replace(F.col(col), r"[^A-Za-z]", "")) /
        F.greatest(F.length(col), F.lit(1))
    )
    quality = (
        F.least(n / F.lit(100.0), F.lit(1.0)) * 0.4
        + (uniq / n) * 0.3
        + alpha_ratio * 0.3
    )
    dupf = (n - uniq) / n
    passed = (
        (quality >= F.lit(float(min_quality)))
        & (dupf <= F.lit(float(max_dup_word_frac)))
        & n.between(min_words, max_words)
    )
    return (
        df.select(F.col("source"), passed.cast("int").alias("p"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("p").alias("n_pass"),
        )
        .withColumn(
            "pass_rate",
            F.round(F.col("n_pass") / F.col("n_docs") + F.lit(1e-9), 4)
            + F.lit(0.0),
        )
    )


def source_word_kl(df: DataFrame, col: str = "text",
                   strata_col: str = "source") -> DataFrame:
    """Per-source word-distribution drift vs the whole corpus: KL(p_src
    || p_corpus) in bits over unigram frequencies. The standard corpus-
    audit signal for "which shard's language diverges from the mixture"
    (a shard of boilerplate or another register shows up as high KL; the
    corpus distribution dominates every source's support, so q > 0
    wherever p > 0 and the sum is total).

    Scale shape: explode to (source, word), ONE partial+final hash
    aggregate on the (source, word) composite — vocabulary-keyed, so the
    70%-hot source key is spread over its whole vocabulary rather than
    one reducer (the same key-widening answer ngram_topk uses). Corpus
    word totals REUSE the per-source aggregate (a second, smaller agg on
    word), and the final join is per-source-counts ⋈ corpus-counts on
    word — both sides vocabulary-keyed, output n_sources rows."""
    w = words(col)
    tok = df.select(
        F.col(strata_col).alias("src"), F.explode(w).alias("word")
    )
    per = tok.groupBy("src", "word").agg(F.count("*").alias("c"))
    src_tot = per.groupBy("src").agg(F.sum("c").alias("n_src"))
    corpus = per.groupBy("word").agg(F.sum("c").alias("cc"))
    corpus_tot = per.agg(F.sum("c").alias("n_corpus"))
    p = (F.col("c") / F.col("n_src"))
    q = (F.col("cc") / F.col("n_corpus"))
    return (
        per.join(corpus, "word")
        .join(F.broadcast(src_tot), "src")
        .crossJoin(F.broadcast(corpus_tot))
        .groupBy("src")
        .agg(
            F.sum(p * F.log2(p / q)).alias("_kl"),
            F.count("*").alias("n_distinct_words"),
        )
        .join(F.broadcast(src_tot), "src")
        .select(
            F.col("src").alias(strata_col),
            F.col("n_src").alias("n_words"),
            "n_distinct_words",
            F.col("_kl").alias("kl_bits"),
        )
    )

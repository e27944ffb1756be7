"""Text-analysis operators for LLM training-data pipelines.

All pure column expressions (whole-stage codegen, no Python in the hot
path): tokenization, shingling, token counting, language-ID by stopword
voting, quality scoring, and a polynomial rolling-hash fingerprint that is
bit-identical in DuckDB (portable md5-based token hashes, exact modular
integer arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.functions.hashing import md5_int64

TOKEN_RE = "[a-z0-9]+"

# tiny per-language stopword lists for the n-gram/stopword-voting heuristic;
# ties break by list order (en, es, de, fr, zh)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

FP_BASE = 1_000_003
FP_MOD = 2_147_483_647  # 2^31 - 1: keeps b*h + t < 2^62 (no bigint overflow)


def tokens(col: str | Column) -> Column:
    """Lower-cased word tokens (regex extraction — robust to punctuation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0)


def shingles(tok: Column, n: int = 3) -> Column:
    """Distinct n-gram shingles of a token array; fewer than n tokens →
    empty array. The guard is load-bearing: ``F.sequence`` counts DOWN
    when stop < start (see :func:`ngrams`), so an unguarded short doc
    would hit index 0 (a runtime error — SQL arrays are 1-based) and emit
    truncated out-of-range "shingles"."""
    return F.when(
        F.size(tok) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(tok) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tok, i + k + 1) for k in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def whitespace_token_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(c, " "))


# BPE-ish pre-tokenizer: letter runs, digit runs capped at 3 (the GPT-style
# numeric chunking), punctuation runs, whitespace runs. Deliberately
# lookahead-free so the same pattern runs in Java regex (Spark) and RE2
# (DuckDB oracle).
# explicit whitespace class, NOT \s: Java regex (Spark) includes \x0b in
# \s while RE2 (the DuckDB oracle) does not, so \s-based tokenization
# diverges on any document containing a vertical tab; this class is
# byte-identical in both engines
_WS = r" \t\n\x0b\f\r"
BPE_RE = rf"[a-z]+|[0-9]{{1,3}}|[^a-z0-9{_WS}]+|[{_WS}]+"


def bpe_token_count(col: str | Column) -> Column:
    """Approximate BPE token count via the pre-tokenizer regex — the cheap
    in-engine stand-in for a real tokenizer when budgeting token counts
    over a 100 TB corpus (a real BPE would be a pandas UDF over the same
    partitioning)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_RE), 0))


def stopword_hits(tok: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tok, lambda t: F.array_contains(words, t)))


def lang_id(tok: Column) -> Column:
    """Argmax of stopword hits across languages, ties by list order.

    A real pipeline would plug a fastText-style model in as a pandas UDF;
    the heuristic keeps the operator oracle-checkable.

    NULL tokens (a NULL document) → NULL prediction. Without the guard the
    argmax structs carry NULL hit counts and the comparison silently falls
    through to the tie priority — Spark would emit 'en' while the SQL
    oracle's CASE falls through its ELSE to 'zh' (r8 cold review,
    execution-confirmed latent hash divergence).
    """
    scored = F.array(
        *[
            F.struct(
                stopword_hits(tok, lang).alias("hits"),
                F.lit(-i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(STOPWORDS)
        ]
    )
    return F.when(tok.isNotNull(), F.array_max(scored)["lang"])


def quality_score(
    text_col: str | Column, tok: Column | None = None
) -> Column:
    """Deterministic quality heuristic in exact integer/IEEE arithmetic:
    len_score + stopword_ratio − non_alnum_ratio (all double divisions of
    exact ints — bit-identical cross-engine). Pass ``tok`` to reuse an
    already-materialized token array (see :func:`analyze`)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if tok is None:
        tok = tokens(c)
    n_tok = F.size(tok)
    n_chars = F.length(c)
    n_alnum = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))
    en_words = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(tok, lambda t: F.array_contains(en_words, t)))
    return (
        F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
        + n_stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
        - (n_chars - n_alnum).cast("double")
        / F.greatest(n_chars, F.lit(1)).cast("double")
    )


def fingerprint(tok: Column) -> Column:
    """Polynomial rolling hash of the token sequence (order-sensitive
    document fingerprint): fold h = (h * B + md5int(t)) mod P.

    Exact modular integer arithmetic — identical in any engine.
    """
    return F.aggregate(
        tok,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * FP_BASE + md5_int64(t) % FP_MOD) % FP_MOD,
    )


# PII-shaped patterns for pre-training scrubbing. POSIX-portable (no
# lookarounds, no \d shorthand inconsistencies) so the DuckDB oracle can run
# the byte-identical regex with regexp_replace(..., 'g').
REDACT_PATTERNS = [
    # email
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    # US-ish phone: optional +1 prefix (separator bound to the prefix so a
    # bare number doesn't swallow the preceding space), separators -/./space
    ("(\\+?1[-. ])?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    # SSN
    ("[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    # IPv4
    ("([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
]


def redact(col: str | Column) -> Column:
    """Scrub PII-shaped substrings (emails, phones, SSNs, IPv4) with typed
    placeholder tags — the standard pre-training privacy pass.

    A chain of ``regexp_replace`` column expressions: whole-stage codegen,
    no Python, no shuffle — at 100 TB this runs at scan speed. The listed
    order is safe because the patterns' shapes are mutually exclusive on
    realistic text (email requires '@'+TLD; phone is 3-3-4 digit groups vs
    SSN's 3-2-4; IPv4 requires dots between octets) — each replacement
    cannot consume a prefix another pattern needs. Re-verify that
    invariant when adding a pattern; order alone is not the guarantee.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat, tag in REDACT_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def repetition_ratio(tok: Column) -> Column:
    """Fraction of repeated tokens: ``1 − distinct/total`` (0 = no
    repetition). The cheap tier of Gopher-style repetition filtering —
    high values flag boilerplate/spam for removal before training. Pure
    array expressions; exact integer-ratio arithmetic cross-engine."""
    n = F.size(tok)
    return (
        (n - F.size(F.array_distinct(tok))).cast("double")
        / F.greatest(n, F.lit(1)).cast("double")
    )


def ngrams(tok: Column, n: int) -> Column:
    """All word n-grams of a token array, duplicates kept (unlike
    :func:`shingles`), empty when the document has fewer than ``n``
    tokens (``F.sequence`` counts DOWN for stop < start — guard it)."""
    gram = F.transform(
        F.sequence(F.lit(1), F.size(tok) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok, i + k) for k in range(n)]
        ),
    )
    return F.when(F.size(tok) >= n, gram).otherwise(
        F.array().cast("array<string>")
    )


def _dup_frac(g: Column) -> Column:
    """Repeat fraction of an ALREADY-materialized n-gram array column —
    see :func:`dup_ngram_frac`. Split out so gopher_metrics can build
    each gram array once per row instead of three times (the inline form
    re-evaluated ``ngrams`` for total, distinct and denominator; lambda
    subtrees are not folded by subexpression elimination)."""
    total = F.size(g)
    return (total - F.size(F.array_distinct(g))).cast("double") / F.greatest(
        total, F.lit(1)
    ).cast("double")


def dup_ngram_frac(tok: Column, n: int) -> Column:
    """Fraction of the document's word n-grams that are repeats of an
    earlier n-gram — the Gopher `duplicate n-gram fraction` repetition
    signal. Row-local array arithmetic: zero shuffle, exact integer
    ratio."""
    return _dup_frac(ngrams(tok, n))


#: Gopher-style acceptance thresholds (Rae et al. 2021, "Scaling Language
#: Models: Methods, Analysis & Insights from Training Gopher", table A1 —
#: public paper). Word-count bounds are scaled down to the synthetic
#: corpus; the rule STRUCTURE is the point.
GOPHER_THRESHOLDS = {
    "min_words": 20,
    "max_words": 100_000,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 10.0,
    "min_alpha_word_frac": 0.8,
    "max_dup_2gram_frac": 0.6,
    "max_dup_3gram_frac": 0.5,
    "max_top_word_frac": 0.3,
    "min_stop_hits": 2,
    "max_symbol_word_ratio": 0.1,
}


def gopher_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gopher-style quality metrics + accept flags.

    Plan shape (the 100 TB contract): every metric except the top-word
    share is a pure column projection over the row's own token array —
    whole-stage codegen at scan speed, zero shuffle. The top-word share
    (per-doc mode) genuinely needs a group-by, done the scale-safe way:
    explode → partial-agg on ``(doc, word)`` (map-side combine collapses
    repeats before the exchange) → per-doc max → join back on the unique
    doc id. No collect, no skew (the doc id is in every grouping key).

    Reference scope note: the reference engine has no text-quality surface
    (it is a Kafka streaming library); this operator belongs to the
    LLM-pipeline extension mandated alongside SURVEY.md §2.
    """
    c = F.col(text_col)
    tok = tokens(c)
    en_words = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    base = df.select(
        F.col(id_col),
        # NULL text => every metric and flag NULL (no measurement) — the
        # same contract analyze() pins for lang_id/fingerprint (r8); the
        # gate rides the scan projection, still zero-shuffle
        c.isNull().alias("_nul"),
        tok.alias("_t"),
        n_hash.alias("_nh"),
        n_ellipsis.cast("bigint").alias("_ne"),
    )
    # gram arrays materialized once per row: the inline dup_ngram_frac
    # re-built each n-gram transform three times (total, distinct,
    # denominator) — per-row work, and the heaviest expressions in the
    # projection (plan-verified at r11). A non-cheap multi-referenced
    # alias is not re-inlined by CollapseProject.
    grams = base.select(
        "*",
        ngrams(F.col("_t"), 2).alias("_g2"),
        ngrams(F.col("_t"), 3).alias("_g3"),
    )
    row = grams.select(
        id_col,
        "_nul",
        F.size("_t").alias("n_words"),
        F.aggregate(
            "_t", F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
        ).alias("_char_sum"),
        F.size(F.filter("_t", lambda t: t.rlike("[a-z]"))).alias("_n_alpha"),
        _dup_frac(F.col("_g2")).alias("dup_2gram_frac"),
        _dup_frac(F.col("_g3")).alias("dup_3gram_frac"),
        F.size(
            F.filter("_t", lambda t: F.array_contains(en_words, t))
        ).alias("stop_hits"),
        (F.col("_nh") + F.col("_ne")).alias("_n_sym"),
    )
    mode = (
        base.select(id_col, F.explode("_t").alias("_w"))
        .groupBy(id_col, "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top_n"))
    )
    t = GOPHER_THRESHOLDS
    nw = F.greatest(F.col("n_words"), F.lit(1)).cast("double")
    m = (
        row.join(mode, id_col, "left")
        .withColumn(
            "mean_word_len", F.col("_char_sum").cast("double") / nw
        )
        .withColumn(
            "alpha_word_frac", F.col("_n_alpha").cast("double") / nw
        )
        .withColumn(
            "top_word_frac",
            F.coalesce(F.col("_top_n"), F.lit(0)).cast("double") / nw,
        )
        .withColumn(
            "symbol_word_ratio", F.col("_n_sym").cast("double") / nw
        )
    )
    flags = {
        "ok_word_count": (F.col("n_words") >= t["min_words"])
        & (F.col("n_words") <= t["max_words"]),
        "ok_mean_word_len": (F.col("mean_word_len") >= t["min_mean_word_len"])
        & (F.col("mean_word_len") <= t["max_mean_word_len"]),
        "ok_alpha_words": F.col("alpha_word_frac")
        >= t["min_alpha_word_frac"],
        "ok_dup_2gram": F.col("dup_2gram_frac") <= t["max_dup_2gram_frac"],
        "ok_dup_3gram": F.col("dup_3gram_frac") <= t["max_dup_3gram_frac"],
        "ok_top_word": F.col("top_word_frac") <= t["max_top_word_frac"],
        "ok_stopwords": F.col("stop_hits") >= t["min_stop_hits"],
        "ok_symbols": F.col("symbol_word_ratio")
        <= t["max_symbol_word_ratio"],
    }
    m = m.withColumns(flags)
    accept = None
    for name in flags:
        accept = F.col(name) if accept is None else accept & F.col(name)
    m = m.withColumn("pass_quality", accept)
    out_cols = [
        "n_words", "dup_2gram_frac", "dup_3gram_frac", "stop_hits",
        "mean_word_len", "alpha_word_frac", "top_word_frac",
        "symbol_word_ratio", *flags, "pass_quality",
    ]
    return m.select(
        id_col,
        *[F.when(~F.col("_nul"), F.col(n)).alias(n) for n in out_cols],
    )


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column family.

    The token array is materialized as a REAL intermediate column first:
    inlining ``tokens(text_col)`` into every metric put ~12 copies of the
    ``regexp_extract_all`` into one projection (n_tokens + 5 stopword
    votes + 2 quality terms + the fingerprint fold), and Catalyst's
    subexpression elimination does not fold expressions under lambda
    binders — each copy re-tokenized the document per row (plan-verified
    at r11). Two projections whose shared alias is non-cheap are NOT
    re-collapsed by CollapseProject, so the regex runs once per row.

    The staging column name is picked to not collide with the caller's
    columns (r11 advisory: a caller-owned ``__tok`` was silently
    overwritten by ``withColumn`` and then dropped).
    """
    tok_name = "__tok"
    while tok_name in df.columns:
        tok_name += "_"
    tok = F.col(tok_name)
    return (
        df.withColumn(tok_name, tokens(text_col))
        .withColumns(
            {
                "n_tokens": F.size(tok),
                "lang_pred": lang_id(tok),
                "quality": quality_score(text_col, tok),
                "fingerprint": fingerprint(tok),
            }
        )
        .drop(tok_name)
    )

"""Text analysis for training-data pipelines (beyond-reference surface,
SURVEY.md SS7 phase 5): tokenization, token/char statistics, quality
scoring, language-ID heuristic, document fingerprinting.

All computed with native Spark column expressions (split / transform /
filter / aggregate over arrays) — no Python UDFs, so the whole thing stays
in whole-stage codegen and scales linearly with executors over a 100 TB
document corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Minimal function-word profiles for the language-ID heuristic. A real
#: deployment would ship larger n-gram profiles; the operator shape
#: (per-language hit counts -> deterministic argmax) is the same.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "los", "y", "es", "un"),
    "fr": ("le", "la", "les", "et", "est", "un"),
    "zh": ("的", "了", "是", "在"),
}

#: Stopwords for quality scoring (English function words).
STOPWORDS: tuple[str, ...] = LANG_PROFILES["en"]


def tokens(text: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokenization -> array<string> (empty array for blank).

    One regex pass: split on ``\\s+`` and drop empty fragments.  Leading /
    trailing whitespace (any kind, not just 0x20 — 'a\\n' was the original
    hypothesis-test catch) yields empty strings at the array ends, and a
    blank document yields [''] — both removed by the length filter, so the
    result is identical to trim-then-split but ~3.5x faster at sf0.1
    (6.1 s -> 1.7 s warm on the quality-score plan: the regexp_replace trim
    was a second full regex scan of every document).  The DuckDB twin
    (``_SQL_TOKS`` in __spark_entry__) computes the same array."""
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0)


def token_stats(df: DataFrame, text_col: str = "text", id_cols=("doc_id",)) -> DataFrame:
    """Token counting: total/unique tokens, mean token length, char count.

    Mean = exact integer sum / count -> deterministic double."""
    toks = tokens(text_col)
    uniq = F.array_distinct(toks)
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n = F.size(toks)
    return df.select(
        *id_cols,
        F.length(text_col).cast("long").alias("n_chars_computed"),
        n.cast("long").alias("n_tokens"),
        F.size(uniq).cast("long").alias("n_unique_tokens"),
        F.when(n > 0, total_len.cast("double") / n).otherwise(F.lit(0.0)).alias(
            "mean_token_len"
        ),
    )


#: BPE-ish pre-tokenization regex (letter runs / digit runs / punctuation
#: runs, leading-space tolerant) — the GPT-2-style pre-tokenizer shape in a
#: dialect both Spark and DuckDB regex engines agree on.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-style pre-tokenization: array of letter/digit/punct runs."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    wordlist = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordlist, t)))


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_cols=("doc_id",),
    tokens_col: str | None = None,
) -> DataFrame:
    """Quality scoring: length/stopword/distinct ratios and a composite
    score in [0,1]. Every ratio is one exact integer division -> stable.

    ``tokens_col``: name of a pre-tokenized array<string> column (same
    whitespace ``tokens()`` semantics) — used by composite pipelines that
    share ONE tokenize exchange across stages (ReuseExchange)."""
    toks = F.col(tokens_col) if tokens_col is not None else tokens(text_col)
    n = F.size(toks)
    stop_ratio = F.when(n > 0, _hits(toks, STOPWORDS).cast("double") / n).otherwise(
        F.lit(0.0)
    )
    distinct_ratio = F.when(
        n > 0, F.size(F.array_distinct(toks)).cast("double") / n
    ).otherwise(F.lit(0.0))
    length_score = F.least(n.cast("double") / 100.0, F.lit(1.0))
    score = length_score * (1.0 - stop_ratio) * distinct_ratio

    def q6(x):
        # quantize to 1e-6 via floor(x*1e6 + 0.5) — pure IEEE ops that
        # replay bit-identically on any engine. round() half-up ties
        # differ across engines exactly when the double is a
        # representable .xxxxxx5 (first seen on d_quality_score at
        # sf0.1; NOTES.md exactness recipe #10).
        return F.floor(x * 1e6 + F.lit(0.5)) / 1e6

    return df.select(
        *id_cols,
        n.cast("long").alias("n_tokens"),
        q6(stop_ratio).alias("stopword_ratio"),
        q6(distinct_ratio).alias("distinct_ratio"),
        q6(score).alias("quality_score"),
    )


def language_guess(df: DataFrame, text_col: str = "text", id_cols=("doc_id",)) -> DataFrame:
    """Language-ID heuristic: function-word hit counts per language
    profile, deterministic argmax with fixed priority order (first language
    whose hit count equals the max wins)."""
    toks = tokens(text_col)
    hit_cols = {lang: _hits(toks, words) for lang, words in LANG_PROFILES.items()}
    out = df.select(
        *id_cols,
        *[c.cast("long").alias(f"hits_{lang}") for lang, c in hit_cols.items()],
    )
    langs = list(LANG_PROFILES)
    mx = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    guess = F.lit("und")
    for lang in reversed(langs):  # earlier languages take precedence on ties
        guess = F.when(F.col(f"hits_{lang}") == mx, F.lit(lang)).otherwise(guess)
    return out.withColumn("lang_guess", F.when(mx > 0, guess).otherwise(F.lit("und")))


def kgram_bottomk_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_cols=("doc_id",),
    k: int = 8,
    sketch_size: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprint: hash every character k-gram
    (the values a Rabin-Karp rolling scan produces — computed here
    directly per gram, which parallelizes; "rolling" is a single-threaded
    optimization, not a semantic), then keep the bottom-``sketch_size``
    hashes as the document's fingerprint sketch. Near-identical documents
    share most of their sketch (bottom-k is an unbiased set sketch, the
    winnowing-family trick)."""
    txt = F.lower(F.col(text_col))
    n = F.length(txt)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: txt.substr(i, F.lit(k)),
    )
    hashes = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 12), 16, 10).cast("long")
    )
    sketch = F.slice(F.array_sort(F.array_distinct(hashes)), 1, sketch_size)
    return df.select(
        *id_cols,
        sketch.alias("fingerprint_sketch"),
        F.md5(F.concat_ws(",", sketch.cast("array<string>"))).alias("fingerprint"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_cols=("doc_id",)) -> DataFrame:
    """Document fingerprinting: md5 of the raw text (exact identity) and
    md5 of the sorted unique token set (content identity, robust to token
    order / repetition — the normalize-then-hash trick)."""
    toks = tokens(text_col)
    content_key = F.md5(F.concat_ws("\x1f", F.array_sort(F.array_distinct(toks))))
    return df.select(
        *id_cols,
        F.md5(F.col(text_col)).alias("exact_fingerprint"),
        content_key.alias("content_fingerprint"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Overlapping token-window chunking — the training-data shaping step
    that turns long documents into model-sized pieces.

    Chunk c covers tokens [c*step, c*step + chunk_tokens) with
    step = chunk_tokens - overlap; n_chunks = ceil(max(n - overlap, 1) /
    step); empty documents produce no chunks. Pure per-row array
    expressions (sequence -> transform -> slice -> posexplode): no
    shuffle at all, embarrassingly parallel at any scale, and exactly
    replayable in SQL (the d_doc_chunks oracle).

    Output: (id_col, chunk_idx, n_chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    base = df.select(
        id_col, tokens(text_col).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    nc = f"cast(ceil(greatest(_n - {overlap}, 1) / {step}.0) as bigint)"
    chunks = F.expr(
        f"transform(sequence(0, {nc} - 1),"
        f" c -> slice(_toks, c * {step} + 1, {chunk_tokens}))"
    )
    return (
        base.filter(F.col("_n") > 0)
        .select(id_col, F.posexplode(chunks).alias("chunk_idx", "_chunk"))
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("_chunk").cast("long").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.col("_chunk")).alias("chunk_text"),
        )
    )


def token_ngrams(toks: Column, n: int = 2, sep: str = " ") -> Column:
    """Token n-grams as joined strings: [] when the document has < n
    tokens. Pure array expression (sequence -> transform), no UDF."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                sep, *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_cols=("doc_id",),
    tokens_col: str | None = None,
) -> DataFrame:
    """Gopher-style within-document repetition signals — the quality
    filters large-scale corpus curation applies before training
    (Rae et al. 2021 §A1.1, public paper): duplicate-line fraction and
    the fraction of all token bigrams taken up by the single most
    frequent bigram. Highly repetitive documents (boilerplate, scraped
    listings) score high and get dropped.

    Line metrics are per-row array expressions (linear, shuffle-free).
    The most-frequent-bigram count is explode -> groupBy(id, gram) ->
    per-id (max, sum) — linear and vectorized, NOT a per-row "count each
    distinct gram inside the array" lambda, which is quadratic in
    document length through interpreted higher-order functions
    (measured: 230 s -> ~2 s at sf0.01 on the long-document tail).
    n_bigrams comes from the SAME aggregation (sum of counts), so the
    final join carries only scalar metrics — never the bigram arrays
    (carrying them through the join shuffle measured 79 s at sf0.1).

    Output: (id, n_lines, dup_line_frac, n_bigrams, top_bigram_frac),
    ratios quantized to 1e-6 via floor(x*1e6 + 0.5) (round() half-up
    ties diverge across engines when x*1e6 is a representable
    half-integer, e.g. odd/128 ratios — same fix as quality_score).
    """
    lines = F.filter(
        F.transform(
            F.split(F.col(text_col), "\n"),
            lambda l: F.regexp_replace(l, r"^\s+|\s+$", ""),
        ),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    # a small corpus often arrives as ONE parquet split; spread the
    # per-row-heavy tokenize/ngram map work (playbook: single-file input).
    # With a pre-tokenized column the caller owns partitioning (the
    # minhash_group_rep_pairs convention) and the bigram branch reads
    # the shared token array instead of re-tokenizing.
    if tokens_col is None:
        par = df.sparkSession.sparkContext.defaultParallelism
        src = df.select(*id_cols, text_col).repartition(par, *id_cols)
        toks = tokens(text_col)
    else:
        src = df.select(*id_cols, text_col, tokens_col)
        toks = F.col(tokens_col)
    base = src.select(
        *id_cols,
        n_lines.cast("long").alias("n_lines"),
        (F.floor(dup_line_frac * 1e6 + F.lit(0.5)) / 1e6).alias(
            "dup_line_frac"
        ),
    )
    bi = (
        src.select(
            *id_cols, F.explode(token_ngrams(toks, 2)).alias("gram")
        )
        .groupBy(*id_cols, "gram")
        .agg(F.count("*").alias("_c"))
        .groupBy(*id_cols)
        .agg(
            F.max("_c").cast("long").alias("_top"),
            F.sum("_c").cast("long").alias("_n_bi"),
        )
    )
    n_bi = F.coalesce(F.col("_n_bi"), F.lit(0).cast("long"))
    top_frac = F.when(
        n_bi > 0, F.coalesce(F.col("_top"), F.lit(0)).cast("double") / n_bi
    ).otherwise(F.lit(0.0))
    return base.join(bi, list(id_cols), "left").select(
        *id_cols,
        "n_lines",
        "dup_line_frac",
        n_bi.alias("n_bigrams"),
        (F.floor(top_frac * 1e6 + F.lit(0.5)) / 1e6).alias(
            "top_bigram_frac"
        ),
    )


#: Dialect-safe PII-ish patterns (same semantics in Java regex and RE2):
#: email-shaped tokens and long digit runs (phone/account numbers).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_LONG_NUMBER = r"[0-9]{9,}"


def redact_pii(
    df: DataFrame, text_col: str = "text", id_cols=("doc_id",)
) -> DataFrame:
    """Training-data cleaning: mask email-shaped tokens and long digit
    runs, report per-doc match counts and the md5 of the redacted text
    (compact, comparison-friendly). Pure regexp expressions — codegen'd,
    no shuffle, and the patterns evaluate identically in the DuckDB
    oracle (d_redact_pii). Real pipelines extend the pattern table; the
    operator shape (chained regexp_replace + counts) is the point."""
    emails = F.regexp_replace(F.col(text_col), PII_EMAIL, "<EMAIL>")
    redacted = F.regexp_replace(emails, PII_LONG_NUMBER, "<NUM>")
    return df.select(
        *id_cols,
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_EMAIL), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_LONG_NUMBER), 0))
        .cast("long")
        .alias("n_long_numbers"),
        F.md5(redacted).alias("redacted_md5"),
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_cols=("doc_id",),
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    max_hash_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1
    shape): the classic document-level heuristics a pretraining corpus
    is screened with before any model-based scoring —

    - word count within [min_words, max_words]
    - mean word length within [min_mean_len, max_mean_len]
    - fraction of words containing an alphabetic char >= min_alpha_frac
    - '#' characters per word <= max_hash_ratio
    - fraction of (space-trimmed non-empty) lines starting with a
      bullet ('-' or '*') <= max_bullet_frac
    - fraction of lines ending with an ellipsis ('...') <=
      max_ellipsis_frac

    quality_score is the weighted-signal variant; this is the
    hard-threshold screen (both belong in a curation stack — cf.
    d_curation_pipeline's quality floor).

    One projection pass, no shuffle, everything codegen'd (array
    lambdas over the one tokens()/split result — no second regex scan
    of the document). Every metric is a quotient of exact integer
    counts, so the doubles and every threshold comparison replay
    bit-identically in the DuckDB twin (_GOPHER_SQL). Line metrics are
    NULL for documents with no non-blank line and those rules then
    pass vacuously (only the word rules can fail an empty doc —
    n_words=0 fails the floor). Trim semantics are 0x20-only on both
    engines (Spark/DuckDB ltrim default), so tab-led lines count as
    content in both.

    Output: id_cols + (n_words, mean_word_len, alpha_frac, hash_ratio,
    bullet_frac, ellipsis_frac, pass_gopher).
    """
    toks = tokens(text_col)
    t = F.col(text_col)
    nw = F.size(toks).cast("long")
    nwd = nw.cast("double")
    mean_len = F.when(
        nw > 0,
        F.aggregate(
            F.transform(toks, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).cast("double")
        / nwd,
    )
    alpha_frac = F.when(
        nw > 0,
        F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))).cast("double")
        / nwd,
    )
    hash_ratio = F.when(
        nw > 0,
        (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
        .cast("double")
        / nwd,
    )
    lines = F.filter(
        F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0
    )
    nl = F.size(lines).cast("double")
    bullet_frac = F.when(
        F.size(lines) > 0,
        F.size(
            F.filter(
                lines,
                lambda x: F.substring(F.ltrim(x), 1, 1).isin("-", "*"),
            )
        ).cast("double")
        / nl,
    )
    ellipsis_frac = F.when(
        F.size(lines) > 0,
        F.size(F.filter(lines, lambda x: F.rtrim(x).like("%...")))
        .cast("double")
        / nl,
    )
    ok = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= F.lit(min_mean_len))
        & (F.col("mean_word_len") <= F.lit(max_mean_len))
        & (F.col("alpha_frac") >= F.lit(min_alpha_frac))
        & (F.col("hash_ratio") <= F.lit(max_hash_ratio))
        & F.coalesce(
            F.col("bullet_frac") <= F.lit(max_bullet_frac), F.lit(True)
        )
        & F.coalesce(
            F.col("ellipsis_frac") <= F.lit(max_ellipsis_frac), F.lit(True)
        )
    )
    return df.select(
        *id_cols,
        nw.alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        hash_ratio.alias("hash_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
    ).withColumn("pass_gopher", ok)

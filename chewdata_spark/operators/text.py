"""Text analysis operators for corpus curation (all built-in functions).

Language ID, quality scoring, token counting, fingerprinting — each is
a narrow projection (no shuffle, no UDF) so at 100 TB it pipelines with
the scan and filter pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Tiny per-language marker lists for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "los"],
    "fr": ["le", "les", "des"],
    "de": ["der", "und", "die"],
}

# BPE-ish pre-tokenizer: words / numbers / single punctuation.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document surface statistics."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    n_spaces = n_tokens - 1
    avg_token_len = F.round((n_chars - n_spaces).cast("double") / n_tokens, 6)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^A-Za-z0-9\s]", ""))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        avg_token_len.alias("avg_token_len"),
        F.round(n_punct.cast("double") / n_chars, 6).alias("punct_ratio"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


def _lang_pred_expr(text_col: str) -> Column:
    """Stopword-marker language prediction expression (highest marker-hit
    count wins, deterministic tie-break by language code, 'und' when
    nothing hits).

    Shaped as ONE ``greatest()`` over (score, rank, lang) structs, not a
    nested when-chain: the chain form re-references the running best at
    every level, so the expression tree — and the codegen the filter
    pushdown then duplicates — grows exponentially in the number of
    languages (measured ~5× slower on the curation funnel).  Ranks are
    assigned so that on equal scores the alphabetically-first language
    holds the larger struct."""
    toks = _tokens(F.col(text_col))
    entries = []
    for rank, (lang, markers) in enumerate(sorted(LANG_MARKERS.items(), reverse=True)):
        score = F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        entries.append(
            F.struct(score.alias("s"), F.lit(rank).alias("r"), F.lit(lang).alias("lang"))
        )
    best = F.greatest(*entries)
    return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-marker language heuristic."""
    return df.select(
        F.col(id_col).alias("doc_id"), _lang_pred_expr(text_col).alias("lang_pred")
    )


def _quality_expr(text_col: str) -> Column:
    """Composite 0-1 quality score expression: reasonable length, low
    punctuation density, lexical diversity (weights arbitrary but
    fixed)."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    len_score = F.least(n_chars.cast("double") / 200.0, F.lit(1.0))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^A-Za-z0-9\s]", ""))
    punct_penalty = F.least(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)) * 5.0, F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)).cast("double") / F.greatest(n_tokens, F.lit(1))
    return F.round(0.4 * len_score + 0.3 * (1 - punct_penalty) + 0.3 * diversity, 6)


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composite 0-1 quality score from surface heuristics — a narrow
    all-builtin projection."""
    return df.select(
        F.col(id_col).alias("doc_id"), _quality_expr(text_col).alias("quality")
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace and BPE-ish regex token counts per document."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(_tokens(t)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_PATTERN), 0)).alias("re_tokens"),
    )


# PII redaction patterns: RE2-compatible (no lookarounds) so the exact
# same patterns run in Spark (Java regex) and the DuckDB oracle (RE2).
# Applied in list order; counts are taken on the ORIGINAL text.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
]


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrubbing for training corpora: regex-redact emails, IPv4
    addresses, and international phone numbers to typed placeholders,
    with per-type hit counts for corpus auditing.

    A narrow all-builtin projection (chained ``regexp_replace``) — zero
    shuffle, pipelines with the scan at any scale.  Patterns are a
    pragmatic floor, not an NER system; swap in model-based PII
    detection via ``mapInPandas`` where recall matters more than cost.
    """
    t = F.col(text_col)
    red = t
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(t, F.lit(pat), 0)).alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, repl)
    return df.select(F.col(id_col).alias("doc_id"), red.alias("redacted"), *counts)


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    lang: str = "en",
    min_quality: float = 0.75,
    min_tokens: int = 20,
    max_tokens: int = 5000,
) -> DataFrame:
    """The canonical pretraining filter funnel in ONE pass: language,
    quality score, token-count band, and exact-duplicate removal.

    Every signal is a projection of the row, so a naive composition of
    the standalone operators (four doc_id joins) would pay three
    needless shuffles; here lang/quality/tokens are computed inline and
    the only shuffle is the dedup window over ``md5(text)`` (keep the
    lowest id per signature).  Filters run BEFORE the window, so
    rejected documents never shuffle — at 100 TB the funnel's selectivity
    is the dominant cost lever.
    """
    from pyspark.sql.window import Window

    kept = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        _lang_pred_expr(text_col).alias("lang_pred"),
        _quality_expr(text_col).alias("quality"),
        F.size(_tokens(F.col(text_col))).alias("n_tokens"),
    ).filter(
        (F.col("lang_pred") == lang)
        & (F.col("quality") >= min_quality)
        & F.col("n_tokens").between(min_tokens, max_tokens)
    )
    w = Window.partitionBy(F.md5(F.col("__text"))).orderBy(F.col("doc_id").asc())
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang_pred", "quality", "n_tokens")
    )


def corpus_top_terms(df: DataFrame, text_col: str, *, k: int = 20) -> DataFrame:
    """Corpus-level term frequency: top-k lowercase alphanumeric terms.

    The vocabulary aggregation is the one shuffle (map-side partial
    count per term); the global top-k is ``orderBy(...).limit(k)`` which
    Spark executes as TakeOrdered — each partition keeps only its local
    top-k, no full sort materializes.  Deterministic tie-break
    (count desc, term asc).
    """
    term = F.explode(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")).alias("term")
    return (
        df.select(term)
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(k)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_size: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Overlapping word-window chunks (embedding-prep for long docs).

    chunk i covers words [i*step, i*step + chunk_size) with
    step = chunk_size - overlap; every doc yields ≥1 chunk.  Built from
    sequence/slice + posexplode — no Python; the explode is map-side so
    chunking pipelines with the scan at any corpus size.
    """
    step = chunk_size - overlap
    words = _tokens(F.col(text_col))
    n_chunks = F.greatest(
        F.ceil((F.size(words) - F.lit(overlap)) / F.lit(float(step))).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(words, i * step + 1, chunk_size),
    )
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_words"),
    )
    return ex.select(
        "doc_id",
        "chunk_idx",
        F.array_join("chunk_words", " ").alias("chunk_text"),
        F.size("chunk_words").alias("n_tokens"),
    )


def content_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set — robust to token shuffling, used for fuzzy-exact dedup."""
    toks = F.array_sort(F.array_distinct(_tokens(F.col(text_col))))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.array_join(toks, " ")).alias("fingerprint"),
    )


def strip_boilerplate(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Line-level boilerplate removal for web-scraped corpora: drop
    lines that are too short (< 4 words), mostly punctuation/digits
    (alphabetic share < 50%), or navigation-like (no terminal
    punctuation AND every word capitalized — menu/header shape).

    All higher-order builtin functions over split(text, '\\n') — a
    zero-shuffle projection that pipelines with the scan; the kept-line
    share doubles as a page-quality signal (content_frac).
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def is_content(ln):
        words = F.split(F.trim(ln), r"\s+")
        n_words = F.size(F.filter(words, lambda w: w != F.lit("")))
        n_alpha = F.length(F.regexp_replace(ln, "[^A-Za-z]", ""))
        n_chars = F.greatest(F.length(ln), F.lit(1))
        navish = (~ln.rlike("[.!?]\\s*$")) & (~ln.rlike("(^|\\s)[a-z]"))
        return (
            (n_words >= 4)
            & ((n_alpha / n_chars) >= 0.5)
            & ~navish
        )

    kept = F.filter(lines, is_content)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).cast("int").alias("n_lines"),
        (F.size(lines) - F.size(kept)).cast("int").alias("n_dropped"),
        F.round(F.size(kept) / F.greatest(F.size(lines), F.lit(1)), 6).alias("content_frac"),
    )


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 5, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every word k-gram, slide a
    window of ``w`` consecutive gram hashes, and keep each window's
    minimum hash (rightmost position on ties).  Guarantees at least one
    shared fingerprint for any match of length >= w + k - 1 tokens, at
    ~2/(w+1) the density of full k-gram hashing.

    Plan: one positional-gram pass (codegen), a per-doc rows-following
    MIN window for each window start, then the rightmost-min position
    via a w-fold start->position equi-join (w is a small constant; the
    join reuses the doc partitioning and the duplicate fingerprints
    collapse in the final distinct).  Hashes are md5 strings — the
    lexicographic MIN is engine-portable for the SQL oracle.

    Returns distinct (doc_id, pos, fp): the selected gram's 0-based
    token position and its hash.
    """
    from chewdata_spark.operators.dedup import positional_grams

    grams = positional_grams(df, id_col, text_col, k).select(
        "doc_id", "pos", F.md5("g").alias("h")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    fwd = win.rowsBetween(Window.currentRow, w - 1)
    starts = (
        grams.withColumn("wmin", F.min("h").over(fwd))
        .withColumn("_full", F.lead("pos", w - 1).over(win))
        .filter(F.col("_full").isNotNull() | (F.col("pos") == 0))
        .select("doc_id", F.col("pos").alias("s"), "wmin")
    )
    offsets = starts.withColumn("off", F.explode(F.sequence(F.lit(0), F.lit(w - 1))))
    cand = offsets.withColumn("pos", F.col("s") + F.col("off")).join(
        grams, ["doc_id", "pos"]
    ).filter(F.col("h") == F.col("wmin"))
    return (
        cand.groupBy("doc_id", "s", "wmin")
        .agg(F.max("pos").alias("pos"))
        .select("doc_id", "pos", F.col("wmin").alias("fp"))
        .distinct()
    )


# unicode punctuation -> ASCII fold pairs, applied as chained replace()
# (portable: identical semantics in Spark and any SQL oracle engine)
_PUNCT_FOLD = [
    ("‘", "'"), ("’", "'"), ("“", '"'), ("”", '"'),
    ("–", "-"), ("—", "-"), ("…", "..."), (" ", " "),
]


def normalize_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Canonical text cleanup before hashing/dedup/tokenization:

    1. fold curly quotes / en-em dashes / ellipsis / NBSP to ASCII,
    2. strip C0/C1 control characters (except newline),
    3. collapse horizontal whitespace runs to one space, trim each
       line's edges, drop runs of 3+ blank lines to one empty line.

    A pure zero-shuffle projection of chained replace/regexp_replace —
    pipelines with the scan, composes with every downstream operator.
    Returns (doc_id, norm_text, changed).
    """
    t = F.col(text_col)
    for src, dst in _PUNCT_FOLD:
        t = F.replace(t, F.lit(src), F.lit(dst))
    t = F.regexp_replace(t, "[\\x00-\\x08\\x0b-\\x1f\\x7f]", "")
    t = F.regexp_replace(t, "[ \\t]+", " ")
    t = F.regexp_replace(t, " ?\\n ?", "\n")
    t = F.trim(F.regexp_replace(t, "\\n{3,}", "\n\n"))
    return df.select(
        F.col(id_col).alias("doc_id"),
        t.alias("norm_text"),
        (t != F.col(text_col)).alias("changed"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, *, top_n: int = 3
) -> DataFrame:
    """Top-``top_n`` characteristic terms per document by tf·idf
    (idf = ln(N / df)) — the classic keyword-extraction / relevance
    primitive.

    One corpus explode feeds three branches off the same (doc, term)
    pre-aggregate (tf, document frequency, and the one-row N — the
    ReusedExchange shape proven by unigram_logprob); the per-doc top-n
    is a window over (doc_id), which is the natural fine partition.
    Returns (doc_id, term, score, rk) with deterministic
    (score desc, term asc) ranking.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    doc_term = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # sum(tf > 0), not count(1): the value is the same (tf >= 1 by
    # construction) but the tf reference is not statically removable,
    # so this branch's partial aggregate keeps the same shape as the
    # probe branch — the exchanges canonicalize identically and the
    # corpus explode runs ONCE (ReusedExchange), as pinned by the plan
    # test (plain count(1) let pruning narrow the aggregate → 2 scans)
    docfreq = doc_term.groupBy("term").agg(
        F.sum((F.col("tf") > 0).cast("bigint")).alias("df_n")
    )
    # N from the UNEXPLODED source (one narrow scan, no Generate): a
    # distinct-over-doc_term branch re-aggregates differently and
    # breaks the probe/docfreq exchange reuse
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        doc_term.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("df_n")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_n)
    )


def segment_sentences(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Sentence segmentation: one row per sentence with its 0-based
    index and word count.  The boundary pattern ``[^.!?]+[.!?]*``
    (a run of non-terminators plus its trailing terminators) is chosen
    to be RE2-compatible — no lookbehind — so the SQL oracle evaluates
    the IDENTICAL regex.  A zero-shuffle posexplode projection.

    Returns (doc_id, sent_idx, sentence, n_words), whitespace-trimmed,
    empty segments dropped.
    """
    sents = F.expr(
        f"filter(transform(regexp_extract_all({text_col}, '[^.!?]+[.!?]*', 0), "
        "x -> trim(x)), x -> x != '')"
    )
    ex = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(sents).alias("sent_idx", "sentence")
    )
    return ex.select(
        "doc_id",
        F.col("sent_idx").cast("int").alias("sent_idx"),
        "sentence",
        F.size(F.split(F.col("sentence"), r"\s+")).cast("int").alias("n_words"),
    )


_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _gopher_metric_exprs(text_col: str) -> dict:
    """The seven Gopher document-quality metrics (Rae et al. 2021
    §A1.1) as per-row expressions, each rounded so an oracle replays
    the downstream gate decisions bit-for-bit.  Shared by the batch
    gate relation and the streaming per-row predicate — ONE definition
    so the two surfaces can never drift."""
    t = F.trim(F.col(text_col))
    toks = F.split(F.lower(t), r"\s+")
    n_words = F.size(toks)
    non_ws = F.length(F.regexp_replace(t, r"\s+", ""))
    mean_wl = F.round(non_ws / n_words, 6)
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ell = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    symbol_ratio = F.round((n_hash + n_ell) / n_words, 6)
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    is_bullet = lambda l: (
        F.trim(l).startswith("-")
        | F.trim(l).startswith("•")
        | F.trim(l).startswith("*")
    )
    bullet_frac = F.round(F.size(F.filter(lines, is_bullet)) / n_lines, 6)
    ellipsis_frac = F.round(
        F.size(F.filter(lines, lambda l: F.trim(l).endswith("..."))) / n_lines, 6
    )
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))) / n_words, 6
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
        )
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "symbol_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "n_stopwords": n_stop,
    }


def gopher_quality_gate(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The Gopher document-quality rules (Rae et al. 2021 §A1.1) as ONE
    projection — word-count band, mean word length band, symbol-to-word
    ratio, bullet/ellipsis line fractions, alphabetic-word fraction and
    the required-stopword count, plus the conjunctive ``passed`` gate.

    Zero shuffle: every rule is a per-row expression over the token and
    line arrays (higher-order filters run on short arrays, outside any
    hot join path).  The gate booleans derive from the ROUNDED metrics
    so an oracle reproduces the decision bit-for-bit.
    """
    m = _gopher_metric_exprs(text_col)
    out = df.select(
        F.col(id_col).alias("doc_id"),
        *[expr.alias(name) for name, expr in m.items()],
    )
    passed = (
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("n_stopwords") >= 2)
    )
    return out.withColumn("passed", passed)


def gopher_passed_expr(text_col: str) -> Column:
    """The conjunctive Gopher gate as a single per-row boolean over the
    SAME rounded metric expressions as ``gopher_quality_gate`` — the
    stream-capable form (a streaming relation cannot semi-join against
    a gate relation derived from itself without watermark state; a
    per-row predicate needs none)."""
    m = _gopher_metric_exprs(text_col)
    return (
        m["n_words"].between(50, 100000)
        & m["mean_word_len"].between(3, 10)
        & (m["symbol_ratio"] <= 0.1)
        & (m["bullet_line_frac"] <= 0.9)
        & (m["ellipsis_line_frac"] <= 0.3)
        & (m["alpha_word_frac"] >= 0.8)
        & (m["n_stopwords"] >= 2)
    )


def blocklist_hits(
    df: DataFrame, id_col: str, text_col: str, phrases: list[str]
) -> DataFrame:
    """(doc_id, phrase, n_hits): exact token-sequence blocklist matches
    as an N-GRAM EQUI-JOIN — the scalable form of content filtering
    against a large banned-phrase list (a per-row `contains` scan is
    O(docs x phrases); the join is one shuffle keyed by the n-gram, and
    the phrase relation broadcasts).  Docs explode into word n-grams
    only for the DISTINCT phrase lengths present in the list; matching
    is lowercase whitespace-token sequence equality, never substring."""
    spark = df.sparkSession
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("w"),
    )
    by_len: dict[int, list[str]] = {}
    for p in phrases:
        by_len.setdefault(len(p.split()), []).append(p)

    def gram_fn(n: int):
        # closure factory, NOT a defaulted lambda param: a 2-parameter
        # lambda would be read by F.transform as (element, index)
        return lambda i: F.concat_ws(" ", F.slice("w", i, n))

    legs = []
    for length, ps in sorted(by_len.items()):
        # sequence(1, 0) is DESCENDING in Spark ([1, 0] — step defaults
        # to -1 when start > stop), so docs shorter than the phrase
        # need an explicit empty array, not a clamped upper bound
        starts = F.when(
            F.size("w") >= length,
            F.sequence(F.lit(1), F.size("w") - length + 1),
        ).otherwise(F.array())
        grams = toks.select(
            "doc_id",
            F.explode(F.transform(starts, gram_fn(length))).alias("phrase"),
        )
        rel = spark.createDataFrame([(p,) for p in ps], ["phrase"])
        legs.append(grams.join(F.broadcast(rel), "phrase"))
    hits = legs[0]
    for leg in legs[1:]:
        hits = hits.unionByName(leg)
    return hits.groupBy("doc_id", "phrase").agg(
        F.count(F.lit(1)).cast("int").alias("n_hits")
    )

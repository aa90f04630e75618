"""Corpus tokenization: frequency vocabulary + token-id sequences.

The step between raw text and training batches: build a top-K term
vocabulary from the corpus, then map every document to its ordered
token-id sequence (OOV → unk id).  Composes with
``curation.pack_sequences`` for the full corpus → packed-sequence
pipeline.

Scale shapes:
- vocabulary: one term-keyed aggregation with map-side partials; the
  top-K cut runs as TakeOrdered (per-partition heaps); the id-assigning
  row_number window runs over the ALREADY-CUT K rows — a single
  partition of K, never of the full term space.
- tokenization: position-carrying explode (map-side) + broadcast vocab
  join + one doc-keyed aggregation; sequence order is restored with
  ``array_sort`` over (pos, id) structs and a field extraction — no
  interpreted higher-order lambdas.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chewdata_spark.operators.text import _tokens


def _token_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "term"),
    )


def build_vocab(df: DataFrame, text_col: str, *, top_k: int = 1000) -> DataFrame:
    """Top-K corpus vocabulary ``(term, tid, term_n)`` with dense ids
    0..K-1 assigned by count desc, term asc (deterministic ties)."""
    counts = (
        df.select(F.explode(_tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_n"))
        .orderBy(F.col("term_n").desc(), F.col("term").asc())
        .limit(top_k)
    )
    # unpartitioned window is bounded: it runs AFTER .limit(top_k), so
    # the single partition holds ≤ top_k rows regardless of corpus size
    w = Window.orderBy(F.col("term_n").desc(), F.col("term").asc())
    return counts.select(
        "term", (F.row_number().over(w) - 1).cast("int").alias("tid"), "term_n"
    )


def tokenize_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    *,
    unk_id: int,
) -> DataFrame:
    """Per document: ``(doc_id, n_tokens, token_ids)`` where token_ids
    is the document's terms mapped through ``vocab`` in text order,
    out-of-vocabulary terms mapped to ``unk_id``."""
    toks = _token_rows(df, id_col, text_col)
    mapped = toks.join(F.broadcast(vocab.select("term", "tid")), "term", "left").select(
        "doc_id", "pos", F.coalesce("tid", F.lit(unk_id)).cast("int").alias("tid")
    )
    return (
        mapped.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.array_sort(F.collect_list(F.struct("pos", "tid"))).alias("s"),
        )
        .select("doc_id", "n_tokens", F.col("s").getField("tid").alias("token_ids"))
    )


def zipf_fit(df: DataFrame, text_col: str, *, top_n: int = 10000) -> DataFrame:
    """Zipf-law diagnostic: OLS fit of ln(frequency) on ln(rank) over
    the top-``top_n`` vocabulary — the standard sanity check that a
    scraped corpus has natural-language token statistics (slope ≈ -1)
    rather than generated/boilerplate text.

    Reuses :func:`build_vocab`: the global ordering is bounded by
    TakeOrdered to ``top_n`` rows before any single-partition work, so
    the fit costs one vocab aggregation regardless of corpus size.
    Returns one row ``(n_terms, slope, intercept, r2)``.
    """
    v = build_vocab(df, text_col, top_k=top_n)
    lr, lf = F.log(F.col("tid") + 1), F.log("term_n")
    return v.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(lf, lr), 6).alias("slope"),
        F.round(F.regr_intercept(lf, lr), 6).alias("intercept"),
        F.round(F.regr_r2(lf, lr), 6).alias("r2"),
    )


def bpe_merges(df: DataFrame, text_col: str, *, iters: int = 2) -> DataFrame:
    """Byte-pair-encoding merge training — the first ``iters`` merge
    rules learned from the corpus (the core loop of GPT-2/SentencePiece
    vocabulary construction): repeatedly count adjacent symbol pairs
    (frequency-weighted over the distinct-word vocabulary) and fuse the
    most frequent pair everywhere it occurs, greedily left-to-right.

    Everything past the one corpus token explode runs on the
    VOCAB-grain symbol relation ``(word, freq, pos, sym)`` — bounded by
    vocabulary size, never corpus size — with every window partitioned
    by word.  The only driver-visible value per iteration is the single
    winning pair (``limit(1)`` broadcast back).  Greedy left-to-right
    overlap resolution (aab + (a,a) merges positions 0-1, not 1-2) is
    the gaps-and-islands parity rule: among match positions of a word,
    consecutive runs keep their 1st, 3rd, ... member — overlapping
    matches only exist when left == right, and then alternation IS the
    greedy answer.  Symbol chars come from codepoint-safe
    ``substring`` (not code-unit regex splits), so multilingual text
    agrees with any engine.  Returns
    ``(merge_rank, lhs, rhs, pair_count)``, one row per merge.
    """
    merges, _ = _bpe_loop(_bpe_words(df, text_col), iters)
    out = merges[0]
    for t in merges[1:]:
        out = out.unionByName(t)
    return out


def _bpe_words(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(_tokens(F.col(text_col))).alias("word"))
        # empty-string tokens (from empty docs) would make
        # sequence(1, 0) DESCEND ([1, 0]) instead of being empty
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _bpe_loop(
    words: DataFrame, iters: int
) -> tuple[list[DataFrame], DataFrame]:
    """The BPE merge loop over the vocab-grain symbol relation.
    Returns (one single-row merge DataFrame per iteration, final symbol
    relation) — the final relation IS the trained word→segmentation
    dictionary :func:`bpe_encode_corpus` applies."""
    cur = words.select(
        "word",
        "freq",
        F.posexplode(
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        ).alias("pos", "sym"),
    )
    win = Window.partitionBy("word").orderBy("pos")
    merges = []
    for it in range(iters):
        # truncate per-iteration lineage: the symbol relation feeds the
        # pair counts, the match windows AND the next iteration (and,
        # for encode, the final segmentation join) — without the lazy
        # checkpoint every consumer replays all prior iterations
        # (measured 3.9 → ~2 s for bpe_encode_documents at sf0.1).
        # Skip iteration 0: the fresh explode is one narrow stage whose
        # recomputation is cheaper than materializing the full
        # char-grain relation (checkpointing it cost bpe_merge_rules
        # 0.38 → 1.00 s at sf0.1)
        if it > 0:
            cur = cur.localCheckpoint(eager=False)
        paired = cur.withColumn("nxt", F.lead("sym").over(win))
        counts = (
            paired.filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("freq").alias("pair_count"))
        )
        top = (
            counts.orderBy(
                F.col("pair_count").desc(), F.col("sym").asc(), F.col("nxt").asc()
            )
            .limit(1)
            .select(
                F.lit(it + 1).alias("merge_rank"),
                F.col("sym").alias("_L"),
                F.col("nxt").alias("_R"),
                "pair_count",
            )
        )
        merges.append(
            top.select(
                "merge_rank",
                F.col("_L").alias("lhs"),
                F.col("_R").alias("rhs"),
                "pair_count",
            )
        )
        m = paired.crossJoin(F.broadcast(top.select("_L", "_R"))).withColumn(
            "_match", (F.col("sym") == F.col("_L")) & (F.col("nxt") == F.col("_R"))
        )
        matches = m.filter("_match").select("word", "pos")
        isl = matches.withColumn("_rn", F.row_number().over(win)).withColumn(
            "_isl", F.col("pos") - F.col("_rn")
        )
        wi = Window.partitionBy("word", "_isl").orderBy("pos")
        starts = (
            isl.withColumn("_k", F.row_number().over(wi))
            .filter(F.col("_k") % 2 == 1)
            .select("word", "pos")
        )
        marks = starts.select("word", "pos", F.lit(1).alias("_mk")).union(
            starts.select("word", (F.col("pos") + 1).alias("pos"), F.lit(2).alias("_mk"))
        )
        survivors = (
            m.join(marks, ["word", "pos"], "left")
            .filter(F.col("_mk").isNull() | (F.col("_mk") == 1))
            .select(
                "word",
                "freq",
                "pos",
                F.when(
                    F.col("_mk") == 1, F.concat(F.col("_L"), F.col("_R"))
                ).otherwise(F.col("sym")).alias("sym"),
            )
        )
        cur = survivors.select(
            "word", "freq", F.row_number().over(win).alias("pos"), "sym"
        )
    return merges, cur


def bpe_encode_corpus(
    df: DataFrame, id_col: str, text_col: str, *, iters: int = 2
) -> DataFrame:
    """Apply BPE to the corpus: train ``iters`` merges
    (:func:`bpe_merges`' loop), then re-segment every document under
    the trained rules — the tokenizer-application half of the BPE
    pipeline (GPT-2/SentencePiece encode).

    Scale shape: training stays on the VOCAB-grain symbol relation;
    the final relation is exactly the word → piece-sequence dictionary,
    so encoding is ONE corpus token explode + ONE join on word + ONE
    doc-keyed reassembly — the corpus text is never re-walked by the
    merge machinery.  Documents with no non-empty tokens drop (inner
    join), mirroring the trainer's vocabulary domain.  Pieces are
    emitted as a canonical space-joined string (driver-sortable; the
    oracle string_aggs identically).  Returns
    ``(doc_id, n_pieces, pieces)``.
    """
    _, segmented = _bpe_loop(_bpe_words(df, text_col), iters)
    segs = segmented.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_word_pieces"),
        F.concat_ws(
            " ", F.array_sort(F.collect_list(F.struct("pos", "sym"))).getField("sym")
        ).alias("seg"),
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "word"),
    ).filter(F.length("word") > 0)
    return (
        toks.join(segs, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_word_pieces").cast("int").alias("n_pieces"),
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("pos", "seg"))).getField("seg")
            ).alias("pieces"),
        )
    )


def _fuse_pass(syms: list, lhs: str, rhs: str) -> list:
    """One greedy left-to-right application of merge rule (lhs, rhs)
    over a symbol list — the scan form of :func:`bpe_merges`' parity
    rule (on a run of overlapping matches, fusing and skipping two
    symbols keeps exactly the 1st, 3rd, ... matches)."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_merges_py(
    word_freqs: list[tuple[str, int]], iters: int
) -> list[tuple[int, str, str, int]]:
    """The BPE merge loop in plain Python over an in-memory word-count
    table: per round, frequency-weighted adjacent-pair counts, argmax
    by (count DESC, lhs ASC, rhs ASC) — byte-identical to the
    distributed loop's and the DuckDB oracle's ORDER BY — then the
    greedy left-to-right fuse.  Stops early when no pairs remain
    (every word a single symbol).  Returns
    ``[(merge_rank, lhs, rhs, pair_count)]``."""
    segs = [(list(w), f) for w, f in word_freqs if w]
    rules: list[tuple[int, str, str, int]] = []
    for rank in range(1, iters + 1):
        counts: dict[tuple[str, str], int] = {}
        for s, f in segs:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (lhs, rhs), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        rules.append((rank, lhs, rhs, c))
        segs = [(_fuse_pass(s, lhs, rhs), f) for s, f in segs]
    return rules


def bpe_train_rules(
    df: DataFrame,
    text_col: str,
    *,
    iters: int,
    max_train_vocab: int = 1 << 20,
) -> list[tuple[int, str, str, int]]:
    """Scalable BPE merge training: the WORD COUNT is distributed (the
    only corpus-sized pass), the merge loop runs driver-side over the
    aggregated vocabulary — how production tokenizer trainers
    (SentencePiece, HuggingFace tokenizers) actually work, because the
    loop's input is vocabulary-bounded, never corpus-bounded.  At
    100 TB the vocabulary can still be huge (junk strings), so it is
    capped to the ``max_train_vocab`` most frequent words by
    (freq DESC, word ASC) — a bounded, deterministic driver payload
    (same contract as the k-means centroid collect); the default 1M
    cap covers >99.9% of token mass on natural corpora.  Encoding
    (:func:`bpe_encode_corpus_rules`) still applies the trained rules
    to EVERY word, in or out of cap.

    Contrast :func:`bpe_merges`: that keeps even the merge loop
    distributed (vocab-grain shuffles per round) — the right choice
    for a handful of demonstration merges, but 64+ sequential rounds
    of shuffle latency (and a 64-deep Catalyst plan) lose to one
    bounded collect.  Both trainers implement the identical algorithm
    and are equivalence-tested against each other."""
    rows = (
        _bpe_words(df, text_col)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_train_vocab)
        .collect()
    )
    return _train_merges_py([(r["word"], r["freq"]) for r in rows], iters)


def bpe_encode_corpus_rules(
    df: DataFrame, id_col: str, text_col: str, rules: list
) -> DataFrame:
    """Re-segment every document under an already-trained ordered merge
    list: a VOCAB-grain Arrow UDF applies the rules per distinct word
    (rule k applied globally before rule k+1 ≡ rules applied per word
    in rank order — words evolve independently), then ONE join on word
    and ONE doc-keyed reassembly, exactly :func:`bpe_encode_corpus`'s
    encode half.  The Python loop runs over DISTINCT WORDS (bounded by
    vocabulary), never corpus positions, so the UDF is off the
    corpus-sized hot path.  Returns ``(doc_id, n_pieces, pieces)``."""
    ordered = [(lhs, rhs) for _rank, lhs, rhs, *_ in rules]

    @F.pandas_udf("string")
    def _seg(words: pd.Series) -> pd.Series:
        def enc(w: str) -> str:
            s = list(w)
            for lhs, rhs in ordered:
                s = _fuse_pass(s, lhs, rhs)
            return " ".join(s)

        return words.map(enc)

    segs = (
        _bpe_words(df, text_col)
        .select("word", _seg("word").alias("seg"))
        .withColumn("n_word_pieces", F.size(F.split("seg", " ")))
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "word"),
    ).filter(F.length("word") > 0)
    return (
        toks.join(segs, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_word_pieces").cast("int").alias("n_pieces"),
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("pos", "seg"))).getField("seg")
            ).alias("pieces"),
        )
    )


def bpe_pieces_of_tokens_udf(rules: list):
    """Arrow UDF ``array<string> tokens -> array<string> pieces``:
    applies an already-trained ordered merge list to each token and
    flattens — the DOC-grain encoder for STREAMING sides, where the
    map-only per-row shape matters more than vocab-grain dedup
    (:func:`bpe_encode_corpus_rules` is the batch path; its vocab
    aggregation would be a second stateful operator in a stream).
    Tokenization stays ENGINE-SIDE (the caller splits with the shared
    ``_tokens`` expression) so both paths tokenize identically; a
    per-batch word cache amortizes repeated tokens.  Piece output is
    byte-identical to the batch encoder's — rank-ordered rule
    application per token (tested)."""
    ordered = [(lhs, rhs) for _rank, lhs, rhs, *_ in rules]

    @F.pandas_udf("array<string>")
    def _enc(toks: pd.Series) -> pd.Series:
        cache: dict = {}

        def enc_word(w: str) -> list:
            got = cache.get(w)
            if got is None:
                s = list(w)
                for lhs, rhs in ordered:
                    s = _fuse_pass(s, lhs, rhs)
                cache[w] = got = s
            return got

        def enc(words) -> list:
            out: list = []
            for w in words if words is not None else ():
                if w:
                    out.extend(enc_word(w))
            return out

        return toks.map(enc)

    return _enc


def _lp_micro(p: Column) -> Column:
    """ln(p) as BIGINT micro-units: 6-dp round, scale, integer round,
    THEN cast — after ROUND(x*1e6, 0) the double is integral, so the
    cast is exact in both Spark (truncating) and DuckDB (rounding).
    The same device as the IVF-PQ ADC sums: integer path scores make
    the Viterbi argmax order-independent and engine-portable."""
    return F.round(F.round(F.log(p), 6) * 1000000.0, 0).cast("bigint")


def unigram_lm_train(
    df: DataFrame,
    text_col: str,
    *,
    max_word_len: int = 10,
    max_piece_len: int = 4,
    seed_multi: int = 200,
    em_iters: int = 2,
) -> DataFrame:
    """Unigram-LM tokenizer training (SentencePiece-style, Kudo 2018)
    — the OTHER half of the production tokenizer story beside
    :func:`bpe_merges`: seed a subword vocabulary from corpus substring
    counts, then run fixed hard-EM (Viterbi) iterations where the
    E-step segments every word optimally under the current piece
    log-probs and the M-step re-estimates piece probabilities from the
    chosen segmentations (add-1 smoothed so the piece set stays fixed
    and deterministic).

    Determinism devices (all established in this repo): piece
    log-probs become BIGINT micro-units (:func:`_lp_micro`) so path
    scores are exact integer sums; Viterbi ties break on the
    lexicographically smallest piece string, which IS dynamic-
    programming-decomposable here (two same-position prefixes always
    first differ at a space-vs-letter index that survives any suffix
    concatenation); expected counts are integer word-frequency sums.

    Scale shape: everything past one corpus token explode runs on the
    length-capped DISTINCT-WORD relation (vocab grain, never corpus
    grain).  The Viterbi DP over one word is LOCAL, so each E-step is
    a single shuffle: edges join the broadcast vocabulary, collapse to
    one map row per word (``(start*16+len) → (lp, piece)``), and the
    whole position DP runs inside ONE SQL ``aggregate`` expression —
    no per-position joins, no window over anything unbounded.  The
    vocabulary (all single chars + top-``seed_multi`` multi-char
    substrings) rides broadcasts.  The DuckDB oracle replays the SAME
    answer by brute-force path enumeration (recursive CTE) + argmax —
    DP vs transparent enumeration, the verification-twin pattern.
    Word-length cap mirrors SentencePiece's own
    max-sentencepiece-length pruning.

    Returns one row per vocabulary piece:
    ``(piece, piece_len, em_count, prob)`` — final hard counts and the
    add-1-smoothed probability after ``em_iters`` EM rounds.
    """
    spark_words = (
        _bpe_words(df, text_col)
        .filter(F.length("word") <= max_word_len)
        .localCheckpoint(eager=False)
    )
    w_all = Window.partitionBy()

    # --- seed vocabulary: substring counts over the word inventory
    pair_expr = F.expr(
        f"""flatten(transform(sequence(1, length(word)),
              i -> transform(sequence(1, least({max_piece_len}, length(word) - i + 1)),
                   l -> struct(i AS i, l AS l))))"""
    )
    subs = spark_words.select("word", "freq", F.explode(pair_expr).alias("e")).select(
        "freq", F.expr("substring(word, e.i, e.l)").alias("piece")
    )
    seed = subs.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    chars = seed.filter(F.length("piece") == 1)
    multi = (
        seed.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(seed_multi)
    )
    vocab = (
        chars.unionByName(multi)
        .select(
            "piece",
            _lp_micro(
                F.col("cnt").cast("double") / F.sum("cnt").over(w_all).cast("double")
            ).alias("lp"),
        )
        .localCheckpoint(eager=False)
    )

    # --- DP edge relation: (word, freq, k, piece) for every in-word
    # substring up to max_piece_len, keyed k = start0*16 + len (unique
    # per word while max_piece_len < 16); joined per EM round with the
    # current vocab log-probs (broadcast) and collapsed to ONE map row
    # per word for the local Viterbi expression.
    assert max_piece_len < 16
    edges = (
        spark_words.select("word", "freq", F.explode(pair_expr).alias("e"))
        .select(
            "word",
            "freq",
            ((F.col("e.i") - 1) * 16 + F.col("e.l")).alias("k"),
            F.expr("substring(word, e.i, e.l)").alias("piece"),
        )
        .localCheckpoint(eager=False)
    )

    # The whole per-word Viterbi runs inside one aggregate() over
    # positions 1..len(word): state j is struct(ns = -score_micro, seg);
    # candidates at j are the ≤max_piece_len vocab edges ending there;
    # array_min picks (max score, then lexicographically smallest seg).
    # A single-char edge always exists (every char of every capped word
    # is seeded), so the candidate list is never empty.
    dp_expr = f"""
        element_at(
          aggregate(
            sequence(1, length(word)),
            array(named_struct('ns', CAST(0 AS BIGINT), 'seg', '')),
            (acc, j) -> acc || array(
              array_min(
                filter(
                  transform(sequence(1, least({max_piece_len}, j)),
                    l -> if(isnotnull(try_element_at(em, (j - l) * 16 + l)),
                            named_struct(
                              'ns', element_at(acc, j - l + 1).ns
                                    - try_element_at(em, (j - l) * 16 + l).lp,
                              'seg', if(element_at(acc, j - l + 1).seg = '',
                                        try_element_at(em, (j - l) * 16 + l).piece,
                                        concat(element_at(acc, j - l + 1).seg, ' ',
                                               try_element_at(em, (j - l) * 16 + l).piece))),
                            cast(null as struct<ns: bigint, seg: string>))),
                  x -> isnotnull(x))))),
          length(word) + 1).seg
    """

    for _ in range(em_iters):
        ve = edges.join(F.broadcast(vocab.select("piece", "lp")), "piece").select(
            "word",
            "freq",
            "k",
            F.struct(F.col("lp").alias("lp"), F.col("piece").alias("piece")).alias("v"),
        )
        segs = (
            ve.groupBy("word", "freq")
            .agg(F.map_from_entries(F.collect_list(F.struct("k", "v"))).alias("em"))
            .select("freq", F.expr(dp_expr).alias("seg"))
        )
        cnts = (
            segs.select("freq", F.explode(F.split("seg", " ")).alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").alias("em_count"))
        )
        vocab = (
            vocab.select("piece")
            .join(cnts, "piece", "left")
            .select("piece", F.coalesce("em_count", F.lit(0)).cast("bigint").alias("em_count"))
            .select(
                "piece",
                "em_count",
                (
                    (F.col("em_count") + 1.0)
                    / (
                        F.sum("em_count").over(w_all).cast("double")
                        + F.count(F.lit(1)).over(w_all).cast("double")
                    )
                ).alias("p"),
            )
            .select("piece", "em_count", "p", _lp_micro(F.col("p")).alias("lp"))
            .localCheckpoint(eager=False)
        )

    return vocab.select(
        "piece",
        F.length("piece").cast("int").alias("piece_len"),
        "em_count",
        F.round("p", 6).alias("prob"),
    )


def wordpiece_segments(
    df: DataFrame,
    text_col: str,
    *,
    max_word_len: int = 10,
    max_piece_len: int = 4,
    seed_multi: int = 200,
    top_words: int = 150,
) -> DataFrame:
    """WordPiece-style greedy longest-match-first segmentation (maximal
    munch — the BERT tokenizer's INFERENCE rule, Wu et al. 2016) of the
    ``top_words`` most frequent words under the same seed vocabulary as
    :func:`unigram_lm_train` (all single chars + top-``seed_multi``
    multi-char substrings by corpus frequency).

    Completes the tokenizer trio beside BPE training
    (:func:`bpe_merges`) and unigram-LM Viterbi: three segmenters, one
    vocab-grain cost model.  Greedy matching is a strictly sequential
    left-to-right scan, but only WITHIN one word: the whole scan runs
    as ONE ``aggregate()`` expression over char positions (the skip
    device: the fold visits every position, acts only when it equals
    the cursor), with the vocabulary riding a broadcast array.  The
    word relation is the length-capped distinct-word inventory — vocab
    grain, never corpus grain — so 100 TB costs one token explode plus
    work proportional to distinct words.

    Returns ``(word, freq, wp_pieces, n_pieces)`` for the top words by
    (freq desc, word asc).  Exactly SQL-replayable: the DuckDB oracle
    walks the same CASE longest-match in a recursive CTE.
    """
    words = _bpe_words(df, text_col).filter(F.length("word") <= max_word_len)

    pair_expr = F.expr(
        f"""flatten(transform(sequence(1, length(word)),
              i -> transform(sequence(1, least({max_piece_len}, length(word) - i + 1)),
                   l -> struct(i AS i, l AS l))))"""
    )
    subs = words.select("word", "freq", F.explode(pair_expr).alias("e")).select(
        "freq", F.expr("substring(word, e.i, e.l)").alias("piece")
    )
    seed = subs.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    chars = seed.filter(F.length("piece") == 1)
    multi = (
        seed.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(seed_multi)
    )
    vocab_arr = (
        chars.unionByName(multi)
        .agg(F.sort_array(F.collect_list("piece")).alias("varr"))
    )

    top = words.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(top_words)
    enc = top.crossJoin(F.broadcast(vocab_arr))

    # longest-match CASE at the cursor (substring past the end returns
    # the remainder, so a short tail matches in an earlier branch and
    # still advances by its true length)
    match_case = " ".join(
        f"WHEN array_contains(varr, substring(word, acc.pos, {l})) "
        f"THEN substring(word, acc.pos, {l})"
        for l in range(max_piece_len, 1, -1)
    )
    # max_piece_len=1 would leave match_case empty and 'CASE  ELSE .. END'
    # is invalid SQL (CASE needs >= 1 WHEN) — degenerate to the
    # single-char ELSE expression directly
    piece = (
        f"(CASE {match_case} ELSE substring(word, acc.pos, 1) END)"
        if match_case
        else "substring(word, acc.pos, 1)"
    )
    fold = f"""
        aggregate(
          sequence(1, length(word)),
          named_struct('pos', 1, 'seg', ''),
          (acc, i) -> if(i != acc.pos, acc,
            named_struct(
              'pos', acc.pos + length({piece}),
              'seg', if(acc.seg = '', {piece},
                        concat(acc.seg, ' ', {piece}))))
        ).seg
    """
    return enc.select(
        "word",
        "freq",
        F.expr(fold).alias("wp_pieces"),
    ).withColumn("n_pieces", F.size(F.split("wp_pieces", " ")).cast("int"))

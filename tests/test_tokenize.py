"""Operator tests for vocabulary build + tokenization (the oracle sweep
covers the corpus queries; these pin id assignment, OOV, ordering, and
the compose-with-packing path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chewdata_spark.operators.curation import pack_sequences
from chewdata_spark.operators.tokenize import build_vocab, tokenize_corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_ids_by_count_then_term(spark):
    df = _docs(spark, [(1, "b b b a a c"), (2, "a z")])
    vocab = {r.term: (r.tid, r.term_n) for r in build_vocab(df, "text", top_k=3).collect()}
    # a:3, b:3 tie → term asc; c and z tied at 1 → c wins the K=3 cut
    assert vocab == {"a": (0, 3), "b": (1, 3), "c": (2, 1)}


def test_tokenize_preserves_order_and_unks(spark):
    df = _docs(spark, [(1, "b a zz b")])
    vocab = build_vocab(df, "text", top_k=2)  # keeps b(0), a(1); zz is OOV
    out = tokenize_corpus(df, "doc_id", "text", vocab, unk_id=99).collect()[0]
    assert out.n_tokens == 4
    assert out.token_ids == [0, 1, 99, 0]


def test_tokenize_feeds_pack_sequences(spark):
    rows = [(i, "w " * 5) for i in range(10)]
    df = _docs(spark, rows)
    vocab = build_vocab(df, "text", top_k=10)
    toks = tokenize_corpus(df, "doc_id", "text", vocab, unk_id=10)
    packed = pack_sequences(toks, "doc_id", F.col("n_tokens"), seq_len=8)
    got = {r.doc_id: r for r in packed.collect()}
    assert got[0].start_offset == 0 and got[9].start_offset == 45
    # 50 tokens / 8 per seq → last doc ends in seq 6
    assert got[9].last_seq == 6


def test_bpe_merges_greedy_parity(spark):
    """aaaa + rule (a,a) must merge greedily left-to-right into
    aa|aa (two pairs), never the overlapping middle; second iteration
    then fuses (aa,aa)."""
    from chewdata_spark.operators.tokenize import bpe_merges

    df = spark.createDataFrame([("aaaa aaaa b",)], ["text"])
    rules = {r.merge_rank: r for r in bpe_merges(df, "text", iters=2).collect()}
    assert (rules[1].lhs, rules[1].rhs) == ("a", "a")
    # pair_count is the PRE-merge adjacency count: "aaaa" has 3 (a,a)
    # adjacencies and occurs with freq 2 -> 6
    assert rules[1].pair_count == 6
    assert (rules[2].lhs, rules[2].rhs) == ("aa", "aa")
    assert rules[2].pair_count == 2


def test_bpe_merges_distinct_pair_no_overlap(spark):
    from chewdata_spark.operators.tokenize import bpe_merges

    df = spark.createDataFrame([("abab abab",)], ["text"])
    rules = {r.merge_rank: r for r in bpe_merges(df, "text", iters=2).collect()}
    # "abab" (freq 2): (a,b) x2 adjacencies beats (b,a) x1 -> count 4
    assert (rules[1].lhs, rules[1].rhs) == ("a", "b") and rules[1].pair_count == 4
    # after merge: [ab, ab] -> (ab, ab) count 2
    assert (rules[2].lhs, rules[2].rhs) == ("ab", "ab") and rules[2].pair_count == 2


def _ref_bpe(words_freq, iters):
    """Pure-Python reference BPE (greedy left-to-right merges)."""
    seqs = {w: list(w) for w in words_freq}
    rules = []
    for it in range(iters):
        counts: dict = {}
        for w, f in words_freq.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (L, R), c = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        rules.append((it + 1, L, R, c))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == L and s[i + 1] == R:
                    out.append(L + R)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return rules


import pytest as _pt


@_pt.mark.parametrize(
    "corpus",
    [
        "aaaa aaaa b",
        "abab abab baba",
        "the theme there then the the",
        "xxxx xxx xx x",
        "héllo héllo wörld wörld wörld",
        "ab ab ab ba ba ba",  # count tie -> lexicographic rule pick
        "mississippi mississippi miss",
        "aa aaa aaaa aaaaa",
    ],
)
def test_bpe_matches_python_reference(spark, corpus):
    from collections import Counter

    from chewdata_spark.operators.tokenize import bpe_merges

    df = spark.createDataFrame([(corpus,)], ["text"])
    got = sorted(
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_merges(df, "text", iters=2).collect()
    )
    want = sorted(_ref_bpe(Counter(corpus.lower().split()), 2))
    assert got == want, (got, want)


def test_bpe_driver_trainer_equals_distributed_loop(spark, sf_dir):
    # bpe_train_rules (driver loop over the collected word-count
    # table) and bpe_merges (distributed vocab-grain loop) implement
    # the same algorithm with the same tie-break — rules must be
    # byte-identical on real data, deep enough to pass several
    # tie-broken rounds
    from chewdata_spark.operators.tokenize import bpe_merges, bpe_train_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dist = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_merges(docs, "text", iters=8).orderBy("merge_rank").collect()
    ]
    assert dist == bpe_train_rules(docs, "text", iters=8)


def test_bpe_rules_encode_equals_distributed_encode(spark, sf_dir):
    # per-word rank-ordered rule application (vocab-grain Arrow UDF)
    # must reproduce the distributed training loop's final
    # segmentation exactly — same pieces, same counts, same doc set
    from chewdata_spark.operators.tokenize import (
        bpe_encode_corpus,
        bpe_encode_corpus_rules,
        bpe_train_rules,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {
        r.doc_id: (r.n_pieces, r.pieces)
        for r in bpe_encode_corpus(docs, "doc_id", "text", iters=4).collect()
    }
    rules = bpe_train_rules(docs, "text", iters=4)
    b = {
        r.doc_id: (r.n_pieces, r.pieces)
        for r in bpe_encode_corpus_rules(docs, "doc_id", "text", rules).collect()
    }
    assert a == b and len(a) > 0


def test_bpe_trainer_stops_when_vocabulary_exhausts(spark):
    # asking for more merges than the symbol relation can yield must
    # return only the feasible prefix (every word fused to one piece),
    # mirroring the oracle chain's empty-t{i} pass-through
    from chewdata_spark.operators.tokenize import (
        bpe_encode_corpus_rules,
        bpe_train_rules,
    )

    df = spark.createDataFrame([(1, "ab ab cd")], ["doc_id", "text"])
    rules = bpe_train_rules(df, "text", iters=50)
    assert 0 < len(rules) < 50
    enc = bpe_encode_corpus_rules(df, "doc_id", "text", rules).collect()[0]
    assert enc.pieces == "ab ab cd" and enc.n_pieces == 3


def test_fim_lengths_partition_the_document(spark):
    # the three segments must tile the doc exactly (no char lost or
    # duplicated), and untouched docs must hash to their raw text
    from pyspark.sql import functions as F

    from chewdata_spark.queries.tokenize_queries import fim_transform_documents
    from chewdata_spark.tables import load_table

    out = fim_transform_documents(spark, "/root/testdata/sf0.001")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id",
        F.length(F.coalesce("text", F.lit(""))).alias("ln"),
        F.md5(F.coalesce("text", F.lit(""))).alias("raw_hash"),
    )
    j = out.join(docs, "doc_id").collect()
    assert len(j) == 500
    n_applied = 0
    for r in j:
        assert r.prefix_len + r.middle_len + r.suffix_len == r.ln, r
        if r.fim_applied:
            n_applied += 1
            assert r.middle_len >= 1  # s2 > s1 by construction
            assert r.out_hash != r.raw_hash
        else:
            assert r.out_hash == r.raw_hash
    # the 50% coin actually engages on this corpus
    assert 0.3 < n_applied / len(j) < 0.7


def test_wordpiece_greedy_maximal_munch(spark):
    """Greedy longest-match: with 'abcd' ranked into the seed vocab the
    word 'abcdz' MUST segment as 'abcd z' (munch 4) even though
    shorter-piece segmentations exist; unseen tail chars fall back to
    single-char pieces."""
    from chewdata_spark.operators.tokenize import wordpiece_segments

    # make 'abcd' (and its sub-pieces) frequent enough to enter the
    # top-200 multi-char seed: repeat the word many times
    docs = spark.createDataFrame(
        [(i, "abcdz " * 3) for i in range(10)], ["doc_id", "text"]
    )
    out = {r.word: (r.wp_pieces, r.n_pieces)
           for r in wordpiece_segments(docs, "text").collect()}
    assert out["abcdz"] == ("abcd z", 2)


def test_stream_piece_encoder_equals_batch_encoder(spark, sf_dir):
    # the map-only Arrow encoder (streaming side) must produce the
    # batch encoder's piece stream byte-for-byte: same tokenization
    # (engine-side split), same rank-ordered rule application
    import pyspark.sql.functions as F

    from chewdata_spark.operators.text import _tokens
    from chewdata_spark.operators.tokenize import (
        bpe_encode_corpus_rules,
        bpe_pieces_of_tokens_udf,
        bpe_train_rules,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rules = bpe_train_rules(docs, "text", iters=16)
    batch = {
        r.doc_id: r.pieces
        for r in bpe_encode_corpus_rules(docs, "doc_id", "text", rules).collect()
    }
    enc = bpe_pieces_of_tokens_udf(rules)
    stream_shape = (
        docs.select(
            "doc_id",
            F.filter(_tokens(F.col("text")), lambda w: F.length(w) > 0).alias("_w"),
        )
        .filter(F.size("_w") >= 1)
        .select("doc_id", F.array_join(enc("_w"), " ").alias("pieces"))
    )
    got = {r.doc_id: r.pieces for r in stream_shape.collect()}
    assert got == batch and len(got) > 0


def test_bpe_vocab_cap_binds_identically_in_both_engines(spark):
    # the max_train_vocab cap path never binds at test SFs (31-word
    # vocab vs a 1M cap) — plant a corpus where it DOES: cap=3 of 6
    # words.  The Spark trainer must train only on the top-3 words by
    # (freq DESC, word ASC) yet still encode all 6; the oracle's
    # capped-words device (top-cap trains, rest re-enter at freq 0)
    # must reproduce the exact same piece streams.  Also pin that the
    # cap CHANGES the rules vs uncapped (i.e. the planted cap binds).
    import duckdb

    from chewdata_spark.operators.tokenize import (
        bpe_encode_corpus_rules,
        bpe_train_rules,
    )
    from chewdata_spark.queries.bpe_sql import (
        _bpe_piece_stream_sql,
        _bpe_seg_ctes,
    )

    text = "zebra zebra zebra zebra yak yak yak xij xij wolf vole umbra"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    capped = bpe_train_rules(docs, "text", iters=4, max_train_vocab=3)
    uncapped = bpe_train_rules(docs, "text", iters=4)
    assert capped != uncapped, "planted cap did not bind"
    got = {
        r.doc_id: r.pieces
        for r in bpe_encode_corpus_rules(docs, "doc_id", "text", capped).collect()
    }

    words_sql = """    SELECT word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
          FROM documents)
    WHERE word <> '' GROUP BY 1"""
    sql = (
        "WITH documents AS (SELECT 1 AS doc_id, '" + text + "' AS text)"
        + _bpe_seg_ctes(4, words_sql, cap=3)
        + _bpe_piece_stream_sql("documents", "toks", "d")
        + " SELECT doc_id, array_to_string(toks, ' ') AS pieces FROM d"
    )
    con = duckdb.connect()
    want = {r[0]: r[1] for r in con.sql(sql).fetchall()}
    assert got == want, (got, want)

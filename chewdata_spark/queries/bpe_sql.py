"""Shared BPE-merge-chain SQL builders (DuckDB oracle side).

A LEAF module: imported by both tokenize_queries and curation_queries
(whose module-level oracle literals need these at import time), so it
must not import either of them — that was an order-dependent circular
import.  The Spark-side twins live in operators/tokenize.py.
"""

from __future__ import annotations


def _bpe_iter_sql(i: int, *, materialized: bool = False) -> str:
    """CTE block for BPE iteration ``i`` over symbol relation syms{i}:
    pair counts c{i}, winning rule t{i}, merged relation syms{i+1}.

    ``materialized`` emits ``AS MATERIALIZED`` on every CTE: each
    iteration references its predecessors several times, so DuckDB's
    default inlining makes an N-iteration chain EXPONENTIAL in plan
    size (a 64-chain exhausts file handles before it even scans);
    materialization bounds it linearly (measured 4.3 s for 64
    iterations at sf0.01).  The single-row t{i} joins via LEFT JOIN ON
    TRUE, so an exhausted vocabulary (no pairs left -> empty t{i})
    passes symbols through unchanged instead of annihilating the
    relation — mirroring the trainers' early stop."""
    m = "MATERIALIZED " if materialized else ""
    return f"""p{i} AS {m}(
    SELECT word, freq, pos, sym,
           lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
    FROM syms{i}
), c{i} AS {m}(
    -- HAVING > 0: zero-weight symbol rows (the union-vocab encode
    -- device carries to-be-encoded-only words at freq 0) must never
    -- win the argmax — mirrors the trainers, which see only counted
    -- words
    SELECT sym, nxt, CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM p{i} WHERE nxt IS NOT NULL GROUP BY 1, 2
    HAVING CAST(SUM(freq) AS BIGINT) > 0
), t{i} AS {m}(
    SELECT {i} AS merge_rank, sym AS lhs, nxt AS rhs, pair_count
    FROM c{i} ORDER BY pair_count DESC, sym ASC, nxt ASC LIMIT 1
), m{i} AS {m}(
    SELECT p.word, p.freq, p.pos, p.sym, t.lhs, t.rhs,
           (p.sym = t.lhs AND p.nxt = t.rhs) AS mt
    FROM p{i} p LEFT JOIN t{i} t ON TRUE
), st{i} AS {m}(
    SELECT word, pos FROM (
        SELECT word, pos,
               ROW_NUMBER() OVER (PARTITION BY word, isl ORDER BY pos) AS k
        FROM (SELECT word, pos,
                     pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS isl
              FROM m{i} WHERE mt)
    ) WHERE k % 2 = 1
), mk{i} AS {m}(
    SELECT word, pos, 1 AS mk FROM st{i}
    UNION ALL
    SELECT word, pos + 1, 2 FROM st{i}
), syms{i + 1} AS {m}(
    SELECT word, freq,
           ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
           CASE WHEN mk = 1 THEN lhs || rhs ELSE sym END AS sym
    FROM (SELECT m.word, m.freq, m.pos, m.sym, m.lhs, m.rhs, k.mk
          FROM m{i} m LEFT JOIN mk{i} k USING (word, pos)
          WHERE k.mk IS NULL OR k.mk = 1)
)"""

_BPE_SA_ITERS = 64  # trained merges for the BPE-grain SA queries
# >= 9-piece repeats: the token family cuts whole >= 5-token repeats,
# and at 64 merges this corpus averages ~1.8 pieces per word (the
# 31-word synthetic vocabulary fuses hard), so 5 tokens ~ 9 pieces —
# the same sensitivity expressed at the trained-piece grain.  (The
# round-12 version trained only 2 merges, leaving pieces near char
# grain and the threshold at the char family's 30.)
_BPE_SA_MIN_PIECES = 9

# mirror of bpe_train_rules' max_train_vocab default: only the top-cap
# words by (freq DESC, word ASC) train the merges; every word is still
# ENCODED under the trained rules (the freq-0 device below)
_BPE_TRAIN_VOCAB_CAP = 1 << 20


def _bpe_capped_words_sql(
    words0_sql: str, m: str, cap: int = _BPE_TRAIN_VOCAB_CAP
) -> str:
    """``words0`` (the raw ``(word, freq)`` relation) wrapped in the
    trainer's vocabulary cap: words outside the top
    ``_BPE_TRAIN_VOCAB_CAP`` by (freq DESC, word ASC) re-enter at
    ``freq = 0`` — parity-MERGED by every iteration (that IS "apply
    the rules to any word", the Spark encoder's contract) but
    invisible to the pair argmax (the c{{i}} HAVING guard).  Exactly
    bpe_train_rules' collect cap + encode-everything split; without
    this mirror a >1M-word corpus would train different rules on the
    two sides (review r13 finding)."""
    return """words0 AS {m}(
{words0_sql}
), words AS {m}(
    SELECT w.word,
           CASE WHEN t.word IS NULL THEN 0 ELSE w.freq END AS freq
    FROM words0 w
    LEFT JOIN (SELECT word FROM words0
               ORDER BY freq DESC, word ASC LIMIT {cap}) t USING (word)
)""".format(m=m, words0_sql=words0_sql, cap=cap)


def _bpe_piece_stream_sql(rel: str, toks_name: str, out_name: str) -> str:
    """WITH-continuation fragment: the encode tail — ``rel (doc_id,
    text)`` tokenized and reassembled through ``seg`` into
    ``{out_name} (doc_id, toks)``, the per-doc piece-sequence
    relation.  ONE builder for every BPE oracle's encode replay
    (review r13: the flagship had hand-copied this pair)."""
    return """, {tn} AS (
    SELECT doc_id, pos, word
    FROM (SELECT doc_id, unnest(w) AS word,
                 unnest(range(1, len(w) + 1)) AS pos
          FROM (SELECT doc_id,
                       string_split_regex(trim(lower(text)), '\\s+') AS w
                FROM {rel}))
    WHERE word <> ''
), {on} AS (
    SELECT doc_id,
           string_split(string_agg(s.seg, ' ' ORDER BY t.pos), ' ') AS toks
    FROM {tn} t JOIN seg s ON s.word = t.word
    GROUP BY doc_id
)""".format(tn=toks_name, on=out_name, rel=rel)


def _bpe_doc_pieces_ctes(n_iters: int = 2) -> str:
    """The corpus-trained-BPE encode chain as a WITH prefix ending at
    ``d (doc_id, toks)`` — the per-doc piece-sequence relation.  Shared
    by the BPE-grain SA cut oracle and the BPE-grain contamination
    gate oracle (one builder so the encode replay cannot drift).
    ``n_iters`` chains that many per-iteration CTE blocks; above 2 the
    blocks are emitted MATERIALIZED (see :func:`_bpe_iter_sql` — plain
    inlining is exponential in chain depth).  Training sees only the
    capped vocabulary (:func:`_bpe_capped_words_sql` — the Spark
    trainer's max_train_vocab mirror)."""
    mat = n_iters > 2
    m = "MATERIALIZED " if mat else ""
    words0 = """    SELECT word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
          FROM documents)
    WHERE word <> '' GROUP BY 1"""
    return ("""
WITH """ + _bpe_capped_words_sql(words0, m) + """, syms1 AS {m}(
    SELECT word, freq, i AS pos, word[i] AS sym
    FROM (SELECT word, freq, unnest(generate_series(1, len(word))) AS i
          FROM words)
), {iters}, seg AS (
    SELECT word, string_agg(sym, ' ' ORDER BY pos) AS seg
    FROM syms{top} GROUP BY word
)""".format(
        m=m,
        top=n_iters + 1,
        iters=", ".join(
            _bpe_iter_sql(i, materialized=mat) for i in range(1, n_iters + 1)
        ),
    ) + _bpe_piece_stream_sql("documents", "toks", "d"))

def _bpe_seg_ctes(
    n_iters: int, words_sql: str, *, cap: int = _BPE_TRAIN_VOCAB_CAP
) -> str:
    """WITH-continuation fragment (leading ``,``) that trains
    ``n_iters`` BPE merges over a CALLER-PROVIDED word-count relation
    and ends at ``seg (word, seg)`` — the trained word -> piece-string
    dictionary.  ``words_sql`` must select ``(word, freq)``; rows with
    ``freq = 0`` participate in the parity MERGE application but never
    in the pair argmax (the c{i} HAVING guard) — the union-vocab
    device that lets one chain train on one slice and encode another
    (words unique to the encode-side slice enter at freq 0, exactly
    "apply the trained rules to any word", the Spark encoder's
    contract).  MATERIALIZED above 2 iterations (inlining is
    exponential in chain depth — see :func:`_bpe_iter_sql`).  The
    caller's relation is additionally wrapped in the trainer's
    vocabulary cap (:func:`_bpe_capped_words_sql`)."""
    mat = n_iters > 2
    m = "MATERIALIZED " if mat else ""
    # NOTE: .format binds to the LAST literal only — keep the caller's
    # words_sql out of any format template (it may contain regex
    # braces) by passing it as a VALUE into the capped builder
    return (", " + _bpe_capped_words_sql(words_sql, m, cap) + """, syms1 AS {m}(
    SELECT word, freq, i AS pos, word[i] AS sym
    FROM (SELECT word, freq, unnest(generate_series(1, len(word))) AS i
          FROM words)
), {iters}, seg AS (
    SELECT word, string_agg(sym, ' ' ORDER BY pos) AS seg
    FROM syms{top} GROUP BY word
)""".format(
        m=m,
        top=n_iters + 1,
        iters=", ".join(
            _bpe_iter_sql(i, materialized=mat) for i in range(1, n_iters + 1)
        ),
    ))

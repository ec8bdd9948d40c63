"""Unigram-LM tokenizer (operators/tokenizer.py: unigram_fit /
unigram_apply / _viterbi_segment, Kudo ACL 2018, hard-EM variant) —
pinned bit-for-bit against an independent pure-Python replica (the
module's stated check for non-SQL-expressible operators, the BPE
precedent), plus decode tie rules, UNK handling, and the apply
contract."""

from __future__ import annotations

import math

from apache_kafka_clickhouse_demo_spark.functions import text as TX
from apache_kafka_clickhouse_demo_spark.operators import tokenizer as TK


# ---------------------------------------------------------------------------
# independent replica (richer DP state: full piece lists per cell)
# ---------------------------------------------------------------------------


def _ref_segment(word, scores, max_len, unk):
    cells = {0: (0, [])}  # pos -> (score, pieces)
    for j in range(1, len(word) + 1):
        best = None
        for i in range(max(0, j - max_len), j):
            if i not in cells:
                continue
            piece = word[i:j]
            s = scores.get(piece)
            if s is None:
                if len(piece) > 1:
                    continue
                s = unk
            sc, pcs = cells[i]
            key = (sc + s, -(len(pcs) + 1), len(piece))
            if best is None or key > best[0]:
                best = (key, (sc + s, pcs + [piece]))
        if best is not None:
            cells[j] = best[1]
    return cells[len(word)][1]


def _ref_word_vocab(rows):
    freq = {}
    for _, text in rows:
        for w in TX.py_tokens(text):
            freq[w] = freq.get(w, 0) + 1
    return freq


def _ref_seed(rows, seed_size, min_count, max_len):
    wv = _ref_word_vocab(rows)
    cnt = {}
    for w, f in wv.items():
        for ln in range(1, min(len(w), max_len) + 1):
            for st in range(0, len(w) - ln + 1):
                p = w[st : st + ln]
                cnt[p] = cnt.get(p, 0) + f
    multi = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1 and c >= min_count),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    singles = [(p, c) for p, c in cnt.items() if len(p) == 1]
    return dict(singles + multi)


def _ref_milli(counts):
    total = sum(counts.values())
    return {
        p: math.floor(1000.0 * math.log(c / total)) for p, c in counts.items() if c > 0
    }


def _ref_fit(rows, vocab_size, seed_size, min_count, max_len, shrink, max_rounds):
    counts = _ref_seed(rows, seed_size, min_count, max_len)
    scores = _ref_milli(counts)
    wv = _ref_word_vocab(rows)
    settled = False
    for _ in range(max_rounds):
        used = {}
        for w, f in wv.items():
            for p in _ref_segment(w, scores, max_len, TK.UNIGRAM_UNK_MILLI):
                if p in scores:
                    used[p] = used.get(p, 0) + f
        singles = {p: c for p, c in used.items() if len(p) == 1}
        multis = sorted(
            ((p, c) for p, c in used.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        alphabet_n = sum(1 for p in scores if len(p) == 1)
        target = max(vocab_size - alphabet_n, 0)
        if len(multis) > target:
            multis = multis[: max(target, len(multis) * shrink // 1000)]
            settled = False
        elif settled:
            break
        else:
            settled = True
        kept = dict(multis)
        for p in {p for p in scores if len(p) == 1}:
            kept[p] = singles.get(p, 1)
        scores = _ref_milli(kept)
    return sorted(scores.items())


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quicker brown foxes jump over the lazy dogs"),
    (3, "quick quick quicker quickest the fox the dog"),
    (4, "lazy dogs jump over brown foxes all over again"),
    (5, None),
    (6, ""),
]


def _df(spark, rows=CORPUS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fit_matches_pure_python_replica_bit_for_bit(spark):
    got = TK.unigram_fit(
        _df(spark), vocab_size=30, seed_size=64, min_count=2, max_rounds=6
    )
    want = _ref_fit(
        CORPUS, vocab_size=30, seed_size=64, min_count=2,
        max_len=TK.UNIGRAM_MAX_PIECE_LEN, shrink=750, max_rounds=6,
    )
    assert got == want


def test_seed_vocab_matches_replica_and_keeps_alphabet(spark):
    got = TK.unigram_seed_vocab(_df(spark), seed_size=32, min_count=2)
    want = _ref_seed(CORPUS, seed_size=32, min_count=2,
                     max_len=TK.UNIGRAM_MAX_PIECE_LEN)
    assert got == want
    alphabet = {c for _, t in CORPUS for c in (t or "") if not c.isspace()}
    assert alphabet <= set(got)  # single chars survive regardless of count


def test_viterbi_prefers_higher_score_then_fewer_pieces(spark):
    scores = {"ab": -1000, "a": -500, "b": -500, "abab": -3000}
    # "abab": [a,b,a,b] = -2000 beats [ab,ab] = -2000? equal score ->
    # fewer pieces wins: [ab, ab]
    assert TK._viterbi_segment("abab", scores, 6, -20_000) == ["ab", "ab"]
    # make the char path strictly better
    scores2 = {"ab": -1100, "a": -500, "b": -500}
    assert TK._viterbi_segment("abab", scores2, 6, -20_000) == ["a", "b", "a", "b"]


def test_viterbi_tie_breaks_on_longer_last_piece(spark):
    # [x, yz] and [xy, z] tie on score and piece count -> longer LAST
    # piece wins
    scores = {"x": -1000, "y": -1000, "z": -1000, "xy": -2000, "yz": -2000}
    assert TK._viterbi_segment("xyz", scores, 6, -20_000) == ["x", "yz"]


def test_viterbi_unknown_chars_fall_back_per_char(spark):
    scores = {"the": -1000, "t": -2000, "h": -2000, "e": -2000}
    got = TK._viterbi_segment("qthe", scores, 6, -20_000)
    assert got == ["q", "the"]


def test_segmentation_agrees_with_replica_on_every_corpus_word(spark):
    vocab = dict(TK.unigram_fit(_df(spark), vocab_size=25, seed_size=64))
    for w in _ref_word_vocab(CORPUS):
        assert TK._viterbi_segment(
            w, vocab, TK.UNIGRAM_MAX_PIECE_LEN, TK.UNIGRAM_UNK_MILLI
        ) == _ref_segment(w, vocab, TK.UNIGRAM_MAX_PIECE_LEN, TK.UNIGRAM_UNK_MILLI)


def test_apply_counts_match_replica(spark):
    vocab = TK.unigram_fit(_df(spark), vocab_size=25, seed_size=64)
    scores = dict(vocab)
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["n_unk_pieces"])
        for r in TK.unigram_apply(_df(spark), vocab).collect()
    }
    for doc_id, text in CORPUS:
        toks = TX.py_tokens(text)
        if not toks:
            assert doc_id not in got  # no-words docs emit no row
            continue
        pieces = [
            p
            for w in toks
            for p in _ref_segment(
                w, scores, TK.UNIGRAM_MAX_PIECE_LEN, TK.UNIGRAM_UNK_MILLI
            )
        ]
        n_unk = sum(1 for p in pieces if p not in scores)
        assert got[doc_id] == (len(toks), len(pieces), n_unk)


def test_fit_is_deterministic_across_runs(spark):
    a = TK.unigram_fit(_df(spark), vocab_size=30, seed_size=64)
    b = TK.unigram_fit(_df(spark), vocab_size=30, seed_size=64)
    assert a == b


def test_vocab_size_prune_respects_target_and_keeps_singles(spark):
    # 32 rounds: the 750-permille shrink needs ~17 rounds to walk a
    # 128-piece seed down to a 20-piece target (max_rounds caps work,
    # not correctness — a tighter cap just stops higher, by design)
    vocab = TK.unigram_fit(_df(spark), vocab_size=20, seed_size=128, max_rounds=32)
    singles = [p for p, _ in vocab if len(p) == 1]
    multis = [p for p, _ in vocab if len(p) > 1]
    assert len(multis) <= max(20 - len(singles), 0) or len(multis) == 0
    alphabet = {c for _, t in CORPUS for c in (t or "") if not c.isspace()}
    assert alphabet <= set(singles)

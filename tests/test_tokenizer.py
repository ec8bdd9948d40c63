"""BPE vocabulary induction / application (operators/tokenizer.py),
pinned against an independent pure-Python reference (no DuckDB oracle —
iterative argmax fit and struct-state folds are outside DuckDB 1.0's
SQL surface; the module docstring states the contract):

- bpe_fit learns the exact merge list the reference learns (frequency-
  weighted argmax, lexicographic ties, min-frequency early stop);
- the merge pass is left-to-right non-overlapping ("aaaa" -> [aa, aa]);
- bpe_apply's per-doc piece counts equal the reference's, and applying
  the learned merges compresses (pieces < chars) on merge-friendly text.
"""

from __future__ import annotations

from apache_kafka_clickhouse_demo_spark.operators import tokenizer as TK


def _py_merge_pass(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_fit(texts: list[str], num_merges: int, min_pair_freq: int = 2):
    vocab: dict[str, int] = {}
    for t in texts:
        for w in (t or "").lower().split():
            vocab[w] = vocab.get(w, 0) + 1
    syms = {w: list(w) for w in vocab}
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            for x, y in zip(s, s[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + vocab[w]
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_freq:
            break
        merges.append((a, b))
        syms = {w: _py_merge_pass(s, a, b) for w, s in syms.items()}
    return merges, syms, vocab


TEXTS = [
    "lower lower lowest low low low",
    "newer newest new new news",
    "the lower the better",
]


def test_fit_matches_pure_python_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = TK.bpe_fit(docs, num_merges=12)
    want, _, _ = _py_fit(TEXTS, 12)
    assert got == want
    assert len(got) >= 5  # the fixture supports a real merge sequence


def test_merge_pass_is_left_to_right_non_overlapping(spark):
    docs = spark.createDataFrame([(1, "aaaa aaaa aa")], "doc_id long, text string")
    merges = TK.bpe_fit(docs, num_merges=1)
    assert merges == [("a", "a")]
    out = TK.bpe_apply(docs, merges).collect()
    # "aaaa" -> [aa, aa] (2), x2 words, plus "aa" -> [aa] (1): 5 pieces
    assert (out[0]["n_words"], out[0]["n_pieces"]) == (3, 5)


def test_apply_matches_reference_and_compresses(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    merges, ref_syms, _ = _py_fit(TEXTS, 12)
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in TK.bpe_apply(docs, merges).collect()
    }
    for d, t in enumerate(TEXTS):
        words = t.split()
        want_pieces = sum(len(ref_syms[w]) for w in words)
        assert got[d] == (len(words), want_pieces), d
        assert want_pieces < sum(len(w) for w in words)  # compression


def test_null_and_empty_docs_emit_no_row(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, None), (3, "")], "doc_id long, text string"
    )
    merges = TK.bpe_fit(docs, num_merges=1)
    got = {r["doc_id"] for r in TK.bpe_apply(docs, merges).collect()}
    assert got == {1}


def _py_fit_batched(
    texts: list[str], num_merges: int, batch: int, min_pair_freq: int = 2
):
    """Pure-Python reference for the BATCHED selection rule (r11): per
    round, one frozen count table scanned in (cnt desc, a, b) order,
    greedily accepting up to `batch` pairs whose {a, b, a+b} are
    disjoint from everything accepted this round."""
    vocab: dict[str, int] = {}
    for t in texts:
        for w in (t or "").lower().split():
            vocab[w] = vocab.get(w, 0) + 1
    syms = {w: list(w) for w in vocab}
    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        want = min(batch, num_merges - len(merges))
        counts: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            for x, y in zip(s, s[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + vocab[w]
        ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        accepted, used = [], set()
        for (a, b), cnt in ordered:
            if cnt < min_pair_freq:
                break
            if {a, b, a + b} & used:
                continue
            accepted.append((a, b))
            used |= {a, b, a + b}
            if len(accepted) == want:
                break
        if not accepted:
            break
        merges.extend(accepted)
        for a, b in accepted:
            syms = {w: _py_merge_pass(s, a, b) for w, s in syms.items()}
    return merges, syms, vocab


def test_batched_fit_matches_pure_python_batched_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    for batch in (2, 4, 8):
        got = TK.bpe_fit(docs, num_merges=12, batch=batch)
        want, _, _ = _py_fit_batched(TEXTS, 12, batch)
        assert got == want, batch
        assert len(got) >= 5


def test_batch_one_is_sequential_bpe(spark):
    """batch=1 must stay bit-identical to the sequential reference —
    the batched code path with want=1 IS sequential argmax."""
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = TK.bpe_fit(docs, num_merges=12, batch=1)
    want, _, _ = _py_fit(TEXTS, 12)
    assert got == want


def test_batched_rule_deviates_where_documented(spark):
    """The docstring's worked example: sequential picks the merge-created
    pair (c,ab) second; the frozen-table batch picks (d,e) — both
    deterministic, and each engine path matches ITS reference."""
    texts = ["cab"] * 100 + ["de"] * 50
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    seq = TK.bpe_fit(docs, num_merges=2, batch=1)
    assert seq == [("a", "b"), ("c", "ab")]
    batched = TK.bpe_fit(docs, num_merges=2, batch=2)
    assert batched == [("a", "b"), ("d", "e")]
    assert batched == _py_fit_batched(texts, 2, 2)[0]

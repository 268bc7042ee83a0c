"""BPE tokenizer tests (operators/bpe.py): the paper's canonical
corpus hand-checked, an INDEPENDENT naive reference implementation
(re-merged strings instead of symbol tuples), encode/train coherence,
the distributed trainer, and the Arrow tokenize stage."""

import re

from accelerator_spark.operators.bpe import (
    EOW, bpe_encode_word, bpe_tokenize, bpe_train, bpe_train_wordfreq)

# the Sennrich et al. example vocabulary
PAPER = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _naive_train(wordfreq, n_merges):
    """Independent reference: words kept as space-joined STRINGS,
    pair counting and merging via regex — a different implementation
    shape than the tuple-based production code."""
    vocab = {" ".join(list(w) + [EOW]): c for w, c in wordfreq.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, c in vocab.items():
            syms = w.split(" ")
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts or max(counts.values()) < 2:
            break
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        pat = re.compile(
            r"(?<!\S)" + re.escape(best[0] + " " + best[1]) + r"(?!\S)")
        vocab = {pat.sub(best[0] + best[1], w): c for w, c in vocab.items()}
    return merges


def test_paper_corpus_first_merges():
    merges = bpe_train_wordfreq(PAPER, 4)
    # 'es' appears 9x (newest 6 + widest 3) — the paper's first merge;
    # then es+t (9), est+</w> (9), then 'lo' (7, low+lower)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert merges[3] == ("l", "o")


def test_matches_naive_reference():
    for n in (1, 3, 8, 50):
        assert bpe_train_wordfreq(PAPER, n) == _naive_train(PAPER, n)
    wf = {"aaab": 4, "abab": 3, "ba": 2, "b": 9}
    for n in (2, 5, 20):
        assert bpe_train_wordfreq(wf, n) == _naive_train(wf, n)


def test_encode_applies_ranks_in_order():
    merges = [("a", "b"), ("ab", "c"), ("abc", EOW), ("x", "y")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode_word("abc", ranks) == ["abc" + EOW]
    assert bpe_encode_word("ab", ranks) == ["ab", EOW]
    assert bpe_encode_word("cab", ranks) == ["c", "ab", EOW]
    assert bpe_encode_word("xyz", ranks) == ["xy", "z", EOW]
    assert bpe_encode_word("q", {}) == ["q", EOW]


def test_train_encode_coherence():
    # encoding the training words with the full merge table compresses
    # every frequent word to one symbol
    merges = bpe_train_wordfreq(PAPER, 100)
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode_word("newest", ranks) == ["newest" + EOW]
    assert bpe_encode_word("low", ranks) == ["low" + EOW]
    # an unseen word still tokenizes (into learned subwords + chars)
    toks = bpe_encode_word("lowest", ranks)
    assert "".join(toks) == "lowest" + EOW


def test_distributed_train_and_tokenize(spark):
    rows = []
    i = 0
    for w, c in PAPER.items():
        for _ in range(c):
            rows.append((i, w))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, n_merges=4)
    assert merges == bpe_train_wordfreq(PAPER, 4)

    docs = spark.createDataFrame(
        [(1, "newest low newest"), (2, None)], "doc_id long, text string")
    full = bpe_train_wordfreq(PAPER, 100)
    out = {r.doc_id: (r.tokens, r.n_tokens)
           for r in bpe_tokenize(docs, full).collect()}
    assert out[1] == (["newest" + EOW, "low" + EOW, "newest" + EOW], 3)
    assert out[2] == (None, None)


def test_max_words_cap_determinism(spark):
    df = spark.createDataFrame(
        [(0, "b b a a c")], "doc_id long, text string")
    # cap 2: freq desc then word asc -> {a:2, b:2} survive, c dropped
    merges = bpe_train(df, n_merges=5, max_words=2)
    assert merges == bpe_train_wordfreq({"a": 2, "b": 2}, 5)

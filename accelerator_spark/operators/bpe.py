"""Byte-pair-encoding tokenizer — train and apply at corpus scale.

Real subword tokenization (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — the published BPE
algorithm GPT-2-family tokenizers build on): a word is its characters
plus an end-of-word marker ``</w>``; training repeatedly merges the
most frequent adjacent symbol pair; encoding replays the merge table
in rank order. This replaces heuristic token counting
(text.bpe_ish_token_count) with the real thing wherever an actual
vocabulary matters (packing budgets, dedup shingles over tokens,
per-token cost estimates).

Scale shape:
- ``bpe_train`` is the standard two-phase distributed design: ONE
  shuffle builds the (word, freq) table — the corpus's distinct-word
  histogram, capped at ``max_words`` by (freq desc, word asc) — and
  training then runs driver-side over that bounded model state.
  Pair counting over a capped word-frequency table is O(vocab), not
  O(corpus); the 100 TB corpus is scanned exactly once.
- ``bpe_tokenize`` is one Arrow map stage (merge ranks broadcast with
  the closure, per-word LRU memo — natural text repeats words), no
  shuffle.

Determinism: merge ties break on (count desc, pair lexicographic
asc); word cap ties on (freq desc, word asc); whitespace
pre-tokenization (the paper's setting — a GPT-2 regex pre-tokenizer
can be layered on later without changing the core).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EOW = "</w>"


def _pair_counts(vocab: dict[tuple, int]) -> Counter:
    pc: Counter = Counter()
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += freq
    return pc


def _merge_word(syms: tuple, pair: tuple) -> tuple:
    out, i, n = [], 0, len(syms)
    a, b = pair
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train_wordfreq(wordfreq: dict[str, int],
                       n_merges: int) -> list[tuple]:
    """The driver-side core: train ``n_merges`` merges over a
    (word -> count) table. Stops early when no pair repeats."""
    vocab = {tuple(w) + (EOW,): c for w, c in wordfreq.items() if w}
    merges: list[tuple] = []
    for _ in range(n_merges):
        pc = _pair_counts(vocab)
        if not pc:
            break
        top = max(pc.values())
        if top < 2:
            break  # nothing repeats; further merges are noise
        best = min(p for p, c in pc.items() if c == top)
        merges.append(best)
        vocab = {_merge_word(s, best): c for s, c in vocab.items()}
    return merges


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 1000, max_words: int = 100_000,
              lowercase: bool = False) -> list[tuple]:
    """Distributed phase: whitespace word histogram (one shuffle),
    capped at ``max_words`` by (freq desc, word asc) — the bounded
    model-state collect — then driver-side training. Returns the
    ordered merge list for ``bpe_tokenize``."""
    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    words = (df.select(F.explode(F.split(col, r"\s+")).alias("w"))
             .filter(F.col("w") != "")
             .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
             .orderBy(F.col("c").desc(), F.col("w").asc())
             .limit(max_words).collect())
    return bpe_train_wordfreq({r["w"]: r["c"] for r in words}, n_merges)


def bpe_encode_word(word: str, ranks: dict[tuple, int]) -> list[str]:
    """Apply merges in rank order: repeatedly fuse the adjacent pair
    with the LOWEST rank until none applies."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize(df: DataFrame, merges: list[tuple],
                 text_col: str = "text", id_col: str = "doc_id",
                 lowercase: bool = False,
                 cache_size: int = 65536) -> DataFrame:
    """(id, tokens array<string>, n_tokens) per document — one Arrow
    map stage, merge table shipped in the closure, per-word memo."""
    from .arrowmap import map_text_rows

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    memo: dict = {}  # plain dict: lru_cache closures don't pickle

    def per_row(s):
        if s is None:
            return None, None
        if lowercase:
            s = s.lower()
        toks: list[str] = []
        for w in s.split():
            t = memo.get(w)
            if t is None:
                if len(memo) >= cache_size:
                    memo.clear()
                t = bpe_encode_word(w, ranks)
                memo[w] = t
            toks.extend(t)
        return toks, len(toks)

    return map_text_rows(
        df, per_row,
        [T.StructField("tokens", T.ArrayType(T.StringType()), True),
         T.StructField("n_tokens", T.IntegerType(), True)],
        text_col, id_col)


def bpe_save(merges: list[tuple], path: str):
    """Persist a merge table as JSON (rank order = list order) — the
    model artifact a curation run trains once and every later
    tokenize job loads."""
    import json

    with open(path, "w", encoding="utf-8") as fh:
        json.dump([list(p) for p in merges], fh, ensure_ascii=False)


def bpe_load(path: str) -> list[tuple]:
    import json

    with open(path, encoding="utf-8") as fh:
        data = json.load(fh)
    if not isinstance(data, list) or any(
            not isinstance(p, list) or len(p) != 2 for p in data):
        raise ValueError(f"{path}: not a merge table (list of pairs)")
    return [tuple(p) for p in data]

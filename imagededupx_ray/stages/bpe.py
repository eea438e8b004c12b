"""Byte-pair-encoding subword tokenizer: distributed training statistics +
actor-pool encoding (Sennrich, Haddow & Birch, "Neural Machine Translation
of Rare Words with Subword Units", ACL 2016) — the first operator of an
LLM training-data pipeline: learn a subword vocabulary over the corpus,
then encode documents with it.

Scale shape (the discipline every production trainer uses — HuggingFace /
SentencePiece train on a word-frequency table, never the token stream):

- **word counts**: per-block partial counts over the shared tokenize
  kernel (vectorized Arrow split + ``value_counts``) shrink the exchange
  to distinct-word rows; one small groupby-sum; the driver receives only
  the top-``max_words`` (word, count) table — frequency-ranked truncation
  is the standard trainer cap, and the exchange volume is the distinct
  vocabulary, never the corpus.
- **merge-rule learning**: the classic highest-pair-count loop over the
  BOUNDED word table on the driver — inherently sequential (merge i+1
  depends on merge i; true of every BPE trainer), corpus-independent once
  the table exists. Pair counts update incrementally: only words
  containing the merged pair are revisited per iteration.
- **encoding**: the merge-rank table broadcasts once (``ray.put``); a
  stateful actor-pool batch encoder applies lowest-rank-first merges per
  DISTINCT word with a per-actor word→tokens cache (Zipf's law makes the
  hit rate ≈ 1 after warmup), so the per-word python loop runs once per
  distinct word per actor, not once per occurrence.

Determinism: pair-count ties break lexicographically; the learned merge
list is a pure function of the word-count table, which is itself exact.

Reference tie-in: the reference tokenizes with jieba + stopwords
(similarities/similarities/utils/tfidf.py:63-71); this stage is the
train-your-own-subwords counterpart the north rule's web-text corpus
needs (M2/M4 family in SURVEY §2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from imagededupx_ray.functions.text import tokenize_batch

_EOW = "▁"  # end-of-word marker (visually distinct, not produced by
# the tokenizer: normalize_batch strips all whitespace and the corpus is
# plain text — documented contract, asserted nowhere hot)


def bpe_word_counts(docs_ds, max_words: int = 30000, text_col: str = "text"):
    """Exact corpus word counts, top-``max_words`` by (count desc, word
    asc): per-batch partial ``value_counts`` → groupby-sum → sort/limit.
    Returns a pandas DataFrame (word, n) — the bounded trainer table."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = tokenize_batch(batch[text_col])
        vc = flat.value_counts() if len(flat) else None
        if vc is None or len(vc) == 0:
            return pa.table(
                {
                    "word": pa.array([], type=pa.string()),
                    "partial_n": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "word": vc.field("values"),
                "partial_n": vc.field("counts").cast(pa.int64()),
            }
        )

    return (
        docs_ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("partial_n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(max_words)
        .to_pandas()
    )


def bpe_train_from_counts(
    words: list[str], counts: list[int] | np.ndarray, n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from a (word, count) table — the
    Sennrich et al. algorithm with incremental pair-count maintenance:
    each iteration picks the (count desc, pair asc) best adjacent symbol
    pair and rewrites only the words that contain it."""
    seqs: list[list[str]] = [list(w) + [_EOW] for w in words]
    cnts = [int(c) for c in counts]

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, seq in enumerate(seqs):
        c = cnts[wi]
        for j in range(len(seq) - 1):
            p = (seq[j], seq[j + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        best_n = 0
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None or best_n < 1:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            seq = seqs[wi]
            c = cnts[wi]
            # remove this word's contribution from every old pair
            for j in range(len(seq) - 1):
                p = (seq[j], seq[j + 1])
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        pair_words.pop(p, None)
            # rewrite the word
            out = []
            j = 0
            while j < len(seq):
                if j < len(seq) - 1 and seq[j] == best[0] and seq[j + 1] == best[1]:
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[wi] = out
            # re-add contributions
            for j in range(len(out) - 1):
                p = (out[j], out[j + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)
    return merges


def bpe_train(
    docs_ds, n_merges: int = 200, max_words: int = 30000, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Distributed word counts → driver merge-rule learning."""
    wc = bpe_word_counts(docs_ds, max_words=max_words, text_col=text_col)
    return bpe_train_from_counts(
        wc["word"].tolist(), wc["n"].to_numpy(), n_merges
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-merge-rank-first application (GPT-2's ``bpe()``
    discipline, which reproduces the training segmentation)."""
    seq = list(word) + [_EOW]
    while len(seq) > 1:
        best_j = -1
        best_r = None
        for j in range(len(seq) - 1):
            r = ranks.get((seq[j], seq[j + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_r, best_j = r, j
        if best_j < 0:
            break
        seq[best_j : best_j + 2] = [seq[best_j] + seq[best_j + 1]]
    return seq


class BPEEncoder:
    """Actor-pool batch encoder: merge ranks arrive once per actor via an
    ObjectRef in ``__init__``; ``__call__`` encodes each batch's DISTINCT
    words through a persistent word→tokens cache. Emits (doc_id, n_tokens,
    tokens: list<string>)."""

    def __init__(self, ranks_ref):
        self.ranks: dict[tuple[str, str], int] = ray.get(ranks_ref)
        self.cache: dict[str, list[str]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offsets = tokenize_batch(batch["text"])
        words = flat.to_pylist()
        cache = self.cache
        toks_per_word = []
        for w in words:
            t = cache.get(w)
            if t is None:
                t = _encode_word(w, self.ranks)
                cache[w] = t
            toks_per_word.append(t)
        doc_tokens: list[list[str]] = []
        n_tokens = np.zeros(len(ids), dtype=np.int64)
        for d in range(len(ids)):
            toks: list[str] = []
            for wi in range(offsets[d], offsets[d + 1]):
                toks.extend(toks_per_word[wi])
            doc_tokens.append(toks)
            n_tokens[d] = len(toks)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "tokens": pa.array(doc_tokens, type=pa.list_(pa.string())),
            }
        )


def bpe_encode(docs_ds, merges: list[tuple[str, str]], concurrency=(1, 4)):
    """Encode (doc_id, text) rows with a learned merge list. Stateful
    actor pool: ranks ship once per actor, the word cache persists across
    batches. ``concurrency`` defaults to an AUTOSCALING (min, max) pool so
    the stage never reserves every CPU of a small session (a fixed pool
    the size of the cluster deadlocks the upstream read)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    ranks_ref = ray.put(ranks)
    return docs_ds.select_columns(["doc_id", "text"]).map_batches(
        BPEEncoder,
        fn_constructor_args=(ranks_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def bpe_vocab(merges: list[tuple[str, str]], word_counts: pd.DataFrame) -> list[str]:
    """The learned vocabulary: base symbols (corpus characters + the
    end-of-word marker) plus one new symbol per merge, in learning order."""
    base: set[str] = {_EOW}
    for w in word_counts["word"]:
        base.update(w)
    return sorted(base) + [a + b for a, b in merges]

"""Byte-pair-encoding tokenizer: sample-trained merges, distributed
apply.

The standard corpus-scale shape (Sennrich et al. 2016 subword-nmt;
every production tokenizer since): the merge table is TRAINED on a
bounded sample — BPE training is inherently sequential (merge i+1's
pair counts depend on merge i), so no engine parallelizes the loop
itself; what must scale is (a) building the word-frequency sample and
(b) APPLYING the learned merges to the full corpus.

Scale shape (100 TB):
- sampling is a deterministic content-hash filter (xxhash64 % mod)
  plus a distributed word-count aggregation — only the aggregated
  (word, count) vocabulary (bounded by ``max_vocab_words``) reaches
  the driver, never document text;
- the merge loop runs on that bounded vocabulary driver-side with
  incremental pair-count maintenance (only words containing the
  merged pair are touched per iteration);
- ``bpe_encode`` ships the merge ranks in the task closure (a few KB)
  and tokenizes via mapInArrow, map-only, with a per-batch memo on
  distinct words — no shuffle, no driver involvement.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "▁"  # end-of-word sentinel appended to each word's last symbol


def _word_symbols(word: str) -> tuple[str, ...]:
    syms = list(word)
    syms[-1] = syms[-1] + EOW
    return tuple(syms)


def train_bpe(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    sample_mod: int = 1,
    max_vocab_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a deterministic sample of
    ``df``. Returns the ranked merge list [(left, right), ...].

    ``sample_mod``: keep docs with xxhash64(text) % mod == 0 (1 =
    whole corpus; at 100 TB set ~corpus_size/10^6 — tokenizers
    saturate long before that). ``max_vocab_words`` caps the driver-
    side vocabulary at the most frequent distinct words.

    Determinism: the sample is content-hashed (partition-order-free),
    the vocabulary cut is (count, word)-ordered, and merge ties break
    lexicographically — identical inputs give identical merges on any
    cluster layout.
    """
    src = df.select(F.col(text_col).alias("_t"))
    if sample_mod > 1:
        src = src.filter(F.pmod(F.xxhash64("_t"), F.lit(sample_mod)) == 0)
    vocab_rows = (
        src.select(F.explode(F.split("_t", r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_vocab_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        _word_symbols(r["w"]): int(r["c"]) for r in vocab_rows
    }

    # pair counts + index of which words contain each pair, maintained
    # incrementally (touch only words containing the merged pair)
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set] = {}
    for word, c in vocab.items():
        for a, b in zip(word, word[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(word)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))
        (a, b), best_count = best
        if best_count < 2:
            break  # nothing left worth merging
        merges.append((a, b))
        new_sym = a + b
        for word in list(pair_words.get((a, b), ())):
            c = vocab.pop(word, None)
            if c is None:
                continue
            # remove old pair contributions
            for pa_, pb in zip(word, word[1:]):
                pair_counts[(pa_, pb)] -= c
                if pair_counts[(pa_, pb)] <= 0:
                    del pair_counts[(pa_, pb)]
                ws = pair_words.get((pa_, pb))
                if ws is not None:
                    ws.discard(word)
                    if not ws:
                        del pair_words[(pa_, pb)]
            # rewrite the word with the merged symbol
            out = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_word = tuple(out)
            vocab[new_word] = vocab.get(new_word, 0) + c
            for pa_, pb in zip(new_word, new_word[1:]):
                pair_counts[(pa_, pb)] = pair_counts.get((pa_, pb), 0) + c
                pair_words.setdefault((pa_, pb), set()).add(new_word)
    return merges


def bpe_apply_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word with a trained merge-rank table (greedy
    lowest-rank-first, the standard BPE apply)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens) — tokenize every
    document with the trained merges. Map-only mapInArrow; the merge
    table travels in the closure; distinct words are memoized per
    batch (Zipf makes the memo hit rate very high)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        memo: dict[str, list[str]] = {}
        for batch in batches:
            ids = batch.column(id_col)
            texts = batch.column(text_col).to_pylist()
            toks_out, counts = [], []
            for t in texts:
                toks: list[str] = []
                for w in (t or "").split():
                    got = memo.get(w)
                    if got is None:
                        got = bpe_apply_word(w, ranks)
                        memo[w] = got
                    toks.extend(got)
                toks_out.append(toks)
                counts.append(len(toks))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(toks_out, type=pa.list_(pa.string())),
                    pa.array(counts, type=pa.int64()),
                ],
                names=[id_col, "bpe_tokens", "n_bpe_tokens"],
            )

    return df.select(id_col, text_col).mapInArrow(
        fn,
        f"{id_col} long, bpe_tokens array<string>, n_bpe_tokens long",
    )

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

import numpy as np
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


_RANK_INF = np.int64(2**62)

# Mean miss-word length above which bpe_encode prefers the scalar
# per-word loop over the numpy batch (measured crossover; see
# bpe_encode docstring).
_BATCH_MAX_MEAN_LEN = 20.0


class _BatchBpe:
    """Vectorized greedy BPE apply over a batch of distinct words.

    Exactly replicates :func:`bpe_apply_word` (pinned by fuzz tests):
    all un-memoized words become ONE numpy symbol-id stream; each
    round applies, per word, that word's current minimum-rank pair.
    When every merge product string has a unique producing pair (the
    normal trained-table case), a new pair created by applying rank r
    can only involve the rank-r product — whose pairs all rank > r —
    so ALL leftmost-alternating occurrences of the word minimum can
    merge simultaneously and the round count is O(distinct ranks
    applied). With duplicate product derivations (pathological: e.g.
    ('a','bc') and ('ab','c') both yielding 'abc'), a later merge can
    expose a LOWER-rank pair mid-word, so the batch falls back to one
    leftmost application per word per round — still vectorized, still
    exactly greedy."""

    # Symbol-id scheme (lets the stream build vectorized, no per-char
    # dict): single char -> its codepoint; char+EOW -> codepoint |
    # _EOW_BIT; any other string (merge products, or exotic caller
    # components) -> _PROD_BASE + dict index.
    _EOW_BIT = 1 << 21  # > max codepoint 0x10FFFF
    _PROD_BASE = 1 << 22

    def __init__(self, merges: list[tuple[str, str]]):
        self.sym_id: dict[str, int] = {}
        keys = np.empty(len(merges), np.int64)
        prods = np.empty(len(merges), np.int64)
        prod_strings = set()
        for r, (a, b) in enumerate(merges):
            keys[r] = (self._sid(a) << 32) | self._sid(b)
            prods[r] = self._sid(a + b)
            prod_strings.add(a + b)
        # duplicate (a,b) rows resolve to their LAST rank — matching
        # the scalar reference's `{pair: i for i, pair in enumerate}`
        # dict, where later assignments win
        order = np.argsort(keys, kind="stable")
        keys, ranks_v, prods = (
            keys[order],
            np.arange(len(merges), dtype=np.int64)[order],
            prods[order],
        )
        if len(keys):
            last = np.r_[keys[1:] != keys[:-1], True]
            keys, ranks_v, prods = keys[last], ranks_v[last], prods[last]
        self.keys, self.ranks_v, self.prods = keys, ranks_v, prods
        self.multi_ok = len(prod_strings) == len(merges)

    def _sid(self, s: str) -> int:
        if len(s) == 1:
            return ord(s)
        if len(s) == 2 and s[1] == EOW:
            return ord(s[0]) | self._EOW_BIT
        i = self.sym_id.get(s)
        if i is None:
            i = self._PROD_BASE + len(self.sym_id)
            self.sym_id[s] = i
        return i

    def _names(self, ids: np.ndarray) -> np.ndarray:
        """Map distinct symbol ids back to strings (object array)."""
        rev = {i: s for s, i in self.sym_id.items()}
        out = np.empty(len(ids), object)
        for k, i in enumerate(ids.tolist()):
            if i >= self._PROD_BASE:
                out[k] = rev[i]
            elif i & self._EOW_BIT:
                out[k] = chr(i ^ self._EOW_BIT) + EOW
            else:
                out[k] = chr(i)
        return out

    def apply(self, words: list[str]) -> dict[str, list[str]]:
        if not words:
            return {}
        # vectorized stream build: UTF-32 codepoints + EOW bit on each
        # word's last char — no per-symbol Python
        lens = np.fromiter((len(w) for w in words), np.int64, len(words))
        syms = np.frombuffer(
            "".join(words).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        syms[np.cumsum(lens) - 1] |= self._EOW_BIT
        # native exact-greedy leg (tl_bpe_apply): per-word greedy over
        # the same id encoding — fastest on every vocabulary shape;
        # the numpy rounds below are the no-native fallback
        from tl_spark.kernel import native_entropy

        res = native_entropy.bpe_apply(
            syms,
            np.r_[np.int64(0), np.cumsum(lens)],
            self.keys,
            self.ranks_v,
            self.prods,
        )
        if res is not None:
            out_ids, out_offs = res
            distinct, codes = np.unique(out_ids, return_inverse=True)
            names = self._names(distinct)[codes]
            return {
                w: names[out_offs[i] : out_offs[i + 1]].tolist()
                for i, w in enumerate(words)
            }
        wid = np.repeat(np.arange(len(words), dtype=np.int64), lens)
        keys, ranks_v, prods = self.keys, self.ranks_v, self.prods
        done_syms: list[np.ndarray] = []
        done_wid: list[np.ndarray] = []
        while len(syms) > 1 and len(keys):
            pk = (syms[:-1] << 32) | syms[1:]
            idx = np.minimum(np.searchsorted(keys, pk), len(keys) - 1)
            found = (wid[:-1] == wid[1:]) & (keys[idx] == pk)
            rk = np.where(found, ranks_v[idx], _RANK_INF)
            # per-word minimum rank: pair i belongs to the word of
            # position i (cross-word pairs already _RANK_INF)
            newword = np.r_[True, wid[:-1] != wid[1:]]
            starts = np.flatnonzero(newword)
            widx = np.cumsum(newword) - 1
            wmin = np.minimum.reduceat(np.r_[rk, _RANK_INF], starts)
            cand = found & (rk == wmin[widx[: len(rk)]])
            ci = np.flatnonzero(cand)
            if ci.size == 0:
                break
            if self.multi_ok:
                # leftmost alternation inside each overlapping run
                # (runs never span words: a word's last position can't
                # start a same-word pair)
                run_start = np.r_[True, np.diff(ci) != 1]
                run_first = ci[run_start][np.cumsum(run_start) - 1]
                keep = ci[(ci - run_first) % 2 == 0]
            else:
                # exactly one (leftmost) application per word
                keep = ci[np.r_[True, np.diff(widx[ci]) != 0]]
            syms[keep] = prods[idx[keep]]
            alive = np.ones(len(syms), bool)
            alive[keep + 1] = False
            # words with no applicable pair left are FINISHED: move
            # them out of the working stream so later rounds only pay
            # for still-active words (the stream shrinks geometrically)
            active_word = wmin < _RANK_INF
            word_active = active_word[widx]
            finished = alive & ~word_active
            if finished.any():
                done_syms.append(syms[finished])
                done_wid.append(wid[finished])
            alive &= word_active
            syms, wid = syms[alive], wid[alive]
        if done_syms:
            done_syms.append(syms)
            done_wid.append(wid)
            syms = np.concatenate(done_syms)
            wid = np.concatenate(done_wid)
            order = np.argsort(wid, kind="stable")
            syms, wid = syms[order], wid[order]
        distinct, codes = np.unique(syms, return_inverse=True)
        out_syms = self._names(distinct)[codes]
        bounds = np.r_[np.flatnonzero(np.r_[True, wid[:-1] != wid[1:]]),
                       len(wid)]
        out: dict[str, list[str]] = {}
        for w_i, w in enumerate(words):
            out[w] = out_syms[bounds[w_i] : bounds[w_i + 1]].tolist()
        return out


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens) — tokenize every
    document with the trained merges. Map-only mapInArrow; the merge
    table travels in the closure; distinct words are memoized per
    batch (Zipf makes the memo hit rate very high) and memo MISSES go
    through :class:`_BatchBpe`. With the native cdylib present that is
    the exact-greedy Rust leg (tl_bpe_apply — fastest on every
    vocabulary shape; the raw merge solve is ~20 ms per million
    symbols, output materialization dominates). Without it, the numpy
    round machine runs when the miss profile favors it (measured
    1.5-1.6x over the scalar loop on natural-language vocabularies,
    slower on degenerate long-word vocabularies), so no-native batches
    whose mean miss length exceeds ``_BATCH_MAX_MEAN_LEN`` take the
    scalar path."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bb = _BatchBpe(merges)
        ranks = {pair: i for i, pair in enumerate(merges)}
        memo: dict[str, list[str]] = {}
        for batch in batches:
            ids = batch.column(id_col)
            texts = batch.column(text_col).to_pylist()
            split = [(t or "").split() for t in texts]
            misses: list[str] = []
            seen = set()
            for ws in split:
                for w in ws:
                    if w not in memo and w not in seen:
                        seen.add(w)
                        misses.append(w)
            if misses:
                mean_len = sum(len(w) for w in misses) / len(misses)
                from tl_spark.kernel.native_entropy import bpe_available

                if bpe_available() or mean_len <= _BATCH_MAX_MEAN_LEN:
                    # native leg wins on every vocabulary shape; the
                    # mean-length routing only matters for the pure-
                    # python numpy fallback (see _BatchBpe.apply)
                    memo.update(bb.apply(misses))
                else:
                    for w in misses:
                        memo[w] = bpe_apply_word(w, ranks)
            toks_out, counts = [], []
            for ws in split:
                toks: list[str] = []
                for w in ws:
                    toks.extend(memo[w])
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

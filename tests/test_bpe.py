"""BPE tokenizer: sample-trained merges + distributed apply."""

import pyspark.sql.functions as F


def _ref_train(word_counts, n_merges):
    """Independent reference trainer: brute-force recount of every
    pair each iteration (no incremental maintenance) — the oracle for
    train_bpe's incremental bookkeeping."""
    from tl_spark.operators.bpe import _word_symbols

    vocab = {_word_symbols(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for word, c in vocab.items():
            for p in zip(word, word[1:]):
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (a, b), cnt = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        new_vocab = {}
        for word, c in vocab.items():
            out, i = [], 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def test_train_bpe_matches_bruteforce_reference(spark):
    """The incremental pair-count maintenance must produce the exact
    merge sequence of a brute-force recount trainer on the same
    corpus (ties broken identically)."""
    from collections import Counter

    from tl_spark.operators.bpe import train_bpe

    docs = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest widest",
        "widest widest lowest lowest lowest",
    ]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    merges = train_bpe(df, n_merges=30)
    wc = Counter(w for d in docs for w in d.split())
    ref = _ref_train(wc, 30)
    assert merges == ref
    assert len(merges) >= 10  # the corpus supports a real merge chain


def test_train_bpe_is_partition_independent(spark):
    from tl_spark.operators.bpe import train_bpe

    rows = [
        (f"token{i % 7} shared common words here token{i % 11}",)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "text string")
    m1 = train_bpe(df.repartition(1), n_merges=40)
    m8 = train_bpe(df.repartition(8), n_merges=40)
    assert m1 == m8


def test_bpe_apply_roundtrip_and_compression():
    """Tokens concatenate back to the word (+ EOW sentinel), and a
    repetitive corpus compresses well below character count."""
    from tl_spark.operators.bpe import EOW, bpe_apply_word

    merges = [("l", "o"), ("lo", "w" + EOW), ("e", "s"), ("es", "t" + EOW)]
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("low", "lowest", "slow", "best", "x"):
        toks = bpe_apply_word(w, ranks)
        assert "".join(toks) == w + EOW
    assert bpe_apply_word("low", ranks) == ["low" + EOW]
    assert bpe_apply_word("best", ranks) == ["b", "est" + EOW]


def test_bpe_encode_matches_local_reference(spark):
    """Spark-side bpe_encode equals per-doc local application of the
    same merge table; token counts line up; the memoized path is
    value-identical to the unmemoized reference."""
    from tl_spark.operators.bpe import bpe_apply_word, bpe_encode, train_bpe

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quicker brown foxes jumped over lazy dogs"),
        (3, "pack my box with five dozen liquor jugs the the the"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = train_bpe(df, n_merges=25)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
        for r in bpe_encode(df.repartition(3), merges).collect()
    }
    for doc_id, text in docs:
        exp = [t for w in text.split() for t in bpe_apply_word(w, ranks)]
        assert got[doc_id] == (exp, len(exp)), doc_id
    assert got[4] == ([], 0)


def test_train_bpe_sample_mod_is_content_deterministic(spark):
    """sample_mod filters by content hash: the same rows survive no
    matter how the input is partitioned, so merges are reproducible
    even on a sampled corpus."""
    from tl_spark.operators.bpe import train_bpe

    rows = [(f"alpha beta gamma delta epsilon word{i % 13}",) for i in range(300)]
    df = spark.createDataFrame(rows, "text string")
    m1 = train_bpe(df.repartition(2), n_merges=20, sample_mod=3)
    m2 = train_bpe(df.repartition(16), n_merges=20, sample_mod=3)
    assert m1 == m2
    # and sampling changed the corpus vs the full train
    full = train_bpe(df, n_merges=20)
    assert isinstance(full, list)


def test_batch_bpe_equals_scalar_greedy_fuzz():
    """The vectorized batch applier must equal bpe_apply_word (the
    greedy source of truth) word-for-word: random merge tables over a
    small alphabet maximize overlapping runs, repeated pairs, EOW
    interactions, and multi-round rank cascades."""
    import random

    from tl_spark.operators.bpe import (
        EOW,
        _BatchBpe,
        bpe_apply_word,
    )

    rng = random.Random(42)
    alpha = "abc"
    for trial in range(30):
        # random but well-formed merge table: build like training does,
        # always pairing currently-existing symbols
        symbols = list(alpha) + [c + EOW for c in alpha]
        merges = []
        for _ in range(rng.randint(1, 25)):
            a = rng.choice(symbols)
            b = rng.choice([s for s in symbols if not s.endswith(EOW)] or symbols)
            if rng.random() < 0.5:
                a, b = b, a
            if a.endswith(EOW):
                continue
            merges.append((a, b))
            symbols.append(a + b)
        words = list(
            {
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
                for _ in range(60)
            }
        )
        ranks = {p: i for i, p in enumerate(merges)}
        got = _BatchBpe(merges).apply(words)
        for w in words:
            assert got[w] == bpe_apply_word(w, ranks), (trial, w, merges)


def test_batch_bpe_overlapping_runs():
    """Same-symbol runs ('aaaa…') take leftmost-alternating merges,
    exactly like sequential greedy."""
    from tl_spark.operators.bpe import _BatchBpe, bpe_apply_word

    merges = [("a", "a"), ("aa", "aa"), ("aa", "a")]
    ranks = {p: i for i, p in enumerate(merges)}
    words = ["a" * n for n in range(1, 14)]
    got = _BatchBpe(merges).apply(words)
    for w in words:
        assert got[w] == bpe_apply_word(w, ranks), w


def test_batch_bpe_duplicate_product_falls_back_to_exact_mode():
    """Pathological table where 'abc' has TWO derivations: applying a
    later-rank merge can expose a lower-rank pair mid-word, so the
    batch applier must take the one-per-word path and still equal
    greedy."""
    from tl_spark.operators.bpe import _BatchBpe, bpe_apply_word

    # rank0 ('ab','c') requires 'ab' (rank2) — greedy on 'abc…' first
    # applies rank2, which EXPOSES rank0. Duplicate product: rank1
    # ('a','bc') also yields 'abc'.
    merges = [("ab", "c"), ("a", "bc"), ("a", "b"), ("b", "c")]
    bb = _BatchBpe(merges)
    assert not bb.multi_ok
    ranks = {p: i for i, p in enumerate(merges)}
    words = ["abc", "abcabc", "ababc", "bcbc", "abcbc"]
    got = bb.apply(words)
    for w in words:
        assert got[w] == bpe_apply_word(w, ranks), w


def test_batch_bpe_unicode_and_singletons():
    from tl_spark.operators.bpe import _BatchBpe, bpe_apply_word

    merges = [("t", "ö"), ("tö", "k"), ("e", "n" + "▁")]
    ranks = {p: i for i, p in enumerate(merges)}
    words = ["töken", "x", "ö", "tok", "en"]
    got = _BatchBpe(merges).apply(words)
    for w in words:
        assert got[w] == bpe_apply_word(w, ranks), w


def test_batch_bpe_native_and_numpy_legs_both_equal_scalar(monkeypatch):
    """_BatchBpe.apply takes the native leg when the cdylib is
    present; pin BOTH legs against the scalar greedy on the same
    adversarial inputs (the earlier fuzz covers whichever leg is
    active; this covers the other explicitly)."""
    import random

    from tl_spark.kernel import native_entropy
    from tl_spark.operators.bpe import _BatchBpe, bpe_apply_word

    rng = random.Random(99)
    symbols = list("abcd")
    merges = []
    for _ in range(40):
        a, b = rng.choice(symbols), rng.choice(symbols)
        merges.append((a, b))
        symbols.append(a + b)
    ranks = {p: i for i, p in enumerate(merges)}
    words = list(
        {
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 30)))
            for _ in range(150)
        }
    )
    expected = {w: bpe_apply_word(w, ranks) for w in words}

    native_res = _BatchBpe(merges).apply(words)
    assert native_res == expected

    monkeypatch.setattr(native_entropy, "bpe_apply", lambda *a: None)
    numpy_res = _BatchBpe(merges).apply(words)
    assert numpy_res == expected

"""BPE merge training / application (operators/bpe.py)."""

from __future__ import annotations


def _ref_bpe(words: list[tuple[str, int]], merges: int):
    """Pure-Python reference: classic Sennrich BPE over a word-freq table
    (greedy-left non-overlapping merge, tie-break on smallest pair
    string)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in words:
        key = tuple(list(w) + ["</w>"])
        vocab[key] = vocab.get(key, 0) + f
    out = []
    for k in range(1, merges + 1):
        pc: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] = pc.get((sym[i], sym[i + 1]), 0) + f
        if not pc:
            break
        top = max(pc.values())
        best = min((p for p, c in pc.items() if c == top), key=lambda p: f"{p[0]} {p[1]}")
        out.append((k, f"{best[0]} {best[1]}", best[0] + best[1], top))
        nv: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            s, i, ns = list(sym), 0, []
            while i < len(s):
                if i < len(s) - 1 and (s[i], s[i + 1]) == best:
                    ns.append(s[i] + s[i + 1])
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            nv[tuple(ns)] = nv.get(tuple(ns), 0) + f
        vocab = nv
    return out


def test_bpe_train_matches_reference_implementation(spark):
    from data_warehouse_punta_fina_spark.operators.bpe import bpe_train

    words = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    wc = spark.createDataFrame(words, "word string, freq long")
    got = sorted(tuple(r) for r in bpe_train(wc, merges=5).collect())
    assert got == _ref_bpe(words, 5)
    # the classic example learns the 'est</w>' suffix unit first
    assert got[0][1:3] == ("e s", "es") and got[2][1:3] == ("est </w>", "est</w>")


def test_bpe_merge_rewrite_is_greedy_left_on_overlaps(spark):
    from data_warehouse_punta_fina_spark.operators.bpe import bpe_train

    # "aaaa": pairs (a,a)×3 → merge 1 'a a'→'aa' must rewrite greedily
    # left ("aa aa </w>"), not overlap. An overlapping rewrite would leave
    # "aa a a </w>"-style states whose round-2 pair counts differ.
    # Round 2 ties (aa,aa)=10 with (aa,</w>)=10 → lexicographic
    # tie-break picks 'aa </w>' ('<' < 'a').
    words = [("aaaa", 10)]
    wc = spark.createDataFrame(words, "word string, freq long")
    got = sorted(tuple(r) for r in bpe_train(wc, merges=2).collect())
    assert got == _ref_bpe(words, 2)
    assert got[0] == (1, "a a", "aa", 30)
    assert got[1] == (2, "aa </w>", "aa</w>", 10)


def test_bpe_apply_segments_with_learned_merges(spark):
    from data_warehouse_punta_fina_spark.operators.bpe import bpe_apply, bpe_train

    words = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    wc = spark.createDataFrame(words, "word string, freq long")
    mt = bpe_train(wc, merges=5)
    segs = {r["word"]: r["sym"] for r in bpe_apply(wc, mt, merges=5).collect()}
    assert segs["newest"] == "n e w est</w>"
    assert segs["low"] == "low </w>"
    # reassembling any segmentation reproduces word + marker exactly
    for w, sym in segs.items():
        assert sym.replace(" ", "") == w + "</w>"


def test_bpe_single_char_words_produce_no_phantom_pairs(spark):
    from data_warehouse_punta_fina_spark.operators.bpe import bpe_train

    # single-letter words have exactly one pair (char, </w>); Spark's
    # sequence(1, 0) descending-step pitfall must not fabricate pairs
    words = [("a", 7), ("b", 3)]
    wc = spark.createDataFrame(words, "word string, freq long")
    got = sorted(tuple(r) for r in bpe_train(wc, merges=2).collect())
    assert got == _ref_bpe(words, 2)
    assert got[0] == (1, "a </w>", "a</w>", 7)
    # after both merges the vocabulary is exhausted — exactly 2 rows
    assert len(got) == 2

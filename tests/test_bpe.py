"""BPE trainer/encoder tests: a pure-Python loop reference (the
Sennrich et al. 2016 algorithm verbatim) pins the distributed trainer
differentially, the classic paper corpus pins it by hand, and the
encode stats are checked against their arithmetic law."""

from collections import Counter

import pandas as pd
import pytest

from hotdog_spark.operators.bpe import (
    EOW,
    _merge_once,
    bpe_encode_stats,
    bpe_train,
)


def _ref_train(wordcounts: dict[str, int], n_merges: int, min_pc: int = 2):
    vocab = {w: list(w) + [EOW] for w in wordcounts}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, c in wordcounts.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pc:
            break
        merges.append((a, b, cnt))
        for w in vocab:
            vocab[w] = _merge_once(vocab[w], a, b)
    return merges


def test_merge_once_overlaps_resolve_left_first():
    assert _merge_once(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_once(["x", "a", "b", "a", "b"], "a", "b") == ["x", "ab", "ab"]
    assert _merge_once(["a"], "a", "a") == ["a"]


def test_bpe_train_classic_corpus(spark):
    """The Sennrich paper's corpus: low×5, lower×2, newest×6, widest×3.
    First merges must be (e,s)→es then (es,t)→est (count 9 each) — the
    published walkthrough — and the whole table must equal the loop
    reference."""
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    rows = []
    did = 0
    for w, c in wc.items():
        for _ in range(c):
            rows.append((did, w))
            did += 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = bpe_train(df, "text", n_merges=8)
    assert got == _ref_train(wc, 8)
    assert got[0] == ("e", "s", 9)
    assert got[1] == ("es", "t", 9)


def test_bpe_train_differential_random_corpus(spark):
    """Multi-word documents with repeated words: the distributed trainer
    (explode → weighted pair aggregate → argmax → kernel rewrite) must
    equal the reference on a corpus where ties and full-word collapses
    both occur."""
    docs = [
        (1, "aa aa ab ba"),
        (2, "aa ab ab cc"),
        (3, "ba ba aa dd dd dd"),
        (4, "e e e e"),
    ]
    wc: Counter = Counter()
    for _, t in docs:
        wc.update(t.split())
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = bpe_train(df, "text", n_merges=10)
    assert got == _ref_train(dict(wc), 10)


def test_bpe_encode_stats_law_and_values(spark):
    """n_merges_applied == n_chars_tok + n_words - n_bpe_tokens always;
    with merges [(l,o),(lo,w)] the word 'low' encodes to [low? no —
    'low' → l o w </w> → lo w </w> → low </w>] = 2 tokens."""
    df = spark.createDataFrame(
        pd.DataFrame([(1, "low low lower"), (2, "wide")],
                     columns=["doc_id", "text"])
    )
    merges = [("l", "o", 7), ("lo", "w", 7)]
    out = {r["doc_id"]: r.asDict()
           for r in bpe_encode_stats(df, "text", "doc_id", merges).collect()}
    # doc 1: 'low'→[low,</w>]=2, ×2; 'lower'→[low,e,r,</w>]=4
    assert out[1]["n_words"] == 3
    assert out[1]["n_chars_tok"] == 11
    assert out[1]["n_bpe_tokens"] == 2 + 2 + 4
    # doc 2: no merge applies → 4 chars + EOW
    assert out[2]["n_bpe_tokens"] == 5
    for r in out.values():
        assert (r["n_merges_applied"]
                == r["n_chars_tok"] + r["n_words"] - r["n_bpe_tokens"])


def test_oracle_separator_absent_from_corpora():
    """The unrolled-CTE DuckDB oracle (queries/_bpe_oracle.py) encodes
    symbol sequences with chr(31) separators and relies on neither
    chr(31) nor a literal '</w>' appearing in documents.text.  Guard the
    assumption against testdata regeneration."""
    import duckdb
    import os

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{path}') "
            "WHERE contains(text, chr(31)) OR contains(text, '</w>')"
        ).fetchone()[0]
        assert n == 0, f"{path}: {n} docs contain the oracle separator"
    con.close()


def test_every_registered_query_has_an_oracle():
    """Driver-contract invariant (VERDICT r6 item 1): the driver scores
    oracle-less registrations as errors, so the registry must have ZERO
    of them — plans whose outputs are engine-specific belong in the
    bench-only registry instead."""
    from hotdog_spark.queries import all_oracles, all_queries

    missing = sorted(set(all_queries()) - set(all_oracles()))
    assert missing == [], f"registered without DuckDB oracle: {missing}"


def test_driver_and_distributed_training_paths_agree(spark):
    """The driver-side merge loop (vocab fits VOCAB_COLLECT_LIMIT — the
    default path) and the fully distributed iteration (forced with
    vocab_collect_limit=0) must learn IDENTICAL merge tables: same
    pairs, same order, same weighted counts."""
    import pandas as pd

    docs = [(i, f"low lower lowest newer new wide doc{i % 7}") for i in range(40)]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    local = bpe_train(df, "text", n_merges=12)
    dist = bpe_train(df, "text", n_merges=12, vocab_collect_limit=0)
    assert local == dist and len(local) == 12


def test_oracle_mirrors_engine_early_stop_on_exhausted_pairs(spark):
    """ADVICE r7: the unrolled oracle must carry the engine's
    min_pair_count=2 early-stop.  On a corpus whose count>=2 pairs
    exhaust well before 20 rounds, the engine breaks — the oracle's
    HAVING must stop at the same round (same merge table), and the
    encode chain must pass symbols through unchanged afterwards rather
    than NULL-poisoning every word via replace(s, NULL, NULL)."""
    import duckdb

    from hotdog_spark.queries._bpe_oracle import (
        bpe_encode_oracle,
        bpe_train_oracle,
    )

    docs = pd.DataFrame(
        [(1, "ab ab cd"), (2, "qq")], columns=["doc_id", "text"]
    )
    df = spark.createDataFrame(docs)
    got = bpe_train(df, "text", n_merges=20)
    # count>=2 pairs exhaust after a handful of merges
    assert 0 < len(got) < 20
    assert all(pc >= 2 for _, _, pc in got)

    con = duckdb.connect()
    con.register("documents", docs)
    oracle_rows = con.execute(bpe_train_oracle(20)).fetchall()
    assert [(a, b, pc) for _, a, b, pc in sorted(oracle_rows)] == got

    enc = con.execute(bpe_encode_oracle(20)).fetchdf()
    assert enc["n_bpe_tokens"].notna().all()
    assert (enc["n_bpe_tokens"] > 0).all()
    con.close()


def test_wordpiece_selection_differs_from_bpe(spark):
    """The likelihood rule must pick the EXCLUSIVE pair over the merely
    FREQUENT one: corpus where (x,y) occurs 2x with x,y occurring only
    in that context (score 2/(2*2)=1/2) while (a,b) occurs 5x but a and
    b are common elsewhere (score 5/(12*12)) — WordPiece merges 'xy'
    first, BPE merges by raw count and picks something else."""
    from hotdog_spark.operators.bpe import bpe_train, wordpiece_train

    # words: 'xy' x2; 'ab' x5; 'a' alone x7; 'b' alone x7
    text = " ".join(["xy"] * 2 + ["ab"] * 5 + ["a"] * 7 + ["b"] * 7)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    wp = wordpiece_train(df, "text", n_merges=1)
    bp = bpe_train(df, "text", n_merges=1)
    (a, b, pc, ca, cb) = wp[0]
    assert (a, b) == ("x", "y") and pc == 2 and ca == 2 and cb == 2
    assert (bp[0][0], bp[0][1]) != ("x", "y")  # BPE goes for frequency


def test_wordpiece_driver_and_distributed_paths_agree(spark):
    """Local (collected vocab) and forced-distributed
    (vocab_collect_limit=0) WordPiece training must learn IDENTICAL
    merge tables including the count provenance columns."""
    import random

    from hotdog_spark.operators.bpe import wordpiece_train

    rng = random.Random(8)
    vocab = ["spark", "sparse", "parse", "parquet", "shuffle", "huddle",
             "row", "rows", "rowset", "set", "get", "jetset"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(30))) for i in range(12)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    local = wordpiece_train(df, "text", n_merges=10)
    dist = wordpiece_train(df, "text", n_merges=10, vocab_collect_limit=0)
    assert local == dist and len(local) == 10


def test_wordpiece_handchecked_first_rounds(spark):
    """Independent hand-derivation on a 2-word corpus: 'to' x4, 'too' x1.
    Round 1 symbol counts: t=5, o=6, </w>=5; pairs: (t,o)=5 -> 5/30,
    (o,</w>)=5 -> 5/30, (o,o)=1 -> 1/36.  Score tie 5/30: cross-mult
    equal, lexicographic tiebreak 'o' < 't' picks ('o','</w>').
    Round 2 after merging: 'to'=[t,o</w>], 'too'=[t,o,o</w>]; symbol
    counts t=5, o</w>=5, o=1; pairs (t,o</w>)=4 -> 4/25,
    (t,o)=1 -> 1/5, (o,o</w>)=1 -> 1/(1*5)=1/5.  Another exact tie at
    1/5; 'o' < 't' picks ('o','o</w>') — count-1 beats count-4."""
    from hotdog_spark.operators.bpe import wordpiece_train

    df = spark.createDataFrame(
        [(1, "to to to to too")], "doc_id long, text string"
    )
    merges = wordpiece_train(df, "text", n_merges=2, min_pair_count=1)
    assert merges[0] == ("o", "</w>", 5, 6, 5)
    assert merges[1] == ("o", "o</w>", 1, 1, 5)

"""Property tests (hypothesis) for the packing and chunk-dedup laws —
invariants that must hold for ANY input, not just the oracle fixtures:

* split packing conserves tokens, fills every bin exactly except each
  group-stream's last, and numbers a doc's pieces contiguously;
* no-split packing never splits and bounds bin overshoot by the bin's
  largest doc;
* chunk dedup conserves text when nothing repeats across docs.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hotdog_spark.operators import dedup, sampling

_doc_lists = st.lists(
    st.integers(min_value=1, max_value=40), min_size=1, max_size=12
)
_budgets = st.integers(min_value=2, max_value=17)


@settings(max_examples=15, deadline=None)
@given(tokens=_doc_lists, budget=_budgets)
def test_pack_split_laws(spark, tokens, budget):
    rows = [(i, n) for i, n in enumerate(tokens)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = sampling.pack_split_spans(df, "doc_id", "n", budget).collect()

    by_doc: dict[int, list] = {}
    by_bin: dict[int, int] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.piece_idx, r.piece_tokens))
        by_bin[r.bin] = by_bin.get(r.bin, 0) + r.piece_tokens

    # token conservation + contiguous piece ordinals per doc
    for i, n in enumerate(tokens):
        pieces = sorted(by_doc[i])
        assert sum(p for _, p in pieces) == n
        assert [idx for idx, _ in pieces] == list(range(len(pieces)))
        assert all(p >= 1 for _, p in pieces)

    # every bin exactly full except the stream's last
    total = sum(tokens)
    last_bin = (total - 1) // budget
    assert set(by_bin) == set(range(last_bin + 1))
    for b, t in by_bin.items():
        if b < last_bin:
            assert t == budget, (b, t, by_bin)
    assert by_bin[last_bin] == total - last_bin * budget


@settings(max_examples=10, deadline=None)
@given(tokens=_doc_lists, budget=_budgets)
def test_pack_no_split_overshoot_bound(spark, tokens, budget):
    rows = [(i, n) for i, n in enumerate(tokens)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = sampling.pack_token_budget(df, "doc_id", "n", budget).collect()
    assert len(out) == len(tokens)  # one row per doc: nothing split
    by_bin: dict[int, list] = {}
    for r in out:
        by_bin.setdefault(r.bin, []).append(r.n)
    for b, ns in by_bin.items():
        assert sum(ns) <= budget + max(ns)  # documented slack bound


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=50_000),
            min_size=1,
            max_size=25,
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: tuple(t),
    )
)
def test_dedup_chunks_identity_without_cross_doc_repeats(spark, texts):
    """Make every token globally unique by prefixing its doc id: no chunk
    can repeat across docs, so dedup must return every doc verbatim."""
    rows = [
        (i, " ".join(f"d{i}w{w}" for w in ws)) for i, ws in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in dedup.dedup_chunks(df, "text", "doc_id").collect()}
    for i, text in rows:
        assert got[i].clean_text == text
        assert got[i].n_removed == 0

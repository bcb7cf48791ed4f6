"""Distributed BPE induction (operators/bpe.py) vs a bit-exact pure-python
twin of the classic Sennrich learn_bpe loop — same word-type weighting,
same (freq desc, left asc, right asc) tie-break, same greedy
left-to-right merge application, same min_pair_freq stop."""

from __future__ import annotations

import collections

import pytest

from research_knowledge_graph_spark.operators.bpe import (
    END_OF_WORD,
    learn_bpe,
    segment_words,
    word_types,
)


def _py_word_types(texts):
    import re

    c = collections.Counter()
    for t in texts:
        for w in re.split("[^a-z]+", t.lower()):
            if w:
                c[w] += 1
    return c


def _py_apply(syms, left, right):
    out = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return tuple(out)


def _py_learn_bpe(texts, num_merges, min_pair_freq=2):
    state = {
        tuple(w) + (END_OF_WORD,): f for w, f in _py_word_types(texts).items()
    }
    merges = []
    for rank in range(1, num_merges + 1):
        pc = collections.Counter()
        for syms, f in state.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        # (freq desc, left asc, right asc) total order
        (left, right), pf = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if pf < min_pair_freq:
            break
        merges.append((rank, left, right, left + right, pf))
        nxt = collections.Counter()
        for syms, f in state.items():
            nxt[_py_apply(syms, left, right)] += f
        state = dict(nxt)
    return merges


TEXTS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
    "the cat sat on the mat the cat",
]


def test_learn_bpe_matches_python_twin(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_freq)
        for r in learn_bpe(docs, num_merges=12).orderBy("rank").collect()
    ]
    want = _py_learn_bpe(TEXTS, num_merges=12)
    assert got == want
    assert len(got) >= 8  # the planted corpus supports a real merge run
    # rank 1 on this corpus: 'e'+'s' inside newest*8... verified by the
    # twin; spot-pin the weighting is by token count not word type:
    assert got[0][4] >= 8


def test_learn_bpe_self_pair_greedy(spark):
    """'aaaa' under merge (a,a) must fold to [aa, aa] — the classic
    non-overlapping greedy semantics (and the fold-correctness edge)."""
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    merges = learn_bpe(docs, num_merges=1)
    row = merges.collect()[0]
    assert (row.left, row.right) == ("a", "a")
    seg = segment_words(
        spark.createDataFrame([("aaaa",)], "word string"), merges
    ).collect()[0]
    assert seg.pieces == ["aa", "aa", END_OF_WORD]


def test_learn_bpe_stop_and_guard(spark):
    """All-hapax corpus: no pair reaches min_pair_freq=2 -> empty merge
    table (early stop), schema intact; num_merges < 1 raises."""
    docs = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    m = learn_bpe(docs, num_merges=5)
    assert m.count() == 0
    assert [f.name for f in m.schema.fields] == [
        "rank", "left", "right", "merged", "pair_freq",
    ]
    with pytest.raises(ValueError):
        learn_bpe(docs, num_merges=0)


def test_segmentation_fertility_python_twin(spark):
    """Per-source pieces-per-token in exact floor ppm vs the twin: the
    word-final bare END_OF_WORD marker is not a piece; sources are split
    correctly; weighting is by token frequency, not word type."""
    from research_knowledge_graph_spark.operators.bpe import (
        segmentation_fertility,
    )

    rows = [(i, t, "s%d" % (i % 2)) for i, t in enumerate(TEXTS)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    merges = learn_bpe(docs, num_merges=12)
    table = [
        (r.left, r.right) for r in merges.orderBy("rank").collect()
    ]

    def pieces(word):
        syms = tuple(word) + (END_OF_WORD,)
        for left, right in table:
            syms = _py_apply(syms, left, right)
        return len(syms) - (1 if syms[-1] == END_OF_WORD else 0)

    per_source = collections.defaultdict(collections.Counter)
    for _, t, src in rows:
        per_source[src].update(_py_word_types([t]))
    want = {}
    for src, wc in per_source.items():
        n_tok = sum(wc.values())
        p_tot = sum(f * pieces(w) for w, f in wc.items())
        want[src] = (n_tok, len(wc), p_tot, (1000000 * p_tot) // n_tok)
    got = {
        r.source: (r.n_tokens, r.n_word_types, r.pieces_total, r.fertility_ppm)
        for r in segmentation_fertility(docs, merges).collect()
    }
    assert got == want
    # fertility must be >= 1 token-piece per token everywhere
    assert all(v[3] >= 1000000 for v in got.values())


def test_segment_words_applies_in_rank_order(spark):
    """Training segmentation == applying the learned table: segmenting the
    training words with the learned merges reproduces the final training
    state of the python twin."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = learn_bpe(docs, num_merges=12)
    words = word_types(docs).select("word")
    got = {
        r.word: tuple(r.pieces) for r in segment_words(words, merges).collect()
    }
    # python twin's final state, replayed through the same merge list
    table = _py_learn_bpe(TEXTS, num_merges=12)
    want = {}
    for w in _py_word_types(TEXTS):
        syms = tuple(w) + (END_OF_WORD,)
        for _, left, right, _, _ in table:
            syms = _py_apply(syms, left, right)
        want[w] = syms
    assert got == want


def test_segment_words_deep_merge_table_no_stack_overflow(spark):
    """1000 merges through segment_words — the uncut expression chain
    overflowed Catalyst's TreeNode recursion around a few hundred nested
    F.aggregate folds (StackOverflowError, reproduced at k=1000); the
    periodic localCheckpoint cut must carry a real-vocabulary-sized merge
    table. Mostly no-op merges: plan depth is what's under test, plus the
    few real merges asserting the fold still applies correctly."""
    from research_knowledge_graph_spark.operators.bpe import END_OF_WORD, segment_words

    real = [("a", "b"), ("ab", "c"), ("abc", END_OF_WORD)]
    noop = [(f"zz{i}", f"qq{i}") for i in range(997)]
    merges = spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(real + noop)],
        "rank int, left string, right string",
    )
    words = spark.createDataFrame([("abc",), ("abd",)], "word string")
    out = {r.word: r.pieces for r in segment_words(words, merges).collect()}
    assert out["abc"] == ["abc" + END_OF_WORD]
    assert out["abd"] == ["ab", "d", END_OF_WORD]

"""Distributed BPE (byte-pair-encoding) vocabulary induction — the
canonical LLM-tokenizer training pass, expressed Spark-first.

The trick that makes corpus-scale BPE cheap is the same one every real
trainer (Sennrich et al. 2016's learn_bpe, SentencePiece, HF tokenizers)
uses: merges are a function of the WORD-TYPE frequency table, not of the
token stream. One corpus-wide groupBy collapses 10¹² token instances to a
vocabulary-sized frame (word_type, freq) — tens of millions of rows at
web scale, each carrying its symbol sequence — and every merge round then
runs on that small frame:

  1. explode adjacent symbol pairs per word type, weighted by freq
     (map-side combinable hash-agg on the pair key),
  2. take the argmax pair with a total-order tie-break
     (freq desc, left asc, right asc) — ONE driver-side row per round
     (the bounded O(1) collect class, same as bm25's stats scalar),
  3. apply the merge with a pure-Catalyst left-to-right fold
     (F.aggregate) over each word's symbol array — map-only, no Python,
  4. localCheckpoint the evolved frame (iterative lineage — the
     shortest_paths/LPA discipline).

Greedy left-to-right application note: after replacing the trailing
symbol `a` with `a||b`, the new tail no longer equals `a` (b is
non-empty), so the single-pass fold reproduces the classic
non-overlapping greedy semantics even for self-pairs — "aaaa" under
(a,a) folds to ["aa", "aa"], exactly what learn_bpe does.

Determinism: the tie-break makes the learned merge table a pure function
of the corpus (bit-stable across partitionings and cluster sizes);
pinned by a bit-exact pure-python twin in tests/test_bpe.py. The
reference has no tokenizer-training surface; this extends the
LLM-data-pipeline tier (SURVEY §2 extras) alongside t18/t36/t37.

Scale: corpus-proportional work happens once (the word-type groupBy);
each of the k merge rounds is one agg + one map over the vocabulary
frame. Word-type keys are near-uniform (no hot key: the weight rides in
the freq column, not in row multiplicity). The driver holds k rows total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"

# plan-depth cut interval for the merge-apply fold (see segment_words):
# 100 nested F.aggregate folds sit comfortably under Catalyst's TreeNode
# recursion limit (k=200 confirmed fine, k=1000 overflows uncut)
_SEGMENT_CHECKPOINT_EVERY = 100


def _exploded_words(docs: DataFrame, text_col: str, *extra_cols: str) -> DataFrame:
    """THE tokenization (lower + split on non-letter runs, every non-empty
    word) — one home, shared by training (:func:`word_types`) and
    evaluation (:func:`segmentation_fertility`), so the fertility metric
    can never drift onto a different word distribution than the merges
    were learned on."""
    return docs.select(
        *extra_cols,
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word"),
    ).filter(F.length("word") >= 1)


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lower + split on non-letter runs, keeping every
    non-empty word — BPE wants the full distribution, so no length floor
    (deliberately NOT _tok3's ≥3 filter)."""
    return (
        _exploded_words(docs, text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Char-split each word type and append the end-of-word marker (the
    Sennrich formulation: '</w>' makes word-final merges distinct)."""
    return words.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), "(?!^)(?=.)"), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """freq-weighted adjacent-pair counts over the symbol arrays: zip the
    array with its own tail (map-side, pure Catalyst), explode, hash-agg
    on the pair key."""
    pairs = F.expr(
        "zip_with(slice(syms, 1, size(syms) - 1),"
        "         slice(syms, 2, size(syms) - 1),"
        "         (l, r) -> struct(l AS left, r AS right))"
    )
    return (
        state.filter(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").cast("long").alias("pair_freq"))
    )


def _apply_merge(state: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of adjacent (left, right) in every
    symbol array — a pure-Catalyst fold: if the accumulated tail equals
    `left` and the incoming symbol is `right`, fuse them, else append."""
    l_lit = F.lit(left)
    r_lit = F.lit(right)
    merged = F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        # try_element_at: NULL (→ false branch) on the empty accumulator —
        # a plain element_at(-1) would throw under ANSI mode if the
        # optimizer reorders the conjuncts
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == l_lit) & (s == r_lit),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(l_lit, r_lit)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    return state.select("word", "freq", merged.alias("syms"))


def learn_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a document corpus; returns the
    merge table (rank, left, right, merged, pair_freq) — rank 1 is the
    first (highest-frequency) merge. Stops early when no pair reaches
    ``min_pair_freq`` (merging hapax pairs encodes noise). The spark
    session must come from the caller's docs frame; each round's argmax
    is a single-row driver collect (bounded O(1) per round)."""
    if num_merges < 1:
        raise ValueError(f"learn_bpe() needs num_merges >= 1, got {num_merges}")
    state = _initial_symbols(word_types(docs, text_col)).localCheckpoint(
        eager=True
    )
    out: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        top = (
            _pair_counts(state)
            .orderBy(F.desc("pair_freq"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0].pair_freq < min_pair_freq:
            break
        left, right, pf = top[0].left, top[0].right, top[0].pair_freq
        out.append((rank, left, right, left + right, pf))
        state = _apply_merge(state, left, right).localCheckpoint(eager=True)
    spark = docs.sparkSession
    return spark.createDataFrame(
        out, "rank long, left string, right string, merged string, pair_freq long"
    )


def segmentation_fertility(
    docs: DataFrame, merges: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Tokenizer fertility per source — the standard tokenizer-quality
    read (pieces emitted per word token; 1.0 = every word is one piece,
    higher = the vocabulary fits the corpus worse). Applies the learned
    merge table via :func:`segment_words` to the DISTINCT word types
    (vocabulary-sized work), then joins the per-word piece count back
    onto per-(source, word) frequencies, so corpus-proportional work is
    one groupBy — the same word-type compression as training.

    A word-final bare ``</w>`` (marker never merged into a piece) is not
    a piece: ``n_pieces(word) = size(pieces) − 1`` in that case.
    Returns (source, n_tokens, n_word_types, pieces_total,
    fertility_ppm) — exact bigints, floor-div ppm."""
    wt = (
        _exploded_words(docs, text_col, "source")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    seg = segment_words(wt.select("word").distinct(), merges)
    n_pieces = (
        F.size("pieces")
        - F.when(
            F.try_element_at(F.col("pieces"), F.lit(-1)) == F.lit(END_OF_WORD),
            F.lit(1),
        ).otherwise(F.lit(0))
    ).cast("long")
    return (
        wt.join(seg.select("word", n_pieces.alias("n_pieces")), "word")
        .groupBy("source")
        .agg(
            F.sum("freq").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_word_types"),
            F.sum(F.col("freq") * F.col("n_pieces"))
            .cast("long")
            .alias("pieces_total"),
        )
        .withColumn(
            "fertility_ppm",
            F.expr("(1000000 * pieces_total) div n_tokens").cast("long"),
        )
    )


def segment_words(
    words: DataFrame, merges: DataFrame, word_col: str = "word"
) -> DataFrame:
    """Apply a learned merge table to a words frame: adds a ``pieces``
    array<string> column — the trained tokenizer's segmentation. Merges
    are applied in rank order, each as the same pure-Catalyst fold used
    during training, so train/apply cannot diverge. The merge table is a
    driver-side list by construction (k rows, k = num_merges).

    The plan is CUT every ``_SEGMENT_CHECKPOINT_EVERY`` merges
    (localCheckpoint, same discipline as training's per-round cut):
    each ``_apply_merge`` nests another ``F.aggregate`` inside the
    previous expression, and one unbroken chain overflows Catalyst's
    TreeNode recursion around a few hundred merges — a real BPE table is
    8k-32k merges, so an uncut apply path cannot run at all
    (StackOverflowError, reproduced at k=1000)."""
    state = words.select(
        F.col(word_col).alias("word"),
        F.lit(1).cast("long").alias("freq"),
        F.concat(
            F.split(F.col(word_col), "(?!^)(?=.)"), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
    )
    for i, m in enumerate(merges.orderBy("rank").collect(), start=1):
        state = _apply_merge(state, m.left, m.right)
        if i % _SEGMENT_CHECKPOINT_EVERY == 0:
            state = state.localCheckpoint(eager=True)
    return state.select("word", F.col("syms").alias("pieces"))

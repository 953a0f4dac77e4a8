"""Byte-pair-encoding merge training over a distributed word vocabulary.

Tokenizer TRAINING as a Spark-iterative algorithm — the complement of
the tokenizer-application expressions in ``functions/text.py``
(``bpe_ish_tokens`` applies a fixed regex segmentation; this LEARNS the
merge table a real BPE tokenizer applies).  The reference pipeline has
no tokenizer at all (/root/reference/airflow.py is schema ETL); this
belongs to the training-data surface the build brief adds.

Scale design: classic BPE trains on the WORD VOCABULARY, not the
corpus — the only corpus-sized job is the initial word count (one
shuffle).  Every merge iteration then runs over the dim-sized distinct
(word, count) relation: one adjacent-pair count aggregate, a 1-row
argmax collect (the bounded scalar action the PageRank convergence
check also uses), and one Arrow ``mapInPandas`` pass applying the
merge pair left-to-right.  Determinism: integer pair counts are
summation-order-exact and the argmax is total-ordered by
(count DESC, left, right), so the learned merge list is a pure
function of the vocabulary — property-tested equal to a plain-Python
reference and invariant under repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_vocab(words: DataFrame, word_col: str = "word", n_col: str = "n") -> DataFrame:
    """(word, count) -> (symbols array<string>, n): initial character
    segmentation.  ``regexp_extract_all('.')`` rather than
    ``split(col, '')`` — the empty-pattern split's boundary behavior is
    engine-version lore; the dot-per-char form is explicit."""
    return words.select(
        F.regexp_extract_all(F.col(word_col), F.lit("."), 0).alias("symbols"),
        F.col(n_col).cast("long").alias("n"),
    ).filter(F.size("symbols") > 0)


def _apply_merge(left: str, right: str):
    merged = left + right

    def apply(batches):
        for pdf in batches:
            def merge_seq(seq):
                out = []
                i = 0
                n = len(seq)
                while i < n:
                    if i + 1 < n and seq[i] == left and seq[i + 1] == right:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                return out

            pdf = pdf.copy()
            pdf["symbols"] = pdf["symbols"].map(merge_seq)
            yield pdf

    return apply


def bpe_train(vocab: DataFrame, n_merges: int) -> list[tuple[int, str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from a (symbols, n) vocab.
    Returns [(rank, left, right, pair_count)], most frequent first;
    stops early when no adjacent pair remains.  Left-to-right,
    non-overlapping merge application (the standard BPE rule: in
    'aaa' the pair (a,a) merges once at position 0, leaving 'aa a')."""
    spark = vocab.sparkSession
    cur = vocab.select("symbols", "n").persist()
    cur.count()
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(n_merges):
            pairs = (
                cur.filter(F.size("symbols") >= 2)
                .select(
                    F.explode(
                        F.arrays_zip(
                            F.slice("symbols", 1, F.size("symbols") - 1),
                            F.slice("symbols", 2, F.size("symbols") - 1),
                        )
                    ).alias("p"),
                    "n",
                )
                .select(
                    F.col("p").getField("0").alias("left"),
                    F.col("p").getField("1").alias("right"),
                    "n",
                )
            )
            best = (
                pairs.groupBy("left", "right")
                .agg(F.sum("n").alias("cnt"))
                .orderBy(F.desc("cnt"), "left", "right")
                .limit(1)
                .collect()
            )
            if not best:
                break
            left, right, cnt = best[0].left, best[0].right, int(best[0].cnt)
            merges.append((rank, left, right, cnt))
            nxt = cur.mapInPandas(
                _apply_merge(left, right), schema="symbols array<string>, n long"
            ).persist()
            nxt.count()  # materialize before dropping the parent cache
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def bpe_train_df(vocab: DataFrame, n_merges: int) -> DataFrame:
    """The learned merge table as a DataFrame:
    (rank, left, right, merged, pair_count)."""
    spark = vocab.sparkSession
    merges = bpe_train(vocab, n_merges)
    return spark.createDataFrame(
        [(r, a, b, a + b, c) for r, a, b, c in merges],
        "rank LONG, left STRING, right STRING, merged STRING, pair_count LONG",
    )


def _apply_all_merges(merges: list[tuple[str, str]]):
    def apply(batches):
        for pdf in batches:
            def seg(seq):
                seq = list(seq)
                for left, right in merges:
                    out = []
                    i = 0
                    n = len(seq)
                    while i < n:
                        if i + 1 < n and seq[i] == left and seq[i + 1] == right:
                            out.append(left + right)
                            i += 2
                        else:
                            out.append(seq[i])
                            i += 1
                    seq = out
                return seq

            pdf = pdf.copy()
            pdf["pieces"] = pdf["symbols"].map(seg)
            yield pdf[["word", "pieces"]]

    return apply


def bpe_segment_words(
    words: DataFrame, merges: list[tuple[int, str, str, int]], word_col: str = "word"
) -> DataFrame:
    """Segment each distinct word with a learned merge table: ONE Arrow
    pass over the vocab applying all merges in rank order (application
    is cheap; it is training that needs per-merge recounts).  Returns
    (word, pieces array<string>).  The corpus-scale pattern: segment
    the DISTINCT words once, then join the tiny word->pieces map back
    to the corpus — tokenization cost scales with vocabulary, not
    corpus volume."""
    pairs = [(a, b) for _, a, b, _ in merges]
    base = words.select(
        F.col(word_col).alias("word"),
        F.regexp_extract_all(F.col(word_col), F.lit("."), 0).alias("symbols"),
    ).filter(F.size("symbols") > 0)
    return base.mapInPandas(
        _apply_all_merges(pairs), schema="word string, pieces array<string>"
    )

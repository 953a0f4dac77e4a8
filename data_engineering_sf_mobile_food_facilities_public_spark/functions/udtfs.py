"""Python user-defined table functions (Spark 4 UDTF API).

The table-function tier of the custom-operator ladder: when a 1:N
row expansion needs imperative Python (a real sentence segmenter, a
parser, a tokenizer with state), a UDTF keeps it composable inside the
plan — it participates in LATERAL joins, its output schema is declared,
and Spark parallelizes it per input partition like any map stage.

This module keeps the deterministic reference instance simple (literal
'. ' split) so the DuckDB oracle can reproduce it exactly; swap the
``eval`` body for a model-backed segmenter in production.  UDTFs are a
Python-process hop per batch — use built-in ``explode``/``split`` when
the logic fits expressions (see plans/analytics.py posexplode_words for
that fast path).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sent_idx: int, sentence: string")
class SentenceSplit:
    """Expand one text into (ordinal, sentence) rows, splitting on the
    literal '. ' boundary — deterministic, engine-reproducible."""

    def eval(self, text: str):  # noqa: D102 - contract defined by Spark
        if text is None:
            return
        for i, part in enumerate(text.split(". ")):
            yield i, part


def register_udtfs(spark) -> None:
    """Register all module UDTFs for SQL/LATERAL use."""
    spark.udtf.register("sentence_split", SentenceSplit)

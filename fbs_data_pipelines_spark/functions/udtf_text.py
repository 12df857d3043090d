"""Python UDTF surface (Spark 4 `pyspark.sql.functions.udtf`) —
table-valued text functions for SQL `LATERAL` use.

Spark 4 added user-defined TABLE functions: a Python class whose
``eval`` yields zero-or-more rows per input row, callable from SQL as
``FROM t, LATERAL fn(t.col)`` — the engine's extension point for
one-to-many transforms that don't fit a generator built-in. This
module keeps the rules deliberately engine-replayable (literal
splits, whitespace token counts) so the same output can be produced
by any SQL engine for verification.

UDTFs are the PYTHON slow path (per-row eval, like row-at-a-time
UDFs) — the engine's own sentence/token machinery in
``functions/text.py`` stays expression-based for hot paths; a UDTF
is for logic that genuinely needs imperative Python per row while
preserving the relational shape. At scale the lateral join
parallelizes per input partition with no shuffle of its own.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="idx int, sentence string, n_tokens int")
class SplitSentences:
    """Sentence segmentation as a table function: split on the
    literal ``'. '`` boundary (the same non-overlapping left-to-right
    literal split as SQL ``string_split``), trim, drop empties, and
    count whitespace tokens per sentence. ``idx`` is 1-based over the
    ORIGINAL split (gaps where empties were dropped are preserved —
    positional provenance survives filtering)."""

    def eval(self, text: str):  # noqa: D102 — contract in class doc
        if text is None:
            return
        for i, raw in enumerate(text.split(". "), start=1):
            s = raw.strip()
            if not s:
                continue
            yield i, s, len(re.split(r"\s+", s))


def register_text_udtfs(spark) -> list[str]:
    """Register this module's UDTFs for SQL use; returns the names.
    Safe to call repeatedly (re-registration replaces)."""
    spark.udtf.register("split_sentences", SplitSentences)
    return ["split_sentences"]

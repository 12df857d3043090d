"""QUALIFY clause front door.

Spark SQL (4.1) does not parse ``QUALIFY``; DuckDB / BigQuery /
Snowflake do (filter on window-function results without writing the
subquery by hand — the reference's embedded-SQL door
(/root/reference/src/db_manager.py:26-76) is DuckDB, where QUALIFY is
idiomatic). ``sql_qualify`` accepts the QUALIFY dialect and rewrites
it to plain Spark SQL at the string level:

    SELECT <list> FROM … [WHERE …] [GROUP BY …] [HAVING …]
    QUALIFY <pred> [ORDER BY …] [LIMIT …]

becomes

    SELECT * FROM (
        SELECT <list>, (<pred'>) AS __qualify FROM … WHERE … GROUP BY …
    ) __qualify_sub WHERE __qualify [ORDER BY …] [LIMIT …]

with the helper column dropped from the returned DataFrame. Window
functions are legal in a projection, so the predicate — which may
contain its own ``OVER (…)`` calls — moves there verbatim;
select-list ALIASES referenced by the predicate (``QUALIFY rn <= 2``)
are substituted with their defining expressions (``<pred'>``), which
implements standard QUALIFY scoping without relying on Spark's
lateral-column-alias resolution. Trailing ORDER BY / LIMIT attach to
the OUTER query, so they see the filtered rows — exactly QUALIFY's
evaluation order (WHERE → GROUP BY/HAVING → windows → QUALIFY →
ORDER BY → LIMIT).

All scanning is quote- and paren-aware (the ``sql_merge`` state
machine), so literals like ``'not a QUALIFY'`` or subqueries in the
select list never split mid-expression. ``SELECT DISTINCT … QUALIFY``
is rejected (appending the helper column would change the distinct
key); statements without a top-level QUALIFY pass through to
``spark.sql`` untouched.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from fbs_data_pipelines_spark.sql_merge import _split_top_level

_KEYWORD = {"QUALIFY", "FROM", "SELECT", "ORDER", "LIMIT"}


def _top_level_positions(text: str) -> list[tuple[str, int]]:
    """(keyword, start) for every top-level occurrence of the
    keywords we care about, outside quotes and parentheses."""
    out: list[tuple[str, int]] = []
    depth, quote, i, n = 0, None, 0, len(text)
    while i < n:
        ch = text[i]
        if quote:
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            i += 1
            continue
        if ch == "(":
            depth += 1
            i += 1
            continue
        if ch == ")":
            depth -= 1
            i += 1
            continue
        if depth == 0 and ch.isalpha() and (
            i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")
        ):
            m = re.match(r"[A-Za-z_]+", text[i:])
            word = m.group(0).upper()
            if word in _KEYWORD:
                out.append((word, i))
            i += len(m.group(0))
            continue
        i += 1
    return out


def _select_aliases(select_list: str) -> dict[str, str]:
    """alias -> defining expression for every ``<expr> AS <alias>``
    item of a top-level select list."""
    aliases: dict[str, str] = {}
    for item in _split_top_level(select_list):
        m = re.match(
            r"(.*)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)\s*$",
            item,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            aliases[m.group(2)] = m.group(1).strip()
    return aliases


def rewrite_qualify(statement: str) -> str | None:
    """The rewritten plain-SQL text, or None when the statement has
    no top-level QUALIFY (caller should run it untouched)."""
    text = statement.strip().rstrip(";")
    pos = _top_level_positions(text)
    qual = [p for w, p in pos if w == "QUALIFY"]
    if not qual:
        return None
    if len(qual) > 1:
        raise ValueError("multiple top-level QUALIFY clauses")
    qstart = qual[0]
    selects = [p for w, p in pos if w == "SELECT"]
    froms = [p for w, p in pos if w == "FROM" and p < qstart]
    if not selects or not froms:
        raise ValueError("QUALIFY requires a top-level SELECT … FROM")
    sel_start = selects[0] + len("SELECT")
    head = text[: selects[0]]  # a WITH clause, if any
    if re.match(r"\s*DISTINCT\b", text[sel_start:], re.IGNORECASE):
        raise ValueError(
            "SELECT DISTINCT … QUALIFY is not supported (the helper "
            "column would change the distinct key) — write the "
            "subquery explicitly"
        )
    from_start = froms[0]
    select_list = text[sel_start:from_start]
    # trailing ORDER BY / LIMIT after the predicate move OUTSIDE
    tail_marks = [p for w, p in pos if w in ("ORDER", "LIMIT") and p > qstart]
    pred_end = min(tail_marks) if tail_marks else len(text)
    pred = text[qstart + len("QUALIFY") : pred_end].strip()
    trailing = text[pred_end:].strip()
    body = text[from_start:qstart]  # FROM … [WHERE/GROUP BY/HAVING …]
    for alias, expr in _select_aliases(select_list).items():
        pred = re.sub(
            rf"\b{re.escape(alias)}\b", f"({expr})", pred, flags=re.IGNORECASE
        )
    inner = (
        f"{head}SELECT {select_list.strip()}, ({pred}) AS __qualify "
        f"{body.strip()}"
    )
    outer = f"SELECT * FROM ({inner}) __qualify_sub WHERE __qualify"
    if trailing:
        outer = f"{outer} {trailing}"
    return outer


def sql_qualify(spark: SparkSession, statement: str) -> DataFrame:
    """Run a statement that may use the QUALIFY dialect. Plain
    statements pass straight through to ``spark.sql``; QUALIFY
    statements are rewritten (see module docstring) and the helper
    column is dropped before returning — the result schema is exactly
    the original select list."""
    rewritten = rewrite_qualify(statement)
    if rewritten is None:
        return spark.sql(statement)
    return spark.sql(rewritten).drop("__qualify")

"""CDC changelog application — reduce a stream of row-level change
events (insert / update / delete with a sequence number) to the
current table snapshot.

This is the lakehouse "apply changelog" primitive (the relational
core of Debezium→table materialization, Delta CDF replay, Flink
upsert-kafka sinks): events arrive per key in ARBITRARY order across
files/partitions, possibly with replays, and the snapshot is defined
as "the highest-sequence event per key wins; if that event is a
delete, the key is absent".

Scale design (the reason this is NOT a window rank):

* The winner per key is computed as ``max(struct(seq, payload…))`` —
  an ALGEBRAIC aggregate, so Spark map-side-combines it: every
  partition reduces its own events to one candidate row per key
  before the shuffle, and the exchange carries ≤ |keys| rows per
  partition no matter how long the changelog is. A
  ``row_number() OVER (ORDER BY seq DESC)`` formulation would
  shuffle EVERY event and sort per key — strictly worse at 100 TB.
* One shuffle total. No window, no join, no second pass.
* Ties on ``seq`` are resolved DETERMINISTICALLY by the struct's
  lexicographic field order (seq first, then the payload columns in
  their given order) — order-insensitive by construction, so replays
  and micro-batch interleavings cannot flip the result. For
  exactly-once CDC feeds seq is unique per key and the tie-break is
  dormant.

Reference parity: generalizes the reference's join-based upsert
(`/root/reference/src/log_handler.py:99-128` get_table_updated — its
merge is the seq-free two-source special case) to N out-of-order
sources with deletes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: sequence value assigned to base-snapshot rows in
#: ``cdc_apply_to_snapshot`` — below any real changelog sequence
SNAPSHOT_SEQ = -(1 << 62)


def cdc_winners(
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Per-key winning event, KEEPING delete tombstones and the op
    column — the mergeable STATE form of CDC reduction: the winners
    of (state ∪ new-events) equal the winners of the full history, so
    a stored winners table folds incrementally batch after batch with
    arbitrary cross-batch disorder (a straggler older than a retained
    tombstone loses to it instead of wrongly resurrecting the key).
    Same one-shuffle algebraic max(struct(...)) as ``cdc_apply``."""
    keys = list(key_cols)
    payload = [c for c in changelog.columns if c not in (*keys, seq_col, op_col)]
    packed: Column = F.struct(
        F.col(seq_col).alias("__seq"),
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(c) for c in payload],
    )
    won = changelog.groupBy(*keys).agg(F.max(packed).alias("__w"))
    return won.select(
        *keys,
        F.col("__w.__seq").alias(seq_col),
        F.col("__w.__op").alias(op_col),
        *[F.col(f"__w.{c}").alias(c) for c in payload],
    )


def cdc_snapshot(
    state: DataFrame,
    op_col: str = "op",
    delete_ops: Sequence[str] = ("D",),
) -> DataFrame:
    """Live snapshot from a winners-state table: drop tombstones and
    the op column. NULL-safe: ~isin is three-valued, so a winning
    event with NULL op would evaluate to NULL and be silently dropped
    (i.e. treated as a delete). A NULL op is "not a delete" — keep
    the key."""
    op = F.col(op_col)
    alive = state.filter((~op.isin(*delete_ops)) | op.isNull())
    return alive.drop(op_col)


def cdc_apply(
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_ops: Sequence[str] = ("D",),
) -> DataFrame:
    """Current snapshot from a changelog: per key, the event with the
    highest ``seq_col`` wins (struct-order tie-break, see module
    docstring); keys whose winning event has ``op_col`` in
    ``delete_ops`` are dropped. Returns key columns + payload columns
    (everything except op; seq is kept as ``seq_col`` so incremental
    consumers can resume)."""
    won = cdc_winners(changelog, key_cols, seq_col, op_col)
    return cdc_snapshot(won, op_col, delete_ops)


def cdc_compact_tombstones(
    state: DataFrame,
    watermark_seq: int,
    seq_col: str = "seq",
    op_col: str = "op",
    delete_ops: Sequence[str] = ("D",),
) -> DataFrame:
    """Drop delete tombstones at or below ``watermark_seq`` from a
    winners-state table — the Kafka-log-compaction retention valve
    for ``streaming_cdc_apply``'s state: tombstones guard against
    cross-batch stragglers, so one may be removed only once upstream
    GUARANTEES no event with ``seq <= watermark_seq`` can still
    arrive (the caller's retention watermark — e.g. the CDC source's
    low-watermark LSN). Live rows are never touched; tombstones above
    the watermark stay, as does a tombstone with NULL seq (its
    position relative to the watermark is unprovable — three-valued
    `seq <= wm` must not silently discard it). A narrow filter: zero
    shuffle, zero joins."""
    op = F.col(op_col)
    seq = F.col(seq_col)
    keep = (
        op.isNull()                      # NULL op is not a delete
        | ~op.isin(*delete_ops)          # live row
        | seq.isNull()                   # unprovable vs watermark: keep
        | (seq > F.lit(watermark_seq))   # still guarding stragglers
    )
    return state.filter(keep)


def compact_cdc_table(
    spark,
    table_path: str,
    watermark_seq: int,
    seq_col: str = "seq",
    op_col: str = "op",
    delete_ops: Sequence[str] = ("D",),
) -> int:
    """Compact a ``streaming_cdc_apply`` state table in place: commit
    a new version with tombstones ≤ ``watermark_seq`` removed.

    The live version's ``batch_id`` is CARRIED FORWARD into the
    compaction commit's ``commit_meta`` — the fold's crash-replay
    guard reads ``commit_info(live)["batch_id"]``, so a compaction
    commit that dropped it would let a replayed micro-batch re-fold
    onto compacted state (double-apply). Returns the new version."""
    from fbs_data_pipelines_spark.sources.versioned import VersionedTable

    t = VersionedTable(spark, table_path)
    live = t.latest_version()
    if live is None:
        raise FileNotFoundError(f"no versions at {table_path}")
    meta = dict(t.commit_info(live) or {})
    meta["compaction_watermark_seq"] = watermark_seq
    compacted = cdc_compact_tombstones(
        t.read(live), watermark_seq, seq_col, op_col, delete_ops
    )
    return t.commit(compacted, commit_meta=meta)


def cdc_apply_to_snapshot(
    snapshot: DataFrame,
    changelog: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_ops: Sequence[str] = ("D",),
) -> DataFrame:
    """Roll a changelog onto an existing base snapshot: snapshot rows
    enter the same reduction as pseudo-inserts at ``SNAPSHOT_SEQ``
    (below every real sequence), so a single ``cdc_apply`` pass — one
    shuffle, no join — yields the updated snapshot. The snapshot must
    carry the key + payload columns (no seq/op)."""
    keys = list(key_cols)
    payload = [c for c in changelog.columns if c not in (*keys, seq_col, op_col)]
    base = snapshot.select(
        *keys,
        F.lit(SNAPSHOT_SEQ).cast("long").alias(seq_col),
        F.lit("I").alias(op_col),
        *payload,
    )
    ordered = changelog.select(*keys, seq_col, op_col, *payload)
    return cdc_apply(
        base.unionByName(ordered),
        keys,
        seq_col=seq_col,
        op_col=op_col,
        delete_ops=delete_ops,
    )

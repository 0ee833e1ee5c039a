"""CDC replication: keep a native table in sync with a FOREIGN Iceberg
table by applying its changelog — the cross-engine mirror/migration
pattern (a Flink job replicating a Kafka-fed Iceberg table into another
catalog does exactly this).

Pipeline: streaming/foreign_source.ForeignTableStream(mode='cdc') polls
the foreign table's changelog in micro-batches; each batch is a set of
`_change_type`-tagged rows grouped by `_change_ordinal` (one ordinal per
source commit, in commit order). apply_cdc_batch() folds one batch into
the target with the two O(batch) keyed write primitives:

- inserts (incl. the new image of updates) → Table.upsert()
- pure deletes (keys with no same-ordinal re-insert) → Table.delete_keys()

Ordinals apply IN ORDER, so a key deleted in commit N and re-inserted in
commit N+1 converges to the re-inserted row; within one ordinal an
upsert's delete+insert pair collapses into the upsert call alone (its
equality delete already retires the old image). Both primitives never
scan the target — per source commit the work is O(changed rows), and the
poll itself reads only the foreign manifests' diff. Checkpointed polls
make the loop resumable; upsert/delete_keys are idempotent per key-value
(re-applying a batch converges to the same state), so at-least-once
delivery still yields the exact mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from minio_iceberg_polaris_lakehouse_spark.streaming.foreign_source import (
    ForeignTableStream,
)
from minio_iceberg_polaris_lakehouse_spark.warehouse import Table, WarehouseError

_META_COLS = ("_change_type", "_commit_snapshot_id", "_change_ordinal")


def apply_cdc_batch(target: Table, batch: DataFrame) -> int:
    """Apply one changelog micro-batch to ``target``; returns the number
    of source commits (ordinals) applied. The target must declare
    identifier fields."""
    if not target.identifier_fields():
        raise WarehouseError("replication target needs identifier fields")
    keys = target.identifier_fields()
    data_cols = [c for c in batch.columns if c not in _META_COLS]
    # the changelog plan can be expensive (an equality-delete commit
    # re-reads the parent state) and each ordinal consumes it several
    # times (ordinal scan + delete write + upsert write) — materialize
    # the window ONCE; it is changed-rows-sized by construction
    batch = batch.localCheckpoint()
    ordinals = sorted(
        r[0] for r in batch.select("_change_ordinal").distinct().collect()
    )
    for o in ordinals:
        sub = batch.filter(batch["_change_ordinal"] == o)
        ins = sub.filter(sub["_change_type"] == "insert").select(*data_cols)
        # pure deletes: keys whose deletion is NOT superseded by a
        # same-commit re-insert (an upsert's old image) — those are
        # retired by the upsert itself
        dels = (
            sub.filter(sub["_change_type"] == "delete")
            .select(*keys)
            .join(ins.select(*keys), keys, "left_anti")
        )
        if dels.limit(1).collect():
            target.delete_keys(dels)
        if ins.limit(1).collect():
            target.upsert(ins)
    return len(ordinals)


def replicate_foreign(stream: ForeignTableStream, target: Table) -> int:
    """Drain everything currently available from the foreign CDC stream
    into ``target``; returns the number of micro-batches applied. Call
    repeatedly (or from a scheduler) to keep the mirror fresh; the
    stream's checkpoint makes restarts resume where they left off."""
    if stream.mode != "cdc":
        raise WarehouseError("replicate_foreign needs a ForeignTableStream(mode='cdc')")
    applied = 0
    while True:
        out = stream.poll(commit=False)
        if out is None:
            return applied
        df, _frm, _to = out
        apply_cdc_batch(target, df)
        stream.commit()  # ack only after the target absorbed the batch
        applied += 1

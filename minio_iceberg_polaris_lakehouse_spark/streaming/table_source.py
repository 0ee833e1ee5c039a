"""Streaming read of a warehouse table — the Iceberg streaming-source
model (`spark.readStream.format("iceberg")` in the reference's stack):
micro-batches are APPEND SNAPSHOTS, consumed in commit order via
`Table.incremental_scan`, never a rescan of the table.

The reference lists streaming as an unexplored next step
(SETUP_GUIDE_WIN.md:473); Iceberg's own streaming source is the natural
completion of its table format — each poll plans O(new data) from the
snapshot log alone, which is what makes a 100 TB table tailable: a
consumer that re-scanned the table per trigger would never keep up.

Semantics (matching Iceberg's options):
- The first batch is the table's CURRENT contents (Iceberg's default
  initial snapshot); pass ``from_version`` to start later ("exactly the
  appends after N").
- Replacing snapshots (overwrite/compaction) are not expressible as
  appends. By default they raise mid-stream, like Iceberg's streaming
  read; ``skip_replacements=True`` is Iceberg's
  `streaming-skip-overwrite-snapshots` — the stream advances past the
  rewrite without re-emitting rewritten data (consumers already saw it).
- Progress checkpoints to a JSON file: restart resumes after the last
  DELIVERED snapshot — with an idempotent sink this is exactly-once,
  the same contract as the engine's foreachBatch parquet sink.
- ``mode='cdc'`` streams `Table.changes()` instead of appends: MOR
  deletes/updates arrive as `_change_type`-tagged rows and compaction
  emits nothing, so row-level churn never stalls the stream — the
  Iceberg CDC shape a bronze→silver pipeline consumes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from minio_iceberg_polaris_lakehouse_spark.warehouse import (
    Table,
    WarehouseError,
    _atomic_write_json,
)


class TableStream:
    """Poll-based micro-batch reader over a warehouse table's snapshot log.

    Each ``poll()`` returns (batch_df, from_version, to_version) for the
    snapshots committed since the last poll, or None when the table has
    not advanced. Driver-side work per poll is O(snapshot-log); data
    planned is O(new rows).
    """

    def __init__(
        self,
        table: Table,
        from_version: int | None = None,
        checkpoint_path: str | None = None,
        skip_replacements: bool = False,
        mode: str = "append",
    ):
        if mode not in ("append", "cdc"):
            raise WarehouseError(f"stream mode must be 'append' or 'cdc', not {mode!r}")
        self.table = table
        self.mode = mode
        self.skip_replacements = skip_replacements
        self.checkpoint_path = checkpoint_path
        restored = self._restore()
        if restored is not None:
            self._last = restored
            self._initial_pending = False
        elif from_version is not None:
            self._last = from_version
            self._initial_pending = False
        else:
            # Iceberg default: the stream's first batch is the table's
            # current contents, then appends from there
            self._last = 0
            self._initial_pending = True

    # -------------------------------------------------- checkpointing
    def _restore(self) -> int | None:
        if not self.checkpoint_path or not os.path.isfile(self.checkpoint_path):
            return None
        try:
            with open(self.checkpoint_path) as fh:
                return int(json.load(fh)["last_snapshot_id"])
        except (OSError, ValueError, KeyError):
            return None

    def _save(self) -> None:
        if self.checkpoint_path:
            _atomic_write_json(self.checkpoint_path, {"last_snapshot_id": self._last})

    # -------------------------------------------------- polling
    def poll(self) -> tuple[DataFrame, int, int] | None:
        """One micro-batch: rows appended by snapshots (last, current],
        or None if the table hasn't advanced. Checkpoint is saved AFTER
        the caller gets the batch handle — re-running a failed batch is
        the idempotent-sink's job, exactly foreachBatch's contract.

        ``mode='cdc'`` streams the CHANGELOG instead (Iceberg's
        changelog-view-over-a-stream shape): each batch is
        `Table.changes(last, current)` — rows tagged `_change_type`
        ('insert'|'delete'), `_commit_snapshot_id`, `_change_ordinal` —
        so merge-on-read DELETEs/UPDATEs and copy-on-write rewrites
        surface as delete+insert rows rather than refusing mid-stream,
        and a downstream MERGE keeps a silver table in sync (the
        bronze→silver CDC pattern). Planning stays O(churned dirs per
        snapshot); replace/compaction snapshots emit nothing."""
        cur = self.table.current_snapshot_id()
        if not cur:
            return None  # empty table (no snapshots yet), nothing to stream
        if self._initial_pending:
            # initial batch: full current snapshot (cdc: the full
            # changelog replay from the first snapshot — same rows,
            # tagged, plus any deletes history already contains)
            df = self.table.changes(None, cur) if self.mode == "cdc" else self.table.read()
            frm, self._last = 0, cur
            self._initial_pending = False
            self._save()
            return df, frm, cur
        if cur == self._last:
            return None
        frm = self._last
        if self.mode == "cdc":
            df = self.table.changes(frm, cur)
            self._last = cur
            self._save()
            return df, frm, cur
        try:
            df = self.table.incremental_scan(frm, cur)
        except WarehouseError:
            if not self.skip_replacements:
                raise
            # Iceberg streaming-skip-overwrite-snapshots: advance past the
            # rewrite; emit only snapshots appended AFTER it (walk forward
            # to the latest replacing snapshot, then increment from there)
            snaps = self.table._snaps()
            replacing = [
                s["snapshot_id"]
                for s in snaps
                if frm < s["snapshot_id"] <= cur and s["operation"] not in ("append", "delete", "update")
            ]
            base = max(replacing)
            df = (
                self.table.incremental_scan(base, cur)
                if base != cur
                else self.table.spark.createDataFrame([], self.table.schema())
            )
            frm = base
        self._last = cur
        self._save()
        return df, frm, cur

    def drain(self, max_batches: int = 100) -> list[tuple[DataFrame, int, int]]:
        """Poll until the table stops advancing (bounded) — the
        Trigger.AvailableNow of this source."""
        out = []
        for _ in range(max_batches):
            b = self.poll()
            if b is None:
                break
            out.append(b)
        return out

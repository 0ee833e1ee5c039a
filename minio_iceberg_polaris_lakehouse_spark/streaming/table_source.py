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
- Progress checkpoints to a JSON file. With ``poll(commit=False)`` +
  ``commit()`` after the sink succeeds, a crash mid-sink re-delivers
  the batch on restart (at-least-once; exactly-once with an idempotent
  sink — foreachBatch's contract). The default ``commit=True`` is the
  convenience mode for in-process pipelines: it acknowledges on
  delivery, so a crash between poll and sink drops that batch
  (at-most-once) — callers that checkpoint durably should use the
  explicit two-step.
- ``mode='cdc'`` streams `Table.changes()` instead of appends: MOR
  deletes/updates arrive as `_change_type`-tagged rows and compaction
  emits nothing, so row-level churn never stalls the stream — the
  Iceberg CDC shape a bronze→silver pipeline consumes.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from minio_iceberg_polaris_lakehouse_spark import fsio

from minio_iceberg_polaris_lakehouse_spark.warehouse import (
    SnapshotNotFoundError,
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
        # through fsio: a remote (s3a://, hdfs://) checkpoint written by
        # _save must also RESTORE, or every restart re-emits the whole
        # table as the first batch
        if not self.checkpoint_path or not fsio.isfile(self.checkpoint_path):
            return None
        try:
            return int(json.loads(fsio.read_text(self.checkpoint_path))["last_snapshot_id"])
        except (OSError, ValueError, KeyError):
            return None

    def _save(self) -> None:
        if self.checkpoint_path:
            _atomic_write_json(self.checkpoint_path, {"last_snapshot_id": self._last})

    # -------------------------------------------------- polling
    def poll(self, commit: bool = True) -> tuple[DataFrame, int, int] | None:
        """One micro-batch: rows appended by snapshots (last, current],
        or None if the table hasn't advanced.

        ``commit=True`` (default) acknowledges the batch immediately —
        convenient, but a crash between poll and the sink loses the
        batch. For durable pipelines pass ``commit=False`` and call
        :meth:`commit` once the sink has the rows: an un-committed batch
        is re-delivered by the next poll (and by a restarted process),
        which is at-least-once — exactly-once with an idempotent sink
        such as TableSink.

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
            out = (df, 0, cur)
            self._ack(cur, initial=True) if commit else self._stage(cur, initial=True)
            return out
        if cur == self._last:
            return None
        frm = self._last
        if self.mode == "cdc":
            df = self.table.changes(frm, cur)
            out = (df, frm, cur)
            self._ack(cur) if commit else self._stage(cur)
            return out
        try:
            df = self.table.incremental_scan(frm, cur)
        except SnapshotNotFoundError as e:
            # the checkpointed snapshot was expired (expire_snapshots):
            # what was appended since it is no longer derivable from
            # metadata, so skip_replacements MUST NOT swallow this —
            # treating the first in-range snapshot as a replacement
            # boundary would silently drop those appends. Fail loudly;
            # the operator resets the checkpoint (full re-read) or
            # re-creates the stream from the current snapshot.
            raise WarehouseError(
                f"checkpointed snapshot {frm} has been expired from "
                f"{self.table.ns}.{self.table.name}; incremental position "
                "lost — delete the checkpoint to force a full re-read "
                "(at-least-once restart) or recreate the stream"
            ) from e
        except WarehouseError:
            if not self.skip_replacements:
                raise
            # Iceberg streaming-skip-overwrite-snapshots: advance past
            # the rewrite. The boundary is found the same way
            # incremental_scan decides consumability — a MAIN-lineage
            # snapshot whose manifest is NOT a superset of its
            # predecessor's replaced data (op names can't tell: COW
            # delete/update replace, MOR delete/update append) — so
            # branch-staged WAP snapshots and MOR row-level DML never
            # derail the stream.
            mains = self.table._main_snaps()
            in_range = [s for s in mains if frm < s["snapshot_id"] <= cur]
            prev = next((set(s["manifest"]) for s in mains if s["snapshot_id"] == frm), None)
            base = frm
            for snp in in_range:
                man = set(snp["manifest"])
                if prev is None or not prev.issubset(man):
                    base = snp["snapshot_id"]
                prev = man
            df = (
                self.table.incremental_scan(base, cur)
                if base != cur
                else self.table.spark.createDataFrame([], self.table.schema())
            )
            frm = base
        out = (df, frm, cur)
        self._ack(cur) if commit else self._stage(cur)
        return out

    # ------------------------------------------------ acknowledgement
    def _stage(self, to: int, initial: bool = False) -> None:
        self._pending = (to, initial)

    def _ack(self, to: int, initial: bool = False) -> None:
        self._last = to
        if initial:
            self._initial_pending = False
        self._pending = None
        self._save()

    def commit(self) -> None:
        """Acknowledge the batch from the last ``poll(commit=False)``:
        advance and persist the checkpoint. Without this call the same
        batch is re-delivered (by the next poll and by a restart) —
        at-least-once delivery for durable sinks."""
        if getattr(self, "_pending", None) is None:
            return
        to, initial = self._pending
        self._ack(to, initial=initial)

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

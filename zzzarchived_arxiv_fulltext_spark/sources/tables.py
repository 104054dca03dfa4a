"""Snapshot-committed parquet tables.

The environment has no Iceberg runtime jar, so the engine ships a thin
snapshot layer with the same commit semantics the north rule needs:
an append is INVISIBLE until a single atomic manifest update commits
it, reads see only committed snapshots, and a killed run leaves no
partial state behind (its orphan directory is simply never listed).
The API is deliberately tiny so a real Iceberg catalog can replace it
behind ``append``/``read``/``snapshot_ids``.

Reference analogue: the filesystem store + meta.json
(``fulltext/services/store/store.py:111-204``) and the "immediately
consistent" placeholder write (``fulltext/extract.py:89-101``) — both
replaced by snapshot isolation.
"""

import json
import os
import shutil
import time
import uuid
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MANIFEST = "_snapshots.json"


class SnapshotTable:
    """A parquet table whose visibility unit is a committed snapshot."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- manifest -----------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.path, _MANIFEST)

    def snapshots(self) -> List[dict]:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return []

    def snapshot_ids(self) -> List[int]:
        return [s["id"] for s in self.snapshots()]

    def latest_snapshot_id(self) -> Optional[int]:
        ids = self.snapshot_ids()
        return max(ids) if ids else None

    def _commit(self, entry: dict) -> None:
        """Atomic manifest update: write-temp + rename."""
        snaps = self.snapshots() + [entry]
        tmp = self._manifest_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(snaps, f, indent=1)
        os.replace(tmp, self._manifest_path())

    def has_meta(self, key, value=None) -> bool:
        """True when any committed snapshot carries the given meta —
        the exactly-once guard for replayed writers (a foreachBatch
        retry checks its batch_id here and skips the append instead
        of duplicating rows). Accepts either ``(key, value)`` or a
        whole meta dict (all entries must match one snapshot)."""
        items = key.items() if isinstance(key, dict) else [(key, value)]
        return any(
            all(s.get(k) == v for k, v in items)
            for s in self.snapshots()
        )

    # -- write --------------------------------------------------------------

    def append(self, df: DataFrame, meta: Optional[dict] = None) -> int:
        """Write ``df`` as a new snapshot; visible only after commit.

        Data lands in an uncommitted staging directory first; the
        snapshot becomes real only via the atomic manifest replace. A
        crash at any earlier point leaves an orphan dir that readers
        never see (crash-safety parity with at-least-once redo,
        ``fulltext/config.py:326-342``).

        ``meta`` keys are stored in the manifest entry — committed
        atomically WITH the data. Incremental consumers record their
        source position here (Iceberg snapshot summary shape), so a
        crash can never separate "data committed" from "position
        advanced".
        """
        snap_id = (self.latest_snapshot_id() or 0) + 1
        staging = os.path.join(self.path, f"_staging-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        final = os.path.join(self.path, f"snap-{snap_id:05d}")
        os.replace(staging, final)
        entry = {"id": snap_id, "dir": os.path.basename(final),
                 "ts": time.time(), "rows": None}
        if meta:
            entry.update(meta)
        self._commit(entry)
        return snap_id

    # -- read ---------------------------------------------------------------

    def snapshot_dir(self, snap_id: int) -> str:
        for s in self.snapshots():
            if s["id"] == snap_id:
                return os.path.join(self.path, s["dir"])
        raise KeyError(f"no snapshot {snap_id} in {self.path}")

    def read(self, spark: SparkSession,
             schema: Optional[T.StructType] = None) -> DataFrame:
        """All committed rows (empty-but-typed DF when no snapshots).

        When ``schema`` is given it is imposed on the scan
        (schema-on-read): snapshots written before a column existed
        return NULL for it instead of failing or silently dropping it,
        without the footer-merging cost of ``mergeSchema`` — the
        schema-evolution contract Iceberg tables give for free.
        """
        dirs = [os.path.join(self.path, s["dir"]) for s in self.snapshots()]
        if not dirs:
            if schema is None:
                raise ValueError(
                    f"empty table {self.path} needs an explicit schema"
                )
            return spark.createDataFrame([], schema)
        reader = spark.read if schema is None else spark.read.schema(schema)
        return reader.parquet(*dirs)

    def read_excluding_meta(self, spark: SparkSession, meta: dict,
                            schema: Optional[T.StructType] = None
                            ) -> DataFrame:
        """All committed rows EXCEPT snapshots whose manifest entry
        matches every key of ``meta``.

        The replay-safe read for idempotent micro-batch writers: a
        replayed batch must classify against history as it stood
        BEFORE its own (possibly partial) earlier attempt, so it
        excludes its own batch stamp — otherwise its prior hash/index
        appends poison the rerun (every doc looks like a duplicate of
        itself) and the replay commits empty output.
        """
        dirs = [
            os.path.join(self.path, s["dir"])
            for s in self.snapshots()
            if not all(s.get(k) == v for k, v in meta.items())
        ]
        if not dirs:
            if schema is None:
                raise ValueError(
                    f"empty table {self.path} needs an explicit schema"
                )
            return spark.createDataFrame([], schema)
        reader = spark.read if schema is None else spark.read.schema(schema)
        return reader.parquet(*dirs)

    def read_snapshot(self, spark: SparkSession, snap_id: int) -> DataFrame:
        return spark.read.parquet(self.snapshot_dir(snap_id))

    def read_as_of(self, spark: SparkSession, snap_id: int,
                   schema: Optional[T.StructType] = None) -> DataFrame:
        """Time travel: all rows committed at or before ``snap_id``
        (Iceberg's ``VERSION AS OF`` shape) — reproduce any historical
        training-set cut exactly, long after later appends.
        """
        dirs = [
            os.path.join(self.path, s["dir"])
            for s in self.snapshots() if s["id"] <= snap_id
        ]
        if not dirs:
            if schema is None:
                raise ValueError(
                    f"nothing committed at or before {snap_id} in "
                    f"{self.path}; need an explicit schema"
                )
            return spark.createDataFrame([], schema)
        reader = spark.read if schema is None else spark.read.schema(schema)
        return reader.parquet(*dirs)

    def read_since(self, spark: SparkSession, after_snap_id: int,
                   schema: Optional[T.StructType] = None,
                   up_to: Optional[int] = None) -> DataFrame:
        """Rows committed strictly after ``after_snap_id``.

        The incremental-read primitive (Iceberg's incremental scan
        shape): downstream consumers track the last snapshot they
        processed and read only newer ones — at 10^12-row scale this
        replaces the anti-join for steady-state increments. ``up_to``
        bounds the scan (inclusive) so a consumer that captured the
        head position first is immune to commits racing in behind it.
        """
        dirs = [
            os.path.join(self.path, s["dir"])
            for s in self.snapshots()
            if s["id"] > after_snap_id
            and (up_to is None or s["id"] <= up_to)
        ]
        if not dirs:
            if schema is None:
                raise ValueError(
                    f"no snapshots after {after_snap_id} in {self.path}; "
                    "need an explicit schema for the empty result"
                )
            return spark.createDataFrame([], schema)
        reader = spark.read if schema is None else spark.read.schema(schema)
        return reader.parquet(*dirs)

    # -- maintenance ----------------------------------------------------------

    def compact(self, spark: SparkSession,
                target_partitions: Optional[int] = None) -> int:
        """Rewrite all committed rows as one snapshot; drop the rest.

        Many small incremental snapshots degrade scan planning (file
        listing, split packing); compaction is the standard remedy.
        Readers are never broken: data is staged first, the manifest
        replace is atomic, and old snapshot dirs are removed only
        after the new manifest is durable.
        """
        snaps = self.snapshots()
        if len(snaps) <= 1:
            return self.latest_snapshot_id() or 0
        df = self.read(spark)
        if target_partitions:
            df = df.coalesce(target_partitions)

        snap_id = self.latest_snapshot_id() + 1
        staging = os.path.join(self.path, f"_staging-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        final = os.path.join(self.path, f"snap-{snap_id:05d}")
        os.replace(staging, final)

        new_manifest = [{"id": snap_id, "dir": os.path.basename(final),
                         "ts": time.time(), "rows": None,
                         "compacted_from": [s["id"] for s in snaps]}]
        tmp = self._manifest_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(new_manifest, f, indent=1)
        os.replace(tmp, self._manifest_path())

        for s in snaps:
            shutil.rmtree(os.path.join(self.path, s["dir"]),
                          ignore_errors=True)
        return snap_id

    def maintain(self, spark: SparkSession, max_snapshots: int = 64,
                 target_partitions: Optional[int] = None) -> Optional[int]:
        """Compact when the snapshot count exceeds ``max_snapshots``.

        The standing-job hygiene hook: incremental pipelines append one
        snapshot per increment; unbounded snapshot counts degrade scan
        planning. Returns the new snapshot id when compaction ran,
        None when the table is within budget.
        """
        if len(self.snapshots()) <= max_snapshots:
            return None
        return self.compact(spark, target_partitions=target_partitions)

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)

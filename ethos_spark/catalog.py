"""Snapshot-manifest table catalog (Iceberg stand-in, SURVEY.md §7.0).

The north_rule targets Iceberg tables; the Iceberg runtime jar is not
available in this sandbox, so this module provides the same *guarantees* on
plain parquet, behind a thin interface the crawl loop uses exclusively —
swapping in Iceberg later means reimplementing this class with
``writeTo(...).append()`` / MERGE and snapshot tags.

Guarantees provided:
- **Atomic snapshot commits**: writers stage parquet directories, then a
  single manifest JSON (``manifest-<v>.json``) + HEAD pointer rename makes
  them visible. Readers only ever see a committed manifest. This is the
  per-round checkpoint (reference analogue: WAL checkpoint after every
  listing page, MetadataDatabase.ts:118-120 / MetadataTracker.ts:321-323).
- **Append** tables accumulate data dirs (pages, seen, metrics, lineage).
- **Replace** tables (frontier working set) write a fresh version dir per
  round — copy-on-write like Iceberg's overwrite snapshots.
- **Tags**: every commit is tagged (``round-7``); ``restore(tag)`` moves
  HEAD back — the resumable-crawl requirement (north_rule "checkpointed
  frontier snapshots", SURVEY.md §4.2.6).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class _Manifest:
    version: int = 0
    tag: str = ""
    tables: dict[str, list[str]] = field(default_factory=dict)  # table → data dirs
    props: dict[str, str] = field(default_factory=dict)


class Warehouse:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._manifest = self._load_head()
        self._staged: dict[str, list[str]] | None = None
        self._staged_props: dict[str, str] = {}

    # -- manifest machinery ------------------------------------------------

    def _head_path(self) -> str:
        return os.path.join(self.path, "HEAD")

    def _load_head(self) -> _Manifest:
        try:
            with open(self._head_path()) as f:
                v = int(f.read().strip())
            with open(os.path.join(self.path, f"manifest-{v}.json")) as f:
                d = json.load(f)
            return _Manifest(d["version"], d["tag"], d["tables"], d.get("props", {}))
        except FileNotFoundError:
            return _Manifest()

    def _begin(self) -> None:
        if self._staged is None:
            self._staged = {t: list(ds) for t, ds in self._manifest.tables.items()}
            self._staged_props = dict(self._manifest.props)

    def commit(self, tag: str, props: dict[str, str] | None = None) -> int:
        """Atomically publish all staged writes as one snapshot."""
        self._begin()
        v = self._manifest.version + 1
        if props:
            self._staged_props.update(props)
        m = _Manifest(v, tag, self._staged, self._staged_props)
        mpath = os.path.join(self.path, f"manifest-{v}.json")
        with open(mpath, "w") as f:
            json.dump(
                {"version": v, "tag": tag, "tables": m.tables, "props": m.props}, f
            )
        tmp = self._head_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._head_path())  # atomic publish
        self._manifest = m
        self._staged = None
        return v

    def rollback(self) -> None:
        self._staged = None

    def restore(self, tag: str) -> None:
        """Point HEAD at the snapshot with the given tag (resume path)."""
        v = self._manifest.version
        while v > 0:
            with open(os.path.join(self.path, f"manifest-{v}.json")) as f:
                d = json.load(f)
            if d["tag"] == tag:
                tmp = self._head_path() + ".tmp"
                with open(tmp, "w") as f:
                    f.write(str(v))
                os.replace(tmp, self._head_path())
                self._manifest = _Manifest(
                    d["version"], d["tag"], d["tables"], d.get("props", {})
                )
                self._staged = None
                return
            v -= 1
        raise KeyError(f"no snapshot tagged {tag!r}")

    @property
    def current_tag(self) -> str:
        return self._manifest.tag

    @property
    def props(self) -> dict[str, str]:
        return dict(self._manifest.props)

    # -- table ops ----------------------------------------------------------

    def _tables(self) -> dict[str, list[str]]:
        return self._staged if self._staged is not None else self._manifest.tables

    def read(self, table: str, schema=None) -> DataFrame:
        dirs = self._tables().get(table, [])
        dirs = [d for d in dirs if os.path.exists(d)]
        if not dirs:
            if schema is None:
                raise KeyError(f"table {table!r} empty and no schema given")
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*dirs)

    def _new_data_dir(self, table: str) -> str:
        return os.path.join(self.path, table, f"data-{uuid.uuid4().hex[:12]}")

    def append(self, table: str, df: DataFrame) -> str:
        """Stage an append; visible after commit(). Returns the data dir so
        a writer can immediately re-read what it just wrote (column-pruned)
        without waiting for the snapshot to publish."""
        self._begin()
        d = self._new_data_dir(table)
        df.write.mode("overwrite").parquet(d)
        self._staged.setdefault(table, []).append(d)
        return d

    def replace(self, table: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Stage a full replace (copy-on-write); visible after commit().

        With Iceberg this would be MERGE / dynamic-partition overwrite; on a
        10^10-row frontier the working set is partitioned by host bucket so
        only dirty buckets rewrite — here the pending set is small relative
        to seen/pages (it shrinks every round), so CoW is the right shape.
        """
        self._begin()
        d = self._new_data_dir(table)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(d)
        self._staged[table] = [d]

    def set_prop(self, key: str, value: str) -> None:
        self._begin()
        self._staged_props[key] = value

    def vacuum(self, keep_last: int = 3) -> None:
        """Delete data dirs unreferenced by the last ``keep_last`` snapshots
        (Iceberg expire_snapshots analogue)."""
        live: set[str] = set()
        v = self._manifest.version
        for i in range(max(1, v - keep_last + 1), v + 1):
            p = os.path.join(self.path, f"manifest-{i}.json")
            if os.path.exists(p):
                with open(p) as f:
                    for ds in json.load(f)["tables"].values():
                        live.update(ds)
        for table in os.listdir(self.path):
            tdir = os.path.join(self.path, table)
            if not os.path.isdir(tdir):
                continue
            for d in os.listdir(tdir):
                full = os.path.join(tdir, d)
                if full not in live:
                    shutil.rmtree(full, ignore_errors=True)

"""Iceberg-shaped table catalog over a Parquet directory backend.

The north_rule requires Iceberg tables (BASELINE.json:14), but no Iceberg
runtime jar or pyiceberg exists in this sandbox (SURVEY.md §0). This class
reproduces the Iceberg semantics the engine depends on — named tables,
append-only snapshot commits, manifest-listed data files, partition
layout, time-travel by snapshot id — over plain Parquet, so that on a real
cluster every call site swaps to ``spark.read.table`` /
``df.writeTo(...).append()`` with no logic change (the mapping is
documented per method).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    """``Catalog(root)`` ≈ an Iceberg catalog warehouse path.

    Table layout on disk::

        <root>/<table>/
            data/<snapshot-uuid>/...parquet     (one dir per commit)
            manifest-<N>.json                   (cumulative data dirs)
            VERSION                             (current manifest N)
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        # commit critical section (version read -> manifest write -> flip):
        # build stages run as concurrent driver threads (Spark schedules
        # their jobs in parallel); on a real catalog Iceberg's optimistic
        # commit protocol plays this role.
        self._commit_lock = threading.Lock()

    # ------------------------------------------------------------ paths
    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str, version: int) -> str:
        return os.path.join(self._tdir(name), f"manifest-{version}.json")

    def current_version(self, name: str) -> int:
        vf = os.path.join(self._tdir(name), "VERSION")
        if not os.path.exists(vf):
            return 0
        with open(vf) as f:
            return int(f.read().strip())

    def exists(self, name: str) -> bool:
        return self.current_version(name) > 0

    def _manifest(self, name: str, version: int | None = None) -> dict:
        v = version or self.current_version(name)
        if v == 0:
            raise FileNotFoundError(f"table {name} does not exist in {self.root}")
        with open(self._manifest_path(name, v)) as f:
            return json.load(f)

    # data_dirs entries are plain path strings, or — after a
    # partition-replacing commit — {"path": str, "exclude": {col: [v,..]}}
    # (Iceberg: a REPLACE snapshot's deleted data files; here whole
    # partition dirs are superseded, so the exclusion is expressible as a
    # partition predicate and read-time pruning makes it zero-IO).
    def _entry_path(self, name: str, entry) -> str:
        """Absolute data-dir path of a manifest entry. New manifests
        store table-RELATIVE paths ("data/<snapshot>") so an index root
        can be moved, backed up, or restored anywhere and still read —
        absolute entries from older manifests pass through unchanged
        (backward compatible, resolved nowhere)."""
        p = entry if isinstance(entry, str) else entry["path"]
        return p if os.path.isabs(p) else os.path.join(self._tdir(name), p)

    @staticmethod
    def _entry_exclude(entry) -> dict:
        return {} if isinstance(entry, str) else (entry.get("exclude") or {})

    @staticmethod
    def _has_data_files(path: str) -> bool:
        """True iff the data dir holds >= 1 real data file. Commits of
        EMPTY DataFrames (e.g. a fully-duplicate streamed delta's tagged
        local_segments commit) write only _SUCCESS; unioning such a dir
        into a read fails schema inference, so read() skips them. Early-
        exit walk — O(first file found)."""
        for dirpath, _dirs, files in os.walk(path):
            for fn in files:
                if not fn.startswith(("_", ".")):
                    return True
        return False

    # ------------------------------------------------------------ write
    def write(
        self,
        name: str,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        tag: dict | None = None,
        replace_partitions: dict | None = None,
        carried_tags: list[dict] | None = None,
    ) -> int:
        """Commit ``df`` as a new snapshot.

        Iceberg equivalent: ``df.writeTo(f"cat.db.{name}").append()`` /
        ``.createOrReplace()``; ``tag`` ≈ snapshot summary properties.
        A crash between the data write and the manifest commit leaves an
        orphan data dir that is never listed — the commit (manifest +
        VERSION flip) is the atomicity point, which is what makes the
        per-unit index build idempotent under resume (SURVEY.md §2.1 S4).

        ``replace_partitions={"bucket": [3, 7]}`` commits a
        partition-level copy-on-write (Iceberg: dynamic partition
        overwrite / REPLACE of the affected data files): the new data dir
        carries ONLY the listed partition values, prior data dirs stay
        listed with those values excluded (read-time partition pruning
        makes the exclusion zero-IO), and every other partition's
        committed files are carried forward untouched — cost ∝ replaced
        partitions, never ∝ table. Returns the new snapshot version.
        """
        assert mode in ("overwrite", "append")
        assert not (replace_partitions and mode == "overwrite")
        tdir = self._tdir(name)
        os.makedirs(os.path.join(tdir, "data"), exist_ok=True)
        snap = str(uuid.uuid4())
        data_dir = os.path.join(tdir, "data", snap)
        rel_dir = os.path.join("data", snap)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        if callable(tag):
            # deferred tag: resolved AFTER the data-write action, so the
            # caller can fold tag inputs (e.g. the corpus fingerprint)
            # into driver-thread jobs that run concurrently with it
            tag = tag()

        with self._commit_lock:
            prev = self.current_version(name)
            dirs = (
                [] if (mode == "overwrite" or prev == 0)
                else self._manifest(name)["data_dirs"]
            )
            if replace_partitions and prev > 0:
                new_dirs = []
                for e in dirs:
                    ex = dict(self._entry_exclude(e))
                    for col, vals in replace_partitions.items():
                        ex[col] = sorted(set(ex.get(col, [])) | set(vals))
                    new_dirs.append({"path": (e if isinstance(e, str) else e["path"]), "exclude": ex})
                dirs = new_dirs
            manifest = {
                "table": name,
                "snapshot": snap,
                "parent_version": prev,
                "committed_at": time.time(),
                "operation": "replace" if replace_partitions else mode,
                "partition_by": partition_by or [],
                "data_dirs": dirs + [rel_dir],
                "tag": tag or {},
            }
            if carried_tags:
                # snapshot-metadata carry (same mechanism compact /
                # expire_snapshots use): tags of history this commit
                # subsumes — e.g. a reindex cloning a multi-commit table
                # into ONE commit keeps every unit/fingerprint visible
                # to committed_tags, so resume/noop detection survives
                manifest["carried_tags"] = list(carried_tags)
            v = prev + 1
            with open(self._manifest_path(name, v), "w") as f:
                json.dump(manifest, f, indent=1)
            # atomic pointer flip (Iceberg: catalog swap of metadata ptr)
            tmp = os.path.join(tdir, f"VERSION.tmp.{snap}")
            with open(tmp, "w") as f:
                f.write(str(v))
            os.replace(tmp, os.path.join(tdir, "VERSION"))
            return v

    def write_local(
        self,
        name: str,
        rows: list[dict],
        schema: "pyarrow.Schema | None" = None,
        mode: str = "append",
        tag: dict | None = None,
        carried_tags: list[dict] | None = None,
    ) -> int:
        """Commit small METADATA tables (checkpoints, stats) driver-side
        via pyarrow — no Spark job. Iceberg writes its metadata/manifest
        files driver-side too; spending a full job round trip (~0.3-0.5 s
        of fixed latency each) per one-row lineage commit was a measured
        scaling-efficiency drain. Readable by spark.read.parquet exactly
        like executor-written snapshots."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        tdir = self._tdir(name)
        snap = str(uuid.uuid4())
        data_dir = os.path.join(tdir, "data", snap)
        rel_dir = os.path.join("data", snap)
        os.makedirs(data_dir, exist_ok=True)
        cols = {k: [r[k] for r in rows] for k in rows[0]} if rows else {}
        table = pa.table(cols, schema=schema)
        pq.write_table(table, os.path.join(data_dir, "part-0.parquet"))

        with self._commit_lock:
            prev = self.current_version(name)
            dirs = (
                [] if (mode == "overwrite" or prev == 0)
                else self._manifest(name)["data_dirs"]
            )
            manifest = {
                "table": name,
                "snapshot": snap,
                "parent_version": prev,
                "committed_at": time.time(),
                "operation": mode,
                "partition_by": [],
                "data_dirs": dirs + [rel_dir],
                "tag": tag or {},
            }
            if carried_tags:
                manifest["carried_tags"] = list(carried_tags)
            v = prev + 1
            with open(self._manifest_path(name, v), "w") as f:
                json.dump(manifest, f, indent=1)
            tmp = os.path.join(tdir, f"VERSION.tmp.{snap}")
            with open(tmp, "w") as f:
                f.write(str(v))
            os.replace(tmp, os.path.join(tdir, "VERSION"))
            return v

    def data_dir_sizes(self, name: str, version: int | None = None) -> dict:
        """Bytes per top-level partition dir (e.g. bucket=N) of the LAST
        committed data dir — drives skew lineage metrics from file sizes
        instead of a dedicated aggregation pass."""
        m = self._manifest(name, version)
        out: dict[str, int] = {}
        root = self._entry_path(name, m["data_dirs"][-1])
        for entry in os.scandir(root):
            if entry.is_dir():
                total = 0
                for dirpath, _dirs, files in os.walk(entry.path):
                    for fn in files:
                        total += os.path.getsize(os.path.join(dirpath, fn))
                out[entry.name] = total
        return out

    # ------------------------------------------------------------- read
    def read(self, spark: SparkSession, name: str, version: int | None = None) -> DataFrame:
        """Read the current (or time-travel ``version``) snapshot.

        Iceberg equivalent: ``spark.read.table(name)`` with
        ``VERSION AS OF``. Partition columns stay usable for pruning
        because each data dir preserves the ``partitionBy`` layout.
        """
        from pyspark.sql import functions as F

        m = self._manifest(name, version)
        entries = [
            e for e in m["data_dirs"] if self._has_data_files(self._entry_path(name, e))
        ]
        if not entries:
            raise FileNotFoundError(
                f"table {name} has no data files in any committed dir"
            )
        if len(entries) == 1 and not self._entry_exclude(entries[0]):
            return spark.read.parquet(self._entry_path(name, entries[0]))
        # appended snapshots: one scan per commit dir, unioned — keeps
        # Hive-style partition-column inference (and pruning) per dir.
        # Partition-replaced values are filtered out of superseded dirs;
        # the filter is on the partition column, so Spark prunes those
        # subdirs at planning time (zero data IO). A dir whose listed
        # partitions are ALL excluded is skipped entirely (no scan node).
        dfs = []
        for e in entries:
            path, ex = self._entry_path(name, e), self._entry_exclude(e)
            if ex:
                try:
                    live = [
                        d.name for d in os.scandir(path)
                        if d.is_dir() and "=" in d.name
                    ]
                except FileNotFoundError:
                    live = []
                excluded = {
                    f"{col}={v}" for col, vals in ex.items() for v in vals
                }
                if live and all(p in excluded for p in live):
                    continue
            df = spark.read.parquet(path)
            for col, vals in ex.items():
                df = df.filter(~F.col(col).isin(vals))
            dfs.append(df)
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def snapshots(self, name: str) -> list[dict]:
        """Snapshot history of ``name``, oldest first (Iceberg: the
        ``.snapshots`` metadata table). Each row carries the version id
        usable with ``read(..., version=)`` — the ``VERSION AS OF``
        time-travel handle — plus operation, commit wall time, and tag.
        Walks the parent chain of the current manifest, so versions
        orphaned by a crashed commit never appear."""
        out: list[dict] = []
        v = self.current_version(name)
        while v > 0:
            m = self._manifest(name, v)
            out.append(
                {
                    "version": v,
                    "snapshot": m["snapshot"],
                    "operation": m["operation"],
                    "committed_at": m["committed_at"],
                    "parent_version": m["parent_version"],
                    "tag": m.get("tag", {}),
                }
            )
            v = m["parent_version"]
        out.reverse()
        return out

    def version_as_of(self, name: str, ts: float) -> int:
        """Latest snapshot version committed at or before wall time
        ``ts`` (Iceberg: ``TIMESTAMP AS OF``). Raises if the table has
        no snapshot that old."""
        best = 0
        for s in self.snapshots(name):
            if s["committed_at"] <= ts:
                best = s["version"]
        if best == 0:
            raise FileNotFoundError(
                f"table {name} has no snapshot committed at or before {ts}"
            )
        return best

    def read_tagged_commit(self, spark: SparkSession, name: str, unit: str) -> DataFrame:
        """Read ONLY the data committed by the snapshot tagged ``unit``
        (Iceberg: incremental read between snapshot ids)."""
        v = self.current_version(name)
        while v > 0:
            m = self._manifest(name, v)
            if m.get("tag", {}).get("unit") == unit:
                return spark.read.parquet(self._entry_path(name, m["data_dirs"][-1]))
            v = m["parent_version"]
        raise FileNotFoundError(f"no commit tagged unit={unit} in table {name}")

    def committed_tags(self, name: str) -> list[dict]:
        """Tags of every committed snapshot in the current lineage
        (Iceberg: walk snapshot summaries). Used by resume to decide
        which build units are already durably committed."""
        if not self.exists(name):
            return []
        tags = []
        v = self.current_version(name)
        while v > 0:
            m = self._manifest(name, v)
            tags.append(m.get("tag", {}))
            # a compaction or snapshot-expiry manifest carries the tags
            # of the history it collapsed/expired (Iceberg: retained
            # snapshot metadata) — collect them on ANY operation, since
            # expire_snapshots can leave them on an append manifest
            tags.extend(m.get("carried_tags", []))
            if m["operation"] == "overwrite":
                break
            v = m["parent_version"]
        return tags

    def rollback(self, name: str, version: int) -> int:
        """Iceberg ``rollback_to_snapshot``: commit a NEW version whose
        file listing is exactly the target snapshot's — history moves
        FORWARD (the rolled-back-over versions stay readable via
        ``read(version=)``; nothing is deleted), and the flip is the
        same atomic VERSION pointer swap as every other commit. Data
        dirs are immutable once committed, so re-listing them is safe.

        Returns the new current version. Raises FileNotFoundError if
        ``version`` never existed."""
        if version <= 0:
            # _manifest treats a falsy version as "current" — without
            # this guard rollback(name, 0) would silently commit a no-op
            # duplicate of the current snapshot instead of refusing
            raise FileNotFoundError(
                f"table {name} has no version {version} to roll back to"
            )
        with self._commit_lock:
            target = self._manifest(name, version)  # validates existence
            prev = self.current_version(name)
            v = prev + 1
            manifest = {
                "table": name,
                "snapshot": target["snapshot"],
                "parent_version": prev,
                "committed_at": time.time(),
                "operation": "rollback",
                "rolled_back_to": version,
                "partition_by": target.get("partition_by", []),
                "data_dirs": target["data_dirs"],
                "tag": {"unit": f"rollback-{version}"},
            }
            with open(self._manifest_path(name, v), "w") as f:
                json.dump(manifest, f, indent=1)
            tmp = os.path.join(self._tdir(name), f"VERSION.tmp.rb{v}")
            with open(tmp, "w") as f:
                f.write(str(v))
            os.replace(tmp, os.path.join(self._tdir(name), "VERSION"))
            return v

    def compact(self, spark: SparkSession, name: str) -> int:
        """Maintenance: rewrite the CURRENT snapshot into a single data
        dir (Iceberg: ``rewrite_data_files`` + snapshot expiry). After
        many append / partition-replace commits, ``read()`` unions one
        scan per surviving commit dir; compaction collapses the plan
        back to one scan. Unit/resume tags of the collapsed history are
        carried on the compaction manifest so idempotence checks
        (committed build units, applied append fingerprints) survive —
        Iceberg keeps them as retained snapshot metadata."""
        carried = self.committed_tags(name)
        m = self._manifest(name)
        df = self.read(spark, name)
        v = self.write(
            name, df, mode="overwrite",
            partition_by=m.get("partition_by") or None,
            tag={"unit": f"compact-{m['snapshot'][:8]}"},
        )
        # attach the carried tags to the just-written manifest (same
        # commit lock discipline: manifests are immutable once VERSION
        # points at them EXCEPT for this write-side enrichment, which
        # happens before anyone can observe v as current... VERSION
        # already flipped, so re-write the manifest file atomically)
        with self._commit_lock:
            mm = self._manifest(name, v)
            mm["carried_tags"] = carried
            tmp = self._manifest_path(name, v) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(mm, f, indent=1)
            os.replace(tmp, self._manifest_path(name, v))
        return v

    def expire_snapshots(self, name: str, keep_last: int = 1) -> dict:
        """Iceberg ``expireSnapshots`` + ``remove_orphan_files``: retain
        the newest ``keep_last`` snapshots of the current lineage,
        delete every other manifest (time-travel to an expired version
        now raises, like Iceberg), and physically remove data that no
        retained snapshot can read:

        * whole data dirs referenced only by expired manifests — plus
          orphan dirs from crashed commits (written but never listed);
        * partition SUBDIRS excluded by EVERY retained manifest that
          lists their dir — the bucket-level copy-on-write path
          (append / force_merge) supersedes whole partition dirs, and
          without this they accumulate forever.

        Resume safety: unit/fingerprint tags of the expired ancestors
        are carried onto the oldest retained manifest (the same
        retained-metadata trick ``compact`` uses) and its parent link
        is cut, so ``committed_tags``/``snapshots`` walks stop cleanly
        instead of chasing deleted manifests. Current reads are
        bit-identical before and after by construction — nothing a
        retained manifest references is touched. Idempotent: a second
        call finds nothing to delete."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")

        def _dir_bytes(path: str) -> int:
            total = 0
            for dirpath, _dirs, files in os.walk(path):
                for fn in files:
                    try:
                        total += os.path.getsize(os.path.join(dirpath, fn))
                    except OSError:
                        pass
            return total

        with self._commit_lock:
            lineage = self.snapshots(name)  # raises if table absent
            retained = [s["version"] for s in lineage[-keep_last:]]
            expired = [s["version"] for s in lineage[:-keep_last]]
            rset = set(retained)

            # live dirs + per-dir exclude sets across retained manifests
            live: dict[str, list[dict]] = {}
            for v in retained:
                for e in self._manifest(name, v)["data_dirs"]:
                    p = os.path.normpath(self._entry_path(name, e))
                    live.setdefault(p, []).append(self._entry_exclude(e))

            tdir = self._tdir(name)
            deleted_dirs = deleted_partitions = 0
            freed = 0

            data_root = os.path.join(tdir, "data")
            if os.path.isdir(data_root):
                for entry in os.scandir(data_root):
                    p = os.path.normpath(entry.path)
                    if not entry.is_dir():
                        continue
                    if p not in live:
                        freed += _dir_bytes(p)
                        shutil.rmtree(p, ignore_errors=True)
                        deleted_dirs += 1
                        continue
                    # a partition subdir is dead iff every retained
                    # manifest listing this dir excludes its value
                    excl_sets = live[p]
                    dead = None
                    for ex in excl_sets:
                        names = {
                            f"{col}={v}" for col, vals in ex.items()
                            for v in vals
                        }
                        dead = names if dead is None else (dead & names)
                        if not dead:
                            break
                    for part in sorted(dead or ()):
                        pp = os.path.join(p, part)
                        if os.path.isdir(pp):
                            freed += _dir_bytes(pp)
                            shutil.rmtree(pp, ignore_errors=True)
                            deleted_partitions += 1

            if expired:
                # carry expired history's tags onto the oldest retained
                # manifest and cut its parent link BEFORE deleting the
                # expired manifests, so a crash between the two steps
                # still leaves every walk consistent
                oldest = retained[0]
                m = self._manifest(name, oldest)
                carried = list(m.get("carried_tags", []))
                for v in reversed(expired):
                    em = self._manifest(name, v)
                    carried.append(em.get("tag", {}))
                    carried.extend(em.get("carried_tags", []))
                m["carried_tags"] = carried
                m["parent_version"] = 0
                m["history_expired_below"] = oldest
                tmp = self._manifest_path(name, oldest) + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(m, f, indent=1)
                os.replace(tmp, self._manifest_path(name, oldest))
                for v in expired:
                    try:
                        os.remove(self._manifest_path(name, v))
                    except FileNotFoundError:
                        pass
            # manifests outside the current lineage (rolled-back-over
            # branches) are unreadable history too once expiry runs
            for fn in os.listdir(tdir):
                if fn.startswith("manifest-") and fn.endswith(".json"):
                    v = int(fn[len("manifest-"):-len(".json")])
                    if v not in rset:
                        os.remove(os.path.join(tdir, fn))
                        if v not in expired:
                            expired.append(v)

            return {
                "table": name,
                "expired_versions": sorted(expired),
                "retained_versions": retained,
                "deleted_dirs": deleted_dirs,
                "deleted_partitions": deleted_partitions,
                "freed_bytes": freed,
            }

    def tables(self) -> list[str]:
        """Names of every committed table under this catalog root."""
        out = []
        for entry in os.scandir(self.root):
            if entry.is_dir() and os.path.exists(
                os.path.join(entry.path, "VERSION")
            ):
                out.append(entry.name)
        return sorted(out)

    def drop(self, name: str) -> None:
        shutil.rmtree(self._tdir(name), ignore_errors=True)

    # ------------------------------------------------------- properties
    # Iceberg equivalent: table/catalog properties (ALTER TABLE ... SET
    # TBLPROPERTIES). Used to pin the build's IndexConfig so readers
    # cannot silently query with mismatched term_buckets/k1/b.
    def set_properties(self, props: dict) -> None:
        path = os.path.join(self.root, "properties.json")
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(props, f, indent=1)
        os.replace(tmp, path)

    def get_properties(self) -> dict | None:
        path = os.path.join(self.root, "properties.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)


def open_pit(index_root: str) -> dict[str, int]:
    """Open a point-in-time view: the current snapshot version of every
    committed table (the ES ``_pit`` open / Iceberg "pin every table to
    a snapshot" posture). The returned dict is the PIT id — a handful
    of integers, freely serializable; pass it to
    ``PinnedCatalog``/``IndexReader(pit=...)``. Tables created AFTER
    the PIT was opened are absent from the dict and therefore invisible
    through it."""
    cat = Catalog(index_root)
    return {name: cat.current_version(name) for name in cat.tables()}


class PinnedCatalog(Catalog):
    """Read-only catalog view pinned to a PIT: every read (and
    ``current_version``/``exists`` probe) resolves through the pinned
    versions, so ALL table access sites — including ones added later —
    inherit time-travel for free; unpinned tables read as nonexistent
    (they were created after the PIT opened). Any commit through a
    pinned view raises: version chains advance only through the live
    ``Catalog``."""

    def __init__(self, root: str, pit: dict[str, int]):
        super().__init__(root)
        self._pit = {str(k): int(v) for k, v in pit.items()}

    def current_version(self, name: str) -> int:
        return self._pit.get(name, 0)

    def read(self, spark, name, version=None):
        # an explicit deeper version is allowed (history below the pin
        # is immutable); reading past the pin is not
        v = version if version is not None else self._pit.get(name, 0)
        pin = self._pit.get(name, 0)
        if v > pin:
            raise ValueError(
                f"version {v} of {name!r} is past this PIT (pin {pin})"
            )
        return super().read(spark, name, version=v)

    def _refuse_write(self, *_a, **_k):
        raise ValueError("catalog is pinned to a PIT — writes must go "
                         "through the live Catalog")

    write = _refuse_write
    write_local = _refuse_write
    rollback = _refuse_write
    compact = _refuse_write
    expire_snapshots = _refuse_write
    drop = _refuse_write
    set_properties = _refuse_write

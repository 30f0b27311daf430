"""Cross-cluster replication (ES CCR's follower-index contract): a
FOLLOWER index tails a LEADER by pulling committed snapshots — never
recomputing, never re-indexing.

Why this is nearly free here: the catalog's commits are append-only
manifests listing table-relative data dirs, and a data dir is immutable
once committed. So "replicate" is literally: copy the manifest files
the follower is missing, copy the data dirs those manifests reference
that the follower does not yet hold, then flip the VERSION pointer —
the same unit of work Iceberg's snapshot-based replication ships. Each
``follow()`` call costs ∝ the NEW snapshots since the last call (an
hourly append replicates as one bucket-COW delta, not a table copy).

Semantics:

* **Idempotent**: a follower at the leader's version is a no-op.
* **Divergence-refusing**: shared versions must have identical
  manifests (snapshot ids) — a follower that was independently written
  to is permanently refused (ES likewise requires follower indices to
  be read-only; promote-then-diverge is a fork, not a replica).
* **History-faithful**: replicated manifests are byte-identical, so
  time travel, committed tags (resume/no-op detection), and PIT
  readers behave exactly as on the leader. Data dirs the leader has
  vacuumed are skipped — reading those versions fails on the follower
  the same way it fails on the leader.
* **Verified**: every copied file is size+sha256 checked after copy
  (a flipped bit fails the sync, not a query later).

At 100 TB the shutil loop becomes distCp/object-store copy driven by
the same manifest walk; the control flow — version diff, dir diff,
copy, verify, pointer flip LAST — is the replication protocol.
"""

from __future__ import annotations

import json
import os
import shutil

from .backup import _sha256
from .catalog import Catalog


def _copy_file_verified(src: str, dst: str) -> int:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.copy2(src, dst)
    if os.path.getsize(src) != os.path.getsize(dst) or _sha256(src) != _sha256(dst):
        raise IOError(f"verified copy failed: {src} -> {dst}")
    return os.path.getsize(dst)


def _copy_dir_verified(src: str, dst: str) -> tuple[int, int]:
    """Copy a committed (immutable) data dir; returns (files, bytes)."""
    nf, nb = 0, 0
    for dirpath, _dirs, files in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        for fn in files:
            s = os.path.join(dirpath, fn)
            d = os.path.join(dst, rel, fn) if rel != "." else os.path.join(dst, fn)
            nb += _copy_file_verified(s, d)
            nf += 1
    return nf, nb


def follow(leader_root: str, follower_root: str) -> dict:
    """Advance the follower to the leader's current snapshot of every
    table. Returns a summary: per-table versions plus copied file/byte
    counts (0 copies == the idempotent no-op). Raises on divergence."""
    leader = Catalog(leader_root)
    names = leader.tables()
    if not names:
        raise FileNotFoundError(f"no committed tables under {leader_root}")
    os.makedirs(follower_root, exist_ok=True)
    follower = Catalog(follower_root)

    copied_files = copied_bytes = 0
    tables: dict[str, dict] = {}
    for name in names:
        lv = leader.current_version(name)
        fv = follower.current_version(name)
        if fv > lv:
            raise ValueError(
                f"follower table {name} is AHEAD of the leader "
                f"(v{fv} > v{lv}): not a replica"
            )
        # divergence check: the newest shared version must be the SAME
        # commit (snapshot id equality; manifests are immutable)
        if fv > 0:
            try:
                lm = leader._manifest(name, fv)
            except FileNotFoundError:
                # the shared version was expired by the leader's vacuum;
                # lineage equality is unverifiable there — trust the
                # follower's read-only contract and sync forward
                lm = None
            fm = follower._manifest(name, fv)
            if lm is not None and lm.get("snapshot") != fm.get("snapshot"):
                raise ValueError(
                    f"follower table {name} diverged at v{fv} "
                    f"(snapshot {fm.get('snapshot')!r} != leader "
                    f"{lm.get('snapshot')!r}); a follower must be read-only"
                )
        if lv == fv:
            tables[name] = {"version": lv, "new_versions": 0}
            continue
        ftdir = follower._tdir(name)
        os.makedirs(ftdir, exist_ok=True)
        new_versions = 0
        for v in range(fv + 1, lv + 1):
            mp = leader._manifest_path(name, v)
            if not os.path.exists(mp):
                # expired by the leader's vacuum — the follower skips it
                # exactly as the leader's own time travel refuses it
                continue
            m = leader._manifest(name, v)
            for e in m["data_dirs"]:
                relp = e if isinstance(e, str) else e["path"]
                if os.path.isabs(relp):
                    raise ValueError(
                        f"table {name} lists absolute data dir {relp}; "
                        "run reindex/compact to relocate before replicating"
                    )
                src_dir = leader._entry_path(name, e)
                dst_dir = os.path.join(ftdir, relp)
                if os.path.exists(dst_dir) or not os.path.exists(src_dir):
                    continue  # already held / vacuumed upstream
                nf, nb = _copy_dir_verified(src_dir, dst_dir)
                copied_files += nf
                copied_bytes += nb
            copied_bytes += _copy_file_verified(
                mp, follower._manifest_path(name, v)
            )
            copied_files += 1
            new_versions += 1
        # pointer flip LAST: a crash mid-sync leaves the follower at its
        # previous consistent version with some pre-staged dirs (re-run
        # completes — the dir-exists check makes that idempotent)
        tmp = os.path.join(ftdir, "VERSION.tmp.follow")
        with open(tmp, "w") as f:
            f.write(str(lv))
        os.replace(tmp, os.path.join(ftdir, "VERSION"))
        tables[name] = {"version": lv, "new_versions": new_versions}

    # root-level metadata (properties.json and friends): the leader's
    # word is law on a replica
    for entry in sorted(os.scandir(leader_root), key=lambda e: e.name):
        if entry.is_file():
            copied_bytes += _copy_file_verified(
                entry.path, os.path.join(follower_root, entry.name)
            )
            copied_files += 1
    summary = {
        "leader": os.path.abspath(leader_root),
        "follower": os.path.abspath(follower_root),
        "tables": tables,
        "copied_files": copied_files,
        "copied_bytes": copied_bytes,
    }
    with open(os.path.join(follower_root, "replication-state.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary

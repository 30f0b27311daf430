"""Index backup and restore (export/import).

Iceberg analogue: snapshot export — copy the CURRENT snapshot's data
files plus a fresh single-manifest metadata tree, not the whole
directory. Three properties make this cheap and safe here:

* **Relocatable roots**: manifests store table-relative data paths, so
  a copied tree reads anywhere with zero rewriting (catalog.py
  ``_entry_path``).
* **Live bytes only**: an export walks each table's current manifest —
  data dirs from expired snapshots, orphan dirs from crashed commits,
  and partition subdirs superseded by copy-on-write commits (present
  but excluded) are never copied. A long-lived index with many appends
  backs up at its *logical* size, not its historical footprint.
* **Resume metadata carried**: every committed unit/fingerprint tag of
  the current lineage rides on the export's single manifest
  (``carried_tags`` — the same retained-metadata mechanism compaction
  and snapshot expiry use), so ``build_index`` on a restored root still
  no-ops on the same corpus and streamed-append fingerprints stay
  deduplicated.

At 100 TB the copy loop is the only part that changes: files move via
distCp/object-store copy instead of shutil, driven by the same manifest
walk — the control flow here IS the file listing a distributed copy
needs. Integrity: the export writes a ``backup-manifest.json`` with
size + sha256 per copied file; ``import_index`` re-hashes and refuses a
tree that drifted (a flipped bit in a posting payload must fail the
restore, not a query three weeks later).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from .catalog import Catalog

BACKUP_MANIFEST = "backup-manifest.json"


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _copy_tree(
    src: str, dst: str, rel_base: str, skip_parts: set[str], files: dict
) -> None:
    """Copy ``src`` dir into ``dst``, skipping top-level partition
    subdirs named in ``skip_parts`` (the copy-on-write-superseded
    partitions the current snapshot excludes) and recording every copied
    file's (size, sha256) under its backup-relative path."""
    os.makedirs(dst, exist_ok=True)
    for entry in sorted(os.scandir(src), key=lambda e: e.name):
        if entry.name in skip_parts:
            continue
        s, d = entry.path, os.path.join(dst, entry.name)
        rel = os.path.join(rel_base, entry.name)
        if entry.is_dir():
            _copy_tree(s, d, rel, set(), files)
        else:
            shutil.copy2(s, d)
            files[rel] = {"bytes": os.path.getsize(s), "sha256": _sha256(s)}


def export_index(root: str, dest: str) -> dict:
    """Export the index at ``root`` (every catalog table it holds, plus
    root-level metadata files like properties.json) to ``dest`` as a
    self-contained, verifiable, restorable tree. Refuses an existing
    non-empty ``dest``. Returns the backup summary (also persisted as
    ``backup-manifest.json`` inside the backup)."""
    cat = Catalog(root)
    names = cat.tables()
    if not names:
        raise FileNotFoundError(f"no committed tables under {root}")
    if os.path.isdir(dest) and os.listdir(dest):
        raise FileExistsError(f"backup destination {dest} is not empty")
    os.makedirs(dest, exist_ok=True)

    files: dict[str, dict] = {}
    tables: dict[str, dict] = {}
    for name in names:
        m = cat._manifest(name)
        tdir = os.path.join(dest, name)
        os.makedirs(tdir, exist_ok=True)
        # current snapshot's dirs only — relative entries preserved
        # verbatim (that is what makes the restored tree readable)
        for e in m["data_dirs"]:
            src_dir = cat._entry_path(name, e)
            relp = e if isinstance(e, str) else e["path"]
            if os.path.isabs(relp):
                raise ValueError(
                    f"table {name} lists absolute data dir {relp}; "
                    "run reindex/compact to relocate before exporting"
                )
            ex = cat._entry_exclude(e)
            skip = {f"{col}={v}" for col, vals in ex.items() for v in vals}
            _copy_tree(
                src_dir, os.path.join(tdir, relp),
                os.path.join(name, relp), skip, files,
            )
        # ONE manifest at version 1: same data_dirs (exclusions intact —
        # a skipped partition subdir simply has no files to prune), the
        # full lineage's tags carried for resume/noop detection
        out_m = {
            "table": name,
            "snapshot": m["snapshot"],
            "parent_version": 0,
            "committed_at": m["committed_at"],
            "operation": "overwrite",
            "partition_by": m.get("partition_by", []),
            "data_dirs": m["data_dirs"],
            "tag": m.get("tag", {}),
            "carried_tags": [
                t for t in cat.committed_tags(name) if t != m.get("tag", {})
            ],
            "exported_from": os.path.abspath(root),
        }
        mp = os.path.join(tdir, "manifest-1.json")
        with open(mp, "w") as f:
            json.dump(out_m, f, indent=1)
        with open(os.path.join(tdir, "VERSION"), "w") as f:
            f.write("1")
        files[os.path.join(name, "manifest-1.json")] = {
            "bytes": os.path.getsize(mp), "sha256": _sha256(mp),
        }
        tables[name] = {"source_version": cat.current_version(name)}

    for entry in sorted(os.scandir(root), key=lambda e: e.name):
        if entry.is_file():  # properties.json and friends
            shutil.copy2(entry.path, os.path.join(dest, entry.name))
            files[entry.name] = {
                "bytes": os.path.getsize(entry.path),
                "sha256": _sha256(entry.path),
            }

    summary = {
        "source_root": os.path.abspath(root),
        "created_at": time.time(),
        "tables": tables,
        "n_files": len(files),
        "total_bytes": sum(v["bytes"] for v in files.values()),
        "files": files,
    }
    with open(os.path.join(dest, BACKUP_MANIFEST), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def verify_backup(path: str) -> dict:
    """Re-hash every file the backup manifest lists; raise on any
    missing/extra-size/drifted file. Returns the manifest."""
    mp = os.path.join(path, BACKUP_MANIFEST)
    if not os.path.exists(mp):
        raise FileNotFoundError(f"{path} is not a backup (no {BACKUP_MANIFEST})")
    with open(mp) as f:
        summary = json.load(f)
    bad = []
    for rel, want in summary["files"].items():
        p = os.path.join(path, rel)
        if not os.path.exists(p):
            bad.append(f"missing: {rel}")
        elif os.path.getsize(p) != want["bytes"]:
            bad.append(f"size drift: {rel}")
        elif _sha256(p) != want["sha256"]:
            bad.append(f"checksum drift: {rel}")
    if bad:
        raise RuntimeError(
            "backup verification failed: " + "; ".join(sorted(bad)[:10])
        )
    return summary


def import_index(src: str, dest: str, verify: bool = True) -> dict:
    """Restore a backup tree at ``dest`` (a fresh index root). Verifies
    checksums first by default — a restore from a drifted backup must
    fail HERE. Refuses an existing non-empty ``dest``. The restored root
    is immediately readable (relative manifests) and resumable (carried
    tags)."""
    summary = verify_backup(src) if verify else None
    if os.path.isdir(dest) and os.listdir(dest):
        raise FileExistsError(f"restore destination {dest} is not empty")
    os.makedirs(dest, exist_ok=True)
    for entry in sorted(os.scandir(src), key=lambda e: e.name):
        if entry.name == BACKUP_MANIFEST:
            continue
        d = os.path.join(dest, entry.name)
        if entry.is_dir():
            shutil.copytree(entry.path, d)
        else:
            shutil.copy2(entry.path, d)
    return summary or {"source_root": None}

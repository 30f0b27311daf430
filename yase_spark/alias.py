"""Index aliases — the ES ``_aliases`` API's operational core: a
level of naming indirection over index roots with ATOMIC swap, so
serving code addresses ``alias://warehouse/prod`` while operators
rebuild/reindex underneath and cut over in one rename.

The pattern this exists for is blue/green re-layout with
``reindex.reindex``::

    reindex(spark, resolve_alias("alias://wh/prod"), new_root,
            block_size=64)
    set_alias("wh", "prod", new_root)      # atomic cutover
    # readers opened after this instant see the new layout;
    # rollback = set_alias back to the old root (still on disk
    # until vacuumed/dropped)

Registry: one JSON file per warehouse dir (``aliases.json``), updated
with the write-temp + ``os.replace`` convention every catalog commit
here uses — readers never observe a partial registry. The warehouse is
any directory; indexes may live inside it or anywhere else (the alias
stores the root path). This is deliberately filesystem-level, exactly
like the catalog itself (SURVEY §0: Iceberg-shaped over the sandbox
FS); on a real deployment the registry maps onto the Iceberg catalog's
table-rename / view indirection.

Alias refs are accepted anywhere an index root is: ``yase_submit.py
--index alias://WH/NAME`` resolves through here, and ``resolve_alias``
is an identity on plain paths so call sites need no branching.
"""

from __future__ import annotations

import json
import os

REGISTRY = "aliases.json"
PREFIX = "alias://"


def _registry_path(warehouse: str) -> str:
    return os.path.join(warehouse, REGISTRY)


def list_aliases(warehouse: str) -> dict[str, str]:
    """alias -> index root for every alias of the warehouse."""
    try:
        with open(_registry_path(warehouse)) as f:
            return dict(json.load(f))
    except FileNotFoundError:
        return {}


def set_alias(
    warehouse: str, name: str, index_root: str, filter: str | None = None
) -> dict:
    """Point ``name`` at ``index_root`` (create or ATOMIC re-point —
    the ES ``_aliases`` remove+add in one action). The target must look
    like an index (``VERSION`` under at least one table dir) so a typo
    cannot silently blackhole a serving alias.

    ``filter`` makes it a FILTERED ALIAS (the ES multi-tenancy
    device: one physical index, per-tenant views): a SQL predicate
    over the docs-dimension columns, stored with the alias and applied
    by every query that resolves through it (the ``topk_where`` lane —
    the predicate prunes the hydration dimension, never the postings
    fetch). Stored as ``{"root": ..., "filter": ...}``; unfiltered
    aliases keep the legacy plain-string form, so old registries read
    unchanged."""
    if "/" in name or not name:
        raise ValueError(f"bad alias name {name!r}")
    if filter is not None and not str(filter).strip():
        raise ValueError("filter must be a non-empty predicate or None")
    root = os.path.abspath(index_root)
    has_table = os.path.isdir(root) and any(
        os.path.exists(os.path.join(root, d, "VERSION"))
        for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
    )
    if not has_table:
        raise ValueError(f"{index_root} is not an index root (no tables)")
    os.makedirs(warehouse, exist_ok=True)
    reg = list_aliases(warehouse)
    prev = reg.get(name)
    reg[name] = root if filter is None else {"root": root, "filter": filter}
    tmp = _registry_path(warehouse) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
    os.replace(tmp, _registry_path(warehouse))
    return {"alias": name, "target": root, "previous": prev}


def drop_alias(warehouse: str, name: str) -> bool:
    """Remove ``name``; True if it existed. The index is untouched."""
    reg = list_aliases(warehouse)
    if name not in reg:
        return False
    del reg[name]
    tmp = _registry_path(warehouse) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
    os.replace(tmp, _registry_path(warehouse))
    return True


def resolve_alias(ref: str) -> str:
    """``alias://WH/NAME`` -> the registered index root; anything else
    passes through unchanged (identity on plain paths). Unknown aliases
    raise with the registry's contents — never a silent miss."""
    if not ref.startswith(PREFIX):
        return ref
    body = ref[len(PREFIX):]
    warehouse, sep, name = body.rpartition("/")
    if not sep or not warehouse or not name:
        raise ValueError(f"malformed alias ref {ref!r} (alias://WH/NAME)")
    reg = list_aliases(warehouse)
    if name not in reg:
        raise ValueError(
            f"unknown alias {name!r} in {warehouse} "
            f"(registered: {sorted(reg) or 'none'})"
        )
    entry = reg[name]
    return entry["root"] if isinstance(entry, dict) else entry


def alias_filter(ref: str) -> str | None:
    """The stored filter predicate of a filtered alias ref, or None
    for plain paths / unfiltered aliases. Callers route a non-None
    filter through the ``topk_where`` lane."""
    if not ref.startswith(PREFIX):
        return None
    body = ref[len(PREFIX):]
    warehouse, _sep, name = body.rpartition("/")
    entry = list_aliases(warehouse).get(name)
    return entry.get("filter") if isinstance(entry, dict) else None

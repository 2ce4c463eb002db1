"""Snapshot / restore: ES `_snapshot` semantics on the parquet index.

Reference surface: the reference deploys finished indexes with
HttpFileTransferDeployer (/root/reference/app/org/nlp4l/framework/
builtin/lucene/LuceneIndexingProcessor.scala — the "ship the built
artifact" step); ES generalizes that into repository snapshots:
point-in-time, INCREMENTAL (files already in the repository are not
re-copied — Lucene segments are immutable, so file identity implies
content identity), and restorable into a fresh index. The same holds
here: every committed table's parquet part-files are immutable under
their snapshot id, so

* ``snapshot`` copies each committed table's data files + manifest into
  the repository, SKIPPING files already present with the same size
  (repeated snapshots of an unchanged index copy nothing), and writes a
  top-level ``_SNAPSHOT.json`` recording the table -> snapshot-id map
  and per-file inventory;
* ``restore`` materializes a repository snapshot into a fresh index
  dir, verifying the inventory (name + size) before declaring it live;
* ``verify_snapshot`` re-checks a repository against its inventory —
  the bit-rot / partial-upload check ES runs on repository verify.

Scale note: file movement here is local shutil; on a cluster the same
inventory drives a distcp/object-store copy — the catalog layout
(immutable part-files + per-table manifest) is what makes the
incremental property safe, and that is the part being modeled.
"""

from __future__ import annotations

import json
import os
import shutil

from nlp4l_spark.index.catalog import IndexCatalog

SNAPSHOT_MANIFEST = "_SNAPSHOT.json"


def _data_files(table_dir: str) -> list[str]:
    return sorted(
        f
        for f in os.listdir(table_dir)
        if not f.startswith(".") and f not in ("_SUCCESS",)
    )


def snapshot(index_dir: str, repo_dir: str) -> dict:
    """Copy every committed table into ``repo_dir`` (incremental) and
    return the written snapshot manifest."""
    cat = IndexCatalog(index_dir)
    os.makedirs(repo_dir, exist_ok=True)
    inventory: dict[str, dict] = {}
    copied = skipped = 0
    for name in sorted(os.listdir(index_dir)):
        src = os.path.join(index_dir, name)
        if not os.path.isdir(src) or not cat.is_committed(name):
            continue
        dst = os.path.join(repo_dir, name)
        os.makedirs(dst, exist_ok=True)
        files = {}
        for f in _data_files(src):
            sp, dp = os.path.join(src, f), os.path.join(dst, f)
            size = os.path.getsize(sp)
            if os.path.exists(dp) and os.path.getsize(dp) == size:
                skipped += 1  # incremental: immutable file already shipped
            else:
                shutil.copy2(sp, dp)
                copied += 1
            files[f] = size
        inventory[name] = {
            "snapshot_id": cat.manifest(name).get("snapshot_id"),
            "files": files,
        }
    manifest = {
        "tables": inventory,
        "files_copied": copied,
        "files_skipped": skipped,
    }
    with open(os.path.join(repo_dir, SNAPSHOT_MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def verify_snapshot(repo_dir: str) -> None:
    """Raise if any inventoried file is missing or size-drifted."""
    with open(os.path.join(repo_dir, SNAPSHOT_MANIFEST)) as fh:
        manifest = json.load(fh)
    problems = []
    for name, entry in manifest["tables"].items():
        for f, size in entry["files"].items():
            p = os.path.join(repo_dir, name, f)
            if not os.path.exists(p):
                problems.append(f"missing {name}/{f}")
            elif os.path.getsize(p) != size:
                problems.append(f"size drift {name}/{f}")
    if problems:
        raise ValueError("snapshot verification failed: " + "; ".join(problems))


def restore(repo_dir: str, index_dir: str) -> IndexCatalog:
    """Materialize a verified repository snapshot into a fresh index
    dir. Refuses to restore over an existing index (ES refuses to
    restore onto an open index the same way)."""
    verify_snapshot(repo_dir)
    if os.path.exists(index_dir) and os.listdir(index_dir):
        raise ValueError(f"restore target {index_dir} is not empty")
    with open(os.path.join(repo_dir, SNAPSHOT_MANIFEST)) as fh:
        manifest = json.load(fh)
    os.makedirs(index_dir, exist_ok=True)
    for name, entry in manifest["tables"].items():
        src, dst = os.path.join(repo_dir, name), os.path.join(index_dir, name)
        os.makedirs(dst, exist_ok=True)
        for f in entry["files"]:
            shutil.copy2(os.path.join(src, f), os.path.join(dst, f))
    cat = IndexCatalog(index_dir)
    for name in manifest["tables"]:
        if not cat.is_committed(name):  # manifest must have round-tripped
            raise ValueError(f"restored table {name} is not committed")
    return cat

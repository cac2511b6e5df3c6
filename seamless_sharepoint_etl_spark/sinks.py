"""Transactional manifest-commit parquet sink (exactly-once append).

Closes SURVEY §7.3#5: the reference's append is fire-and-forget REST
POSTs with no transaction (bin/copy-seamless-to-sharepoint.rb:111-125 —
a crash mid-batch leaves a half-written sink, and its strict-`>`
watermark then *skips* the unposted remainder forever). Round 2's
``run_incremental_append`` was idempotent per key-range directory but
not atomic: a reader racing the overwrite could see a partial batch.

This module is a minimal Delta-style commit protocol on plain files:

  <root>/data/txn-<txn_id>/part-*.parquet   -- distributed data write
  <root>/_manifest/v<NNNNNN>.json           -- ordered manifest log
  <root>/_manifest/LATEST                   -- pointer, atomic rename

* The DATA write is a normal distributed ``df.write.parquet`` into a
  transaction-private directory — executors never touch shared state,
  so the protocol is identical on local[32] and a 1000-executor
  cluster (only the tiny manifest commit is driver-side, same as
  Delta/Iceberg).
* COMMIT is: write ``v<next>.json`` (the new snapshot's full file
  list + txn ids), then ``os.replace`` a temp file onto ``LATEST``.
  ``os.replace`` is atomic on POSIX, so a reader sees the old snapshot
  or the new one, never a mix; a crash ANYWHERE before the rename
  leaves the sink logically unchanged (orphan data files are invisible
  — they're not in any manifest — and are swept by ``vacuum``).
* EXACTLY-ONCE: each commit carries a caller txn id; a retry of an
  already-committed txn id is a no-op, so at-least-once drivers (cron
  rerun, stream restart) still append each batch once.

On a real deployment ``root`` is an object-store prefix; rename-commit
then rides the store's atomic-put-if-absent (as Delta does). The
protocol shape is unchanged.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifest"
_LATEST = "LATEST"


def _manifest_path(root: str) -> str:
    return os.path.join(root, _MANIFEST_DIR)


def _read_latest(root: str) -> dict:
    """Current committed snapshot ({version, files, txns}); empty if none."""
    latest = os.path.join(_manifest_path(root), _LATEST)
    if not os.path.exists(latest):
        return {"version": 0, "files": [], "txns": []}
    with open(latest) as fh:
        version_file = fh.read().strip()
    with open(os.path.join(_manifest_path(root), version_file)) as fh:
        return json.load(fh)


def committed_txns(root: str) -> set[str]:
    return set(_read_latest(root)["txns"])


def commit_append(df: DataFrame, root: str, txn_id: str) -> dict:
    """Atomically append ``df`` to the sink under transaction ``txn_id``.

    Returns the committed snapshot dict. Re-committing an already
    committed txn_id is a no-op (exactly-once under retries).
    """
    snap = _read_latest(root)
    if txn_id in snap["txns"]:
        return snap  # retried batch: already durable, do nothing

    # 1. distributed data write into a txn-private directory
    data_dir = os.path.join(root, "data", f"txn-{txn_id}")
    df.write.mode("overwrite").parquet(data_dir)
    files = sorted(
        os.path.join("data", f"txn-{txn_id}", f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )

    # 2. manifest commit: new version file, then atomic LATEST flip
    os.makedirs(_manifest_path(root), exist_ok=True)
    new = {
        "version": snap["version"] + 1,
        "files": snap["files"] + files,
        "txns": snap["txns"] + [txn_id],
    }
    vname = f"v{new['version']:06d}.json"
    with open(os.path.join(_manifest_path(root), vname), "w") as fh:
        json.dump(new, fh)
    tmp = os.path.join(_manifest_path(root), f".latest-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(vname)
    os.replace(tmp, os.path.join(_manifest_path(root), _LATEST))  # THE commit
    return new


def commit_upsert(
    spark: SparkSession, df: DataFrame, root: str, keys: list[str], txn_id: str
) -> dict:
    """Atomically MERGE ``df`` into the sink on ``keys`` (matched rows
    replaced, new rows inserted) under transaction ``txn_id`` —
    copy-on-write at FILE granularity, the Delta/Iceberg MERGE shape:

      1. one distributed job finds the files that contain any incoming
         key (``input_file_name`` + broadcast semi-join) — everything
         else carries over into the new manifest untouched, so the
         rewrite cost scales with the keys' file-locality, not the
         table (on a 100 TB sink with date-clustered keys a daily
         upsert rewrites a handful of files);
      2. survivors of the touched files (anti-join on keys) union the
         incoming rows are written to the txn-private directory;
      3. the manifest commit (atomic LATEST flip) swaps touched files
         for new ones in one step — readers see old or new, never a
         mix, and a replayed txn_id is a no-op (exactly-once).
    """
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F

    snap = _read_latest(root)
    if txn_id in snap["txns"]:
        return snap

    untouched = list(snap["files"])
    survivors = None
    if snap["files"]:
        # input_file_name() reports file:// URIs (possibly percent-
        # encoded, possibly through symlinks) — normalize BOTH sides to
        # realpath before mapping back to manifest-relative paths, and
        # fail loudly on an unmappable URI rather than leave the old
        # file referenced alongside its rewrite (duplicate keys).
        abs_of = {
            os.path.realpath(os.path.join(root, f)): f for f in snap["files"]
        }
        old = spark.read.parquet(
            *[os.path.join(root, f) for f in snap["files"]]
        ).withColumn("_f", F.input_file_name())
        keys_df = df.select(*keys).distinct()
        touched_uris = [
            r["_f"]
            for r in old.join(F.broadcast(keys_df), keys, "left_semi")
            .select("_f")
            .distinct()
            .collect()
        ]
        touched = set()
        for u in touched_uris:
            p = os.path.realpath(unquote(urlparse(u).path))
            if p not in abs_of:
                raise ValueError(f"unmappable data file URI in upsert: {u}")
            touched.add(abs_of[p])
        if touched:
            untouched = [f for f in snap["files"] if f not in touched]
            survivors = spark.read.parquet(
                *[os.path.join(root, f) for f in sorted(touched)]
            ).join(F.broadcast(keys_df), keys, "left_anti")

    new_data = df if survivors is None else survivors.unionByName(df)
    data_dir = os.path.join(root, "data", f"txn-{txn_id}")
    new_data.write.mode("overwrite").parquet(data_dir)
    files = sorted(
        os.path.join("data", f"txn-{txn_id}", f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )

    os.makedirs(_manifest_path(root), exist_ok=True)
    new = {
        "version": snap["version"] + 1,
        "files": untouched + files,
        "txns": snap["txns"] + [txn_id],
    }
    vname = f"v{new['version']:06d}.json"
    with open(os.path.join(_manifest_path(root), vname), "w") as fh:
        json.dump(new, fh)
    tmp = os.path.join(_manifest_path(root), f".latest-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        fh.write(vname)
    os.replace(tmp, os.path.join(_manifest_path(root), _LATEST))  # THE commit
    return new


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame | None:
    """Read a committed snapshot (None if the sink has never committed).

    ``version=None`` reads the latest; an explicit version TIME-TRAVELS
    to that manifest (the ordered v<NNNNNN>.json log is retained, so any
    committed state stays readable — until ``vacuum``, which keeps only
    the files of the LATEST snapshot, exactly like Delta's VACUUM
    retention tradeoff). Only files named by the chosen manifest are
    read — uncommitted or half-written txn directories are invisible
    by construction.
    """
    if version is None:
        snap = _read_latest(root)
    else:
        vpath = os.path.join(_manifest_path(root), f"v{version:06d}.json")
        if not os.path.exists(vpath):
            raise ValueError(f"snapshot version {version} was never committed")
        with open(vpath) as fh:
            snap = json.load(fh)
    if not snap["files"]:
        return None
    paths = [os.path.join(root, f) for f in snap["files"]]
    return spark.read.parquet(*paths)


def vacuum(root: str) -> list[str]:
    """Delete data files not referenced by the committed snapshot
    (orphans from crashed transactions). Returns deleted paths."""
    snap = _read_latest(root)
    live = {os.path.join(root, f) for f in snap["files"]}
    deleted = []
    data_root = os.path.join(root, "data")
    if not os.path.isdir(data_root):
        return deleted
    for txn in os.listdir(data_root):
        tdir = os.path.join(data_root, txn)
        for f in os.listdir(tdir):
            p = os.path.join(tdir, f)
            if f.endswith(".parquet") and p not in live:
                os.remove(p)
                deleted.append(p)
        if not os.listdir(tdir):
            os.rmdir(tdir)
    return deleted

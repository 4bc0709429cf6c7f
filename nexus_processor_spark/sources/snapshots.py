"""Manifest-committed snapshot tables: executed lakehouse semantics
without the (environment-gated) Iceberg runtime.

The reference commits event tables through an Iceberg catalog
(reference ``lakehouse_scripts/init_neutron_data.py:129-201``,
``ingest_neutron_data.py:209-211``); this container has no Iceberg jars,
so ``catalog.write_table(fmt="iceberg")`` can emit the matching DDL but
never execute. This module supplies the SEMANTICS that matter —
atomic snapshot commits, snapshot-isolated readers, append/overwrite,
time travel, and crash invisibility — with nothing but parquet files
and one atomically-renamed manifest per version, so the behavior is
fully executed and test-pinned in this environment:

* Data files land under ``<table>/data/<uuid>/`` (one directory per
  commit attempt — writers never touch other commits' files).
* A commit is the atomic rename of ``manifest.<v>.json.tmp`` →
  ``manifest.<v>.json`` listing EVERY data directory visible in that
  snapshot. Readers resolve the highest manifest and read exactly its
  listed directories: a crash before rename leaves orphan data that no
  reader ever sees; a reader holding version v is unaffected by later
  commits (snapshot isolation).
* ``append`` lists the previous snapshot's directories + the new one;
  ``overwrite`` lists only the new one (old files stay on disk for time
  travel until ``expire_snapshots`` prunes unreferenced directories).

This is the standard snapshot/manifest design from the public Iceberg /
Delta literature reduced to its observable semantics — not a port of
either implementation.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_RE = re.compile(r"^manifest\.(\d+)\.json$")


def _versions(table_path: str) -> list[int]:
    if not os.path.isdir(table_path):
        return []
    out = []
    for name in os.listdir(table_path):
        m = _MANIFEST_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _read_manifest(table_path: str, version: int) -> dict:
    with open(os.path.join(table_path, f"manifest.{version}.json")) as fh:
        return json.load(fh)


def current_version(table_path: str) -> int | None:
    vs = _versions(table_path)
    return vs[-1] if vs else None


def write_snapshot(
    df: DataFrame,
    table_path: str,
    *,
    mode: str = "append",
) -> int:
    """Commit ``df`` as a new snapshot; returns the committed version.

    The data write happens into a fresh commit-private directory; the
    snapshot becomes visible only at the manifest rename (atomic on any
    POSIX filesystem; on an object store this maps to the usual
    put-if-absent commit). A crash at ANY earlier point leaves the table
    exactly at its previous version.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append or overwrite, got {mode!r}")
    os.makedirs(table_path, exist_ok=True)
    commit_dir = f"data/{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(os.path.join(table_path, commit_dir))

    prev = current_version(table_path)
    dirs = [commit_dir]
    if mode == "append" and prev is not None:
        dirs = _read_manifest(table_path, prev)["data_dirs"] + dirs
    version = 0 if prev is None else prev + 1
    manifest = {
        "version": version,
        "mode": mode,
        "schema": df.schema.jsonValue(),
        "data_dirs": dirs,
    }
    tmp = os.path.join(table_path, f"manifest.{version}.json.tmp")
    final = os.path.join(table_path, f"manifest.{version}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, final)  # THE commit point
    return version


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    *,
    version: int | None = None,
) -> DataFrame:
    """Read a snapshot (latest by default; ``version`` time-travels).
    Only the manifest's directories are scanned — uncommitted/orphaned
    data is invisible by construction."""
    vs = _versions(table_path)
    if not vs:
        raise FileNotFoundError(f"no committed snapshot under {table_path}")
    if version is None:
        version = vs[-1]
    elif version not in vs:
        raise FileNotFoundError(
            f"version {version} not present under {table_path}; have {vs}"
        )
    m = _read_manifest(table_path, version)
    paths = [os.path.join(table_path, d) for d in m["data_dirs"]]
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(m["schema"])
    return spark.read.schema(schema).parquet(*paths)


def expire_snapshots(table_path: str, *, keep_last: int = 2) -> list[int]:
    """Drop manifests older than the last ``keep_last`` and delete data
    directories no retained snapshot references. Returns the expired
    versions. Readers of retained versions are unaffected (their
    directories survive by definition)."""
    import shutil

    vs = _versions(table_path)
    expired = vs[:-keep_last] if keep_last > 0 else vs
    kept = vs[len(expired):]
    referenced: set[str] = set()
    for v in kept:
        referenced.update(_read_manifest(table_path, v)["data_dirs"])
    for v in expired:
        os.remove(os.path.join(table_path, f"manifest.{v}.json"))
    data_root = os.path.join(table_path, "data")
    if os.path.isdir(data_root):
        for name in os.listdir(data_root):
            if f"data/{name}" not in referenced:
                shutil.rmtree(os.path.join(data_root, name))
    return expired

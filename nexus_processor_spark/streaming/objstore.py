"""Storage backends for :class:`streaming.state_store.KeyedStateStore`.

The store's deployment contract (state_store module docstring) names
exactly one POSIX-only primitive — ``os.link`` create-exclusive manifest
publication — plus sidecar/byte accounting reads. This module makes that
seam explicit and EXECUTED: ``FsBackend`` is the POSIX path;
``LocalObjectStore`` is the object-store twin, speaking only primitives
S3/GCS offer (conditional PUT for the commit point, whole-object
GET/PUT, LIST-by-prefix emulated over the same local directory), so the
full state-store test suite runs over both and a real port only swaps
the HTTP client in.

Both backends are tiny picklable value objects (no session state), so
executor-side kernels (``probe_distributed``'s bloom test,
``_make_shard_writer``) can close over them.

Parquet data reads/writes stay with Spark's own Hadoop connectors —
they already speak both filesystems and object stores natively; the
backend governs only the store's PROTOCOL files (manifests, bloom
sidecars) and its byte accounting.
"""

from __future__ import annotations

import io
import json
import os
import shutil
import uuid


class FsBackend:
    """POSIX local/shared-filesystem backend. Manifest publication is
    write-to-temp + create-exclusive ``os.link`` — the commit point the
    snapshots module defines (`sources/snapshots.py:97`)."""

    name = "fs"

    def publish_manifest(self, root: str, version: int, manifest: dict) -> bool:
        from nexus_processor_spark.sources.snapshots import _publish_manifest

        return _publish_manifest(root, version, manifest)

    # -- objects (protocol files: manifests, sidecars)

    def put_bytes(self, path: str, data: bytes) -> None:
        """Atomic non-conditional object write (idempotent task retries
        republish identical bytes): temp + rename on POSIX."""
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def get_bytes(self, path: str) -> bytes | None:
        try:
            with open(path, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        os.remove(path)

    # -- listings / accounting

    def listdir(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return sorted(os.listdir(path))

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def du(self, path: str) -> int:
        total = 0
        for r, _, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(r, f))
        return total

    def delete_tree(self, path: str) -> None:
        shutil.rmtree(path)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)


class LocalObjectStore(FsBackend):
    """Object-store twin over a local directory: same layout, but the
    protocol uses ONLY primitives S3/GCS offer —

    * commit point: conditional create (``open(path, 'xb')``), the
      local stand-in for S3 ``If-None-Match: *`` / GCS
      ``ifGenerationMatch=0`` — NO hard links anywhere;
    * whole-object GET/PUT for sidecars (readers get bytes, never a
      seekable local path);
    * directory tests degrade to prefix listings (an object store has
      no directories — ``isdir`` means "any key under this prefix").

    Listing/du/mtime reuse the local walk as the LIST emulation. A real
    port replaces the ``open``/``os.walk`` calls with the store's HTTP
    client behind the same method contract; the state-store suite runs
    green over this twin to pin that the engine itself never depends on
    links or rename atomicity (the one rename left, in ``put_bytes``,
    emulates the atomicity a single object PUT already has)."""

    name = "objstore"

    def publish_manifest(self, root: str, version: int, manifest: dict) -> bool:
        path = os.path.join(root, f"manifest.{version}.json")
        data = json.dumps(manifest).encode()
        try:
            with open(path, "xb") as f:  # conditional PUT: one winner
                f.write(data)
            return True
        except FileExistsError:
            return False

    def get_bytes(self, path: str) -> bytes | None:
        # whole-object GET through an explicit buffer: callers never
        # see a filesystem path (np.load gets a BytesIO upstream)
        try:
            with open(path, "rb") as f:
                return io.BytesIO(f.read()).getvalue()
        except FileNotFoundError:
            return None


def resolve_backend(spec) -> FsBackend:
    """``"fs"`` | ``"objstore"`` | an instance with the same surface."""
    if spec == "fs" or spec is None:
        return FsBackend()
    if spec == "objstore":
        return LocalObjectStore()
    if isinstance(spec, FsBackend):
        return spec
    raise ValueError(f"unknown state-store backend: {spec!r}")

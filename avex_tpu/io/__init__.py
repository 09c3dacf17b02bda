"""Storage abstraction: uniform access to local and remote paths.

Mirrors the reference io shim (``avex/io/__init__.py:38-50``,
``avex/io/paths.py:110-147``): fsspec-backed handling of ``gs://``, ``s3://``,
``hf://`` and local paths, plus a TTL-validated local cache used by checkpoint
loading (≈ ``avex/utils/utils.py:32-177``).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from pathlib import Path
from typing import Any, Optional, Tuple

import fsspec

__all__ = [
    "anypath",
    "filesystem_from_path",
    "exists",
    "rm",
    "read_bytes",
    "read_text",
    "write_bytes",
    "write_text",
    "cached_download",
    "cache_dir",
]

_REMOTE_SCHEMES = ("gs://", "s3://", "r2://", "hf://", "http://", "https://")


def is_remote(path: str) -> bool:
    """Return True when ``path`` points at a remote (non-local) filesystem."""
    return str(path).startswith(_REMOTE_SCHEMES)


def anypath(path: str) -> str:
    """Normalize a path string; local paths are expanded, remote passed through."""
    path = str(path)
    if is_remote(path):
        return path
    return str(Path(path).expanduser())


def filesystem_from_path(path: str) -> Tuple[Any, str]:
    """Return ``(fsspec filesystem, fs-internal path)`` for any path string."""
    path = anypath(path)
    if path.startswith("r2://"):
        # Cloudflare R2 is S3-compatible; the endpoint comes from env config.
        fs = fsspec.filesystem("s3")
        return fs, path[len("r2://") :]
    fs, _, paths = fsspec.get_fs_token_paths(path)
    return fs, paths[0]


def exists(path: str) -> bool:
    """True when the (local or remote) path exists."""
    fs, p = filesystem_from_path(path)
    return fs.exists(p)


def rm(path: str, recursive: bool = False) -> None:
    """Delete a file or directory tree."""
    fs, p = filesystem_from_path(path)
    if fs.exists(p):
        fs.rm(p, recursive=recursive)


def read_bytes(path: str) -> bytes:
    """Read a (local or remote) file fully into bytes."""
    fs, p = filesystem_from_path(path)
    with fs.open(p, "rb") as f:
        return f.read()


def read_text(path: str, encoding: str = "utf-8") -> str:
    """Read a file as text."""
    return read_bytes(path).decode(encoding)


def write_bytes(path: str, data: bytes) -> None:
    """Write bytes, creating local parent directories."""
    fs, p = filesystem_from_path(path)
    parent = os.path.dirname(p)
    if parent and not is_remote(path):
        os.makedirs(parent, exist_ok=True)
    with fs.open(p, "wb") as f:
        f.write(data)


def write_text(path: str, text: str, encoding: str = "utf-8") -> None:
    """Write text content."""
    write_bytes(path, text.encode(encoding))


def cache_dir() -> Path:
    """Local cache root; honours ``ESP_CACHE_HOME`` like the reference loader."""
    root = os.environ.get("ESP_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache", "avex_tpu"
    )
    path = Path(root)
    path.mkdir(parents=True, exist_ok=True)
    return path


def _cache_key(path: str) -> str:
    return hashlib.sha256(path.encode()).hexdigest()[:24]


def cached_download(
    path: str,
    ttl_seconds: Optional[float] = 7 * 24 * 3600,
    force: bool = False,
) -> str:
    """Download a remote file into the local cache and return the local path.

    Implements the reference's atomic-download + TTL validation scheme
    (``avex/utils/utils.py:32-177``): downloads land in a temp file that is
    atomically renamed, and a sidecar records fetch time + source for TTL and
    provenance checks. Local paths are returned unchanged.
    """
    path = anypath(path)
    if not is_remote(path):
        return path

    key = _cache_key(path)
    name = os.path.basename(path.split("?", 1)[0]) or "blob"
    dest = cache_dir() / key / name
    meta = dest.with_suffix(dest.suffix + ".meta.json")

    if dest.exists() and not force:
        fresh = True
        if ttl_seconds is not None and meta.exists():
            try:
                fetched_at = json.loads(meta.read_text()).get("fetched_at", 0)
                fresh = (time.time() - fetched_at) < ttl_seconds
            except (json.JSONDecodeError, OSError):
                fresh = False
        if fresh:
            return str(dest)

    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(dest.suffix + f".tmp.{os.getpid()}")
    fs, p = filesystem_from_path(path)
    with fs.open(p, "rb") as src, open(tmp, "wb") as out:
        shutil.copyfileobj(src, out, length=1 << 20)
    os.replace(tmp, dest)  # atomic on POSIX — safe under concurrent fetchers
    meta.write_text(json.dumps({"source": path, "fetched_at": time.time()}))
    return str(dest)

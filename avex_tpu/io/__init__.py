"""Storage abstraction: uniform access to local and remote paths.

Mirrors the reference io shim (``avex/io/__init__.py:38-50``,
``avex/io/paths.py:110-147``): fsspec-backed handling of ``gs://``, ``s3://``,
``hf://`` and local paths, plus a local cache with exponential-backoff retry,
TTL checks, and remote version-token (etag/md5/generation) revalidation
(≈ ``avex/utils/utils.py:32-177``, ``avex/data/cloudpathlib_retry_patch.py``).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import shutil
import time
from pathlib import Path
from typing import Any, Callable, Optional, Tuple, TypeVar

import fsspec

logger = logging.getLogger(__name__)

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
    "retry",
]

_T = TypeVar("_T")


def retry(
    fn: Callable[[], _T],
    attempts: int = 3,
    base_delay: float = 0.5,
    max_delay: float = 8.0,
    retry_on: Tuple[type, ...] = (OSError, IOError, TimeoutError),
    description: str = "io operation",
) -> _T:
    """Run ``fn`` with exponential-backoff retry on transient IO failures.

    Matches the reference's retry semantics (utils.py:152-177 and the
    cloudpathlib read retry patch): short exponentially-increasing delays,
    the final exception re-raised so upstream code aborts rather than
    silently consuming corrupt data. ``AVEX_IO_RETRIES`` overrides attempts.
    """
    attempts = max(1, int(os.environ.get("AVEX_IO_RETRIES", attempts)))
    delay = base_delay
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except retry_on as err:
            if attempt == attempts:
                raise
            logger.warning(
                "%s failed (attempt %d/%d): %s — retrying in %.1fs",
                description, attempt, attempts, err, delay,
            )
            time.sleep(delay)
            delay = min(delay * 2, max_delay)
    raise RuntimeError("unreachable")  # pragma: no cover

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
    """Read a (local or remote) file fully into bytes (with retry when remote)."""
    fs, p = filesystem_from_path(path)

    def _read() -> bytes:
        with fs.open(p, "rb") as f:
            return f.read()

    if is_remote(path):
        return retry(_read, description=f"read {path}")
    return _read()


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


def _remote_version_token(fs: Any, p: str) -> Optional[str]:
    """Best-effort remote version token without downloading
    (≈ utils.py:109-143): normalized from whichever stable identifiers the
    backend's ``fs.info`` exposes (etag, md5, generation, mtime, size...)."""
    try:
        info = fs.info(p)
    except Exception as err:
        logger.debug("remote stat failed for %s: %s", p, err)
        return None
    if not isinstance(info, dict):
        return None
    candidates = [
        f"{key}={info[key]}"
        for key in (
            "etag", "ETag", "md5", "md5Hash", "crc32c", "sha256",
            "generation", "versionId", "last_modified", "mtime", "size",
        )
        if info.get(key) is not None
    ]
    return "|".join(candidates) or None


def _validate_ttl_seconds() -> float:
    """Seconds between remote revalidations; 0 = every hit, <0 = never
    (``ESP_CACHE_VALIDATE_TTL_SECONDS``, matching the reference knob)."""
    raw = os.environ.get("ESP_CACHE_VALIDATE_TTL_SECONDS")
    if raw is None:
        return 24 * 3600.0
    try:
        return float(raw)
    except ValueError:
        logger.warning("Invalid ESP_CACHE_VALIDATE_TTL_SECONDS=%r; using default", raw)
        return 24 * 3600.0


def cached_download(
    path: str,
    ttl_seconds: Optional[float] = 7 * 24 * 3600,
    force: bool = False,
) -> str:
    """Download a remote file into the local cache and return the local path.

    Implements the reference's scheme (``avex/utils/utils.py:32-177``):
    atomic temp-file + rename downloads with exponential-backoff retry, a
    sidecar recording fetch time / source / remote version token, TTL
    freshness, and periodic remote version-token revalidation — a cached file
    whose remote etag changed is re-fetched. Local paths return unchanged.
    """
    path = anypath(path)
    if not is_remote(path):
        return path

    key = _cache_key(path)
    name = os.path.basename(path.split("?", 1)[0]) or "blob"
    dest = cache_dir() / key / name
    meta_path = dest.with_suffix(dest.suffix + ".meta.json")
    fs, p = filesystem_from_path(path)

    if dest.exists() and not force:
        meta: dict = {}
        if meta_path.exists():
            try:
                meta = json.loads(meta_path.read_text())
            except (json.JSONDecodeError, OSError):
                meta = {}
        fresh = bool(meta)
        if fresh and ttl_seconds is not None:
            fresh = (time.time() - meta.get("fetched_at", 0)) < ttl_seconds
        if fresh:
            validate_ttl = _validate_ttl_seconds()
            last_validated = meta.get("last_validated_at", meta.get("fetched_at", 0))
            if validate_ttl >= 0 and (time.time() - last_validated) >= validate_ttl:
                token = _remote_version_token(fs, p)
                if token is not None and token != meta.get("version_token"):
                    fresh = False  # remote changed → re-fetch below
                else:
                    meta["last_validated_at"] = time.time()
                    meta_path.write_text(json.dumps(meta))
        if fresh:
            return str(dest)

    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(dest.suffix + f".tmp.{os.getpid()}")

    def _fetch() -> None:
        try:
            with fs.open(p, "rb") as src, open(tmp, "wb") as out:
                shutil.copyfileobj(src, out, length=1 << 20)
        except BaseException:
            Path(tmp).unlink(missing_ok=True)  # no half-baked cache files
            raise

    retry(_fetch, description=f"download {path}")
    os.replace(tmp, dest)  # atomic on POSIX — safe under concurrent fetchers
    now = time.time()
    meta_path.write_text(
        json.dumps(
            {
                "source": path,
                "fetched_at": now,
                "last_validated_at": now,
                "version_token": _remote_version_token(fs, p),
            }
        )
    )
    return str(dest)

"""One filesystem seam for the archive sources (VERDICT r12 item 7).

At 100 TB the archive source IS an object store, so listing and open
must be scheme-routed, not hard-coded to the local filesystem. Every
path the zip/tar sources touch now flows through exactly two functions:

* ``expand_glob(pattern)``  -- planning-time listing (driver side)
* ``open_seekable(path)``   -- read-time open (executor side)

both dispatching on the URI scheme:

* no scheme / ``file://``  -> the local filesystem (``glob`` + ``open``);
  ``file://`` results keep their scheme so partitions carry URIs and
  the executor-side open routes through the seam again.
* a scheme named in the ``GRAFT_FS_MAP`` environment variable
  (``scheme=localroot[,scheme2=root2]``) -> an object-store test
  double: ``scheme://bucket/key`` maps to ``localroot/bucket/key``.
  Env-var-driven (resolved lazily at each call) so executor Python
  workers see the same mapping without any driver-side registration
  handshake; on a real cluster the same knob ships via
  ``spark.executorEnv.GRAFT_FS_MAP``. This is the seam's test: an
  "s3-like" filesystem is a config entry, not a rewrite.
* any other scheme -> ``pyarrow.fs.FileSystem.from_uri`` (s3 / hdfs /
  gcs...; ``s3a``/``s3n`` aliased to ``s3``), with listing implemented
  as a recursive ``FileSelector`` under the pattern's wildcard-free
  prefix + ``fnmatch`` -- pyarrow filesystems have no native glob.
  The open side range-reads (random-access input file), so zip central
  directories seek without materializing the archive.

``register_filesystem(scheme, factory)`` additionally lets a process
install a custom implementation in-process (driver-side planning
doubles, future fsspec adapters); the env map is the worker-safe path.
"""

from __future__ import annotations

import fnmatch
import glob as _glob
import os
import posixpath
import re
from collections.abc import Callable
from urllib.parse import unquote, urlparse

#: Hadoop-era aliases pyarrow's from_uri does not know.
SCHEME_ALIASES = {"s3a": "s3", "s3n": "s3"}

# Accept both RFC 3986 (scheme://...) and Hadoop's single-slash form
# (file:/tmp/x -- what Spark's binaryFile listing emits). A colon NOT
# followed by a slash stays local: odd-but-legal paths like
# 'dir:with:colons/x.zip' must not be misread as remote schemes.
_URI_RE = re.compile(r"^[a-z][a-z0-9+.\-]*:/", re.IGNORECASE)

#: In-process custom schemes: scheme -> factory() -> filesystem object
#: exposing ``glob(pattern: str) -> list[str]`` and
#: ``open_input(path: str) -> binary file``.
_REGISTRY: dict[str, Callable[[], object]] = {}


def register_filesystem(scheme: str, factory: Callable[[], object]) -> None:
    """Install an in-process filesystem for ``scheme`` (test doubles,
    custom adapters). Worker processes do NOT inherit this registry --
    use GRAFT_FS_MAP for anything an executor must open."""
    _REGISTRY[scheme.lower()] = factory


def unregister_filesystem(scheme: str) -> None:
    _REGISTRY.pop(scheme.lower(), None)


def is_uri(path: str) -> bool:
    """True when ``path`` carries an RFC 3986 scheme followed by '//'
    (plain urlparse would misread odd-but-legal local patterns like
    'dir:with:colons/x.zip' as remote schemes)."""
    return bool(_URI_RE.match(path))


def _env_map() -> dict[str, str]:
    """Parse GRAFT_FS_MAP lazily -- workers inherit the env, never a
    driver-side registry."""
    raw = os.environ.get("GRAFT_FS_MAP", "")
    out: dict[str, str] = {}
    for entry in raw.split(","):
        entry = entry.strip()
        if not entry or "=" not in entry:
            continue
        scheme, root = entry.split("=", 1)
        out[scheme.strip().lower()] = root.strip()
    return out


class LocalFileSystem:
    """'' and ``file://`` paths. Scheme-preserving: a ``file://`` glob
    returns ``file://`` URIs so downstream opens stay scheme-routed."""

    def _split(self, path: str) -> tuple[str, str]:
        """-> (local_path, prefix_to_restore)."""
        if not is_uri(path):
            return path, ""
        parsed = urlparse(path)
        if parsed.netloc not in ("", "localhost"):
            # file://host/share names a REMOTE host; globbing the path
            # locally would silently read the wrong tree.
            raise ValueError(
                f"file:// path {path!r} carries a remote host "
                f"{parsed.netloc!r}; only local files are supported"
            )
        # Preserve the caller's URI form (file:///x vs Hadoop's
        # file:/x) so re-prefixed listings round-trip byte-identical.
        sep = "//" if path[len(parsed.scheme) + 1 :].startswith("//") else ""
        prefix = f"{parsed.scheme}:{sep}{parsed.netloc}"
        return unquote(parsed.path), prefix

    def glob(self, pattern: str) -> list[str]:
        local, prefix = self._split(pattern)
        return [prefix + p for p in sorted(_glob.glob(local))]

    def open_input(self, path: str):
        local, _ = self._split(path)
        return open(local, "rb")


class MappedFileSystem:
    """Object-store double: ``scheme://bucket/key`` -> ``root/bucket/key``
    on the local filesystem. Listing and open behave exactly like the
    remote layout would (bucket is the first path component)."""

    def __init__(self, scheme: str, root: str):
        self.scheme = scheme
        self.root = root

    def _to_local(self, path: str) -> str:
        parsed = urlparse(path)
        rel = parsed.netloc + unquote(parsed.path)
        return os.path.join(self.root, rel.lstrip("/"))

    def _to_uri(self, local: str) -> str:
        rel = os.path.relpath(local, self.root)
        bucket, _, key = rel.replace(os.sep, "/").partition("/")
        return f"{self.scheme}://{bucket}/{key}" if key else (
            f"{self.scheme}://{bucket}"
        )

    def glob(self, pattern: str) -> list[str]:
        return [
            self._to_uri(p)
            for p in sorted(_glob.glob(self._to_local(pattern)))
        ]

    def open_input(self, path: str):
        return open(self._to_local(path), "rb")


class ArrowFileSystem:
    """Any scheme pyarrow.fs understands (s3, hdfs, gcs...). Listing =
    recursive FileSelector under the wildcard-free prefix + fnmatch;
    open = random-access input file (range reads, zip-seekable)."""

    def __init__(self, scheme: str):
        self.scheme = scheme

    def _resolve(self, path: str):
        import pyarrow.fs as pafs

        canon = SCHEME_ALIASES.get(self.scheme)
        if canon is not None:
            path = canon + path[len(self.scheme):]
        return pafs.FileSystem.from_uri(path)

    def glob(self, pattern: str) -> list[str]:
        import pyarrow.fs as pafs

        fs, rel = self._resolve(pattern)
        if not any(ch in rel for ch in "*?["):
            info = fs.get_file_info(rel)
            hit = info.type != pafs.FileType.NotFound
            return [pattern] if hit else []
        # list once under the deepest wildcard-free directory
        base = rel
        while any(ch in base for ch in "*?["):
            base = posixpath.dirname(base)
        selector = pafs.FileSelector(
            base, recursive=True, allow_not_found=True
        )
        prefix = pattern[: len(pattern) - len(rel)]
        return sorted(
            prefix + info.path
            for info in fs.get_file_info(selector)
            if info.type == pafs.FileType.File
            and fnmatch.fnmatch(info.path, rel)
        )

    def open_input(self, path: str):
        fs, rel = self._resolve(path)
        return fs.open_input_file(rel)


def filesystem_for(path: str):
    """Resolve the filesystem handling ``path``'s scheme."""
    if not is_uri(path):
        return LocalFileSystem()
    scheme = urlparse(path).scheme.lower()
    if scheme == "file":
        return LocalFileSystem()
    factory = _REGISTRY.get(scheme)
    if factory is not None:
        return factory()
    root = _env_map().get(scheme)
    if root is not None:
        return MappedFileSystem(scheme, root)
    return ArrowFileSystem(scheme)


def expand_glob(pattern: str) -> list[str]:
    """Planning-time listing, scheme-routed. Results preserve the
    pattern's scheme so executor-side opens route through the seam."""
    return filesystem_for(pattern).glob(pattern)


def open_seekable(path: str):
    """Open a file URI (or plain path) as a seekable binary stream
    WITHOUT materializing it: builtin ``open`` locally, range-reading
    random-access files remotely. ``zipfile`` then seeks the central
    directory and inflates members incrementally from the stream."""
    return filesystem_for(path).open_input(path)

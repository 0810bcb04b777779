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
  gcs...; ``s3a``/``s3n`` aliased to ``s3``; ``arrowfile`` aliased to
  ``file`` -- the explicit opt-in that drives LOCAL files through the
  pyarrow adapter, i.e. the exact code path an ``s3://`` URI takes,
  testable without an object store). Listing walks a recursive
  ``FileSelector`` under the pattern's wildcard-free prefix and
  matches PER PATH COMPONENT -- pyarrow filesystems have no native
  glob, and plain ``fnmatch`` would let ``*`` cross ``/`` (ADVICE
  r13: ``bucket/daily/*.zip`` silently ingesting
  ``bucket/daily/sub/deep.zip`` only on real object stores). The open
  side range-reads (random-access input file), so zip central
  directories seek without materializing the archive.

Glob semantics (all backends agree; the wildcarded local double IS
python glob): ``*`` and ``?`` never match ``/``; a ``.``-led name is
matched only by a ``.``-led pattern component; and a WILDCARD-FREE
pattern is a probe that hits only a FILE -- a directory of the same
name must not masquerade as an archive (the r13 ``x.tar``-directory
bug), a rule ADVICE r14 found applied on only the pyarrow backend:
LocalFileSystem and MappedFileSystem now enforce it too
(``os.path.isfile``), and their WILDCARDED listings are equally
file-only, matching the pyarrow FileSelector walk. Callers probing parquet TABLE directories must
use the Hadoop FileSystem their reads use, not this seam
(``streaming/jobs._table_exists``). URI splitting is done manually
(scheme / netloc / path partitioned on ``://`` and the first ``/``),
never via ``urlparse`` -- ``?`` is a legal single-char glob wildcard
that urlparse would silently misparse as a query string (ADVICE r13).
``#`` cannot be represented in the URIs pyarrow's ``from_uri`` parses,
so ArrowFileSystem raises loudly on it instead of listing nothing.
A concrete path that CONTAINS glob metacharacters ('[', '?', '*' are
legal POSIX name characters) is indistinguishable from a pattern at
this interface -- ``glob.escape`` it first when it names one file.

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
from urllib.parse import unquote

#: Aliases pyarrow's from_uri does not know: the Hadoop-era s3a/s3n
#: names, plus ``arrowfile`` -- the explicit scheme that routes LOCAL
#: paths through the ArrowFileSystem adapter (production-parity
#: testing of the pyarrow code path without an object store).
SCHEME_ALIASES = {"s3a": "s3", "s3n": "s3", "arrowfile": "file"}

# Accept both RFC 3986 (scheme://...) and Hadoop's single-slash form
# (file:/tmp/x -- what Spark's binaryFile listing emits). A colon NOT
# followed by a slash stays local: odd-but-legal paths like
# 'dir:with:colons/x.zip' must not be misread as remote schemes.
_URI_RE = re.compile(r"^[a-z][a-z0-9+.\-]*:/", re.IGNORECASE)

#: In-process custom schemes: scheme -> factory() -> filesystem object
#: exposing ``glob(pattern: str) -> list[str]`` and
#: ``open_input(path: str) -> binary file``.
_REGISTRY: dict[str, Callable[[], object]] = {}

_WILDCARDS = "*?["


def register_filesystem(scheme: str, factory: Callable[[], object]) -> None:
    """Install an in-process filesystem for ``scheme`` (test doubles,
    custom adapters). Worker processes do NOT inherit this registry --
    use GRAFT_FS_MAP for anything an executor must open."""
    _REGISTRY[scheme.lower()] = factory


def unregister_filesystem(scheme: str) -> None:
    _REGISTRY.pop(scheme.lower(), None)


def is_uri(path: str) -> bool:
    """True when ``path`` carries an RFC 3986 scheme followed by '/'
    (plain urlparse would misread odd-but-legal local patterns like
    'dir:with:colons/x.zip' as remote schemes)."""
    return bool(_URI_RE.match(path))


def split_uri(path: str) -> tuple[str, str, str, bool]:
    """Manual (scheme, netloc, path, had_double_slash) split.

    urlparse is WRONG for glob patterns: ``?`` (a legal single-char
    wildcard) parses as a query string and ``#`` as a fragment, so
    ``file:///d/R52?.zip`` would silently list nothing (ADVICE r13).
    Partitioning on ``:``/``://`` and the first ``/`` keeps every
    character of the pattern. Caller guarantees ``is_uri(path)``.
    """
    scheme, _, rest = path.partition(":")
    if rest.startswith("//"):
        netloc, sep, tail = rest[2:].partition("/")
        return scheme, netloc, ("/" + tail) if sep else "", True
    return scheme, "", rest, False


def _glob_match(path: str, pattern: str) -> bool:
    """Per-path-component glob match: ``*``/``?`` never cross ``/``,
    and a dot-led name needs a dot-led pattern component -- python
    ``glob`` semantics, so the pyarrow backend, the GRAFT_FS_MAP
    double, and the local filesystem agree (ADVICE r13: plain
    fnmatch's ``*`` matches ``/``, silently ingesting nested files
    only on real object stores)."""
    psegs = pattern.split("/")
    xsegs = path.split("/")
    if len(psegs) != len(xsegs):
        return False
    for pseg, xseg in zip(psegs, xsegs):
        if xseg.startswith(".") and not pseg.startswith("."):
            return False
        if not fnmatch.fnmatchcase(xseg, pseg):
            return False
    return True


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
        scheme, netloc, p, dbl = split_uri(path)
        if netloc not in ("", "localhost"):
            # file://host/share names a REMOTE host; globbing the path
            # locally would silently read the wrong tree.
            raise ValueError(
                f"file:// path {path!r} carries a remote host "
                f"{netloc!r}; only local files are supported"
            )
        # Preserve the caller's URI form (file:///x vs Hadoop's
        # file:/x) so re-prefixed listings round-trip byte-identical.
        prefix = f"{scheme}:{'//' if dbl else ''}{netloc}"
        return unquote(p), prefix

    def glob(self, pattern: str) -> list[str]:
        local, prefix = self._split(pattern)
        if not any(ch in local for ch in _WILDCARDS):
            # Wildcard-free probe: file-only, matching the pyarrow
            # backend (module docstring; ADVICE r14 low -- a local
            # directory named x.tar must not masquerade as an archive
            # any more than an object-store one does).
            return [pattern] if os.path.isfile(local) else []
        # Wildcarded listings are file-only too: ArrowFileSystem's
        # FileSelector walk skips directories, so a directory named
        # daily_x.zip must not enter a listing here either.
        return [
            prefix + p
            for p in sorted(_glob.glob(local))
            if os.path.isfile(p)
        ]

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
        _, netloc, p, _ = split_uri(path)
        rel = netloc + unquote(p)
        return os.path.join(self.root, rel.lstrip("/"))

    def _to_uri(self, local: str) -> str:
        rel = os.path.relpath(local, self.root)
        bucket, _, key = rel.replace(os.sep, "/").partition("/")
        return f"{self.scheme}://{bucket}/{key}" if key else (
            f"{self.scheme}://{bucket}"
        )

    def glob(self, pattern: str) -> list[str]:
        local = self._to_local(pattern)
        if not any(ch in local for ch in _WILDCARDS):
            # Wildcard-free probe: file-only (module docstring; the
            # double must agree with the real object-store backend it
            # stands in for -- ADVICE r14 low).
            return [pattern] if os.path.isfile(local) else []
        # File-only listing, like the FileSelector walk it doubles for.
        return [
            self._to_uri(p)
            for p in sorted(_glob.glob(local))
            if os.path.isfile(p)
        ]

    def open_input(self, path: str):
        return open(self._to_local(path), "rb")


class ArrowFileSystem:
    """Any scheme pyarrow.fs understands (s3, hdfs, gcs...; arrowfile
    -> local). Listing = recursive FileSelector under the
    wildcard-free prefix + per-component glob match; open =
    random-access input file (range reads, zip-seekable)."""

    def __init__(self, scheme: str):
        self.scheme = scheme

    def _parts(self, path: str) -> tuple[str, str, str]:
        """-> (original_scheme, netloc, path); rejects ``#`` loudly --
        pyarrow's from_uri would misparse it as a fragment and this
        backend would otherwise silently list/open the wrong key."""
        scheme, netloc, p, _ = split_uri(path)
        if "#" in netloc or "#" in p:
            raise ValueError(
                f"ArrowFileSystem cannot represent '#' in {path!r}: "
                "pyarrow.fs.FileSystem.from_uri parses it as a URI "
                "fragment. Rename the key or use a GRAFT_FS_MAP / "
                "register_filesystem backend for such paths."
            )
        return scheme, netloc, p

    def _canon(self, scheme: str) -> str:
        return SCHEME_ALIASES.get(scheme.lower(), scheme.lower())

    def _resolve(self, path: str):
        """from_uri for a CONCRETE path (no wildcards): '?' would be a
        wildcard in a pattern but from_uri misparses it as a query
        string, so reject it loudly here too."""
        import pyarrow.fs as pafs

        scheme, netloc, p = self._parts(path)
        if "?" in p or "?" in netloc:
            raise ValueError(
                f"ArrowFileSystem cannot open {path!r}: '?' cannot be "
                "represented in the URIs pyarrow.fs.from_uri parses."
            )
        return pafs.FileSystem.from_uri(
            f"{self._canon(scheme)}://{netloc}{p}"
        )

    def glob(self, pattern: str) -> list[str]:
        import pyarrow.fs as pafs

        scheme, netloc, path = self._parts(pattern)
        if not any(ch in path for ch in _WILDCARDS):
            # Wildcard-free probe: only a FILE is a hit -- a Directory
            # of the same name must not masquerade as an archive (the
            # executor-side open would fail, or a streaming offset
            # would permanently carry a directory entry; ADVICE r13).
            fs, rel = pafs.FileSystem.from_uri(
                f"{self._canon(scheme)}://{netloc}{path}"
            )
            info = fs.get_file_info(rel)
            return [pattern] if info.type == pafs.FileType.File else []
        # Resolve the filesystem from the deepest wildcard-free
        # DIRECTORY prefix of the pattern, at the string level, so a
        # '?' wildcard never reaches pyarrow's URI parser.
        base_path = path
        while any(ch in base_path for ch in _WILDCARDS):
            base_path = posixpath.dirname(base_path)
        fs, base_rel = pafs.FileSystem.from_uri(
            f"{self._canon(scheme)}://{netloc}{base_path}"
        )
        root = base_rel.rstrip("/")  # '' when base is the fs root
        suffix = path[len(base_path):].lstrip("/")
        rel_pattern = f"{root}/{suffix}"
        selector = pafs.FileSelector(
            root or "/", recursive=True, allow_not_found=True
        )
        out = []
        for info in fs.get_file_info(selector):
            if info.type != pafs.FileType.File:
                continue
            if not _glob_match(info.path, rel_pattern):
                continue
            # Map the backend-relative path back to the caller's URI
            # space (original scheme preserved: s3a:// stays s3a://).
            tail = info.path[len(root):].lstrip("/")
            out.append(
                f"{scheme}://{netloc}" + posixpath.join(base_path, tail)
            )
        return sorted(out)

    def open_input(self, path: str):
        fs, rel = self._resolve(path)
        return fs.open_input_file(rel)


def filesystem_for(path: str):
    """Resolve the filesystem handling ``path``'s scheme."""
    if not is_uri(path):
        return LocalFileSystem()
    scheme = path.partition(":")[0].lower()
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

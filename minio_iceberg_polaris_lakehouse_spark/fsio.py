"""Filesystem facade for warehouse/table paths (SURVEY §2.1 S11 —
object-store I/O beyond session conf).

Two backends behind one function surface:

- **Plain local paths** (no scheme, or ``file:``) dispatch straight to
  ``os``/``shutil`` — byte-identical semantics and zero overhead vs the
  pre-facade code, which is what every test and the bench exercise.
- **Any other ``scheme://`` URI** is served through Hadoop's
  ``FileSystem`` API over the active SparkSession's py4j gateway — the
  SAME connector stack (``s3a://``, ``abfs://``, ``gs://``, ``hdfs://``)
  the executors resolve for the parquet data (reference
  docker-compose.yml:24-44 deploys exactly this: MinIO behind ``s3a://``
  with ``fs.s3a.*`` conf). Driver-side metadata I/O and executor-side
  data I/O therefore share one configuration: setting
  ``spark.hadoop.fs.<scheme>.*`` makes BOTH sides work, with no second
  client library or credential plumbing.

Scale notes (100 TB deployment):
- Everything routed here is metadata-sized: JSON snapshot logs, Avro
  manifests, parquet FOOTERS, lock files — O(KB-MB), never table data.
  Data files move exclusively through Spark's own readers/writers.
- The commit lock uses atomic create-exclusive. On HDFS that is
  ``createNewFile`` (atomic in the NameNode); on true object stores
  conditional-PUT semantics require the catalog service (Polaris does
  CAS on the metadata pointer — reference setup-polaris.sh), which is
  why Iceberg's HadoopCatalog carries the same documented caveat.
- ``replace`` (metadata pointer swap) is rename-based: atomic on POSIX
  and HDFS; delete+rename (a crash window, writers still serialized by
  the commit lock) on stores without overwriting rename.
"""

from __future__ import annotations

import io
import os
import re
import shutil
from collections.abc import Iterator

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")

# os.path.join / split / relpath work on scheme URIs as plain '/'-joined
# strings on POSIX; re-exported so callers never import os.path for table
# paths (keeping the rule "all table-path I/O goes through fsio" greppable)
join = os.path.join
relpath = os.path.relpath
basename = os.path.basename
dirname = os.path.dirname


def is_remote(path: str) -> bool:
    """True when ``path`` is a non-``file:`` scheme URI (served via the
    Hadoop FileSystem gateway rather than the local os module)."""
    return bool(_SCHEME_RE.match(path)) and not path.startswith("file:")


def strip_file_scheme(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://") :] or "/"
    if path.startswith("file:"):
        return path[len("file:") :]
    return path


def abspath(path: str) -> str:
    """os.path.abspath for local paths; scheme URIs pass through verbatim
    (abspath would mangle '//' and prepend the cwd)."""
    if is_remote(path):
        return path
    return os.path.abspath(strip_file_scheme(path))


# ---------------------------------------------------------------- hadoop


class _HadoopFS:
    """Thin py4j wrapper over org.apache.hadoop.fs.FileSystem, one
    instance per (scheme, authority). Only metadata-sized I/O goes
    through here — see module docstring."""

    _cache: dict[str, _HadoopFS] = {}

    def __init__(self, uri: str):
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession() or SparkSession._instantiatedSession
        if spark is None:
            raise RuntimeError(
                f"no active SparkSession to resolve Hadoop filesystem for {uri}"
            )
        self._jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(
            self._jvm.java.net.URI.create(uri), conf
        )
        self._P = self._jvm.org.apache.hadoop.fs.Path

    @classmethod
    def for_path(cls, path: str) -> _HadoopFS:
        from pyspark.sql import SparkSession

        m = _SCHEME_RE.match(path)
        authority = path[m.end() :].split("/", 1)[0]
        uri = path[: m.end()] + authority
        # key includes the application id: a cached handle's py4j gateway
        # dies with its SparkSession, so a restarted session must mint a
        # fresh FileSystem instead of dereferencing a dead JVM
        spark = SparkSession.getActiveSession() or SparkSession._instantiatedSession
        app = spark.sparkContext.applicationId if spark is not None else "-"
        key = f"{app}::{uri}"
        if key not in cls._cache:
            cls._cache[key] = cls(uri + "/")
        return cls._cache[key]

    def _call(self, fn, *args):
        """Invoke a java FS method, converting java FileNotFoundException
        into the Python one so call sites keep their except clauses."""
        try:
            return fn(*args)
        except Exception as e:  # py4j Py4JJavaError
            j = getattr(e, "java_exception", None)
            if j is not None and "FileNotFoundException" in j.getClass().getName():
                raise FileNotFoundError(str(j.getMessage())) from None
            raise

    # -- queries
    def exists(self, p: str) -> bool:
        return self._call(self._fs.exists, self._P(p))

    def status(self, p: str):
        return self._call(self._fs.getFileStatus, self._P(p))

    def isfile(self, p: str) -> bool:
        try:
            return self.status(p).isFile()
        except FileNotFoundError:
            return False

    def isdir(self, p: str) -> bool:
        try:
            return self.status(p).isDirectory()
        except FileNotFoundError:
            return False

    def listdir(self, p: str) -> list[str]:
        if not self.exists(p):
            raise FileNotFoundError(p)
        return sorted(
            st.getPath().getName() for st in self._call(self._fs.listStatus, self._P(p))
        )

    def scandir(self, p: str) -> list[tuple[str, bool]]:
        return [
            (st.getPath().getName(), st.isDirectory())
            for st in self._call(self._fs.listStatus, self._P(p))
        ]

    # -- mutations
    def mkdirs(self, p: str) -> None:
        self._call(self._fs.mkdirs, self._P(p))

    def delete(self, p: str, recursive: bool) -> bool:
        return self._call(self._fs.delete, self._P(p), recursive)

    def rename(self, src: str, dst: str) -> bool:
        return self._call(self._fs.rename, self._P(src), self._P(dst))

    def create_new(self, p: str) -> bool:
        return self._call(self._fs.createNewFile, self._P(p))

    # -- bytes
    def read_bytes(self, p: str) -> bytes:
        stream = self._call(self._fs.open, self._P(p))
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            return bytes(data)
        finally:
            stream.close()

    def open_seekable(self, p: str) -> _HadoopSeekable:
        size = int(self.status(p).getLen())
        return _HadoopSeekable(self, self._call(self._fs.open, self._P(p)), size)

    def write_bytes(self, p: str, data: bytes) -> None:
        out = self._call(self._fs.create, self._P(p), True)
        try:
            out.write(data)
        finally:
            out.close()


class _HadoopSeekable(io.RawIOBase):
    """Seekable read-only file-like over an FSDataInputStream — lets
    pyarrow read a parquet FOOTER from a remote file without pulling the
    whole file to the driver (a data file at scale is hundreds of MB;
    the footer is KB). Each read() seeks the Java stream and returns
    exactly the requested range via commons-io (byte[] return values
    cross py4j efficiently; element-wise array access would not)."""

    def __init__(self, hfs: _HadoopFS, stream, size: int):
        self._hfs = hfs
        self._in = stream
        self._size = size
        self._pos = 0

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def seek(self, offset: int, whence: int = 0) -> int:
        base = {0: 0, 1: self._pos, 2: self._size}[whence]
        self._pos = max(0, min(self._size, base + offset))
        return self._pos

    def tell(self) -> int:
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        n = min(n, self._size - self._pos)
        if n <= 0:
            return b""
        self._in.seek(self._pos)
        data = bytes(
            self._hfs._jvm.org.apache.commons.io.IOUtils.toByteArray(self._in, n)
        )
        self._pos += len(data)
        return data

    def close(self) -> None:
        try:
            self._in.close()
        finally:
            super().close()


# ------------------------------------------------------------ facade ops


def exists(path: str) -> bool:
    if is_remote(path):
        return _HadoopFS.for_path(path).exists(path)
    return os.path.exists(strip_file_scheme(path))


def isfile(path: str) -> bool:
    if is_remote(path):
        return _HadoopFS.for_path(path).isfile(path)
    return os.path.isfile(strip_file_scheme(path))


def isdir(path: str) -> bool:
    if is_remote(path):
        return _HadoopFS.for_path(path).isdir(path)
    return os.path.isdir(strip_file_scheme(path))


def listdir(path: str) -> list[str]:
    if is_remote(path):
        return _HadoopFS.for_path(path).listdir(path)
    return os.listdir(strip_file_scheme(path))


def makedirs(path: str, exist_ok: bool = True) -> None:
    if is_remote(path):
        _HadoopFS.for_path(path).mkdirs(path)  # mkdirs is exist-ok by contract
        return
    os.makedirs(strip_file_scheme(path), exist_ok=exist_ok)


def walk(top: str) -> Iterator[tuple[str, list[str], list[str]]]:
    if not is_remote(top):
        yield from os.walk(strip_file_scheme(top))
        return
    fs = _HadoopFS.for_path(top)
    if not fs.exists(top):
        return

    def _walk(d: str) -> Iterator[tuple[str, list[str], list[str]]]:
        dirs, files = [], []
        for name, is_dir in fs.scandir(d):
            (dirs if is_dir else files).append(name)
        yield d, dirs, files
        for sub in dirs:
            yield from _walk(join(d, sub))

    yield from _walk(top)


def getsize(path: str) -> int:
    if is_remote(path):
        return int(_HadoopFS.for_path(path).status(path).getLen())
    return os.path.getsize(strip_file_scheme(path))


def getmtime(path: str) -> float:
    if is_remote(path):
        return _HadoopFS.for_path(path).status(path).getModificationTime() / 1000.0
    return os.path.getmtime(strip_file_scheme(path))


def remove(path: str) -> None:
    if is_remote(path):
        if not _HadoopFS.for_path(path).delete(path, False):
            raise FileNotFoundError(path)
        return
    os.unlink(strip_file_scheme(path))


def rmtree(path: str, ignore_errors: bool = False) -> None:
    if is_remote(path):
        fs = _HadoopFS.for_path(path)
        try:
            fs.delete(path, True)
        except Exception:
            if not ignore_errors:
                raise
        return
    shutil.rmtree(strip_file_scheme(path), ignore_errors=ignore_errors)


def rename(src: str, dst: str) -> None:
    """Move; MUST NOT clobber an existing dst (callers rely on the
    fail-if-exists contract for lock handoff). POSIX os.rename on a dir
    over an existing dir fails; Hadoop rename returns False."""
    if is_remote(src):
        fs = _HadoopFS.for_path(src)
        # Hadoop rename with an existing dst DIRECTORY moves src INTO it
        # and reports success — check first to keep the fail-if-exists
        # contract (narrow check-then-act window; the commit lock
        # serializes the callers that care)
        if fs.exists(dst):
            raise FileExistsError(dst)
        if not fs.rename(src, dst):
            if not fs.exists(src):
                raise FileNotFoundError(src)
            raise FileExistsError(dst)
        return
    src, dst = strip_file_scheme(src), strip_file_scheme(dst)
    if os.path.isfile(src) and os.path.exists(dst):
        # POSIX rename would silently overwrite a file — keep the
        # fail-if-exists contract uniform across backends
        raise FileExistsError(dst)
    os.rename(src, dst)


def replace(src: str, dst: str) -> None:
    """Move with overwrite — the metadata-pointer swap. Atomic on POSIX
    and HDFS; delete+rename elsewhere (see module docstring)."""
    if is_remote(src):
        fs = _HadoopFS.for_path(src)
        if fs.exists(dst):
            fs.delete(dst, False)
        if not fs.rename(src, dst):
            raise OSError(f"rename {src} -> {dst} failed")
        return
    os.replace(strip_file_scheme(src), strip_file_scheme(dst))


def read_text(path: str) -> str:
    if is_remote(path):
        return _HadoopFS.for_path(path).read_bytes(path).decode()
    with open(strip_file_scheme(path)) as f:
        return f.read()


def read_bytes(path: str) -> bytes:
    if is_remote(path):
        return _HadoopFS.for_path(path).read_bytes(path)
    with open(strip_file_scheme(path), "rb") as f:
        return f.read()


def open_binary(path: str):
    """Readable binary file-like — a real file handle locally, a
    SEEKABLE ranged-read stream for remote paths, so parquet footer
    parsing (the per-commit stats pass) reads KBs off a remote data
    file, never the whole file into driver memory."""
    if is_remote(path):
        return _HadoopFS.for_path(path).open_seekable(path)
    return open(strip_file_scheme(path), "rb")


def write_bytes(path: str, data: bytes) -> None:
    if is_remote(path):
        _HadoopFS.for_path(path).write_bytes(path, data)
        return
    with open(strip_file_scheme(path), "wb") as f:
        f.write(data)


def write_bytes_atomic(path: str, data: bytes, tmp_suffix: str) -> None:
    """Write-temp + replace — the atomic publish every metadata file
    uses. ``tmp_suffix`` must be unique per writer (uuid)."""
    tmp = f"{path}.{tmp_suffix}.tmp"
    write_bytes(tmp, data)
    replace(tmp, path)


def try_create_exclusive(path: str, content: bytes) -> bool:
    """Atomically create ``path`` iff absent (the lock-acquire
    primitive); on success write ``content`` (we own the file) and
    return True. O_CREAT|O_EXCL locally; FileSystem.createNewFile
    (NameNode-atomic on HDFS) remotely."""
    if is_remote(path):
        fs = _HadoopFS.for_path(path)
        if not fs.create_new(path):
            return False
        fs.write_bytes(path, content)
        return True
    try:
        fd = os.open(strip_file_scheme(path), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    os.write(fd, content)
    os.close(fd)
    return True


def restore_renamed_lock(broken: str, lock: str) -> None:
    """Undo a mistaken stale-lock break: put ``broken`` back at ``lock``
    unless an even newer lock already took the name, then drop the
    ``broken`` copy. Locally hardlink+unlink (atomic, never loses the
    fresh lock); remotely rename-if-absent."""
    if is_remote(broken):
        fs = _HadoopFS.for_path(broken)
        if not fs.rename(broken, lock):  # lock name re-taken: drop copy
            fs.delete(broken, False)
        return
    broken, lock = strip_file_scheme(broken), strip_file_scheme(lock)
    try:
        os.link(broken, lock)
    except FileExistsError:
        pass
    os.unlink(broken)

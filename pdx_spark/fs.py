"""Filesystem seam for index artifacts.

Every manifest / segment / tombstone side-file operation routes through
an IndexFS so the engine runs against whatever filesystem Spark itself
can reach. Two implementations:

  LocalFS  — plain os/shutil for scheme-less paths (the sandbox, tests,
             single-box deployments). os.replace gives atomic renames.
  HadoopFS — py4j bridge to Spark's own org.apache.hadoop.fs.FileSystem
             for any path WITH a scheme (file:, hdfs:, s3a:, gs:, ...).
             This is the 100 TB path: the driver talks to the same
             FileSystem implementation the executors write through, so
             whatever connectors the cluster ships (S3A committers,
             ABFS, ...) work here without new dependencies. Renames are
             atomic on HDFS; on S3-like stores rename is copy+delete —
             the manifest stays the single commit point either way
             because readers resolve every artifact THROUGH it (an
             interrupted rename leaves an unreferenced dir, never a
             manifest pointing at missing data; see maintenance.py's
             commit-then-delete ordering).

Parquet data reads/writes go straight through spark.read/write, which
accepts the same URIs; this module only covers the small side-artifacts
(manifest JSON) and metadata operations (exists/list/delete/rename).
"""

from __future__ import annotations

import os
import shutil


def _has_scheme(path: str) -> bool:
    # "scheme:/..." or "scheme://..." — but not a Windows drive or a
    # plain local path
    i = path.find(":")
    return i > 1 and path[:i].isalpha()


def index_fs(spark, root: str) -> "IndexFS":
    return HadoopFS(spark, root) if _has_scheme(root) else LocalFS()


class IndexFS:
    is_local = False

    # -- pure path algebra (no I/O) ------------------------------------------
    @staticmethod
    def join(*parts: str) -> str:
        out = parts[0]
        for p in parts[1:]:
            out = out.rstrip("/") + "/" + p
        return out

    # -- interface -------------------------------------------------------------
    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_text_atomic(self, path: str, data: str) -> None:
        """Write via tmp + rename so readers never see a torn file."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        """Recursive delete; missing path is a no-op."""
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def parquet_files(self, path: str) -> list[tuple[str, int]]:
        """Recursive [(file_path, size)] of *.parquet under path."""
        raise NotImplementedError

    def num_row_groups(self, file_path: str) -> int:
        raise NotImplementedError


class LocalFS(IndexFS):
    is_local = True

    def exists(self, path):
        return os.path.exists(path)

    def read_text(self, path):
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path, data):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)

    def delete(self, path):
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)

    def rename(self, src, dst):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        os.replace(src, dst)

    def parquet_files(self, path):
        out = []
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    full = os.path.join(root, f)
                    out.append((full, os.path.getsize(full)))
        return out

    def num_row_groups(self, file_path):
        import pyarrow.parquet as pq
        return pq.ParquetFile(file_path).metadata.num_row_groups


class HadoopFS(IndexFS):
    """Driver-side access to any Hadoop-supported filesystem via py4j —
    no new Python dependencies; uses the exact connector jars the Spark
    cluster already runs its executors with."""

    is_local = False

    def __init__(self, spark, root: str):
        self._jvm = spark._jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._uri = self._jvm.java.net.URI(root)
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(
            self._uri, self._conf)
        self._fc = None  # lazy FileContext (atomic overwrite renames)

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path):
        return bool(self._fs.exists(self._p(path)))

    def read_text(self, path):
        stream = self._fs.open(self._p(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8")
        finally:
            stream.close()

    def write_text_atomic(self, path, data):
        """tmp + OVERWRITE rename: the previous file (e.g. the manifest —
        the index's single commit point) stays readable at `path` until
        the instant the new one replaces it. The old delete-then-rename
        protocol had a crash window with NO manifest at all (round-3
        ADVICE, medium)."""
        tmp = path + ".tmp"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(data.encode("utf-8")))
        finally:
            out.close()
        self._rename_overwrite(tmp, path)

    def _rename_overwrite(self, src, dst):
        """FileContext.rename(OVERWRITE): atomic replace on HDFS (and
        a single-RPC copy-swap on object stores). Falls back to
        delete+rename only when the connector has no AbstractFileSystem
        binding (the pre-fix behavior, with its narrow window)."""
        if self._fc is not False:  # False = binding known-missing
            try:
                if self._fc is None:
                    self._fc = self._jvm.org.apache.hadoop.fs.FileContext \
                        .getFileContext(self._uri, self._conf)
                ren = self._jvm.org.apache.hadoop.fs.Options.Rename
                opts = self._gateway.new_array(ren, 1)
                opts[0] = ren.OVERWRITE
                self._fc.rename(self._p(src), self._p(dst), opts)
                return
            except Exception:
                self._fc = False  # don't retry a missing binding per call
        self._fs.delete(self._p(dst), False)
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise IOError(f"rename {src} -> {dst} failed")

    def delete(self, path):
        self._fs.delete(self._p(path), True)

    def rename(self, src, dst):
        """Directory commit rename. Hadoop's FileSystem.rename moves src
        INTO an existing dst dir, so an existing dst must be moved out of
        the way first — but never deleted before the new artifact is in
        place: dst is parked at dst+".stale", src swings in, then the
        stale copy is dropped. A crash mid-sequence leaves the old
        artifact recoverable at .stale (this only arises on crash-RETRY
        paths: normal commits target fresh gen-named dirs — single-writer
        assumption, see maintenance.py)."""
        parent = dst.rsplit("/", 1)[0]
        self._fs.mkdirs(self._p(parent))
        stale = None
        if self._fs.exists(self._p(dst)):
            stale = dst + ".stale"
            self._fs.delete(self._p(stale), True)
            if not self._fs.rename(self._p(dst), self._p(stale)):
                raise IOError(f"rename {dst} -> {stale} failed")
        if not self._fs.rename(self._p(src), self._p(dst)):
            if stale is not None:  # restore the previous artifact
                self._fs.rename(self._p(stale), self._p(dst))
            raise IOError(f"rename {src} -> {dst} failed")
        if stale is not None:
            self._fs.delete(self._p(stale), True)

    def parquet_files(self, path):
        out = []
        if not self.exists(path):
            return out
        it = self._fs.listFiles(self._p(path), True)
        while it.hasNext():
            st = it.next()
            p = st.getPath().toString()
            if p.endswith(".parquet"):
                out.append((p, int(st.getLen())))
        return out

    def num_row_groups(self, file_path):
        # parquet-hadoop ships with Spark: footer-only read, any scheme
        in_file = self._jvm.org.apache.parquet.hadoop.util.HadoopInputFile \
            .fromPath(self._p(file_path), self._conf)
        reader = self._jvm.org.apache.parquet.hadoop.ParquetFileReader \
            .open(in_file)
        try:
            return int(reader.getFooter().getBlocks().size())
        finally:
            reader.close()


def verify_single_rowgroup(fs: IndexFS, seg_dir: str,
                           root: str | None = None) -> bool:
    """True iff every parquet file under seg_dir has exactly one row
    group — the invariant the shuffle-free map-scan needs (Spark splits
    parquet scans at row-group granularity, so 1 row group = the file is
    never fragmented across scan partitions). Footer-only reads: pyarrow
    locally, parquet-hadoop through py4j on any other scheme. Writers
    verify their own output and record the verdict in the manifest so
    loads don't repeat the walk."""
    path = fs.join(root, seg_dir) if root is not None else seg_dir
    for f, _ in fs.parquet_files(path):
        if fs.num_row_groups(f) > 1:
            return False
    return True

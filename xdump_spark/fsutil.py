"""Driver-side small-file IO through the Hadoop FileSystem API.

The persistent-state modules (stage checkpointing, the incremental
dedup stores, the text-index manifest) need a handful of filesystem
primitives — exists / list / read / atomic-write / rename — for paths
that in production are NOT on the driver's local disk (``hdfs://``,
``s3a://``…). Python ``os``/``open`` silently sees those paths as
absent, which turns "dedup against history" into "history is empty".
Routing through the JVM's ``org.apache.hadoop.fs.FileSystem`` (already
loaded in every Spark session) makes the same code correct for any
scheme Spark itself can read.

Atomicity note: ``write_text_atomic`` is write-tmp + rename. Where the
scheme has a Hadoop ``FileContext`` binding (local, HDFS, viewfs) the
rename is a single overwrite-atomic call — no window in which the
destination is absent. Schemes without one (S3A) fall back to a
backup-swap (dest → ``.name.old``, tmp → dest, delete backup) whose
crash windows ``read_text_atomic``/``exists_atomic`` roll forward from
the surviving tmp: the pair can see either the old or the new text,
never nothing and never a torn file. A lone ``.tmp`` with NO backup
and NO destination is a crashed FIRST write and is deliberately NOT
recovered — nothing was ever committed, and the tmp itself may be
torn. That is strictly stronger than Spark's own ``_SUCCESS``-style
commit protocols on object stores.

The reference keeps all state in the host database and never touches a
filesystem beyond the zip archive (``xdump/base.py:87-106``); this
module exists because our engine's state lives in files.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path``'s scheme."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def join(*parts: str) -> str:
    """URI-safe path join (``os.path.join`` breaks on ``scheme://``
    under Windows-style separators; posixpath semantics are what every
    Hadoop scheme uses)."""
    return posixpath.join(*parts)


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return fs.exists(p)


def is_dir(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return fs.exists(p) and fs.getFileStatus(p).isDirectory()


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child names of a directory ([] when absent)."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs(spark, path)
    fs.mkdirs(p)


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, p = _fs(spark, path)
    return fs.delete(p, recursive)


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    fs, p = _fs(spark, src)
    return fs.rename(p, spark._jvm.org.apache.hadoop.fs.Path(dst))


def read_text(spark: SparkSession, path: str) -> str:
    """Whole-file read (driver-side, for manifests — not data)."""
    fs, p = _fs(spark, path)
    stream = fs.open(p)
    try:
        # commons-io ships on Spark's classpath; a py4j read loop cannot
        # work anyway (Java byte[] args pass by value into the JVM)
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _siblings(spark: SparkSession, p):
    """The commit protocol's tmp and backup Paths for destination ``p``."""
    P = spark._jvm.org.apache.hadoop.fs.Path
    parent = p.getParent()
    return P(parent, f".{p.getName()}.tmp"), P(parent, f".{p.getName()}.old")


def _rename_overwrite(spark: SparkSession, fs, src, dst) -> bool:
    """One overwrite-atomic rename via FileContext, when the scheme has
    an AbstractFileSystem binding (local/HDFS/viewfs do; S3A does not —
    there this returns False and the caller swaps with a backup)."""
    jvm = spark._jvm
    try:
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            fs.makeQualified(dst).toUri(), spark._jsc.hadoopConfiguration()
        )
        opts = spark.sparkContext._gateway.new_array(
            jvm.org.apache.hadoop.fs.Options.Rename, 1
        )
        opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(fs.makeQualified(src), fs.makeQualified(dst), opts)
        return True
    except Exception:
        return False


def write_text_atomic(spark: SparkSession, path: str, text: str) -> None:
    """Write via a tmp sibling + overwrite-atomic rename (see module
    docstring). On schemes without FileContext the swap leaves windows
    that :func:`read_text_atomic` / :func:`exists_atomic` roll forward
    from, so a reader using those never observes "no file" mid-commit."""
    fs, p = _fs(spark, path)
    parent = p.getParent()
    fs.mkdirs(parent)
    tmp, old = _siblings(spark, p)
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()
    if _rename_overwrite(spark, fs, tmp, p):
        return
    # backup-swap fallback: every crash window leaves a state the
    # atomic readers resolve (dest wins; else complete tmp + backup
    # evidence rolls forward; a lone tmp is an uncommitted first write)
    if fs.exists(p):
        fs.delete(old, False)
        if not fs.rename(p, old):
            raise IOError(f"backup rename {path} -> {old} failed")
    if not fs.rename(tmp, p):
        raise IOError(f"rename {tmp} -> {path} failed")
    fs.delete(old, False)


def _recover_commit(spark: SparkSession, path: str) -> bool:
    """Roll an interrupted backup-swap forward: when ``path`` is absent
    but its complete ``.tmp`` AND ``.old`` backup survive, finish the
    rename. Returns whether ``path`` now exists. A lone ``.tmp``
    (crashed FIRST write — possibly torn, nothing was committed) is
    left alone."""
    fs, p = _fs(spark, path)
    if fs.exists(p):
        return True
    tmp, old = _siblings(spark, p)
    if fs.exists(tmp) and fs.exists(old):
        if not fs.rename(tmp, p):
            raise IOError(f"recovery rename {tmp} -> {path} failed")
        fs.delete(old, False)
        return True
    return False


def status(spark: SparkSession, path: str) -> tuple | None:
    """(length, modification_time) of one file, or None when absent —
    ONE namenode/object-store RPC, the cheap freshness probe for
    driver-side caches of manifest files (a full atomic read chain is
    several round trips plus the payload)."""
    fs, p = _fs(spark, path)
    try:
        st = fs.getFileStatus(p)
    except Exception:
        return None
    return (int(st.getLen()), int(st.getModificationTime()))


def exists_atomic(spark: SparkSession, path: str) -> bool:
    """exists() for files committed by :func:`write_text_atomic`,
    resolving interrupted backup-swap commits first (a liveness bit —
    a store meta, an index manifest — must not read as dead inside the
    fallback's crash window)."""
    return _recover_commit(spark, path)


def read_text_atomic(spark: SparkSession, path: str) -> str:
    """read_text() with interrupted-commit recovery (pair of
    :func:`write_text_atomic`; see :func:`exists_atomic`)."""
    _recover_commit(spark, path)
    return read_text(spark, path)


def list_data_files(spark: SparkSession, path: str) -> list[tuple]:
    """(path, bytes) for every DATA file under ``path``, recursively —
    hidden/metadata entries (``.``/``_`` prefixes: ``_SUCCESS``,
    ``.crc``, in-flight ``.tmp``) skipped at every level, EXCEPT
    ``_``-prefixed names containing ``=``: those are partition
    directories (``_tbucket=3``), exempted exactly as Spark's own
    InMemoryFileIndex exempts them — without the exemption the text
    index's bucket-partitioned postings read as "no files". One
    ``listStatus`` per directory. [] when ``path`` is absent."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    out: list[tuple] = []
    stack = [p]
    while stack:
        d = stack.pop()
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if name.startswith(".") or (
                name.startswith("_") and "=" not in name
            ):
                continue
            if st.isDirectory():
                stack.append(st.getPath())
            else:
                # full URI string (keeps the scheme — s3a://… must
                # round-trip back into read.parquet / delete calls)
                out.append((st.getPath().toString(), int(st.getLen())))
    return sorted(out)


def file_statuses(spark: SparkSession, files: list[str]) -> list[tuple]:
    """(path, length, modification_time) per file, batched one
    ``listStatus`` per parent directory (per-file ``getFileStatus``
    would be one namenode/object-store RPC each — a 10k-file input
    listing is one call per directory instead)."""
    by_parent: dict[str, set[str]] = {}
    for f in files:
        parent, name = posixpath.split(f)
        by_parent.setdefault(parent, set()).add(name)
    out = []
    for parent, names in sorted(by_parent.items()):
        fs, p = _fs(spark, parent)
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name in names:
                out.append(
                    (
                        posixpath.join(parent, name),
                        int(st.getLen()),
                        int(st.getModificationTime()),
                    )
                )
    return sorted(out)

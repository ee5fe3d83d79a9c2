"""One shared JVM-gateway Hadoop FileSystem helper.

Every durable-state feature (crawl checkpoints, incremental job merge,
compaction sizing) needs driver-side filesystem metadata; going through
the Hadoop FileSystem API means the same code handles local paths, HDFS,
and s3a:// — and keeping it in ONE place means a conf quirk or new
scheme is fixed once.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_path(spark: SparkSession, path: str):
    """(Path, FileSystem) pair for `path` under the session's Hadoop conf."""
    p = spark._jvm.org.apache.hadoop.fs.Path(path)
    return p, p.getFileSystem(spark._jsc.hadoopConfiguration())


def exists(spark: SparkSession, path: str) -> bool:
    p, fs = hadoop_path(spark, path)
    return fs.exists(p)


def delete_tree(spark: SparkSession, path: str) -> bool:
    """Recursive delete; False if the path did not exist."""
    p, fs = hadoop_path(spark, path)
    return fs.delete(p, True) if fs.exists(p) else False


def tree_bytes(spark: SparkSession, path: str) -> int:
    p, fs = hadoop_path(spark, path)
    return fs.getContentSummary(p).getLength()


def child_names(spark: SparkSession, path: str) -> list[str]:
    """Names of direct children (empty if the path does not exist)."""
    p, fs = hadoop_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def copy_tree(spark: SparkSession, src: str, dst: str) -> None:
    """Recursive byte copy via Hadoop FileUtil — IO only, no decode /
    shuffle / re-encode.  Used by selective compaction to carry
    untouched partition directories into a new snapshot version; works
    across any scheme the session's Hadoop conf knows (local, HDFS,
    s3a://)."""
    sp, sfs = hadoop_path(spark, src)
    dp, dfs = hadoop_path(spark, dst)
    conf = spark._jsc.hadoopConfiguration()
    ok = spark._jvm.org.apache.hadoop.fs.FileUtil.copy(
        sfs, sp, dfs, dp, False, conf
    )
    if not ok:
        raise IOError(f"copy_tree failed: {src} -> {dst}")

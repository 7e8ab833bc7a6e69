"""The fork-free local filesystem shim (java/forklessfs) and its bench wiring.

Why it exists (r9): without libhadoop.so, Hadoop's RawLocalFileSystem
applies permissions by fork/exec of /bin/chmod (and resolves link status
via /bin/readlink) — measured ~11,500 subprocess forks and ~90 s of
process-tree CPU for ONE stream-stream join's checkpoint traffic. The shim
overrides exactly those entry points with java.nio calls; result equality
is pinned by the oracle gate run with the shim's confs overlaid
(SPARK_GRAFT_CHECK_SPARK_CONF — the conf-fuzz axis).
"""

from __future__ import annotations

import os
import subprocess
import zipfile

import bench

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAR = os.path.join(HERE, "jars", "forkless-localfs.jar")


def test_jar_builds_and_contains_all_bindings():
    # build.sh is idempotent and offline (javac against the distro's
    # hadoop-client-api jar); rebuild to prove source and jar agree
    subprocess.run(
        ["sh", os.path.join(HERE, "java", "build.sh")],
        check=True, capture_output=True, timeout=120,
    )
    with zipfile.ZipFile(JAR) as z:
        names = set(z.namelist())
    for cls in (
        "forklessfs/ForklessRawLocalFileSystem.class",
        "forklessfs/ForklessLocalFileSystem.class",   # fs.file.impl
        "forklessfs/ForklessRawLocalFs.class",
        "forklessfs/ForklessLocalFs.class",           # fs.AbstractFileSystem.file.impl
    ):
        assert cls in names, f"missing {cls}"


def test_bench_wires_both_fs_bindings():
    confs = bench._forkless_fs_confs()
    assert confs["spark.driver.extraClassPath"] == JAR
    # BOTH bindings are required: batch writers resolve file:// through
    # FileSystem, Structured Streaming's checkpoint manager through
    # FileContext/AbstractFileSystem — missing either leaves the forks.
    assert confs["spark.hadoop.fs.file.impl"] == "forklessfs.ForklessLocalFileSystem"
    assert (
        confs["spark.hadoop.fs.AbstractFileSystem.file.impl"]
        == "forklessfs.ForklessLocalFs"
    )

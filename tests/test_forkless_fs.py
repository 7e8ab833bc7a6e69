"""The fork-free local filesystem shim (java/forklessfs) and its wiring.

Why it exists (r9): without libhadoop.so, Hadoop's RawLocalFileSystem
applies permissions by fork/exec of /bin/chmod (and resolves link status
via /bin/readlink) — measured ~11,500 subprocess forks and ~90 s of
process-tree CPU for ONE stream-stream join's checkpoint traffic. The shim
overrides exactly those entry points with java.nio calls; result equality
is pinned by the oracle gate run with the shim's confs overlaid
(SPARK_GRAFT_CHECK_SPARK_CONF — the conf-fuzz axis).

r10: the confs moved from the bench harness into the engine package
(plans/session.py) so the CLI session recipe applies them too; the test
builds into a TEMP dir (never mutating the committed jar) and compares
the fresh build's class list against the committed artifact.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
import zipfile

import bench
from data_profiler_for_aws_glue_data_catalog_spark.plans.session import (
    forkless_fs_confs,
)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAR = os.path.join(HERE, "jars", "forkless-localfs.jar")

REQUIRED_CLASSES = (
    "forklessfs/ForklessRawLocalFileSystem.class",
    "forklessfs/ForklessLocalFileSystem.class",   # fs.file.impl
    "forklessfs/ForklessRawLocalFs.class",
    "forklessfs/ForklessLocalFs.class",           # fs.AbstractFileSystem.file.impl
)


def test_source_builds_and_matches_committed_jar():
    # build into a temp dir (the committed artifact is never touched) and
    # prove source and committed jar agree on the class surface
    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run(
            ["sh", os.path.join(HERE, "java", "build.sh"), tmp],
            check=True, capture_output=True, timeout=120,
        )
        with zipfile.ZipFile(os.path.join(tmp, "forkless-localfs.jar")) as z:
            fresh = {n for n in z.namelist() if n.endswith(".class")}
    with zipfile.ZipFile(JAR) as z:
        committed = {n for n in z.namelist() if n.endswith(".class")}
    for cls in REQUIRED_CLASSES:
        assert cls in fresh, f"missing from fresh build: {cls}"
    assert fresh == committed, (
        f"committed jar out of date vs java/forklessfs sources: "
        f"{sorted(fresh ^ committed)}"
    )


def test_engine_session_recipe_wires_both_fs_bindings():
    confs = forkless_fs_confs()
    assert confs["spark.driver.extraClassPath"] == JAR
    # BOTH bindings are required: batch writers resolve file:// through
    # FileSystem, Structured Streaming's checkpoint manager through
    # FileContext/AbstractFileSystem — missing either leaves the forks.
    assert confs["spark.hadoop.fs.file.impl"] == "forklessfs.ForklessLocalFileSystem"
    assert (
        confs["spark.hadoop.fs.AbstractFileSystem.file.impl"]
        == "forklessfs.ForklessLocalFs"
    )
    # the bench applies the engine recipe, not its own copy
    assert bench._forkless_fs_confs() == confs


def test_forkless_confs_graceful_when_jar_absent():
    assert forkless_fs_confs(jar="/nonexistent/nope.jar", build=False) == {}

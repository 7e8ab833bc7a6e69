#!/bin/sh
# Build forkless-localfs.jar from java/forklessfs/*.java against the
# Spark distribution's hadoop-client-api jar. Pure JDK, no network.
# Optional $1: output directory for the jar (default: ../jars — the
# committed location). Tests pass a temp dir so they never mutate the
# tracked artifact.
set -e
cd "$(dirname "$0")"
OUT_DIR=${1:-../jars}
HADOOP_API=$(ls /opt/spark/jars/hadoop-client-api-*.jar | head -1)
CLASSES_DIR=$(mktemp -d /tmp/forklessfs_classes.XXXXXX)
trap 'rm -rf "$CLASSES_DIR"' EXIT
mkdir -p "$OUT_DIR"
javac -encoding UTF-8 -classpath "$HADOOP_API" -d "$CLASSES_DIR" forklessfs/*.java
jar cf "$OUT_DIR/forkless-localfs.jar" -C "$CLASSES_DIR" .
echo "built $OUT_DIR/forkless-localfs.jar"

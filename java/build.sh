#!/bin/sh
# Build jars/forkless-localfs.jar from java/forklessfs/*.java against the
# Spark distribution's hadoop-client-api jar. Pure JDK, no network.
set -e
cd "$(dirname "$0")"
HADOOP_API=$(ls /opt/spark/jars/hadoop-client-api-*.jar | head -1)
rm -rf /tmp/forklessfs_classes
mkdir -p /tmp/forklessfs_classes ../jars
javac -encoding UTF-8 -classpath "$HADOOP_API" -d /tmp/forklessfs_classes forklessfs/*.java
jar cf ../jars/forkless-localfs.jar -C /tmp/forklessfs_classes .
echo "built ../jars/forkless-localfs.jar"

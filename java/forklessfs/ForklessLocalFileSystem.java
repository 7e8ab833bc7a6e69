package forklessfs;

import org.apache.hadoop.fs.LocalFileSystem;

/**
 * Drop-in replacement for the default {@code fs.file.impl}
 * (org.apache.hadoop.fs.LocalFileSystem): the same checksumming wrapper,
 * over the fork-free raw local filesystem. Wire with
 * {@code spark.hadoop.fs.file.impl=forklessfs.ForklessLocalFileSystem}.
 */
public class ForklessLocalFileSystem extends LocalFileSystem {
  public ForklessLocalFileSystem() {
    super(new ForklessRawLocalFileSystem());
  }
}

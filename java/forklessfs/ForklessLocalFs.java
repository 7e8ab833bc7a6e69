package forklessfs;

import java.io.IOException;
import java.net.URI;
import java.net.URISyntaxException;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.ChecksumFs;

/**
 * Checksummed FileContext binding (mirrors hadoop's LocalFs over RawLocalFs)
 * for the fork-free raw local filesystem. Wire with
 * {@code spark.hadoop.fs.AbstractFileSystem.file.impl=forklessfs.ForklessLocalFs}.
 */
public class ForklessLocalFs extends ChecksumFs {
  public ForklessLocalFs(final URI theUri, final Configuration conf)
      throws IOException, URISyntaxException {
    super(new ForklessRawLocalFs(theUri, conf));
  }
}

package forklessfs;

import java.io.IOException;
import java.net.URI;
import java.net.URISyntaxException;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.DelegateToFileSystem;

/**
 * FileContext-side (AbstractFileSystem) twin of
 * {@link ForklessRawLocalFileSystem} — mirrors hadoop's RawLocalFs.
 * Structured Streaming's checkpoint file manager goes through FileContext,
 * not FileSystem, so both bindings are needed.
 */
public class ForklessRawLocalFs extends DelegateToFileSystem {
  public ForklessRawLocalFs(final URI theUri, final Configuration conf)
      throws IOException, URISyntaxException {
    super(theUri, new ForklessRawLocalFileSystem(), conf, "file", false);
  }
}

package forklessfs;

import java.io.File;
import java.io.FileNotFoundException;
import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.LinkOption;
import java.nio.file.NoSuchFileException;
import java.nio.file.attribute.PosixFileAttributes;
import java.nio.file.attribute.PosixFilePermission;
import java.util.EnumSet;
import java.util.Set;

import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * RawLocalFileSystem whose permission operations never fork a subprocess.
 *
 * Without the native hadoop library (libhadoop.so), stock
 * RawLocalFileSystem applies permissions by shelling out (Shell.execCommand
 * -> fork/exec of /bin/chmod) on EVERY file create and mkdir. A Structured
 * Streaming micro-batch checkpoints state through exactly this path:
 * measured on Spark 4.1.2 / Hadoop 3.4.2 in local mode, one stream-stream
 * interval join query forked ~11,500 subprocesses (~2 forks and ~40 ms per
 * setPermission / mkdirs; ~90 s of process-tree CPU), all charged to the
 * "process reaper" thread and invisible in stage metrics.
 *
 * java.nio.file.Files#setPosixFilePermissions sets the identical permission
 * bits with one futimes-free syscall chain, no subprocess. Semantics note:
 * the sticky bit (01000) cannot be expressed through PosixFilePermission and
 * is dropped here — checkpoint/state/metric files never request it.
 */
public class ForklessRawLocalFileSystem extends RawLocalFileSystem {

  private static final PosixFilePermission[] BITS = {
    PosixFilePermission.OTHERS_EXECUTE,
    PosixFilePermission.OTHERS_WRITE,
    PosixFilePermission.OTHERS_READ,
    PosixFilePermission.GROUP_EXECUTE,
    PosixFilePermission.GROUP_WRITE,
    PosixFilePermission.GROUP_READ,
    PosixFilePermission.OWNER_EXECUTE,
    PosixFilePermission.OWNER_WRITE,
    PosixFilePermission.OWNER_READ,
  };

  private static Set<PosixFilePermission> toNio(short mode) {
    EnumSet<PosixFilePermission> s = EnumSet.noneOf(PosixFilePermission.class);
    for (int i = 0; i < 9; i++) {
      if ((mode & (1 << i)) != 0) {
        s.add(BITS[i]);
      }
    }
    return s;
  }

  @Override
  public void setPermission(Path p, FsPermission permission) throws IOException {
    if (permission == null) {
      return;
    }
    Files.setPosixFilePermissions(pathToFile(p).toPath(), toNio(permission.toShort()));
  }

  @Override
  protected boolean mkOneDirWithMode(Path p, File p2f, FsPermission permission)
      throws IOException {
    if (!p2f.mkdir()) {
      return false;
    }
    if (permission != null) {
      setPermission(p, permission);
    }
    return true;
  }

  private static short toMode(Set<PosixFilePermission> perms) {
    short mode = 0;
    for (int i = 0; i < 9; i++) {
      if (perms.contains(BITS[i])) {
        mode |= (short) (1 << i);
      }
    }
    return mode;
  }

  /**
   * No-follow status via java.nio. Stock RawLocalFileSystem implements this
   * with FileUtil.readLink — a fork/exec of /bin/readlink PER CALL — and
   * FileContext routes every checkpoint rename through it (twice with the
   * checksum wrapper: data file + .crc).
   */
  @Override
  public FileStatus getFileLinkStatus(final Path f) throws IOException {
    File file = pathToFile(f);
    java.nio.file.Path p = file.toPath();
    PosixFileAttributes a;
    try {
      a = Files.readAttributes(p, PosixFileAttributes.class, LinkOption.NOFOLLOW_LINKS);
    } catch (NoSuchFileException e) {
      throw new FileNotFoundException("File " + f + " does not exist");
    }
    Path symlink =
        a.isSymbolicLink() ? new Path(Files.readSymbolicLink(p).toString()) : null;
    return new FileStatus(
        a.size(),
        a.isDirectory(),
        1,
        getDefaultBlockSize(f),
        a.lastModifiedTime().toMillis(),
        a.lastAccessTime().toMillis(),
        new FsPermission(toMode(a.permissions())),
        a.owner().getName(),
        a.group().getName(),
        symlink,
        f.makeQualified(getUri(), getWorkingDirectory()));
  }
}

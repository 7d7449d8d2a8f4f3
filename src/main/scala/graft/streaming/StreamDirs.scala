package graft.streaming

import java.nio.file.{Files, Path, Paths}

/** FileStreamSource monitors a DIRECTORY; the driver testdata tables are
  * single read-only parquet files. This helper exposes such a file
  * through a per-namespace tmp directory holding one symlink — shared by
  * every `readStream` entry point so the filesystem logic lives once.
  * Production sources are directories already and pass through untouched.
  */
object StreamDirs {

  def fileStreamDir(dir: String, fileName: String, namespace: String): Path = {
    val src = Paths.get(dir, fileName)
    if (Files.isDirectory(src)) src
    else {
      // sanitized name + a hash of the ORIGINAL path: sanitization alone
      // is lossy ("/data/sf0.001" and "/data/sf0_001" would collide and
      // silently share one symlink -> a stream reading the wrong table)
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_))
        .mkString
      val d = Paths.get(sys.props("java.io.tmpdir"), namespace,
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + tag)
      Files.createDirectories(d)
      val link = d.resolve(fileName)
      // a stale link (target moved/deleted) reads as non-existent via
      // the following Files.exists — recreate rather than swallow
      if (Files.isSymbolicLink(link) &&
          Files.readSymbolicLink(link) != src.toAbsolutePath)
        Files.delete(link)
      // tolerate a concurrent session creating the same link between the
      // exists-check and the create
      if (!Files.exists(link))
        try Files.createSymbolicLink(link, src.toAbsolutePath)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
      d
    }
  }
}

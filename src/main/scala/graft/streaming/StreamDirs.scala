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
      val d = Paths.get(sys.props("java.io.tmpdir"), namespace,
        dir.replaceAll("[^A-Za-z0-9]", "_"))
      Files.createDirectories(d)
      val link = d.resolve(fileName)
      // tolerate a concurrent session creating the same link between the
      // exists-check and the create
      if (!Files.exists(link))
        try Files.createSymbolicLink(link, src)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
      d
    }
  }
}

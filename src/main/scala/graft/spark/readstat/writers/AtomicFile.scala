package graft.spark.readstat.writers

import java.io.File
import java.nio.file.{AtomicMoveNotSupportedException, Files, StandardCopyOption}

/** Write-then-rename-into-place for every final stat-file output.
  *
  * The streaming ingest source (and any external watcher) must never
  * observe a half-written file at its final name — XPT in particular
  * reads a truncated prefix silently. All writers therefore emit to a
  * same-directory `.<name>.<rand>.inprogress` temp file and atomically
  * rename over the target (same-filesystem rename(2)); the dot-prefixed
  * temp name is invisible to the directory expansion, which matches on
  * stat-file extensions.
  */
/** Shared prep for multiFile directory writes: overwrite clears every
  * existing part of the extension; append keeps them and returns a
  * run-unique part prefix so new parts never collide with old ones. */
private[writers] object MultiFileParts {
  def prepare(dir: java.io.File, ext: String,
      options: Map[String, String]): String = {
    val overwrite = options.getOrElse("__overwrite", "true").toBoolean
    if (dir.exists() && dir.isFile) dir.delete()
    java.nio.file.Files.createDirectories(dir.toPath)
    if (overwrite) {
      Option(dir.listFiles()).foreach(_.foreach { f =>
        if (f.getName.matches(s"part-.*\\.$ext")) f.delete()
      })
      "part-"
    } else s"part-${java.util.UUID.randomUUID.toString.take(8)}-"
  }
}

private[writers] object AtomicFile {
  def write(path: String)(body: String => Unit): Unit = {
    val target = new File(path).getAbsoluteFile
    val dir = target.getParentFile
    if (dir != null) Files.createDirectories(dir.toPath)
    val tmp = File.createTempFile(s".${target.getName}.", ".inprogress", dir)
    try {
      body(tmp.getAbsolutePath)
      try Files.move(tmp.toPath, target.toPath,
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      catch {
        case _: AtomicMoveNotSupportedException =>
          Files.move(tmp.toPath, target.toPath,
            StandardCopyOption.REPLACE_EXISTING)
      }
    } finally if (tmp.exists()) tmp.delete()
  }
}

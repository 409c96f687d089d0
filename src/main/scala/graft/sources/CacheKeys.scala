package graft.sources

import java.io.File
import java.security.MessageDigest

/** Stable tmpdir locations for write-once caches (margin cache,
  * time-partitioned events, sky layouts, IVF indexes), keyed by a
  * content fingerprint of the SOURCE data.
  *
  * The previous scheme keyed on `abs(dir.hashCode)` and only checked
  * `_SUCCESS`: a regenerated source dir (or a hashCode collision
  * between dirs) silently reused stale cache contents, feeding wrong
  * rows into oracle-checked queries. Keying the path on a per-file
  * (path, size, mtime) digest makes any source change produce a fresh
  * cache path instead — stale reuse becomes structurally impossible,
  * and the write-once/read-many economics are unchanged for an
  * unchanged source.
  */
object CacheKeys {

  private def walk(f: File): Seq[File] =
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[File])
        .sortBy(_.getName).toSeq.flatMap(walk)
    else Seq(f)

  /** Cache dir `<tmpdir>/<tag>_<digest>` where the digest covers the
    * canonical source path plus every file's (relative path, size,
    * mtime) — cheap (metadata only), no data read. */
  def path(tag: String, srcPath: String): String = {
    val src = new File(srcPath)
    val base = src.getCanonicalPath
    val sig = (base +: walk(src).map(f =>
      s"${f.getCanonicalPath.stripPrefix(base)}|${f.length}|${f.lastModified}"))
      .mkString("\n")
    val md = MessageDigest.getInstance("MD5").digest(sig.getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(16)
    s"${sys.props("java.io.tmpdir")}/${tag}_$hex"
  }

  /** True when the cache at `path` finished writing (Spark's _SUCCESS
    * marker — a partial/killed write never has one). */
  def isComplete(path: String): Boolean =
    new File(s"$path/_SUCCESS").exists()
}

package graft.io

/** Single definition of "has this file tree changed": the (relative
  * path, size, mtime) listing of every regular file under a root,
  * folded through SHA-256, 16 hex chars. Both consumers — the bench's
  * testdata drift gate (`graft.Bench.dataFingerprint`) and the
  * persisted-index data stamp (`LlmPipeline.corpusStamp`) — derive from
  * this one walk, so a future change to what counts as "the data
  * changed" (e.g. ignoring mtime-only touches) cannot make the drift
  * gate and index orphaning disagree.
  */
object Fingerprint {

  def ofTree(path: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val root = new java.io.File(path)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    walk(root).sortBy(_.getPath).foreach { f =>
      md.update((f.getPath.stripPrefix(root.getPath) +
        s":${f.length}:${f.lastModified}\n").getBytes("UTF-8"))
    }
    md.digest().take(8).map("%02x".format(_)).mkString
  }
}

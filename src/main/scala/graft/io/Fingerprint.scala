package graft.io

import org.apache.hadoop.fs.{FileStatus, Path}

/** Single definition of "has this file tree changed": the (relative
  * path, size, mtime) listing of every regular file under a root,
  * folded through SHA-256, 16 hex chars. Both consumers — the bench's
  * testdata drift gate (`graft.Bench.dataFingerprint`) and the
  * persisted-index data stamp (`LlmPipeline.corpusStamp`) — derive from
  * this one walk, so a future change to what counts as "the data
  * changed" (e.g. ignoring mtime-only touches) cannot make the drift
  * gate and index orphaning disagree.
  *
  * The walk resolves through the Hadoop FileSystem API from the path's
  * own URI scheme (the [[IndexMeta]] convention), so a corpus on
  * `hdfs://` or `s3a://` fingerprints its real listing instead of an
  * empty local-disk miss. Local paths hash BYTE-IDENTICALLY to the
  * original `java.io.File` walk (FingerprintSpec pins both the format
  * and the cross-scheme equality), so pinned PERF_BASELINE.json stamps
  * survive this port. One deliberate asymmetry: checksum schemes hide
  * their `.crc` sidecars from listings — none of the fingerprinted
  * trees contain any (Spark-written parquet sidecars live on the same
  * scheme and are hidden the same way), and hashing bookkeeping files
  * the scheme itself refuses to list would make the same tree
  * fingerprint differently through `file://` and `graftfs://`.
  *
  * Bench's `--fingerprint-only` mode runs before any SparkSession
  * exists, so the FileSystem conf falls back from the active session's
  * to a vanilla Hadoop Configuration (identical for `file://`).
  */
object Fingerprint {

  private def hadoopConf =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  def ofTree(path: String): String = {
    val fs = new Path(path).getFileSystem(hadoopConf)
    val root = fs.makeQualified(new Path(path))
    def walk(st: FileStatus): Seq[FileStatus] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).sortBy(_.getPath.getName).toSeq.flatMap(walk)
      else Seq(st)
    // absent root hashes as one zero-length entry — the java.io.File
    // walk's behavior, kept so "missing" and "empty dir" stay distinct
    val files =
      if (!fs.exists(root)) Seq((root.toString, 0L, 0L))
      else walk(fs.getFileStatus(root))
        .map(s => (s.getPath.toString, s.getLen, s.getModificationTime))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    files.sortBy(_._1).foreach { case (p, len, mtime) =>
      md.update((p.stripPrefix(root.toString) +
        s":$len:$mtime\n").getBytes("UTF-8"))
    }
    md.digest().take(8).map("%02x".format(_)).mkString
  }
}

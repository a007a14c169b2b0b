package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Driver-side metadata I/O for persisted-index roots — the POINTER
  * files, manifests, ingest-batch ledgers and version listings that live
  * BESIDE an index's parquet segments. Everything resolves through the
  * Hadoop FileSystem API from the path's own URI scheme, so the same
  * code addresses `file://`, `hdfs://` and `s3a://` roots — the
  * BatchStore convention ([[graft.io.BatchStore]]; reference deployment
  * surface: extract/oireachtas/io_s3.py:74-89, whose corpora live on
  * object storage).
  *
  * The FileSystem is resolved against the ACTIVE SparkSession's
  * hadoopConfiguration: Spark reads/writes the parquet segments beside
  * this metadata through exactly that configuration, so resolving the
  * metadata any other way (in particular `java.io.File`, which binds to
  * the driver's local filesystem regardless of scheme) would split-brain
  * the index — data on the cluster store, pointer on the driver's disk.
  *
  * Atomicity notes, once for every caller:
  *  - [[swapVersionPointer]] is a single small-object overwrite-put
  *    (create-overwrite + close), the same mechanism BatchStore's
  *    promote uses for its production pointer: atomic on object stores
  *    (one PUT) and a one-`close()` window on HDFS/local. Readers
  *    ([[readVersionPointer]]) absorb that window by retrying a blank
  *    read a few times before giving up.
  *  - [[claimDir]] uses create-if-absent (`FileSystem.createNewFile`),
  *    atomic on HDFS/local. S3 offers no create-exclusive primitive, so
  *    on object stores concurrent WRITERS must be excluded upstream
  *    (single-writer maintenance is the documented contract on every
  *    mutating index entry point); the claim then still guards against
  *    accidental double-runs that race within one driver.
  */
object IndexMeta {

  private def conf = SparkSession.active.sparkContext.hadoopConfiguration

  def fs(path: String): FileSystem = new Path(path).getFileSystem(conf)

  def exists(path: String): Boolean = fs(path).exists(new Path(path))

  def readString(path: String): Option[String] = {
    val f = fs(path)
    val p = new Path(path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

  /** Overwrite-put `content` at `path` (create-overwrite + close). */
  def writeString(path: String, content: String): Unit = {
    val out = fs(path).create(new Path(path), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Child names of `dir`, sorted; empty when the dir is absent. */
  def listChildNames(dir: String): Seq[String] = {
    val f = fs(dir)
    val p = new Path(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map(_.getPath.getName).sorted
  }

  /** Atomically claim a fresh directory: parent mkdirs + create-if-absent
    * of a `_CLAIM` marker inside it. Returns false when another writer
    * claimed it first (marker already present). See the S3 caveat above.
    */
  def claimDir(dir: String): Boolean = {
    val f = fs(dir)
    f.mkdirs(new Path(dir))
    try f.createNewFile(new Path(dir, "_CLAIM"))
    catch { case _: java.io.IOException => false }
  }

  /** Read a one-line `vNNNN` version pointer at `root/POINTER`. A blank
    * read (a reader racing an in-flight overwrite-put on HDFS/local) is
    * retried briefly; a pointer that stays blank is corrupt and throws
    * rather than silently serving nothing.
    */
  def readVersionPointer(root: String): Option[Int] = {
    val path = s"${root.stripSuffix("/")}/POINTER"
    var attempt = 0
    while (true) {
      readString(path) match {
        case None => return None
        case Some(s) if s.trim.nonEmpty =>
          return Some(s.trim.stripPrefix("v").toInt)
        case Some(_) if attempt < 5 => attempt += 1; Thread.sleep(20)
        case Some(_) =>
          throw new IllegalStateException(s"corrupt (blank) pointer at $path")
      }
    }
    None // unreachable
  }

  /** Atomically (see object scaladoc) point readers at version `v`. */
  def swapVersionPointer(root: String, v: Int): Unit =
    writeString(s"${root.stripSuffix("/")}/POINTER", f"v$v%04d")
}

package graft

import org.scalatest.matchers.should.Matchers

import graft.io.Fingerprint

/** The round-13 Hadoop-FS port of [[graft.io.Fingerprint]] must hash
  * BYTE-IDENTICALLY to the original `java.io.File` walk on local paths
  * — PERF_BASELINE.json's testdata stamp is pinned against the old
  * format, and a silent format change would vacuously re-arm the drift
  * gate. The oracle below IS that original walk, inlined.
  */
class FingerprintSpec extends SparkSpec with Matchers {

  spark // Fingerprint prefers the active session's hadoop conf
  spark.sparkContext.hadoopConfiguration
    .set("fs.graftfs.impl", classOf[GraftTestFs].getName)

  /** The pre-port implementation, verbatim: the format oracle. */
  private def legacyOfTree(path: String): String = {
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

  test("hashes the real testdata trees byte-identically to the java.io walk") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.001/documents.parquet", // root-is-a-file
        "/root/testdata/sf0.001/does_not_exist"     // absent root
    ).foreach { p =>
      Fingerprint.ofTree(p) shouldBe legacyOfTree(p)
    }
  }

  test("nested trees, empty dirs and mtime changes fingerprint like the java.io walk") {
    val d = java.nio.file.Files.createTempDirectory("graft_fp_").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(d)
    java.nio.file.Files.createDirectories(d.toPath.resolve("a/b"))
    java.nio.file.Files.createDirectories(d.toPath.resolve("empty"))
    java.nio.file.Files.write(d.toPath.resolve("a/b/x.parquet"), "xx".getBytes)
    java.nio.file.Files.write(d.toPath.resolve("a/y"), "y".getBytes)
    val before = Fingerprint.ofTree(d.getPath)
    before shouldBe legacyOfTree(d.getPath)
    // a content-preserving mtime touch IS a change by this definition
    d.toPath.resolve("a/y").toFile.setLastModified(1234567890000L)
    val after = Fingerprint.ofTree(d.getPath)
    after should not be before
    after shouldBe legacyOfTree(d.getPath)
  }

  test("resolves through the path's own scheme: a graftfs:// root hashes its real listing") {
    val d = java.nio.file.Files.createTempDirectory("graft_fp_scheme_").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(d)
    java.nio.file.Files.write(d.toPath.resolve("part-0000.parquet"), "data".getBytes)
    // same tree, same relative entries → same fingerprint through either
    // scheme; a stray java.io.File regression would hash graftfs:// as
    // an absent tree instead
    Fingerprint.ofTree(s"graftfs://${d.getPath}") shouldBe Fingerprint.ofTree(d.getPath)
    Fingerprint.ofTree(s"graftfs://${d.getPath}") should not be
      Fingerprint.ofTree(s"graftfs://${d.getPath}/nonexistent")
  }
}

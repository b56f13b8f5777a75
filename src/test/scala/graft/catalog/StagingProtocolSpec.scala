package graft.sources.catalog

import org.apache.hadoop.fs.Path

/** White-box tests of the commit protocol itself (package-private surface):
  * create-exclusive manifests and the optimistic base-version check. The
  * black-box races live in CatalogSpec; these pin the exact protocol
  * behaviors deterministically by forging the interleavings.
  */
class StagingProtocolSpec extends graft.SparkSpec {
  import GraftStagingCatalog._

  private def freshTable(): (org.apache.hadoop.fs.FileSystem, Path) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_proto_").toString
    val raw = new Path(dir)
    val fs = raw.getFileSystem(spark.sessionState.newHadoopConf())
    (fs, fs.makeQualified(raw))
  }

  test("tryCreateExclusive: first writer wins, second loses without corrupting the file") {
    val (fs, d) = freshTable()
    val p = new Path(d, "v1.json")
    assert(tryCreateExclusive(fs, p, "{\"a\":1}"))
    assert(!tryCreateExclusive(fs, p, "{\"a\":2}"))
    assert(readString(fs, p) === "{\"a\":1}")
  }

  test("append commits merge past a racer; rewrite commits conflict on a stale base") {
    val (fs, d) = freshTable()
    // v1: an explicit manifest with file a
    writeString(fs, new Path(d, "a.parquet"), "x")
    val v1 = writeExplicitManifest(fs, d, Seq("a.parquet"), kind = "commit")
    assert(v1 === 1L)
    // forge a racer: v2 lands underneath (as a concurrent commit would)
    writeString(fs, new Path(d, "b.parquet"), "x")
    assert(tryCreateExclusive(fs, new Path(new Path(d, VersionsDir), "v2.json"),
      s"""{"ts":0,"kind":"commit","files":["a.parquet","b.parquet"]}"""))
    // an APPEND commit on the stale view merges: it re-reads current (v2)
    // and mints v3 containing the racer's file plus its own delta
    writeString(fs, new Path(d, "c.parquet"), "x")
    writeCommitManifest(fs, d, before = Set("a.parquet", "b.parquet"))
    val (v3, mf3) = versionManifests(fs, d).last
    assert(v3 === 3L)
    assert(manifestFiles(fs, mf3).toSet === Set("a.parquet", "b.parquet", "c.parquet"))
    // a REWRITE commit computed against v1 must NOT replace v3's state
    val e = intercept[java.util.ConcurrentModificationException] {
      writeExplicitManifest(fs, d, Seq("rewritten.parquet"),
        kind = "update", expectedBase = Some(1L))
    }
    assert(e.getMessage.contains("conflict"), e.getMessage)
    // the chain is untouched by the aborted rewrite
    assert(versionManifests(fs, d).map(_._1) === Seq(1L, 2L, 3L))
    // the same rewrite re-run against the CURRENT base succeeds
    val v4 = writeExplicitManifest(fs, d, Seq("rewritten.parquet"),
      kind = "update", expectedBase = Some(3L))
    assert(v4 === 4L)
    assert(manifestFiles(fs, versionManifests(fs, d).last._2) === Seq("rewritten.parquet"))
  }

  test("randomized model: interleaved appends and rewrites never lose a committed append") {
    // Conflict-arm of the catalog model test: appends and base-pinned
    // rewrites interleave; a rewrite whose base went stale must abort, and
    // after every step the CURRENT manifest equals the model.
    val (fs, d) = freshTable()
    val rng = new scala.util.Random(77)
    var model = Set.empty[String]
    var n = 0
    def newFile(): String = { n += 1; val f = s"f$n.parquet"; writeString(fs, new Path(d, f), "x"); f }
    (1 to 40).foreach { _ =>
      rng.nextInt(3) match {
        case 0 => // append
          val f = newFile()
          writeCommitManifest(fs, d, before = model ++ dataFiles(fs, d).filterNot(_ == f).toSet)
          model += f
        case 1 => // rewrite against the true current base: succeeds
          val base = versionManifests(fs, d).lastOption.map(_._1).getOrElse(0L)
          val f = newFile()
          writeExplicitManifest(fs, d, Seq(f), kind = "optimize", expectedBase = Some(base))
          model = Set(f)
        case 2 => // rewrite against a stale base: must abort, model unchanged
          val base = versionManifests(fs, d).lastOption.map(_._1).getOrElse(0L)
          if (base >= 1) {
            val f = newFile()
            intercept[java.util.ConcurrentModificationException] {
              writeExplicitManifest(fs, d, Seq(f), kind = "delete",
                expectedBase = Some(base - 1))
            }
          }
      }
      val cur = versionManifests(fs, d).lastOption
        .map { case (_, mf) => manifestFiles(fs, mf).toSet }.getOrElse(Set.empty)
      assert(cur === model, s"current diverged from model after step: $cur vs $model")
    }
  }
}

package graft.catalog

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.catalog.DeletionVectors
import graft.sources.catalog.DeletionVectors.{PosDvs, PosSpec}

/** Unit edges of the distributed position-delete RUN sidecars (r13):
  * binary codec round-trip, cross-sidecar run merging (overlap, adjacency),
  * membership binary search at run boundaries, and the PosDvs handle
  * algebra the planners lean on. Pure driver-side — no SparkSession.
  */
class RunSidecarSpec extends AnyFunSuite {

  private val conf = new org.apache.hadoop.conf.Configuration()

  /** Write one run file in the production binary format. */
  private def writeRuns(dir: java.io.File, rel: String,
      runs: Seq[(Long, Long)]): String = {
    val name = s"run-${java.util.UUID.randomUUID().toString.take(8)}.bin"
    val out = new java.io.DataOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir, name)))
    try {
      out.writeInt(0x47445652); out.writeInt(1); out.writeUTF(rel)
      runs.foreach { case (start, len) => out.writeLong(start); out.writeLong(len) }
    } finally out.close()
    new java.io.File(dir, name).getAbsolutePath
  }

  private def tmpDir(): java.io.File =
    java.nio.file.Files.createTempDirectory("runspec_").toFile

  test("membership: single-run boundaries, gaps, and inline union") {
    val d = tmpDir()
    val bin = writeRuns(d, "f.parquet", Seq((10L, 5L), (100L, 1L)))
    val m = PosSpec(Set(3L), Seq(bin)).resolve(conf)
    assert(!m.contains(9L) && m.contains(10L) && m.contains(14L) && !m.contains(15L))
    assert(m.contains(100L) && !m.contains(99L) && !m.contains(101L))
    assert(m.contains(3L) && !m.contains(4L)) // inline ordinals join the runs
    assert(!m.contains(Long.MaxValue) && !m.contains(0L))
  }

  test("cross-sidecar merge: overlapping and touching runs collapse correctly") {
    val d = tmpDir()
    // two sidecars from two DELETEs: [10,20) and [15,30) overlap; [30,35)
    // touches; [50,60) stands alone
    val b1 = writeRuns(d, "f.parquet", Seq((10L, 10L), (50L, 10L)))
    val b2 = writeRuns(d, "f.parquet", Seq((15L, 15L), (30L, 5L)))
    val m = PosSpec(Set.empty, Seq(b1, b2)).resolve(conf)
    (0L to 70L).foreach { p =>
      val expected = (p >= 10 && p < 35) || (p >= 50 && p < 60)
      assert(m.contains(p) === expected, s"ordinal $p")
    }
  }

  test("empty spec and runs-free spec resolve to empty membership") {
    assert(!PosSpec(Set.empty, Seq.empty).resolve(conf).contains(0L))
    assert(PosSpec(Set(7L), Seq.empty).resolve(conf).contains(7L))
  }

  test("truncated run file is refused loudly, not silently misread") {
    val d = tmpDir()
    val bin = writeRuns(d, "f.parquet", Seq((10L, 5L)))
    val raf = new java.io.RandomAccessFile(bin, "rw")
    try raf.setLength(raf.length() - 4) finally raf.close() // torn mid-run
    val e = intercept[IllegalArgumentException] {
      PosSpec(Set.empty, Seq(bin)).resolve(conf)
    }
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("PosDvs handle algebra: coverage, filtering, per-file state identity") {
    val dv = PosDvs(
      map = Map("a.parquet" -> Set(1L, 2L)),
      runs = Map("a.parquet" -> Seq("/x/r1.bin"), "b.parquet" -> Seq("/x/r2.bin")))
    assert(dv.nonEmpty && dv.coveredFiles === Set("a.parquet", "b.parquet"))
    assert(dv.contains("a.parquet") && dv.contains("b.parquet") && !dv.contains("c"))
    val only = dv.filterFiles(_ == "b.parquet")
    assert(only.map.isEmpty && only.runs.keySet === Set("b.parquet"))
    // stateOf is the change-feed's DV-visibility comparator: identical
    // (inline, runs) pairs compare equal, any drift compares different
    assert(dv.stateOf("a.parquet") === (Set(1L, 2L), Seq("/x/r1.bin")))
    assert(dv.stateOf("missing") === (Set.empty[Long], Seq.empty[String]))
    assert(PosDvs.empty.isEmpty && !PosDvs.empty.contains("a.parquet"))
  }
}

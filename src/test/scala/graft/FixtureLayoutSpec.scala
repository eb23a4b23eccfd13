package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.FixtureGen

/** Round-12 VERDICT directive 4: the 32-file fixture layout is a spec'd
  * CONTRACT, not a comment. Round 12's own incident is the proof of the
  * failure mode: a regeneration in an 8-thread session silently wrote
  * 8-file tables, capping every downstream scan at 8-way parallelism on
  * the 32-core box and inflating the scale artifact's large-SF medians
  * up to 9× on unchanged queries — the measurement apparatus, not the
  * engine, was being measured, and nothing failed. This spec writes a
  * tiny generated SF to a temp dir and asserts every table lands as
  * exactly [[FixtureGen.LayoutFiles]] parquet files, so a future
  * `repartition` change (or its accidental removal) fails HERE, before
  * it silently poisons a scale run. ScaleBench independently records
  * per-table file counts in its artifact header, so an already-stale
  * on-disk fixture dir is self-identifying from the artifact alone. */
class FixtureLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every generated at-scale table is written as exactly LayoutFiles parquet files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout-").toString
    try {
      // sf0.01: every SCALING table carries >= 100 rows (supplier is the
      // smallest at 100), i.e. more distinct leading-key values than
      // LayoutFiles, so range partitioning fills every output slot —
      // INDEPENDENT of session parallelism (post-review: the previous
      // round-robin layout passed at this spec's 4 cores but wrote
      // supplier@sf0.01 as 31 files under the 8-thread generator; range
      // partitioning removes the parallelism dependence the spec could
      // not see). The row-bounded dimensions (region 5, nation 25)
      // CANNOT reach 32 — Spark skips empty partitions at write — so
      // their honest contract is 1..32 files; they are KB-sized and
      // broadcast everywhere, never a scan-parallelism bottleneck.
      FixtureGen.writeAll(spark, 0.01, dir)
      val tiny = Set("region", "nation")
      val bad = FixtureGen.TableNames.flatMap { t =>
        val files = FixtureGen.parquetFileCount(dir, t)
        val ok =
          if (tiny(t)) files >= 1 && files <= FixtureGen.LayoutFiles
          else files == FixtureGen.LayoutFiles
        if (ok) None else Some(s"$t=$files")
      }
      assert(bad.isEmpty,
        s"fixture tables violating the ${FixtureGen.LayoutFiles}-file " +
          s"layout contract: ${bad.mkString(", ")}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("TableNames covers the full star schema and tableFor serves each one") {
    assert(FixtureGen.TableNames.size === 10)
    assert(FixtureGen.TableNames.distinct.size === 10)
    FixtureGen.TableNames.foreach { t =>
      assert(FixtureGen.tableFor(spark, t, 0.001).columns.nonEmpty, t)
    }
    intercept[IllegalArgumentException] {
      FixtureGen.tableFor(spark, "nope", 0.001)
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-19 mechanism guards.
  *
  * (1) The streaming staged-log memo EVICTS superseded entries (r18
  * advisor low): a source regenerated in place within one JVM must not
  * only re-stage under its new part-file signature — the previous
  * staged directory (a full parquet copy of the log) must be deleted
  * eagerly, not leaked until JVM exit. The test regenerates an events
  * table in a temp fixture dir and asserts both halves: a fresh staged
  * dir is returned AND the old one is gone from disk.
  *
  * (2) `dedup_containment` now defaults to the df-ordered probe prefix
  * (r19 promotion). The three forms — flat, length-bucketed, bucketed +
  * df prefix — must stay output-identical on the REAL fixture, pinning
  * in-suite what `DevStress containment` asserts on salted replicas
  * out-of-suite. This is the guard that caught the df positional-bound
  * bug live (a df-chosen prefix probed against hash-order positions
  * prunes true pairs), so it earns a permanent in-suite twin.
  */
class Round19OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("staged-log memo evicts and deletes the superseded staged copy on in-place regeneration") {
    val s2 = spark
    import s2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-restage").toFile
    try {
      val ev = Tables.events(spark, sf)
      ev.write.mode("overwrite").parquet(s"${dir.getPath}/events.parquet")
      val staged1 = graft.cdc.StreamingLatest.stagedEventLog(spark, dir.getPath)
      assert(new java.io.File(staged1).exists(), "first staging must exist")
      // memo hit: same signature → same dir, nothing deleted
      assert(graft.cdc.StreamingLatest.stagedEventLog(spark, dir.getPath) == staged1)
      // regenerate IN PLACE with different content (drops half the rows,
      // so the part-file signature moves)
      ev.filter($"event_id" % 2 === 0)
        .write.mode("overwrite").parquet(s"${dir.getPath}/events.parquet")
      val staged2 = graft.cdc.StreamingLatest.stagedEventLog(spark, dir.getPath)
      assert(staged2 != staged1,
        "a regenerated source must re-stage under its new signature")
      assert(new java.io.File(staged2).exists(), "second staging must exist")
      assert(!new java.io.File(staged1).exists(),
        "the superseded staged copy must be deleted eagerly, not leaked until JVM exit")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("dedup_containment: flat, bucketed and df-prefix forms are output-identical on the fixture") {
    def rows(lb: Boolean, dfp: Boolean): Set[(Long, Long, Double)] =
      graft.llm.TextOps.dedupContainment(spark, sf,
          lengthBucketed = lb, dfOrderedPrefix = dfp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val flat = rows(lb = false, dfp = false)
    assert(rows(lb = true, dfp = false) == flat,
      "length-bucketed form diverged from the flat form")
    assert(rows(lb = true, dfp = true) == flat,
      "df-ordered-prefix form diverged from the flat form")
    assert(rows(lb = false, dfp = true) == flat,
      "df-prefix-without-buckets form diverged from the flat form")
  }
}

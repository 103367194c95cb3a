package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.GraphOps
import graft.rel.{Formats, Modern}

class Round7OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("binaryFile scan: one row per doc, decoy pruned at listing, digests byte-exact") {
    val s = spark
    import s.implicits._
    val out = Formats.binaryFileScan(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    // the .tmp decoy sits in the same directory; pathGlobFilter must
    // drop it before it can become a row
    assert(out.count() == docs.count(), "row count != doc count (decoy leaked or docs lost)")
    // digest + length must equal what Spark computes from the source
    // column directly: proves the staged file bytes ARE the text bytes
    val expected = docs.select($"doc_id",
      length(encode($"text", "UTF-8")).cast("long").as("n_bytes"),
      md5(encode($"text", "UTF-8")).as("content_md5"))
    assert(out.except(expected).isEmpty && expected.except(out).isEmpty,
      "binaryFile read disagrees with source-column digest/length")
    out.unpersist()
  }

  test("json quarantine: corrupt lines routed not dropped; DROPMALFORMED shrinks exactly") {
    val s = spark
    import s.implicits._
    val out = Formats.jsonCorruptQuarantine(spark, sf).cache()
    val nEvents = Tables.events(spark, sf).count()
    val nCorrupt = Tables.events(spark, sf).filter($"event_id" % 17 === 0).count()
    // PERMISSIVE: nothing lost — every line is a row somewhere
    assert(out.agg(sum($"n_rows")).first().getLong(0) == nEvents)
    val corruptRow = out.filter($"bucket" === "_corrupt").collect()
    assert(corruptRow.length == 1 && corruptRow.head.getAs[Long]("n_rows") == nCorrupt)
    assert(corruptRow.head.getAs[Long]("n_parsed") == 0, "corrupt lines must not parse ids")
    // DROPMALFORMED by contrast: silently loses exactly the corrupt lines —
    // the failure mode the quarantine pattern exists to avoid
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, event_type STRING, user_id BIGINT")
    val dropped = spark.read.schema(schema).option("mode", "DROPMALFORMED")
      .json(Formats.stagedCorruptJsonl(spark, sf)).count()
    assert(dropped == nEvents - nCorrupt)
    out.unpersist()
  }

  test("triangle count agrees with a naive set-based recount") {
    val s = spark
    import s.implicits._
    val row = GraphOps.triangleCount(spark, sf).collect().head
    // naive recount at fixture scale: materialize the same >=2-support
    // edge set and count triangles by set intersection
    val po = Tables.lineitem(spark, sf)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
    val edges = po.as("a").join(po.as("b"), $"a.ok" === $"b.ok" && $"a.p" < $"b.p")
      .groupBy($"a.p".as("pa"), $"b.p".as("pb")).agg(count(lit(1)).as("supp"))
      .filter($"supp" >= 2).select($"pa", $"pb")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
    val naive = edges.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => c != a && c != b)
    }.sum / 3L // each triangle counted once per edge
    assert(row.getAs[Long]("n_triangles") == naive,
      s"oriented-wedge count ${row.getAs[Long]("n_triangles")} != naive $naive")
    assert(row.getAs[Long]("n_edges") == edges.length)
    assert(row.getAs[Long]("n_vertices") == adj.size)
  }

  test("sliding windows: every event in exactly 4 windows, starts on the slide grid") {
    val s = spark
    import s.implicits._
    val out = Modern.windowSlidingTime(spark, sf).cache()
    val nEvents = Tables.events(spark, sf).count()
    val total = out.agg(sum($"n_events")).first().getLong(0)
    assert(total == 4 * nEvents, s"expected 4x$nEvents memberships, got $total")
    assert(out.filter($"win_start_us" % 900000000L =!= 0L).count() == 0,
      "window start off the 15-minute slide grid")
    // min/max ids must come from events that actually lie in the window
    val bad = out.join(Tables.events(spark, sf), $"min_event_id" === $"event_id")
      .filter(unix_micros($"ts") < $"win_start_us" ||
        unix_micros($"ts") >= $"win_start_us" + 3600000000L)
      .count()
    assert(bad == 0, s"$bad windows whose min_event_id lies outside the window")
    out.unpersist()
  }
}

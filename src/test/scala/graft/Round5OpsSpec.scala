package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextOps
import graft.rel.{Modern, Relational}

/** Specs for the round-5 operator additions (SURVEY.md §2.2): nested-JSON
  * shred round-trip, deterministic mode, per-document TF-IDF, and seeded
  * fraction sampling. */
class Round5OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("json_nested_shred round-trip equals the relational aggregates") {
    val s = spark
    import s.implicits._
    val viaJson = Modern.jsonNestedShred(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    val direct = Tables.lineitem(spark, sf)
      .filter($"l_orderkey" < 1000)
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 4).as("q"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(viaJson == direct, "JSON shred lost rows or values")
  }

  test("json_nested_shred: array survives serialization ordered by linenumber") {
    val s = spark
    import s.implicits._
    // first_ln must equal the relational min — proves element-level fidelity
    val firstLn = Modern.jsonNestedShred(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val minLn = Tables.lineitem(spark, sf).filter($"l_orderkey" < 1000)
      .groupBy($"l_orderkey").agg(min($"l_linenumber").as("m"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(firstLn == minLn)
  }

  test("agg_mode_freq picks the true per-status maximum count") {
    val s = spark
    import s.implicits._
    val modes = Modern.aggModeFreq(spark, sf).collect()
    assert(modes.nonEmpty)
    val counts = Tables.orders(spark, sf)
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    modes.foreach { r =>
      val (status, pri, n) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(counts((status, pri)) == n)
      val best = counts.collect { case ((s2, _), c) if s2 == status => c }.max
      assert(n == best, s"$status: mode count $n != max $best")
      // tie-break: among priorities at the max count, the alphabetically first
      val tied = counts.collect { case ((s2, p), c) if s2 == status && c == best => p }
      assert(pri == tied.min, s"$status: tie not broken alphabetically")
    }
  }

  test("text_tfidf: 5 terms per doc, rare terms outrank common ones") {
    val rows = TextOps.tfidf(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.nonEmpty && byDoc.values.forall(_.length <= 5))
    byDoc.values.foreach { rs =>
      val scores = rs.map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse, "per-doc rows not sorted by tfidf desc")
      assert(scores.forall(v => v >= 0.0), "idf of df<=N must be non-negative")
    }
  }

  test("text_pii_redact leaves no residual PII and a constant masked tail") {
    val rows = TextOps.piiRedact(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("redacted_tail") == " contact <EMAIL> call <PHONE>")
      assert(r.getAs[Int]("n_residual_email") == 0)
      assert(r.getAs[Int]("n_residual_phone") == 0)
    }
  }

  test("text_decontaminate flags exactly the docs sharing an 8-gram with the bench slice") {
    val s = spark
    import s.implicits._
    val flagged = TextOps.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0)).toSet
    // brute-force recompute on the driver at sf0.001 (500 docs)
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    def grams(toks: Seq[String]) =
      if (toks.length < 8) Set.empty[String]
      else toks.sliding(8).map(_.mkString(" ")).toSet
    val benchGrams = docs.collect { case (id, t) if id % 50 == 0 => grams(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    val expected = docs.collect {
      case (id, t) if id % 50 != 0 && grams(t).exists(benchGrams) => id
    }.toSet
    assert(flagged == expected)
  }

  test("sample_tablesample: content-keyed draw is partitioning-invariant and near the fraction") {
    val s = spark
    import s.implicits._
    val a = Relational.sampleTablesample(spark, sf).collect().toSeq
    // the md5-threshold draw must survive a repartitioning — the exact
    // property df.sample's per-partition RNG lacks (r17 advisor): rerun
    // the same aggregate over a deliberately reshuffled scan
    val reshuffled = Tables.lineitem(spark, sf).repartition(7, $"l_partkey")
    val draw = substring(md5(concat(
      $"l_orderkey".cast("string"), lit(":"),
      $"l_linenumber".cast("string"), lit(":42"))), 1, 3)
    val b = reshuffled.filter(draw < "19a")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_sampled"),
        round(sum($"l_quantity"), 4).as("sum_qty"))
      .orderBy($"l_returnflag").collect().toSeq
    assert(a == b, "content-keyed sample must be identical under repartitioning")
    val total = Tables.lineitem(spark, sf).count().toDouble
    val sampled = a.map(_.getLong(1)).sum.toDouble
    assert(sampled > total * 0.05 && sampled < total * 0.15,
      s"sample fraction ${sampled / total} far from 0.1")
  }

  test("df.sample statistical contract (the TABLESAMPLE API surface the query keyed away from)") {
    val s = spark
    import s.implicits._
    // the engine-native seeded Bernoulli draw: reproducible under the
    // SAME partitioning and near the fraction — kept as the df.sample
    // API property test after sample_tablesample moved to the
    // content-keyed draw (r18)
    val li = Tables.lineitem(spark, sf)
    val a = li.sample(withReplacement = false, fraction = 0.1, seed = 42L).count()
    val b = li.sample(withReplacement = false, fraction = 0.1, seed = 42L).count()
    assert(a == b, "same seed + same partitioning must reproduce")
    val total = li.count().toDouble
    assert(a > total * 0.05 && a < total * 0.15,
      s"df.sample fraction ${a / total} far from 0.1")
  }
}

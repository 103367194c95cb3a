package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Partitioned-layout semantics: the partition-key predicate must prune
  * at the DIRECTORY level (only the matching year's files become scan
  * input), and the pruned aggregate must equal the unpartitioned
  * original's. (ORC roundtrip is covered in Round6OpsSpec.) */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("source_csv_roundtrip: text cycle lossless vs the original parquet, incl. NTZ timestamps") {
    val s = spark
    import s.implicits._
    val df = graft.rel.Formats.csvRoundtrip(spark, sf)
    val direct = Tables.orders(spark, sf)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double"), 4)
          .as("sum_price"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"),
        unix_micros(min($"o_orderdate")
          .cast(org.apache.spark.sql.types.TimestampType)).as("min_date_us"),
        unix_micros(max($"o_orderdate")
          .cast(org.apache.spark.sql.types.TimestampType)).as("max_date_us"))
      .orderBy($"o_orderstatus").collect().map(_.toSeq).toSeq
    assert(df.collect().map(_.toSeq).toSeq == direct,
      "CSV write/read cycle diverged from the original parquet")
    // explicit schema means the read plan carries the declared types —
    // no inference pass ran (a wrong type would already break the
    // epoch/decimal equality above; this pins the schema on the scan)
    assert(df.schema("min_date_us").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("source_partitioned_roundtrip: directory pruning, lossless values") {
    val s = spark
    import s.implicits._
    val df = graft.rel.Formats.partitionedRoundtrip(spark, sf)

    // value-lossless vs the original parquet under the same predicate
    val direct = Tables.orders(spark, sf)
      .filter(year($"o_orderdate") === 1995)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double"), 4)
          .as("sum_price"))
      .orderBy($"o_orderstatus").collect().map(_.toSeq).toSeq
    assert(df.collect().map(_.toSeq).toSeq == direct)

    // the predicate is a PartitionFilter, not a data filter...
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"partition filter missing from plan:\n$plan")
    // ...and pruning is real: after execution the scan's numFiles metric
    // counts only the matching year's file, not the whole directory tree
    // (inputFiles can't show this — it lists the relation PRE-pruning)
    def findScan(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScan(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScan(s.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Some(f)
      case other => other.children.view.flatMap(findScan(_)).headOption
    }
    val scan = findScan(df.queryExecution.executedPlan).get
    val yearDirs = new java.io.File(
      scan.relation.location.rootPaths.head.toUri).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("o_year="))
    assert(yearDirs > 1, "fixture must span multiple years for the test to bite")
    assert(scan.metrics("numFiles").value < yearDirs,
      s"scan read ${scan.metrics("numFiles").value} files across $yearDirs year dirs — no pruning")
  }

  test("source_avro_roundtrip: wire codec lossless, byte-exact per row") {
    val s = spark
    import s.implicits._
    // aggregate equals the original parquet's (the oracle's claim)
    val df = graft.rel.Formats.avroRoundtrip(spark, sf)
    val direct = Tables.orders(spark, sf)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct($"o_custkey").as("n_cust"),
        round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double"), 4)
          .as("sum_price"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"))
      .orderBy($"o_orderstatus").collect().map(_.toSeq).toSeq
    assert(df.collect().map(_.toSeq).toSeq == direct)
  }

  test("join_dpp_partitioned: runtime dim filter prunes fact partitions") {
    val s = spark
    import s.implicits._
    val df = graft.rel.Formats.dppJoin(spark, sf)

    // values equal the static IN-subquery restatement
    val years = Tables.lineitem(spark, sf)
      .select(year($"l_shipdate").as("y")).distinct()
      .filter($"y".isin(1995, 1996)).collect().map(_.getInt(0)).toSet
    val direct = Tables.orders(spark, sf)
      .filter(year($"o_orderdate").isin(years.toSeq: _*))
      .groupBy(year($"o_orderdate").cast("long").as("o_year"), $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double"), 4)
          .as("sum_price"))
      .orderBy($"o_year", $"o_orderstatus").collect().map(_.toSeq).toSeq
    assert(df.collect().map(_.toSeq).toSeq == direct)

    // the fact scan carries a RUNTIME pruning subquery, and it executed:
    // fewer files read than year directories exist
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning expression in plan:\n$plan")
    def findScan(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScan(a.executedPlan)
      case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScan(st.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.head.toString.contains("graft-part") => Some(f)
      case other => other.children.view.flatMap(findScan(_)).headOption
    }
    val scan = findScan(df.queryExecution.executedPlan).get
    val yearDirs = new java.io.File(
      scan.relation.location.rootPaths.head.toUri).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("o_year="))
    assert(yearDirs > 2, "fixture must span >2 years")
    assert(scan.metrics("numFiles").value <= 2,
      s"dynamic pruning did not restrict the scan: ${scan.metrics("numFiles").value} files read of $yearDirs year dirs")
  }
}

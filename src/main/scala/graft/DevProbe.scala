package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: probe SQL-surface support (syntax availability) in the
  * running Spark version — `runMain graft.DevProbe`. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def probe(name: String, sql: String): Unit =
      try println(s"[probe] $name OK: " + spark.sql(sql).collect().take(3).mkString(" "))
      catch { case e: Throwable => println(s"[probe] $name FAIL: " + e.getMessage.linesIterator.next().take(160)) }
    probe("recursive_cte",
      "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t WHERE n < 5) SELECT sum(n) FROM t")
    probe("lateral_subquery",
      "SELECT * FROM (VALUES (1),(2)) v(a), LATERAL (SELECT a+1 AS b)")
    probe("lateral_correlated_limit",
      "SELECT * FROM (VALUES (1),(2)) v(a), LATERAL (SELECT * FROM (VALUES (10),(20)) w(c) WHERE c > a*5 ORDER BY c LIMIT 1)")
    probe("offset", "SELECT * FROM (VALUES (1),(2),(3)) v(a) ORDER BY a LIMIT 1 OFFSET 1")
    probe("qualify", "SELECT a FROM (VALUES (1),(2)) v(a) QUALIFY row_number() OVER (ORDER BY a) = 1")
    probe("bloom_filter_agg",
      "SELECT might_contain((SELECT bloom_filter_agg(xxhash64(a), 10, 100) FROM (VALUES (1),(2)) v(a)), xxhash64(1))")
    probe("pipe_syntax",
      "FROM (VALUES (1, 'a'), (2, 'b')) v(x, s) |> WHERE x > 0 |> AGGREGATE count(*) AS n GROUP BY s |> ORDER BY s")
    // driver-contract smoke: entry() must work from THIS bare session
    // (no nanosAsLong pre-set; Tables.events sets it dynamically)
    try println(s"[probe] entry OK: rows=" + SparkEntry.entry(spark).count())
    catch { case e: Throwable => println(s"[probe] entry FAIL: " + e.getMessage.take(200)) }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
/** Dev utility (round 6): probe approx_top_k / XML surface + vocab sizes
  * before designing oracles — `runMain graft.DevRound6`. */
object DevRound6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def probe(name: String, sql: String): Unit =
      try println(s"[probe] $name OK: " + spark.sql(sql).collect().take(3).mkString(" "))
      catch { case e: Throwable => println(s"[probe] $name FAIL: " + e.getMessage.linesIterator.next().take(200)) }
    probe("approx_top_k",
      "SELECT approx_top_k(x, 2) FROM VALUES ('a'),('a'),('b'),('c') t(x)")
    probe("approx_top_k_two_phase",
      """SELECT approx_top_k_estimate(approx_top_k_combine(st, 100), 2)
         FROM (SELECT g, approx_top_k_accumulate(x, 100) AS st
               FROM VALUES ('a',0),('a',1),('b',0),('c',1) t(x,g) GROUP BY g)""")
    probe("to_xml", "SELECT to_xml(named_struct('a', 1, 'b', 'x'))")
    probe("from_xml",
      "SELECT from_xml('<ROW><a>1</a><b>x</b></ROW>', 'a INT, b STRING')")
    probe("xml_roundtrip_date",
      "SELECT from_xml(to_xml(named_struct('d', DATE'1995-01-02', 'p', CAST(1.5 AS DOUBLE))), 'd DATE, p DOUBLE')")
    try println("[probe] sql_named_params OK: " +
      spark.sql("SELECT :a + 1 AS x", Map("a" -> 41)).collect().mkString(" "))
    catch { case e: Throwable => println("[probe] sql_named_params FAIL: " + e.getMessage.take(160)) }
    try {
      val df = spark.range(3).toDF("n")
      println("[probe] sql_df_template OK: " +
        spark.sql("SELECT sum(n) AS s FROM {src}", Map("src" -> df)).collect().mkString(" "))
    } catch { case e: Throwable => println("[probe] sql_df_template FAIL: " + e.getMessage.take(160)) }
    probe("xpath_funcs",
      "SELECT xpath_string('<r><a>hi</a><b>7</b></r>', '/r/a'), xpath_int('<r><b>7</b></r>', '/r/b'), xpath('<r><x>1</x><x>2</x></r>', '/r/x/text()')")
    probe("exists_in_select",
      "SELECT a, EXISTS(SELECT 1 FROM (VALUES (1)) w(b) WHERE w.b = v.a) AS f FROM (VALUES (1),(2)) v(a)")
    probe("try_agg_funcs",
      "SELECT try_sum(x), try_avg(x), try_add(max(x), 1), try_multiply(max(x), 2) FROM VALUES (1.5),(2.5) t(x)")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      import org.apache.spark.sql.functions._
      val vocab = docs.select(explode(split(col("text"), " ")).as("t"))
        .filter(col("t") =!= "").agg(countDistinct(col("t"))).first().getLong(0)
      println(s"[vocab] $sf docs=${docs.count()} vocab=$vocab")
    }
    spark.stop()
  }
}

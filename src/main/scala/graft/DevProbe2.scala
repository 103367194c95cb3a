package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DevProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }
    val threshold = 0.5
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val sets = graft.Tables.documents(spark, sfDir)
      .select($"doc_id",
        graft.functions.ShingleFunctions.word_shingle_hashes($"text", 3, sorted = true).as("toks"))
      .select($"doc_id", $"toks", size($"toks").as("n"))
    time("sets")(sets.count())
    val prefixLen = ($"n" - ceil($"n" * lit(threshold)) + 1).cast("int")
    val prefixes = sets
      .select($"doc_id", $"n", posexplode(slice($"toks", lit(1), prefixLen)))
      .toDF("doc_id", "n", "pos", "tok")
    time("prefixes")(prefixes.count())
    val a = prefixes.select($"doc_id".as("doc_a"), $"n".as("na"), $"pos".as("pa"), $"tok")
    val b = prefixes.select($"doc_id".as("doc_b"), $"n".as("nb"), $"pos".as("pb"), $"tok")
    val alpha = lit(threshold / (1.0 + threshold)) * ($"na" + $"nb") - lit(1e-9)
    val joined = a.join(b, Seq("tok"))
      .filter($"doc_a" < $"doc_b" &&
        $"na" >= $"nb" * threshold && $"nb" >= $"na" * threshold &&
        (least($"na" - $"pa", $"nb" - $"pb")) >= alpha)
    time("prefix join")(joined.count())
    val cand = joined.select($"doc_a", $"doc_b").dropDuplicates("doc_a", "doc_b")
    time("cand")(cand.count())
    val verified = cand
      .join(sets.select($"doc_id".as("doc_a"), $"toks".as("ta"), $"n".as("na")), "doc_a")
      .join(sets.select($"doc_id".as("doc_b"), $"toks".as("tb"), $"n".as("nb")), "doc_b")
      .select($"doc_a", $"doc_b",
        size(array_intersect($"ta", $"tb")).cast("double").as("inter"), $"na", $"nb")
      .select($"doc_a", $"doc_b", round($"inter" / ($"na" + $"nb" - $"inter"), 4).as("jaccard"))
      .filter($"jaccard" >= threshold)
    time("verified")(verified.count())
    time("full")(graft.llm.TextOps.ngramJaccard(spark, sfDir).count())
    spark.stop()
  }
}

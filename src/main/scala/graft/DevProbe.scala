package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage prober for slow queries. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
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
    val docs = graft.Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    val sh = docs.select($"doc_id", graft.llm.MinHash.shinglesCol($"text").as("sh"))
    time("shingles")(sh.count())
    val ex = sh.select($"doc_id", explode($"sh").as("s"))
    time("explode")(ex.count())
    time("explode2")(ex.count())
    val fp = graft.llm.SimHash.fingerprints(docs)
    time("fingerprints")(fp.count())
    time("fingerprints2")(fp.count())
    time("dedup_simhash")(graft.llm.SimHash.dedupSimhash(spark, sfDir).count())
    // ngram jaccard probes
    val tok = docs.select($"doc_id", size(graft.llm.MinHash.shinglesCol($"text")).as("n"),
      explode(transform(graft.llm.MinHash.shinglesCol($"text"), s => xxhash64(s))).as("tok"))
    time("ngram tokens")(tok.count())
    val a = tok.select($"doc_id".as("doc_a"), $"n".as("na"), $"tok")
    val b = tok.select($"doc_id".as("doc_b"), $"n".as("nb"), $"tok")
    time("ngram join pairs")(a.join(b, Seq("tok")).filter($"doc_a" < $"doc_b").count())
    time("ngram grouped")(a.join(b, Seq("tok")).filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b", $"na", $"nb").agg(count(lit(1))).count())
    spark.stop()
  }
}

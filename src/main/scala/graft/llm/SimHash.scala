package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SimHash near-duplicate detection (Charikar random-hyperplane sketch in
  * its Manku/Jain/Sarma web-dedup form): each document gets a 64-bit
  * fingerprint whose bits are the signs of per-bit vote sums over feature
  * hashes; near-duplicates differ in few bits.
  *
  * Deterministic: features are word 3-shingles hashed with xxhash64 (no
  * RNG anywhere).
  *
  * Scale path: candidate generation splits the 64-bit fingerprint into 4
  * 16-bit chunks — documents within hamming distance 3 must share at
  * least one chunk (pigeonhole), so the pair search is an equi-join on
  * (chunk_idx, chunk_value), never an O(n²) scan. The 64 per-bit vote
  * sums are one hash aggregate with map-side partial combine.
  */
object SimHash {
  val Bits = 64
  val Chunks = 4
  val ChunkBits: Int = Bits / Chunks
  val MaxHamming = 3

  /** doc_id -> 64-bit simhash fingerprint. The ±1 vote sum is computed
    * branch-free as `2*popcount_b - n` (bit b is set iff ones outnumber
    * zeros): 64 unconditional `sum((h>>b)&1)` aggregates + one count,
    * all in a single map-side-combined hash aggregate. */
  def fingerprints(docs: DataFrame): DataFrame = {
    val ex = docs
      .select(col("doc_id"), explode(MinHash.shinglesCol(col("text"))).as("s"))
      .withColumn("h", xxhash64(col("s")))
    val ones = (0 until Bits).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L))).as(s"c$b"))
    val agg = ex.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nsh"), ones: _*)
    val sim = (0 until Bits)
      .map(b => when(col(s"c$b") * 2 > col("nsh"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** `dedup_simhash`: near-dup pairs at hamming distance <= MaxHamming.
    * Declared without a SQL oracle (bit-vote aggregation is not sanely
    * SQL-expressible); SimHashSpec asserts exact-dup recall and agreement
    * with the MinHash pair set. */
  def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fp = fingerprints(Tables.documents(spark, sfDir))
    val chunkCols = (0 until Chunks).map { i =>
      struct(lit(i).as("chunk_idx"),
        shiftright($"simhash", i * ChunkBits).bitwiseAND(lit((1L << ChunkBits) - 1))
          .as("chunk_val"))
    }
    val banded = fp
      .select($"doc_id", $"simhash", explode(array(chunkCols: _*)).as("c"))
      .select($"doc_id", $"simhash", $"c.chunk_idx".as("chunk_idx"), $"c.chunk_val".as("chunk_val"))
    val a = banded.select($"doc_id".as("doc_a"), $"simhash".as("sim_a"), $"chunk_idx", $"chunk_val")
    val b = banded.select($"doc_id".as("doc_b"), $"simhash".as("sim_b"), $"chunk_idx", $"chunk_val")
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b", $"sim_a", $"sim_b")
      .dropDuplicates("doc_a", "doc_b")
      .select($"doc_a", $"doc_b",
        bit_count($"sim_a".bitwiseXOR($"sim_b")).cast("int").as("hamming"))
      .filter($"hamming" <= MaxHamming)
      .orderBy($"doc_a", $"doc_b")
  }
}

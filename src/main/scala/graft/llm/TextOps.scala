package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Text-pipeline operators over `documents` (SURVEY.md §2.2 Group C +
  * the LLM-training-data extension surface).
  *
  * Scale notes: exact dedup is one hash-shuffle on the text key (at
  * 100 TB you'd group on a 128-bit text hash instead of the raw string —
  * `dedup_exact_hash` below does exactly that); tokenize/explode is a
  * flat-map that never materializes per-doc state; all stats are
  * partial+final aggregates.
  */
object TextOps {

  /** `dedup_exact`: canonical doc per distinct text (min doc_id) + dup
    * count. Deterministic version of dropDuplicates("text"). */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .groupBy($"text")
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
      .select($"doc_id", $"n_dups")
      .orderBy($"doc_id")
  }

  /** Scale-path exact dedup: group on a 256-bit content hash rather than
    * shuffling full document bodies (what you'd run at 100 TB). Same
    * result as `dedup_exact` absent sha2 collisions. */
  def dedupExactHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .groupBy(sha2($"text", 256).as("text_hash"))
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
      .select($"doc_id", $"n_dups")
      .orderBy($"doc_id")
  }

  /** `text_tokenize_counts`: whitespace tokenize -> explode -> global
    * top-20 tokens (count desc, token asc). */
  def tokenizeCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token")
      .limit(20)
  }

  /** `text_lang_stats`: per-language doc count, avg chars, avg tokens.
    * Integer sums keep averages exact (no FP merge-order wobble). */
  def langStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"lang", $"n_chars", size(split($"text", " ")).cast(LongType).as("n_tokens"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum($"n_chars").cast(DoubleType) / count(lit(1)), 4).as("avg_chars"),
        round(sum($"n_tokens").cast(DoubleType) / count(lit(1)), 4).as("avg_tokens"))
      .orderBy($"lang")
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** IVF (inverted-file) approximate nearest neighbour — the second scale
  * path for similarity search next to the random-hyperplane LSH in
  * [[EmbedLsh]]:
  *
  *  1. a small set of coarse centroids partitions the vector space;
  *  2. every vector is assigned to its nearest centroid (the "inverted
  *     list" — at cluster scale this is the partitioning column, so
  *     each list is co-located);
  *  3. a probe searches only the `NumProbe` lists whose centroids are
  *     nearest to it, ranking those candidates by exact cosine.
  *
  * Centroid "training" is a deterministic seed pick (the vectors with
  * the `NumCentroids` smallest ids) rather than k-means iterations:
  * the driver environment has no MLlib dependency and the operator
  * contract — bounded candidate scan, exact re-rank, deterministic
  * output — is independent of centroid quality. Swapping in trained
  * centroids changes recall, not the plan shape.
  *
  * All distance math runs through the codegen [[graft.functions.FloatVecDot]]
  * (dist² = |v|² − 2·v·c + |c|²; ranking by −2·v·c + |c|² since |v|² is
  * constant per row). The centroid set rides along as a broadcast —
  * 16 rows — so assignment is a map-side nested loop over 16, never a
  * shuffle.
  */
object IvfAnn {
  val NumCentroids = 16
  val NumProbe = 4

  private def centroids(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

  private def nearestCentroids(emb: DataFrame, cents: DataFrame, n: Int): DataFrame = {
    // per (vector, centroid) relative distance; keep the n nearest via
    // min-of-struct / ranked window (n=1 is a plain min aggregation)
    val rel = (VectorOps.sumSquares(col("cvec")) -
      lit(2.0) * VectorOps.dot(col("embedding"), col("cvec"))).as("rel_dist")
    val scored = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"), rel)
    if (n == 1)
      scored.groupBy(col("vec_id"))
        .agg(min(struct(col("rel_dist"), col("cid"))).as("m"))
        .select(col("vec_id"), col("m.cid").as("cid"))
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("rel_dist"), col("cid"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= n)
        .select(col("vec_id"), col("cid"))
    }
  }

  private def cosine(a: Column, b: Column): Column =
    VectorOps.dot(a, b) / (VectorOps.l2Norm(a) * VectorOps.l2Norm(b))

  /** `sim_ann_ivf`: approximate top-10 neighbours of probe vec_id=0 —
    * candidates are the vectors assigned to the probe's NumProbe nearest
    * centroid lists, ranked by exact cosine. No SQL oracle
    * (probabilistic recall); IvfSpec asserts determinism, precision of
    * the re-rank, and overlap with the exact top-10. */
  def simAnnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val cents = centroids(emb)
    // List assignment is MAP-ONLY: the 16 centroids fold into one
    // broadcast array row and each vector picks its list with a per-row
    // array_min — keeping `embedding` in the row. The old shape
    // (nearestCentroids n=1: 16-way crossJoin fan-out + a corpus-wide
    // groupBy(vec_id) shuffle, embedding dropped) then had to JOIN BACK
    // to the embeddings table for the exact re-rank — a second full
    // corpus scan plus a corpus shuffle, both gone: the candidate scan
    // now reads the corpus exactly once and nothing corpus-sized ever
    // crosses an exchange (the top-10 is a TakeOrdered). array_min over
    // struct(rel_dist, cid) is the same lexicographic min as the old
    // min(struct(rel_dist, cid)) — identical assignment, identical
    // output rows.
    val panel = cents.agg(collect_list(struct($"cid", $"cvec")).as("cs"))
    val assigned = emb.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(panel))
      .select($"vec_id", $"embedding",
        // coalesce(…, -1): the panel is never empty so the fallback never
        // fires, but it makes the derived join key NON-NULLABLE — without
        // it the optimizer infers an isnotnull() filter on the key and
        // inlines the whole lambda a second time into the join operator
        // (the PlanAuditSpec duplicated-HOF class)
        coalesce(array_min(transform($"cs", c => struct(
          (VectorOps.sumSquares(c.getField("cvec")) -
            lit(2.0) * VectorOps.dot($"embedding", c.getField("cvec"))).as("rel_dist"),
          c.getField("cid").as("cid")))).getField("cid"), lit(-1)).as("cid"))
    val probeLists = nearestCentroids(emb.filter($"vec_id" === 0), cents, NumProbe)
      .select($"cid")
    val probeEmb = emb.filter($"vec_id" === 0).select($"embedding".as("probe_emb"))
    assigned
      .join(broadcast(probeLists), "cid")
      .crossJoin(broadcast(probeEmb))
      .select($"vec_id", cosine($"embedding", $"probe_emb").as("cos_raw"))
      .orderBy($"cos_raw".desc, $"vec_id")
      .limit(10)
      .select($"vec_id", round($"cos_raw", 4).as("cos_sim"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{EmbedLsh, MinHash, SimHash, TextOps, VectorOps}
import graft.mm.MultiModal

class ExtensionOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  // ── SimHash ────────────────────────────────────────────────────────
  test("simhash: exact duplicates hash to identical fingerprints") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val copies = docs.filter($"doc_id" < 5).withColumn("doc_id", $"doc_id" + 100000L)
    val fp = SimHash.fingerprints(docs.union(copies))
    val dupFp = fp.filter($"doc_id" >= 100000L)
      .select(($"doc_id" - 100000L).as("doc_id"), $"simhash".as("dup_sim"))
    val joined = fp.join(dupFp, "doc_id")
      .filter($"simhash" =!= $"dup_sim").count()
    assert(joined == 0)
  }

  test("simhash pairs are a subset of the exact ngram-jaccard near-dup pairs") {
    val simPairs = SimHash.dedupSimhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = TextOps.ngramJaccard(spark, sf, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simPairs.subsetOf(exact),
      s"simhash found non-near-dup pairs: ${simPairs.diff(exact)}")
  }

  // ── exact n-gram Jaccard ───────────────────────────────────────────
  test("ngram jaccard: minhash candidates at high estimate are confirmed exactly") {
    val s = spark
    import s.implicits._
    val est = MinHash.fuzzyDedup(spark, sf, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = TextOps.ngramJaccard(spark, sf, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(est.subsetOf(exact))
  }

  // ── embedding LSH ──────────────────────────────────────────────────
  test("embed LSH pairs: 100% precision (every pair truly >= threshold)") {
    val s = spark
    import s.implicits._
    val pairs = EmbedLsh.dedupEmbedCosine(spark, sf).collect()
    assert(pairs.forall(_.getAs[Double]("cos_sim") >= EmbedLsh.CosineThreshold))
    assert(pairs.nonEmpty) // the corpus has pairs above 0.4
  }

  test("embed LSH: exact duplicate vectors always land in the same buckets") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(spark, sf).limit(20)
    val buckets = e.select(col("vec_id"),
      EmbedLsh.bucketsCol(col("embedding")).getItem(0).as("t0"),
      EmbedLsh.bucketsCol(col("embedding")).getItem(5).as("t5"))
    val twice = buckets.union(buckets).groupBy("vec_id")
      .agg(countDistinct(col("t0"), col("t5")).as("n")).filter(col("n") > 1).count()
    assert(twice == 0) // deterministic bucketing
  }

  test("sim_ann_lsh: candidates overlap the exact top-10 and are correctly ranked") {
    val s = spark
    import s.implicits._
    val ann = EmbedLsh.simAnnLsh(spark, sf).collect()
    assert(ann.length <= 10 && ann.nonEmpty)
    val cos = ann.map(_.getAs[Double]("cos_sim")).toSeq
    assert(cos == cos.sorted.reverse)
    val exact = VectorOps.simTopkCosine(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val annIds = ann.map(_.getAs[Long]("vec_id")).toSet
    // pinned recall@10 vs the exact panel: multi-probe LSH measures
    // 10/10 at sf0.001/0.01/0.1 (DevRecall, round 5) — threshold 8
    // leaves head-room for corpus regeneration, and a banding-parameter
    // regression (fewer tables / broken perturbation) fails loudly here
    val recall = annIds.intersect(exact).size
    assert(recall >= 8, s"LSH recall@10 regressed: $recall/10 (recorded 10/10)")
  }

  test("sim_ann_pq: deterministic, correctly ranked, overlaps exact top-10") {
    val s = spark
    import s.implicits._
    val ann1 = graft.llm.PqAnn.simAnnPq(spark, sf).collect()
    val ann2 = graft.llm.PqAnn.simAnnPq(spark, sf).collect()
    assert(ann1.toSeq == ann2.toSeq) // codebook training + ADC deterministic
    assert(ann1.length <= 10 && ann1.nonEmpty)
    val cos = ann1.map(_.getAs[Double]("cos_sim")).toSeq
    assert(cos == cos.sorted.reverse) // exact re-rank order
    // pinned recall@10 vs the exact panel: PQ measures 10/10 at
    // sf0.001/0.01/0.1 (DevRecall, this round) with the 2% shortlist;
    // threshold 8 leaves head-room for corpus regeneration, and a
    // codebook/ADC regression fails loudly here
    val exact = VectorOps.simTopkCosine(spark, sf).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val recall = ann1.map(_.getAs[Long]("vec_id")).toSet.intersect(exact).size
    assert(recall >= 8, s"PQ recall@10 regressed: $recall/10 (recorded 10/10)")
  }

  // ── text analysis ──────────────────────────────────────────────────
  test("lang_id confusion matrix covers every document") {
    val df = TextOps.langId(spark, sf)
    assert(df.agg(sum("n_docs")).collect().head.getLong(0) ==
      Tables.documents(spark, sf).count())
  }

  test("quality score is bounded in (0, 1]") {
    val s = spark
    import s.implicits._
    val bad = TextOps.qualityScore(spark, sf)
      .filter($"quality" <= 0.0 || $"quality" > 1.0).count()
    assert(bad == 0)
  }

  test("regex tokens equal whitespace tokens on this space-separated corpus") {
    val s = spark
    import s.implicits._
    // all-lowercase space-separated text: the two tokenizers must agree
    val diff = TextOps.tokenRegexCounts(spark, sf)
      .filter($"n_ws_tokens" =!= $"n_re_tokens").count()
    assert(diff == 0)
  }

  test("fingerprints: identical docs produce identical fingerprint sketches") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val hashes = transform(MinHash.shinglesCol($"text"), x => xxhash64(x))
    val minima = transform(
      sequence(lit(0), greatest(size(hashes) - TextOps.FingerprintWindow, lit(0))),
      i => array_min(slice(hashes, i + 1, lit(TextOps.FingerprintWindow))))
    val fp = docs.select($"doc_id", array_distinct(minima).as("fps"))
    // self-join identical text -> identical sketch
    val t = docs.select($"doc_id".as("id2"), $"text")
    val joined = docs.join(t, "text").filter($"doc_id" < $"id2").count()
    val fpOut = TextOps.fingerprint(spark, sf)
    assert(fpOut.count() == docs.count())
    assert(fpOut.filter($"n_fingerprints" <= 0).count() == 0)
    assert(joined == 0) // corpus has no exact dups; planted-dup case covered via sketch determinism:
    val again = docs.select($"doc_id", array_distinct(minima).as("fps2"))
    assert(fp.join(again, "doc_id").filter($"fps" =!= $"fps2").count() == 0)
  }

  // ── multimodal ─────────────────────────────────────────────────────
  test("binary payload round-trips: byte_len equals utf-8 length of source text") {
    val s = spark
    import s.implicits._
    val meta = MultiModal.binaryMeta(spark, sf)
    val joined = meta.join(
      Tables.documents(spark, sf).select($"doc_id".as("media_id"), length($"text").as("tl")),
      "media_id")
    assert(joined.filter($"byte_len" =!= $"tl").count() == 0)
  }

  test("image decode: javax.imageio dimensions and pixel sums match an independent recomputation") {
    val s = spark
    import s.implicits._
    val f1 = MultiModal.decodeFeatures(spark, sf).collect()
    val f2 = MultiModal.decodeFeatures(spark, sf).collect()
    assert(f1.toSeq == f2.toSeq) // deterministic across runs
    val texts = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(f1.nonEmpty)
    f1.foreach { r =>
      val seed = texts(r.getAs[Long]("media_id"))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // expected geometry + pixel sum recomputed WITHOUT going through
      // the codec — a decode that returned wrong pixels would diverge
      assert(r.getAs[Int]("img_w") == MultiModal.BmpWidth)
      assert(r.getAs[Int]("img_h") == MultiModal.bmpHeight(seed.length))
      val expectSum = (0 until r.getAs[Int]("img_h")).flatMap(y =>
        (0 until MultiModal.BmpWidth).map { x =>
          val (pr, pg, pb) = MultiModal.pixelChannels(seed, x, y)
          (pr + pg + pb).toLong
        }).sum
      assert(r.getAs[Long]("pixel_sum") == expectSum,
        s"decoded pixel sum diverged for media ${r.getAs[Long]("media_id")}")
      assert(r.getAs[String]("pixel_md5").length == 32)
    }
  }

  test("frame sampling emits every k-th frame index") {
    val s = spark
    import s.implicits._
    val frames = MultiModal.sampleFrames(MultiModal.mediaTable(spark, sf), everyK = 4)
    val bad = frames.filter($"frame_idx" % 4 =!= 0).count()
    assert(bad == 0)
    assert(frames.count() >= Tables.documents(spark, sf).count())
  }
}

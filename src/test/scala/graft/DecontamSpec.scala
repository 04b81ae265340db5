package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-pruned benchmark decontamination
  * (Dedup.contaminatedDocsBloom): answer-equality with the exact
  * operator (the bloom only prunes candidates; the semi-join
  * decides), and the pruning itself — the property that makes it the
  * 100 TB form.
  */
class DecontamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // corpus: contaminated docs quote benchmark sentences; clean docs
  // share no bigram with the benchmark vocabulary
  private def fixture = {
    import spark.implicits._
    val bench = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1001L, "neural networks learn distributed representations from large text corpora"))
    val corpus = Seq(
      // quotes bench 1000 wholesale → well past minOverlap
      (1L, "witness said the quick brown fox jumps over the lazy dog near the shed"),
      // quotes bench 1001 wholesale
      (2L, "today neural networks learn distributed representations from large text corpora easily"),
      // shares exactly one bigram ("brown fox") → below minOverlap
      (3L, "a brown fox pelt hung beside copper kettles and woven reed baskets"),
      // disjoint vocabulary entirely
      (4L, "garlic butter shrimp simmered gently while rosemary potatoes roasted underneath"),
      (5L, "volcanic basalt columns framed the glacier lagoon under pale arctic light"))
    (bench.toDF("doc_id", "text"), corpus.toDF("doc_id", "text"))
  }

  test("bloom variant equals the exact operator (prune-only, join decides)") {
    val (bench, corpus) = fixture
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_hits"))).toSet
    val exact = canon(Dedup.contaminatedDocs(corpus, bench, "doc_id", "text",
      n = 2, minOverlap = 5))
    val bloomed = canon(Dedup.contaminatedDocsBloom(corpus, bench, "doc_id", "text",
      n = 2, minOverlap = 5))
    assert(exact.map(_._1) == Set(1L, 2L), s"fixture must contaminate docs 1,2: $exact")
    assert(bloomed == exact, "bloom pruning must never change the answer")
  }

  test("near-dup decontamination flags planted leakage; stored == storeless") {
    val (bench, corpus) = fixture
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_hits"),
        math.rint(r.getAs[Double]("max_jaccard") * 1e6))).toSet
    val storeless = canon(Dedup.contaminatedDocsNearDup(corpus, bench,
      "doc_id", "text", shingleN = 2, threshold = 0.3))
    // docs 1 and 2 near-duplicate their benchmark sources; 3-5 don't
    assert(storeless.map(_._1) == Set(1L, 2L),
      s"fixture must flag docs 1,2 as near-dup leakage: $storeless")
    // the index-backed form over one store holding both slices
    val store = new graft.sources.ParquetStore(
      spark, TestSpark.tempDir("graft_decontam_store_"))
    Dedup.buildNearDupStore(store, "sigs", corpus.unionByName(bench),
      "doc_id", "text", shingleN = 2)
    val stored = canon(Dedup.contaminatedDocsNearDupStored(store, "sigs",
      col("id") < 1000L, col("id") >= 1000L, threshold = 0.3))
    assert(stored == storeless, "index-backed form must equal storeless")
    // and it never reads any document text source (pure index query)
    val plan = Dedup.contaminatedDocsNearDupStored(store, "sigs",
        col("id") < 1000L, col("id") >= 1000L, threshold = 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan") || !plan.contains("text"),
      "stored form reads only the signature index")
  }

  test("at-ingest decontamination gate equals the storeless sweep") {
    val (bench, corpus) = fixture
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_hits"),
        math.rint(r.getAs[Double]("max_jaccard") * 1e6))).toSet
    // benchmark signatures persisted once (per benchmark release);
    // the batch probes them with freshly computed signatures
    val store = new graft.sources.ParquetStore(
      spark, TestSpark.tempDir("graft_decontam_gate_"))
    Dedup.buildNearDupStore(store, "bench_sigs", bench, "doc_id", "text",
      shingleN = 2)
    val gated = canon(Dedup.contaminatedBatchNearDup(store, "bench_sigs",
      corpus, "doc_id", "text", shingleN = 2, threshold = 0.3))
    val storeless = canon(Dedup.contaminatedDocsNearDup(corpus, bench,
      "doc_id", "text", shingleN = 2, threshold = 0.3))
    assert(gated == storeless && gated.map(_._1) == Set(1L, 2L),
      s"gate must equal the storeless sweep: $gated vs $storeless")
  }

  test("semantic decontamination flags cosine leakage, gated before the shuffle") {
    import spark.implicits._
    // 4-dim handcrafted vectors: corpus 1 ≈ bench 100 (paraphrase —
    // nearly parallel), corpus 2 orthogonal to both bench vectors,
    // corpus 3 ≈ bench 101 but NEGATED (cosine -1, must not flag)
    val bench = Seq(
      (100L, Seq(1.0f, 0.1f, 0.0f, 0.0f)),
      (101L, Seq(0.0f, 0.0f, 1.0f, 0.2f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.9f, 0.12f, 0.05f, 0.0f)),
      (2L, Seq(0.0f, -1.0f, 0.0f, 0.9f)),
      (3L, Seq(0.0f, 0.0f, -1.0f, -0.2f))).toDF("vec_id", "embedding")
    val got = Dedup.contaminatedDocsSemantic(corpus, bench, "vec_id",
        "embedding", dim = 4, threshold = 0.9, bits = 2, bands = 8)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_hits"))).toSet
    assert(got == Set((1L, 1L)),
      s"only the near-parallel corpus vector may flag: $got")
    // scale shape: the benchmark band-key gate broadcasts, and it cuts
    // the corpus stream BEFORE the candidate join
    val plan = Dedup.contaminatedDocsSemantic(corpus, bench, "vec_id",
        "embedding", dim = 4, threshold = 0.9, bits = 2, bands = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"benchmark gate must broadcast:\n$plan")
  }

  test("bloom prunes clean-doc grams map-side (the shuffle-shrink property)") {
    val (bench, corpus) = fixture
    val (_, bloom) = Dedup.benchmarkGramBloom(bench, "text", 2, fpp = 0.01)
    val grams = corpus.filter(col("doc_id").isin(4L, 5L))
      .select(explode(Dedup.ngramSet(col("text"), 2)).as("g"))
      .collect().map(_.getString(0))
    assert(grams.length > 10, "clean docs must contribute a real gram stream")
    val passing = grams.count(bloom.mightContainString)
    // disjoint vocabulary: only bloom false positives may pass. At
    // fpp=0.01 over ~20 grams even 3 passes is < 1e-4 probable.
    assert(passing <= 2,
      s"bloom must prune nearly all clean grams; $passing/${grams.length} passed")
    // and every benchmark gram must pass (blooms have no false negatives)
    val benchGrams = bench.select(explode(Dedup.ngramSet(col("text"), 2)).as("g"))
      .collect().map(_.getString(0))
    assert(benchGrams.forall(bloom.mightContainString),
      "a bloom filter must never reject a member")
  }
}

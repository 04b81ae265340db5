package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components canonicalization over near-dup pair lists
  * (Dedup.clusterCanonical): transitivity across multi-round
  * propagation, component isolation, and pair-order independence.
  */
class ClusterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def cluster(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.clusterCanonical(pairs.toDF("id_a", "id_b"))
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id"))
      .toMap
  }

  test("chain components close transitively (diameter > 1 ⇒ >1 round)") {
    // 1-2-3-4-5 is a chain of diameter 4: min label must travel four
    // hops, exercising the propagation loop past its first round
    val got = cluster(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("separate components keep separate canonicals") {
    val got = cluster(Seq((10L, 11L), (20L, 21L), (21L, 22L)))
    assert(got == Map(10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("pair orientation and duplicates don't change the result") {
    val a = cluster(Seq((2L, 1L), (3L, 2L), (2L, 1L)))
    val b = cluster(Seq((1L, 2L), (2L, 3L)))
    assert(a == b && a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  private def starCluster(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.clusterCanonicalStar(pairs.toDF("id_a", "id_b"))
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id"))
      .toMap
  }

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra.max(rb)) = ra.min(rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("large-star/small-star: long chain converges (min-label's hard case)") {
    // diameter 120 chain — min-label at default maxRounds=20 throws;
    // the star algorithm closes it in O(log^2) alternations
    val chain = (0L until 120L).map(i => (i, i + 1))
    val got = starCluster(chain)
    assert(got == (0L to 120L).map(_ -> 0L).toMap)
    intercept[IllegalStateException] {
      cluster(chain)
    }
  }

  test("large-star/small-star agrees with union-find on random graphs") {
    val rnd = new scala.util.Random(13)
    (1 to 6).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val pairs = (0 until n).map { _ =>
        // skewed id space exercises the hook order
        (rnd.nextInt(25).toLong * 7, rnd.nextInt(25).toLong * 7)
      }.filter(p => p._1 != p._2)
      val got = starCluster(pairs)
      assert(got == unionFind(pairs), s"trial $trial diverged")
      // and matches min-label on these shallow graphs
      assert(got == cluster(pairs), s"trial $trial: star != min-label")
    }
  }

  test("dedup_clusters agrees with driver-side union-find on real pairs") {
    val dir = "/root/testdata/sf0.01"
    val pairs = Dedup.minHashLshPairs(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16, threshold = 0.3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.nonEmpty)
    // driver-side union-find over the same pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra.max(rb)) = ra.min(rb)
    }
    // path-compress to the true minimum per component
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = cluster(pairs.toSeq)
    assert(got == expected)
    assert(got.values.toSet.size < got.size, "fixture should have a real cluster")
  }
}

package graft

import graft.operators.{Ann, Dedup}
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup semantic dedup (Dedup.semanticAssign/semanticKeep) —
  * cluster-bounded cosine pruning per Abbas et al. 2023.
  */
class SemDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def emb(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = a.map(x => x.toDouble * x).sum
    val nb = b.map(x => x.toDouble * x).sum
    dot / math.sqrt(na * nb)
  }

  // two tight duplicate groups on the x- and y-axes + one orthogonal
  // loner; ids 0 and 1 seed the deterministic k-means init so the two
  // clusters land on the two axes
  private val rows: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(1f, 0f, 0f, 0f),
    1L -> Seq(0f, 1f, 0f, 0f),
    2L -> Seq(0.98f, 0.02f, 0f, 0f),
    3L -> Seq(0.9f, 0f, 0.1f, 0f),
    4L -> Seq(0f, 0.97f, 0.03f, 0f),
    5L -> Seq(0f, 0f, 0f, 1f))

  /** Local replay of the keep rule over the operator's own
    * assignment: rank within cell by (dist DESC, id ASC), drop rows
    * with a higher-priority neighbor at cos ≥ threshold.
    */
  private def expectedKept(assigned: Seq[(Long, Seq[Float], Int, Double)],
      threshold: Double): Set[Long] = {
    val byCell = assigned.groupBy(_._3)
    byCell.values.flatMap { cell =>
      val ranked = cell.sortBy { case (id, _, _, d) => (-d, id) }
      ranked.zipWithIndex.collect {
        case ((id, v, _, _), i)
            if !ranked.take(i).exists { case (_, u, _, _) =>
              cos(v, u) >= threshold } => id
      }
    }.toSet
  }

  test("within-cluster duplicates pruned to the farthest-from-centroid representative") {
    val df = emb(rows)
    val cents = Ann.ivfCentroids(df, "vec_id", "embedding", nCells = 2)
    val assigned = Dedup.semanticAssign(df, "vec_id", "embedding", cents)
      .collect().map(r => (r.getAs[Long]("id"), r.getSeq[Float](1),
        r.getAs[Int]("cell"), r.getAs[Double]("dist"))).toSeq
    val kept = Dedup.semanticKeep(
        Dedup.semanticAssign(df, "vec_id", "embedding", cents), 0.95)
      .collect().map(_.getAs[Long]("id")).toSet

    assert(kept == expectedKept(assigned, 0.95))
    // the x-axis trio {0,2,3} is mutually ≥0.95-similar → exactly one
    // survivor, and it must be the one FARTHEST from its centroid
    val trio = assigned.filter(t => Set(0L, 2L, 3L).contains(t._1))
    assert(trio.map(_._3).distinct.size == 1, "trio must share a cluster")
    val survivor = trio.maxBy(t => (t._4, -t._1))._1
    assert(kept.intersect(Set(0L, 2L, 3L)) == Set(survivor))
    // the loner is never near anything → always kept
    assert(kept.contains(5L))
  }

  test("identical vectors tie-break by id: lowest id wins the keep slot") {
    val same = Seq(0.6f, 0.8f, 0f, 0f)
    val df = emb(Seq(7L -> same, 3L -> same, 9L -> same, 1L -> Seq(0f, 0f, 1f, 0f)))
    val cents = Ann.ivfCentroids(df, "vec_id", "embedding", nCells = 2)
    val kept = Dedup.semanticKeep(
        Dedup.semanticAssign(df, "vec_id", "embedding", cents), 0.99)
      .collect().map(_.getAs[Long]("id")).toSet
    // equal dist ⇒ rank order is id ASC ⇒ id 3 outranks 7 and 9
    assert(kept.intersect(Set(3L, 7L, 9L)) == Set(3L))
    assert(kept.contains(1L))
  }

  test("dissimilar same-cluster rows all survive") {
    val df = emb(rows)
    val kept = Dedup.semanticDedup(df, "vec_id", "embedding",
      nClusters = 2, threshold = 0.9999)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(kept == rows.map(_._1).toSet, "threshold above every pair keeps all")
  }

  test("prune joins on the cell key — no cross product in the plan") {
    val df = emb(rows)
    val cents = Ann.ivfCentroids(df, "vec_id", "embedding", nCells = 2)
    val plan = Dedup.semanticKeep(
        Dedup.semanticAssign(df, "vec_id", "embedding", cents), 0.95)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}

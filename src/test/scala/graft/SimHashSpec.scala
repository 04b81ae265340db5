package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** SimHash banded near-dup pairing (Dedup.simHashPairs). */
class SimHashSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("identical docs pair at hamming 0; distinct texts do not pair") {
    val same = "structured streaming writes micro batch output to the sink table"
    val other = "gardening gloves protect hands while pruning thorny rose bushes outdoors"
    val got = Dedup.simHashPairs(
      docs(Seq((1L, same), (2L, same), (3L, other))), "doc_id", "text",
      maxHamming = 3).collect()
    assert(got.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet == Set((1L, 2L)))
    assert(got.head.getAs[Int]("hamming") == 0)
  }

  test("small edit keeps hamming small; pair survives banding") {
    val base = "the distributed query engine optimizes joins aggregations and window functions across many partitions"
    val edit = base.replace("many", "all")
    val got = Dedup.simHashPairs(docs(Seq((1L, base), (2L, edit))), "doc_id", "text",
      maxHamming = 16).collect()
    assert(got.length == 1, "near-identical docs must share at least one 16-bit band")
    assert(got.head.getAs[Int]("hamming") <= 16)
  }

  test("pairs deduplicated across bands") {
    val same = "exact duplicate rows collide in every band but appear once"
    val got = Dedup.simHashPairs(docs(Seq((5L, same), (9L, same))), "doc_id", "text",
      maxHamming = 0).collect()
    assert(got.length == 1)
  }

  test("blockCol: full recall WITHIN blocks at maxHamming=7; no cross-block pairs") {
    import graft.functions.GraftFunctions
    import spark.implicits._
    // two "languages": recall inside each block must equal brute force
    // restricted to same-block pairs, and no pair may span blocks even
    // when the signatures are near-identical across them
    val rows = (0L until 60L).map { i =>
      val words = (0 until 12).map(j => s"w${(i + j * (i % 7 + 1)) % 19}")
      (i, words.mkString(" "), if (i % 2 == 0) "en" else "de")
    }
    val df = rows.toDF("doc_id", "text", "lang")
    val got = Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 7,
        blockCol = Some("lang"))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val sigs = rows.map { case (id, tx, lang) =>
      (id, GraftFunctions.simHashScala(graft.functions.TextAnalyzer.tokenize(tx)), lang)
    }
    val want = (for {
      (ia, sa, la) <- sigs; (ib, sb, lb) <- sigs
      if ia < ib && la == lb
      if java.lang.Long.bitCount(sa ^ sb) <= 7
    } yield (ia, ib)).toSet
    assert(got == want,
      s"blocked pairs must equal same-block brute force; extra=${got.diff(want)} missing=${want.diff(got)}")
    // sanity: the unblocked run finds strictly more (cross-block) pairs
    val unblocked = Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 7)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(want.subsetOf(unblocked))
    assert(unblocked.diff(want).nonEmpty, "fixture must contain cross-block near-dups")
  }

  test("blockCol: separator-adversarial block values never pair cross-block") {
    import spark.implicits._
    // identical text everywhere, so signatures are identical and ANY
    // band-key collision across blocks would surface as a pair; block
    // values share prefixes and embed the '|' separator itself
    val txt = "identical content in every block exercises the key encoding"
    val rows = Seq(
      (1L, txt, "en|0"), (2L, txt, "en|0"),
      (3L, txt, "en"), (4L, txt, "en"),
      (5L, txt, "0"), (6L, txt, "0"),
      (7L, txt, null.asInstanceOf[String]), (8L, txt, null.asInstanceOf[String]))
    val got = Dedup.simHashPairs(rows.toDF("doc_id", "text", "lang"),
        "doc_id", "text", maxHamming = 3, blockCol = Some("lang"))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(got == Set((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)),
      s"only same-block pairs allowed (nulls group together); got $got")
  }

  test("banded recall equals brute force (pigeonhole over maxHamming+1 bands)") {
    import graft.functions.GraftFunctions
    // Varied docs so signatures span a range of Hamming distances.
    val rows = (0L until 40L).map { i =>
      val words = (0 until 12).map(j => s"w${(i + j * (i % 5 + 1)) % 23}")
      (i, words.mkString(" "))
    }
    for (maxHamming <- Seq(3, 8)) {
      val got = Dedup.simHashPairs(docs(rows), "doc_id", "text", maxHamming)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      val sigs = rows.map { case (id, tx) =>
        id -> GraftFunctions.simHashScala(
          graft.functions.TextAnalyzer.tokenize(tx))
      }
      val want = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        if java.lang.Long.bitCount(sa ^ sb) <= maxHamming
      } yield (ia, ib)).toSet
      assert(got == want, s"banded pairs must match brute force at maxHamming=$maxHamming")
    }
  }
}

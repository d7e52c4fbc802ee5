package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Prefix-filtered set-similarity join: the contract is EXACTNESS —
  * the result equals brute-force all-pairs Jaccard at every threshold,
  * including the float-boundary prefix lengths (0.6·5) the epsilon
  * ceiling exists for.
  */
class SetSimJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toks(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text").select(col("doc_id"),
      split(col("text"), " ").as("toks"))

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def brute(rows: Seq[(Long, String)],
                    t: Double): Set[(Long, Long, Long, Double)] = {
    val sets = rows.map { case (id, s) => id -> s.split(" ").toSet }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      j = r6(inter.toDouble / (sa.size + sb.size - inter))
      if j >= t
    } yield (a, b, inter, j)).toSet
  }

  private def engine(rows: Seq[(Long, String)],
                     t: Double): Set[(Long, Long, Long, Double)] =
    SetSimJoin.jaccardPairs(toks(rows), "doc_id", "toks", t)
      .as[(Long, Long, Long, Double)].collect().toSet

  test("exactness vs brute force, including the 0.6 x 5-token boundary") {
    // 5-token docs at t = 0.6: correct prefix length is 3; a naive
    // ceil(0.6*5)=4 would shorten it to 2 and can miss pairs that
    // share only their 3rd-rarest token
    val rows = Seq(
      (1L, "q1 q2 c1 c2 c3"),
      (2L, "q3 q4 c1 c2 c3"),   // ∩ = {c1,c2,c3}, jac = 3/7 < 0.6
      (3L, "q1 q2 c1 c2 zz"),   // vs 1: ∩ = 4, jac = 4/6 ≥ 0.6
      (4L, "q1 q2 c1 c2 c3"))   // clone of 1
    val t = 0.6
    assert(engine(rows, t) == brute(rows, t))
    assert(engine(rows, t).exists(p => p._1 == 1L && p._2 == 4L))
  }

  test("exactness on a seeded random corpus across thresholds") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 30).map(i => s"w$i")
    val rows = (0L until 60L).map { id =>
      val n = 3 + rnd.nextInt(8)
      id -> rnd.shuffle(vocab).take(n).mkString(" ")
    }
    for (t <- Seq(0.4, 0.5, 0.6, 0.75, 0.9, 1.0)) {
      assert(engine(rows, t) == brute(rows, t), s"threshold $t")
    }
  }

  test("threshold 1.0 finds exactly the equal-set pairs, order-insensitive") {
    val rows = Seq((1L, "a b c"), (2L, "c a b"), (3L, "a b"), (4L, "a b"))
    val got = engine(rows, 1.0)
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L), (3L, 4L)))
  }

  private def bruteContainment(rows: Seq[(Long, String)],
                               t: Double): Set[(Long, Long, Long, Double)] = {
    val sets = rows.map { case (id, s) => id -> s.split(" ").toSet }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      inter = (sa & sb).size.toLong
      c = r6(inter.toDouble / sa.size)
      if c >= t
    } yield (a, b, inter, c)).toSet
  }

  private def engineContainment(rows: Seq[(Long, String)],
                                t: Double): Set[(Long, Long, Long, Double)] =
    SetSimJoin.containmentPairs(toks(rows), "doc_id", "toks", t)
      .as[(Long, Long, Long, Double)].collect().toSet

  test("containment: exactness vs brute force across thresholds, directed") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    val rows = (0L until 50L).map { id =>
      val n = 2 + rnd.nextInt(10)
      id -> rnd.shuffle(vocab).take(n).mkString(" ")
    }
    for (t <- Seq(0.5, 0.6, 0.75, 0.9, 1.0)) {
      assert(engineContainment(rows, t) == bruteContainment(rows, t),
        s"threshold $t")
    }
  }

  test("containment: a small quote inside a large page (the Jaccard blind spot)") {
    val page = (0 until 200).map(i => s"p$i").mkString(" ")
    val quote = (10 until 30).map(i => s"p$i").mkString(" ")
    val rows = Seq((1L, page), (2L, quote), (3L, "x1 x2 x3"))
    val got = engineContainment(rows, 1.0)
    // quote ⊆ page: containment(2→1) = 1.0; the reverse is 0.1
    assert(got.map(p => (p._1, p._2)) == Set((2L, 1L)))
    // and Jaccard at any sane threshold misses it
    assert(engine(rows, 0.5).isEmpty)
  }

  test("containment: subset at t=1.0 needs only the rarest prefix token") {
    val rows = Seq((1L, "a b c d e f"), (2L, "a b c"), (3L, "b c zz"))
    val got = engineContainment(rows, 1.0).map(p => (p._1, p._2))
    assert(got == Set((2L, 1L)))
  }

  test("containment guard trips on a high-df prefix token, lazily") {
    val rows = (0L until 20L).map(id => id -> s"common x$id")
    val df = SetSimJoin.containmentPairs(toks(rows), "doc_id", "toks",
      threshold = 0.3, maxBucket = 5)
    val ex = intercept[Exception] { df.collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("maxBucket")), msgs(ex).mkString("|"))
  }

  test("incremental: batch pairs == rebuild restricted to batch members") {
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 35).map(i => s"w$i")
    def mk(ids: Range) = ids.map { id =>
      val n = 3 + rnd.nextInt(8)
      id.toLong -> rnd.shuffle(vocab).take(n).mkString(" ")
    }
    val stored = mk(0 until 40)
    val batch = mk(100 until 130)
    val all = stored ++ batch
    val path = java.nio.file.Files.createTempDirectory("setsim_inc").toString
    SetSimJoin.saveSets(toks(stored), "doc_id", "toks", path)
    for (t <- Seq(0.5, 0.75, 1.0)) {
      val inc = SetSimJoin.incrementalJaccardPairs(spark, path,
          toks(batch), "doc_id", "toks", t)
        .as[(Long, Long, Long, Double)].collect().toSet
      val batchIds = batch.map(_._1).toSet
      val expected = brute(all, t)
        .filter(p => batchIds.contains(p._1) || batchIds.contains(p._2))
      assert(inc == expected, s"threshold $t")
      // incremental ∪ prior == rebuild over the union
      assert(inc ++ brute(stored, t) == brute(all, t), s"threshold $t union")
    }
  }

  test("incremental: append grows the stored state; collisions rejected") {
    val rows1 = Seq((1L, "a b c"), (2L, "d e f"))
    val rows2 = Seq((3L, "a b c"), (4L, "g h i"))
    val path = java.nio.file.Files.createTempDirectory("setsim_app").toString
    SetSimJoin.saveSets(toks(rows1), "doc_id", "toks", path)
    SetSimJoin.appendSets(spark, path, toks(rows2), "doc_id", "toks")
    // a later batch pairs against BOTH stored generations
    val inc = SetSimJoin.incrementalJaccardPairs(spark, path,
        toks(Seq((9L, "a b c"))), "doc_id", "toks", 1.0)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(inc.map(p => (p._1, p._2)) == Set((1L, 9L), (3L, 9L)))
    intercept[IllegalArgumentException] {
      SetSimJoin.appendSets(spark, path, toks(Seq((3L, "zz"))),
        "doc_id", "toks")
    }
    // foreign stamps are rejected loudly
    val bad = java.nio.file.Files.createTempDirectory("setsim_bad").toString
    toks(rows1).withColumn("setsim_format", lit("other-v9"))
      .write.mode("overwrite").parquet(bad)
    val ex = intercept[IllegalArgumentException] {
      SetSimJoin.loadSets(spark, bad)
    }
    assert(ex.getMessage.contains("rebuild"))
  }

  test("prefix-bucket skew guard trips loudly at execution, lazily at call") {
    val rows = (0L until 20L).map(id => id -> s"common x$id")
    // construction is lazy — no job runs, no error yet
    val df = SetSimJoin.jaccardPairs(toks(rows), "doc_id", "toks",
      threshold = 0.3, maxBucket = 5)
    val ex = intercept[Exception] { df.collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("maxBucket")), msgs(ex).mkString("|"))
  }

  test("incremental containment: batch pairs == rebuild restricted; " +
       "union with prior == rebuild") {
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 35).map(i => s"w$i")
    def mk(ids: Range) = ids.map { id =>
      val n = 2 + rnd.nextInt(9)
      id.toLong -> rnd.shuffle(vocab).take(n).mkString(" ")
    }
    val stored = mk(0 until 40)
    // batch includes genuine containment shapes: subsets of stored docs
    val batch = mk(100 until 120) ++ stored.take(5).map { case (id, s) =>
      (id + 500L) -> s.split(" ").take(math.max(1, s.split(" ").length / 2))
        .mkString(" ")
    }
    val all = stored ++ batch
    val path =
      java.nio.file.Files.createTempDirectory("setsim_incc").toString
    SetSimJoin.saveSets(toks(stored), "doc_id", "toks", path)
    for (t <- Seq(0.5, 0.75, 0.9, 1.0)) {
      val inc = SetSimJoin.incrementalContainmentPairs(spark, path,
          toks(batch), "doc_id", "toks", t)
        .as[(Long, Long, Long, Double)].collect().toSet
      val batchIds = batch.map(_._1).toSet
      val expected = bruteContainment(all, t)
        .filter(p => batchIds.contains(p._1) || batchIds.contains(p._2))
      assert(inc == expected, s"threshold $t")
      // incremental ∪ prior == rebuild over the union (directed)
      assert(inc ++ bruteContainment(stored, t) == bruteContainment(all, t),
        s"threshold $t union")
    }
  }

  test("incremental joins reject batch-stored id collisions eagerly — " +
       "even when the colliding docs are identical (empty pair output)") {
    val path =
      java.nio.file.Files.createTempDirectory("setsim_coll").toString
    SetSimJoin.saveSets(toks(Seq((1L, "a b c"), (2L, "d e f"))),
      "doc_id", "toks", path)
    // the dangerous case: same id, same content — pair output would be
    // EMPTY (a=b pairs are filtered), so an output-riding lazy guard
    // would never fire; the eager check must
    val dup = toks(Seq((1L, "a b c")))
    val e1 = intercept[IllegalArgumentException] {
      SetSimJoin.incrementalJaccardPairs(spark, path, dup,
        "doc_id", "toks", 0.8)
    }
    assert(e1.getMessage.contains("collide"))
    val e2 = intercept[IllegalArgumentException] {
      SetSimJoin.incrementalContainmentPairs(spark, path, dup,
        "doc_id", "toks", 0.8)
    }
    assert(e2.getMessage.contains("collide"))
  }
}

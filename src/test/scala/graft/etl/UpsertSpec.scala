package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestSession

class UpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("updates win over base; unmatched rows from both sides survive") {
    val base = Seq(("v1", 1), ("v2", 2), ("v3", 3)).toDF("vin", "x")
    val updates = Seq(("v2", 20), ("v4", 40)).toDF("vin", "x")
    val got = Upsert.upsertByVin(base, updates)
      .orderBy("vin").as[(String, Int)].collect().toSeq
    assert(got == Seq(("v1", 1), ("v2", 20), ("v3", 3), ("v4", 40)))
  }

  test("duplicate keys inside updates: exactly one survivor per key") {
    val base = Seq(("v1", 1)).toDF("vin", "x")
    val updates = Seq(("v1", 10), ("v1", 11)).toDF("vin", "x")
    val got = Upsert.upsertByVin(base, updates).collect()
    assert(got.length == 1 && got(0).getString(0) == "v1")
    assert(Set(10, 11).contains(got(0).getInt(1)))
  }

  test("schema mismatch rejected") {
    val base = Seq(("v1", 1)).toDF("vin", "x")
    val bad = Seq(("v1", 1)).toDF("vin", "y")
    assertThrows[IllegalArgumentException](Upsert.upsertByVin(base, bad))
  }

  // SURVEY.md §5.2 property: merge(merge(t,d),d) == merge(t,d).
  // Plain ScalaCheck generators with pinned seeds (the scalatest bridge
  // artifact is not on the offline classpath).
  test("property: upsert is idempotent over random key/value frames") {
    val gen = Gen.listOfN(12,
      Gen.zip(Gen.oneOf("a", "b", "c", "d", "e"), Gen.choose(0, 100)))
    (1L to 8L).foreach { seedNo =>
      val s = Seed(seedNo)
      val b = gen.pureApply(Gen.Parameters.default, s)
      val u = gen.pureApply(Gen.Parameters.default, s.next)
      val base = b.distinctBy(_._1).toDF("vin", "x")
      val ups = u.distinctBy(_._1).toDF("vin", "x")
      val once = Upsert.upsertByVin(base, ups)
      val twice = Upsert.upsertByVin(once, ups)
      val a = once.orderBy("vin", "x").as[(String, Int)].collect().toSeq
      val c = twice.orderBy("vin", "x").as[(String, Int)].collect().toSeq
      assert(a == c, s"idempotence broken for seed $seedNo")
      // updates dominate: every update key carries the update value
      val aMap = a.toMap
      u.distinctBy(_._1).foreach { case (k, v) =>
        assert(aMap(k) == v, s"update for key $k lost (seed $seedNo)")
      }
    }
  }
}

package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class JsonlSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dir = "/root/repo/src/test/resources/fixtures"
  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  test("PERMISSIVE: malformed lines survive with the raw line quarantined") {
    val df = JsonlSource.read(spark, s"$dir/docs_corrupt.jsonl", schema,
      corruptCol = "bad")
    val rows = df.orderBy(asc("doc_id")).collect()
    assert(rows.length == 5)
    val bad = df.filter(col("bad").isNotNull).collect()
    // truncated JSON + non-JSON are quarantined whole; the wrong-typed
    // doc_id row keeps its good fields and quarantines the line too
    assert(bad.length == 3)
    assert(bad.exists(_.getAs[String]("bad") == "not json at all"))
    val good = df.filter(col("bad").isNull)
      .select("doc_id").as[Long](spark.implicits.newLongEncoder).collect()
    assert(good.sorted.toSeq == Seq(1L, 5L))
  }

  test("DROPMALFORMED: only fully-clean rows remain") {
    val df = JsonlSource.read(spark, s"$dir/docs_corrupt.jsonl", schema,
      mode = "DROPMALFORMED")
    val ids = df.select("doc_id")
      .as[Long](spark.implicits.newLongEncoder).collect().sorted.toSeq
    assert(ids == Seq(1L, 5L),
      "truncated, non-JSON, and wrong-typed rows all drop")
  }

  test("imposed schema decodes edge rows: escapes, unicode, 2^53+1 id") {
    val full = StructType(schema.fields :+ StructField("score", DoubleType))
    val df = JsonlSource.read(spark, s"$dir/docs_corpus.jsonl", full)
    assert(df.count() == 60)
    val esc = df.filter(col("doc_id") === 8).select("text").head().getString(0)
    assert(esc == "quote \" backslash \\ and\nnewline inside")
    val uni = df.filter(col("doc_id") === 12).select("text").head().getString(0)
    assert(uni.contains("東京") && uni.contains("🚀") && uni.contains("ĐÔNG"))
    val big = df.filter(col("doc_id") > 9000000000000000L)
      .select("doc_id").head().getLong(0)
    assert(big == 9007199254740993L, "BIGINT survives past double precision")
  }

  test("scan parallelizes: JSONL stays splittable (no single-task read)") {
    val df = JsonlSource.read(spark, s"$dir/docs_corpus.jsonl", schema)
    // newline framing means maxPartitionBytes can split the file; with a
    // tiny fixture Spark plans >= 1 partition — assert the plan is a
    // plain FileScan (no WholeTextFile-style collapse)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan json"), s"expected json FileScan in:\n$plan")
  }
}

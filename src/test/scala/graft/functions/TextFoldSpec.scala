package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.plans.GraftFunctions

class TextFoldSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fold(values: String*) = {
    GraftFunctions.register(spark)
    values.toDF("s")
      .select(FoldText.fold_text($"s").as("f"))
      .as[String].collect().toSeq
  }

  test("folds case and diacritics") {
    assert(fold("Café", "NAÏVE", "Zürich", "ÉLÈVE") ==
      Seq("cafe", "naive", "zurich", "eleve"))
  }

  test("combining sequences fold like precomposed") {
    // e + U+0301 (combining acute) vs precomposed é
    assert(fold("e\u0301clair", "\u00e9clair") == Seq("eclair", "eclair"))
  }

  test("non-mark letters are preserved, not stripped") {
    // ß is not a combining mark; đ/Đ are letters with built-in stroke
    assert(fold("straße", "ĐÔNG") == Seq("straße", "đong"))
  }

  test("dotted capital I lowers then strips the combining dot") {
    assert(fold("İstanbul") == Seq("istanbul"))
  }

  test("pure lowercase ASCII is the identity fast path") {
    assert(fold("plain ascii text 123", "") == Seq("plain ascii text 123", ""))
  }

  test("registered in SQL; null propagates") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT fold_text('ÉTÉ')").as[String].head() == "ete")
    assert(spark.sql("SELECT fold_text(CAST(NULL AS STRING)) IS NULL")
      .as[Boolean].head())
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    GraftFunctions.register(spark)
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", FoldText.fold_text(upper($"text")).as("f"))
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty,
      s"expected a codegen stage in:\n${df.queryExecution.executedPlan}")
    // uppercased corpus text folds back to the original lowercase
    val rows = df.filter($"doc_id" < 5).orderBy("doc_id").collect()
    val orig = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 5).orderBy("doc_id").collect()
    assert(rows.map(_.getString(1)).toSeq == orig.map(_.getString(1)).toSeq)
  }
}

package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Versioned persistence for TRAINED tokenizer artifacts — BPE merge
  * lists, unigram-LM vocabularies, WordPiece vocabularies. A production
  * pipeline trains a tokenizer once and ships the artifact to every
  * later job; a stale, foreign, or wrong-kind table read back silently
  * would change the tokenization of the entire corpus — the exact
  * failure mode the `sig_family` (minhash) and `sketch_format`
  * (sketches) and `index_format` (IVF-PQ) stamps already guard, applied
  * here to the fourth stored-artifact family.
  *
  * Layout: one parquet table per artifact, a `tokenizer_format` column
  * on every row carrying layout version + kind + the parameters that
  * change encode semantics (endMark for BPE; nothing for unigram —
  * logp doubles round-trip bit-exactly through parquet; contPrefix/unk
  * for WordPiece). Order-bearing artifacts (the BPE merge LIST) carry
  * an explicit `rank` column — parquet read order is not a contract.
  */
object TokenizerStore {

  private[graft] val FormatPrefix = "graft-tokenizer-v1"

  private def stampOf(kind: String, params: Seq[(String, String)]): String =
    (s"$FormatPrefix;kind=$kind" +: params.map { case (k, v) => s"$k=$v" })
      .mkString(";")

  private def checkedRead(spark: SparkSession, path: String,
                          expectKind: String)
      : (org.apache.spark.sql.DataFrame, Map[String, String]) = {
    val df = spark.read.parquet(path)
    require(df.columns.contains("tokenizer_format"),
      s"stored tokenizer table at $path has no tokenizer_format column — " +
      "written by a pre-versioning build or not a tokenizer artifact; " +
      "retrain and re-save with TokenizerStore")
    val stamps = df.select(col("tokenizer_format")).distinct().limit(3)
      .collect().map(_.getString(0))
    require(stamps.length == 1,
      s"stored tokenizer table at $path carries ${stamps.length} distinct " +
      "tokenizer_format stamps — mixed artifacts; retrain and re-save")
    require(stamps.head != null && stamps.head.startsWith(FormatPrefix),
      s"stored tokenizer table at $path has layout '${stamps.head}', this " +
      s"build reads '$FormatPrefix' — retrain and re-save")
    val params = stamps.head.stripPrefix(FormatPrefix + ";").split(';')
      .map { kv =>
        val i = kv.indexOf('=')
        kv.substring(0, i) -> kv.substring(i + 1)
      }.toMap
    require(params.get("kind").contains(expectKind),
      s"stored tokenizer table at $path is kind '${params("kind")}', " +
      s"caller asked for '$expectKind' — wrong artifact for this encode " +
      "path")
    (df.drop("tokenizer_format"), params)
  }

  // ---- BPE (and byte-level BPE) merge lists --------------------------

  /** Persist an ordered merge list. `endMark` is part of the stamp:
    * encoding with the wrong terminal convention is a semantic change,
    * not a soft default.
    */
  def saveBpeMerges(spark: SparkSession, merges: Seq[(String, String)],
                    path: String, endMark: String = "</w>"): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "a", "b")
      .withColumn("tokenizer_format",
        lit(stampOf("bpe-merges", Seq("end_mark" -> endMark))))
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a merge list in rank order; returns (merges, endMark). */
  def loadBpeMerges(spark: SparkSession,
                    path: String): (Seq[(String, String)], String) = {
    val (df, params) = checkedRead(spark, path, "bpe-merges")
    val merges = df.orderBy(asc("rank")).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"))).toSeq
    (merges, params.getOrElse("end_mark", "</w>"))
  }

  // ---- unigram-LM vocabularies ---------------------------------------

  def saveUnigramVocab(spark: SparkSession, vocab: Seq[(String, Double)],
                       path: String): Unit = {
    import spark.implicits._
    vocab.toDF("piece", "logp")
      .withColumn("tokenizer_format", lit(stampOf("unigram-vocab", Nil)))
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a unigram vocabulary. Order within the vocab is not
    * semantic (Viterbi scores decide); returned piece-sorted for
    * determinism.
    */
  def loadUnigramVocab(spark: SparkSession,
                       path: String): Seq[(String, Double)] = {
    val (df, _) = checkedRead(spark, path, "unigram-vocab")
    df.orderBy(asc("piece")).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Double]("logp"))).toSeq
  }

  // ---- WordPiece vocabularies ----------------------------------------

  def saveWordPieceVocab(spark: SparkSession, vocab: Seq[String],
                         path: String, contPrefix: String = "##",
                         unk: String = "[UNK]"): Unit = {
    import spark.implicits._
    vocab.zipWithIndex.map { case (p, i) => (i, p) }.toDF("rank", "piece")
      .withColumn("tokenizer_format",
        lit(stampOf("wordpiece-vocab",
          Seq("cont_prefix" -> contPrefix, "unk" -> unk))))
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a WordPiece vocab in stored order; returns
    * (vocab, contPrefix, unk).
    */
  def loadWordPieceVocab(spark: SparkSession,
                         path: String): (Seq[String], String, String) = {
    val (df, params) = checkedRead(spark, path, "wordpiece-vocab")
    val vocab = df.orderBy(asc("rank")).collect()
      .map(_.getAs[String]("piece")).toSeq
    (vocab, params.getOrElse("cont_prefix", "##"),
      params.getOrElse("unk", "[UNK]"))
  }
}

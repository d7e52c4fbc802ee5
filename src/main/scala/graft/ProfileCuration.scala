package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{LineDedup, NbClassifier, NgramLm}

/** Data-dominated scaling instrument for the curation family
  * (line-dedup / NB classifier / bigram-LM), the ProfileScale protocol
  * applied to the round-9 operators: k content-disjoint tagged copies
  * of the corpus (constant structure, vocab grows ×k — the worst case
  * for the vocab-bounded count tables), corpora materialized before
  * timing, reps interleaved round-robin across factors so steal bursts
  * hit every arm alike. `runMain graft.ProfileCuration <sfDir> [reps]
  * [factors]`.
  */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val factors = (if (args.length > 2) args(2) else "1,10")
      .split(',').map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("source"))

    // ProfileScale's construction: copy j shifts ids into their own 10M
    // window and tags every token _j (content-disjoint copies, ×k
    // vocab), tripled within-copy so dup structure is preserved.
    def copyAt(j: Int): DataFrame = {
      val tagged = docs.select(
        (col("doc_id") + lit(j * 10000000L)).as("doc_id"),
        array_join(transform(
          filter(split(trim(col("text")), "\\s+"), t => t =!= ""),
          t => concat(t, lit(s"_$j"))), " ").as("text"),
        concat(col("source"), lit(s"_$j")).as("source"))
      tagged
        .unionByName(tagged.select((col("doc_id") + 1000000L).as("doc_id"),
          col("text"), col("source")))
        .unionByName(tagged.select((col("doc_id") + 2000000L).as("doc_id"),
          col("text"), concat(lit(s"offsite_$j")).as("source")))
    }

    def corpusAt(k: Int): DataFrame =
      (0 until k).map(copyAt).reduce(_.unionByName(_))

    def time(label: String, k: Int, it: Int)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = BenchAction.consumeAll(mk)
      println(f"$label%-12s k=$k%-3d it$it ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val corpora = factors.map { k =>
      val c = corpusAt(k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"k=$k corpus rows=${c.count()}")
      k -> c
    }

    (0 to reps).foreach { it =>
      corpora.foreach { case (k, corpus) =>
        time("line_dedup", k, it) {
          // the gate's multi-line construction: 10-token chunk lines +
          // a corpus-wide header + per-source footer boilerplate
          val t = corpus.select(col("doc_id"), col("source"),
              TextFunctions.tokens(col("text")).as("toks"))
            .filter(size(col("toks")) >= 1)
          val nChunks =
            ceil(size(col("toks")).cast("double") / 10.0).cast("int")
          val chunks = transform(sequence(lit(0), nChunks - 1),
            g => concat_ws(" ", slice(col("toks"), g * 10 + 1, lit(10))))
          val built = t.select(col("doc_id"),
            array_join(concat(
              array(lit("shared boilerplate header")), chunks,
              array(concat(lit("footer for "), col("source")))),
              "\n").as("text"))
          LineDedup.dropCommonLines(built, "doc_id", "text", 5L)
            .agg(sum(col("n_dropped")), count(lit(1)))
        }
        time("nb_classify", k, it) {
          val t = corpus.select(col("doc_id"),
              (col("doc_id") % 2).cast("int").as("y"),
              TextFunctions.tokens(concat(col("text"),
                when(col("doc_id") % 2 === 0, lit(" mk0 mk0"))
                  .otherwise(lit(" mk1 mk1")))).as("toks"))
            .filter(size(col("toks")) >= 1)
          NbClassifier.trainScoreBinary(t, "doc_id", "toks", "y")
            .agg(sum(col("pred_label")), count(lit(1)))
        }
        time("lm_score", k, it) {
          val t = corpus.select(col("doc_id"),
              TextFunctions.tokens(col("text")).as("toks"))
            .filter(size(col("toks")) >= 2)
          NgramLm.scoreBigramLm(t, "doc_id", "toks")
            .agg(count(lit(1)))
        }
        time("winnow_pairs", k, it) {
          // production order: EXACT dedup first — the profile corpus
          // plants identical-doc groups (tripled copies × the natural
          // dup groups), and identical docs share their ENTIRE
          // fingerprint set, so skipping the exact pass pairwise-
          // explodes every bucket (measured: the un-deduped k=20 arm
          // ran >45 min where the deduped one takes seconds — that
          // blow-up is inherent to fingerprint matching, not a plan
          // defect; no fingerprint scheme should ever see exact dups)
          val t = corpus
            .withColumn("fp0", md5(col("text")))
            .dropDuplicates("fp0")
            .select(col("doc_id"),
              TextFunctions.tokens(col("text")).as("toks"))
            .filter(size(col("toks")) >= 5)
          graft.operators.Winnow.sharedFingerprintPairs(
              t, "doc_id", "toks", k = 5, w = 4)
            .agg(sum(col("shared_fps")), count(lit(1)))
        }
        time("bpe_pairs", k, it) {
          // corpus-dominated half of BPE training: word table + one
          // pair count (each extra merge repeats only the vocab-
          // bounded part, which the ×k tagged vocab grows linearly)
          val t = corpus.select(
            TextFunctions.tokens(col("text")).as("toks"))
          graft.operators.Bpe.pairCounts(
              graft.operators.Bpe.wordSymbolCounts(t, "toks"))
            .agg(sum(col("cnt")), count(lit(1)))
        }
        if (k == 1) locally {
          // tokenization-path A/B at real merge depth (k=1 only — the
          // comparison is per-word cost, not corpus scaling): the
          // BpeEncode expression's min-rank loop is ~flat in numMerges;
          // applyMerges' in-order literal fold pays O(numMerges) per
          // word and is the measured reason the expression exists
          graft.plans.GraftFunctions.register(spark)
          val t = corpus
            .filter(col("doc_id") % 10 === 0)
            .select(col("doc_id"),
              TextFunctions.tokens(col("text")).as("toks"))
          val trained = graft.operators.Bpe.trainFast(
            t.select(col("toks")), "toks", numMerges = 500)
          for (n <- Seq(100, math.min(500, trained.size))) {
            val m = trained.take(n)
            val t0 = System.nanoTime()
            val r1 = t.select(posexplode(col("toks")).as(Seq("i", "word")))
              .select(graft.functions.BpeEncode.bpe_encode(col("word"), m)
                .as("p"))
              .agg(sum(size(col("p"))), count(lit(1))).head()
            println(f"bpe_encode$n%-4d k=$k%-3d it$it ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=${r1.getLong(1)}")
            val t1 = System.nanoTime()
            val r2 = graft.operators.Bpe.applyMerges(t, "doc_id", "toks", m)
              .agg(sum(size(col("pieces"))), count(lit(1))).head()
            println(f"bpe_apply$n%-5d k=$k%-3d it$it ${(System.nanoTime() - t1) / 1e9}%8.2f s  rows=${r2.getLong(1)}")
          }
        }
        locally {
          // full trainFast at real merge depth: ONE corpus pass + the
          // driver-side heap loop — the r9-verdict claim under test is
          // wall ∝ corpus (k), NOT ∝ numMerges (500 merges must not
          // add 500 scheduling floors the way sequential train does)
          val t0 = System.nanoTime()
          val t = corpus.select(
            TextFunctions.tokens(col("text")).as("toks"))
          val m = graft.operators.Bpe.trainFast(t, "toks", numMerges = 500)
          println(f"bpe_train500 k=$k%-3d it$it ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=${m.size}")
        }
        time("span_excise", k, it) {
          // production order (exact dedup first, like winnow_pairs —
          // tripled copies would otherwise make EVERY gram df ≥ 2 and
          // the removal set corpus-sized); dup mass is then only the
          // planted passage, so the claim under test is the operator
          // contract: wall ∝ corpus scan + duplicated mass, both ∝ k
          val t = corpus
            .withColumn("fp0", md5(col("text")))
            .dropDuplicates("fp0")
            .select(col("doc_id"),
              TextFunctions.tokens(when(col("doc_id") % 10 === 0,
                concat(col("text"),
                  lit(" zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10 zq11 zq12")))
                .otherwise(col("text"))).as("toks"))
            .filter(size(col("toks")) >= 1)
          graft.operators.SpanDedup.removeDupSpans(t, "doc_id", "toks", 8)
            .agg(sum(col("n_removed")), count(lit(1)))
        }
        time("kll_sketch", k, it) {
          // the ONE corpus-sized pass of the mergeable-quantile
          // lifecycle (per-partition sketch build + per-shard merge);
          // the driver-side state merge is |shards|-bounded and free
          val vals = corpus.select(col("source"),
            size(TextFunctions.tokens(col("text"))).cast("double").as("v"))
          graft.operators.SketchStats.shardKll(vals, "source", "v", 200)
            .agg(sum(col("n_values")), count(lit(1)))
        }
        time("rep_signals", k, it) {
          // the gate's construction: 10-token chunk lines, planted
          // dup line on every 3rd doc, planted 5-gram re-emit on every
          // 7th; the claim under test is a pure per-doc map — wall ∝
          // corpus, no shuffle, with the staged-column binding holding
          // the per-doc cost at O(L log L) (the naive lambda-inlined
          // form measured 10+ min at k=1)
          val t = corpus.select(col("doc_id"),
              TextFunctions.tokens(col("text")).as("toks"))
            .filter(size(col("toks")) >= 5)
          val nChunks =
            ceil(size(col("toks")).cast("double") / 10.0).cast("int")
          val chunks = transform(sequence(lit(0), nChunks - 1),
            g => concat_ws(" ", slice(col("toks"), g * 10 + 1, lit(10))))
          val built = t
            .select(col("doc_id"), col("toks"), chunks.as("chunks"))
            .select(col("doc_id"),
              concat(col("chunks"),
                when(col("doc_id") % 3 === 0, slice(col("chunks"), 1, 1))
                  .otherwise(slice(col("chunks"), 1, 0)),
                when(col("doc_id") % 7 === 0,
                    array(concat_ws(" ", slice(col("toks"), 1, 5))))
                  .otherwise(slice(col("chunks"), 1, 0))).as("lines"))
            .withColumn("toks2",
              flatten(transform(col("lines"), l => split(l, " "))))
          graft.functions.RepetitionSignals
            .withSignals(built, "lines", "toks2")
            .agg(round(sum(col("rep_dup5_frac")), 2).as("dup5_sum"),
              sum(when(col("rep_dup_line_frac") > 0.30, 1).otherwise(0))
                .as("n_dup_lines"),
              count(lit(1)).as("n"))
        }
        time("dsir", k, it) {
          // the gate's target slice (src0/src1) under the tagged-copy
          // renames: src0_j / src1_j (prefix match excludes src1x_j)
          val t = corpus.select(col("doc_id"), col("source"),
              TextFunctions.tokens(col("text")).as("toks"))
            .filter(size(col("toks")) >= 1)
          graft.operators.Dsir.importanceWeights(
              t, t.filter(col("source").startsWith("src0_") ||
                          col("source").startsWith("src1_")),
              "doc_id", "toks", numBuckets = 1024)
            .agg(round(sum(col("log_weight")), 2), count(lit(1)))
        }
      }
    }
    corpora.foreach(_._2.unpersist(blocking = false))
    spark.stop()
  }
}

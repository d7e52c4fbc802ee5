package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE trainFast at REAL tokenizer merge depth — the r10-verdict gap:
  * the 500-merge profile arm exhausted the documents-corpus vocabulary
  * at 109–427 merges, so "wall ∝ corpus, flat in merge count" was
  * extrapolated past ~500, not measured. This profile feeds the trainer
  * a synthetic merge-rich corpus (md5-derived pseudo-words: 16-char hex
  * alphabet, heavy shared substructure — the adjacent-pair supply grows
  * with vocab size, like real subword corpora) whose word table
  * supports tens of thousands of merges, and times trainFast at
  * numMerges ∈ {1k, 5k, 10k, 30k, 50k} over the SAME corpus.
  *
  * Claim under test (BASELINE.md): wall is dominated by the one
  * distributed corpus pass + the one-time pair-index build; the heap
  * loop adds per-merge cost proportional to the TOUCHED words only, so
  * 50k merges must cost nowhere near 50× the 1k arm — the fastBPE
  * shape, vs the sequential `train`'s ≥2 jobs × scheduling floor ×
  * merge count (hours at this depth).
  *
  * `runMain graft.ProfileBpeDeep [nDocs] [reps]` (defaults 30000, 2).
  */
object ProfileBpeDeep {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 30000
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 8 pseudo-words per doc, 12 hex chars each — ~nDocs×8 mostly
    // distinct words over a 16-char alphabet: plenty of repeated
    // character pairs at every merge depth
    val docs = spark.range(nDocs).select(
      transform(sequence(lit(0), lit(7)),
        i => substring(md5(concat(col("id"), lit("_"), i)), 1, 12))
        .as("toks"))

    // corpus-pass-only reference: numMerges=0 isolates the distributed
    // half (word table collect) from the driver loop
    for (it <- 1 to reps) {
      val t0 = System.nanoTime()
      val m0 = graft.operators.Bpe.trainFast(docs, "toks", numMerges = 0)
      println(f"bpe_deep m=0      it$it ${(System.nanoTime() - t0) / 1e9}%8.2f s  got=${m0.size}")
    }
    for (m <- Seq(1000, 5000, 10000, 30000, 50000); it <- 1 to reps) {
      val t0 = System.nanoTime()
      val merges = graft.operators.Bpe.trainFast(docs, "toks", numMerges = m)
      println(f"bpe_deep m=$m%-6d it$it ${(System.nanoTime() - t0) / 1e9}%8.2f s  got=${merges.size}")
    }
    spark.stop()
  }
}

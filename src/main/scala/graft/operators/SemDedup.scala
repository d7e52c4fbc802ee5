package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023,
  * arXiv:2303.09540): drop any item whose embedding cosine to a
  * LOWER-ID item in the same coarse cell reaches `tau` — near-duplicate
  * MEANING, not near-duplicate text, which catches paraphrases and
  * templated rewrites that survive minhash.
  *
  * Scale shape (100 TB):
  *  - All-pairs cosine is confined WITHIN coarse cells; the join is an
  *    equi-join on the cell key (one shuffle per side), never a global
  *    cross join. Cell granularity is the dial: this file's sign-bit
  *    cells are deterministic and oracle-replicable for the gate; a
  *    production corpus uses [[Similarity.ivfAssign]] k-means cells
  *    (thousands of cells → per-cell quadratic cost bounded by
  *    (n/cells)²), the paper's own construction.
  *  - `maxCell` is the skew guard, and it fails CONSERVATIVE: an
  *    oversized cell skips pairing and keeps all members (recall loss,
  *    never precision loss) — same trade as the minhash `maxBucket`,
  *    spec-pinned where it binds.
  *  - The drop set derives from (lower-id neighbor ≥ tau) EXISTS — no
  *    iterative clustering, one aggregation over the pair stream.
  * Determinism: the threshold compares the ROUNDED (6 dp) cosine, so
  * both engines make identical keep/drop decisions at the boundary
  * (the raw doubles are already bit-identical — sequential-fold dot —
  * but the rounded compare makes the contract explicit).
  */
object SemDedup {

  /** Deterministic coarse cell from the sign pattern of the first
    * `bits` components: cell = Σ 2^i·[v_{i+1} > 0].
    */
  def signCell(v: Column, bits: Int): Column =
    (0 until bits).map(i =>
      when(element_at(v, i + 1) > 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Per-item verdict: `idCol, cell, dropped` — dropped=true iff a
    * lower-id same-cell item has rounded cosine ≥ `tau`. Sign-bit
    * cells (deterministic, oracle-replicable).
    */
  def semanticDedup(embs: DataFrame, idCol: String, vecCol: String,
                    signBits: Int = 4, tau: Double = 0.95,
                    maxCell: Long = 10000L): DataFrame =
    semanticDedupInCells(
      embs.select(col(idCol), Similarity.asDouble(col(vecCol)).as("v"))
        .withColumn("cell", signCell(col("v"), signBits)),
      idCol, "v", "cell", tau, maxCell)

  /** [[semanticDedup]] over PRECOMPUTED cells — the production path:
    * feed [[Similarity.ivfAssign]] (k-means coarse quantization, the
    * paper's own construction) so per-cell quadratic cost is bounded
    * by (n/cells)². The vector column must already be array<double>.
    */
  def semanticDedupInCells(embs: DataFrame, idCol: String, vecCol: String,
                           cellCol: String, tau: Double,
                           maxCell: Long): DataFrame = {
    val t = embs.select(col(idCol), col(vecCol).as("v"),
      col(cellCol).as("cell"))
    // |cells| rows (2^signBits or the k-means k) — broadcast by
    // construction.
    val okCells = t.groupBy("cell").agg(count(lit(1)).as("cell_n"))
      .filter(col("cell_n") <= maxCell)
      .select(col("cell"))
    val eligible = t.join(broadcast(okCells), Seq("cell"))
    val a = eligible.select(col("cell"), col(idCol).as("id_a"),
      col("v").as("va"))
    val b = eligible.select(col("cell"), col(idCol).as("id_b"),
      col("v").as("vb"))
    val drops = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b") &&
        round(Similarity.cosine(col("va"), col("vb")), 6) >= tau)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("hit", lit(true))
    t.join(drops, Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        coalesce(col("hit"), lit(false)).as("dropped"))
  }
}

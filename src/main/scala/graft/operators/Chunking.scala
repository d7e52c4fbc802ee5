package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size token-window chunking with overlap — the
  * long-document → training-example split every pretraining/RAG
  * pipeline runs before packing or embedding (the sliding-window
  * convention: stride = size − overlap, windows starting every stride
  * tokens, each successive pair sharing `overlap` tokens).
  *
  * Chunk-start contract: starts are `1 + j·stride` for j = 0,1,… while
  * `start ≤ max(1, n − overlap)` — the tail chunk may be shorter than
  * `size` but is never a strict sub-range of its predecessor, and a doc
  * shorter than `size` yields exactly one chunk (itself).
  *
  * Scale shape (100 TB): a pure per-row explode — chunk boundaries are
  * arithmetic over each doc's own token array (in-row higher-order
  * functions, whole-stage codegen), so the operator is a map with NO
  * shuffle, no window, no join; output size is corpus × (1/stride)
  * chunk rows. Downstream grouping (packing, embedding batches) decides
  * the first exchange.
  */
object Chunking {

  /** Explode a token-array column into overlapping chunks:
    * `idCol, chunk_id (0-based), start_pos (1-based), n_chunk_tokens,
    * chunk_text` (space-joined tokens). Docs with empty arrays yield
    * no chunk (nothing to train on — the caller's filter contract).
    */
  def chunkTokens(docs: DataFrame, idCol: String, toksCol: String,
                  size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val n = org.apache.spark.sql.functions.size(col(toksCol))
    // last start ≤ max(1, n − overlap) ⇒ j ≤ (max(1, n−overlap) − 1)/stride
    val maxJ = floor((greatest(lit(1), n - overlap) - 1).cast("double")
      / stride).cast("int")
    docs.filter(n >= 1)
      .select(col(idCol),
        explode(transform(sequence(lit(0), maxJ),
          j => struct(
            j.as("chunk_id"),
            (j * stride + 1).as("start_pos"),
            slice(col(toksCol), j * stride + 1, lit(size)).as("ctoks"))))
          .as("c"))
      .select(col(idCol), col("c.chunk_id"), col("c.start_pos"),
        org.apache.spark.sql.functions.size(col("c.ctoks")).cast("long")
          .as("n_chunk_tokens"),
        array_join(col("c.ctoks"), " ").as("chunk_text"))
  }

  /** Content-defined chunking (the LBFS/rsync-family splitter): a new
    * chunk opens at token position p ≥ 2 whenever the k-gram hash at p
    * is ≡ 0 (mod `modulus`); position 1 always opens the first chunk.
    * Expected chunk length ≈ `modulus` tokens (geometric), and — the
    * property fixed-stride [[chunkTokens]] lacks — boundaries are
    * STABLE under edits: inserting/deleting tokens moves only the
    * chunks up to the first surviving boundary after the edit, so
    * chunk fingerprints dedup across near-identical documents
    * (ChunkingSpec pins the suffix-stability property).
    *
    * Hashes are the md5-prefix integers every cross-engine gate uses.
    * Output: `idCol, chunk_id (0-based), start_pos (1-based),
    * n_chunk_tokens, chunk_fp` (md5 of the space-joined chunk).
    *
    * Scale shape: boundary selection is in-row higher-order-function
    * arithmetic over each doc's own token array (whole-stage codegen,
    * no shuffle); the explode emits one row per CHUNK (~n/modulus),
    * cheaper than the gram stream by modulus×.
    */
  def chunkContentDefined(docs: DataFrame, idCol: String, toksCol: String,
                          k: Int, modulus: Int): DataFrame = {
    require(k >= 1 && modulus >= 2,
      s"need k >= 1 and modulus >= 2, got k=$k modulus=$modulus")
    val n = org.apache.spark.sql.functions.size(col(toksCol))
    def gh(p: org.apache.spark.sql.Column) =
      conv(substring(md5(concat_ws(" ", slice(col(toksCol), p, lit(k)))),
        1, 8), 16, 10).cast("long")
    // guard: Spark's sequence(2, hi) is DESCENDING for hi < 2 (the
    // Bpe.symbols lesson) — emit no candidate positions instead
    val candidates = when(n - (k - 1) >= 2,
        filter(sequence(lit(2), n - (k - 1)), p => gh(p) % modulus === 0))
      .otherwise(array().cast("array<int>"))
    val starts = concat(array(lit(1)), candidates)
    docs.filter(n >= 1)
      .select(col(idCol), col(toksCol), starts.as("starts"))
      .select(col(idCol), col(toksCol),
        explode(transform(
          sequence(lit(1), org.apache.spark.sql.functions.size(col("starts"))),
          j => struct(
            (j - 1).as("chunk_id"),
            element_at(col("starts"), j).as("start_pos"),
            when(j < org.apache.spark.sql.functions.size(col("starts")),
              element_at(col("starts"), j + 1) - 1).otherwise(n)
              .as("end_pos")))).as("c"))
      .select(col(idCol), col("c.chunk_id"), col("c.start_pos"),
        (col("c.end_pos") - col("c.start_pos") + 1).cast("long")
          .as("n_chunk_tokens"),
        md5(array_join(slice(col(toksCol), col("c.start_pos"),
          col("c.end_pos") - col("c.start_pos") + 1), " ")).as("chunk_fp"))
  }
}

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
}

package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking (north-star X9: the
  * context-window prep step of a training/RAG corpus — split each
  * document into fixed-size token windows with a configurable overlap
  * so no boundary-spanning content is lost).
  *
  * Semantics: whitespace tokens ([[TextAnalysis.tokens]]); chunk i
  * covers tokens [i*step, i*step + chunkTokens) with
  * step = chunkTokens - overlap; chunks start at every multiple of
  * step strictly below the token count, so the final chunk may be
  * short (never empty) and documents with zero tokens emit no chunks.
  *
  * Scale design: pure map-side generator expansion — tokenize, build
  * the start offsets with `sequence`, slice in the array domain, and
  * `posexplode`. No shuffle anywhere; at 100 TB this is a single
  * embarrassingly-parallel scan whose output is written straight back
  * out, and the sizing knobs are the input split size, nothing else.
  */
object Chunking {

  /** (idCol, chunk_idx, start_token, n_tokens, chunk_text) — one row
    * per window, chunk_idx counting from 0 in document order.
    */
  def slidingChunks(
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val step = chunkTokens - overlap
    val toks = docs.select(
      col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__tc", size(col("__toks")))
      .filter(col("__tc") >= 1)
    toks
      .select(col(idCol), col("__toks"), col("__tc"),
        posexplode(sequence(lit(0), col("__tc") - 1, lit(step))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "start_token")
      .select(col(idCol), col("chunk_idx"), col("start_token"),
        least(lit(chunkTokens), col("__tc") - col("start_token")).as("n_tokens"),
        array_join(slice(col("__toks"), col("start_token") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }
}

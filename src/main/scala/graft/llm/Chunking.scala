package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-window token chunking — the sequence-preparation step that
  * turns variable-length documents into trainer-sized pieces (window of
  * `window` tokens advancing by `stride`, so consecutive chunks overlap
  * by `window - stride` tokens).
  *
  * Entirely narrow: chunk indices come from `sequence` + `transform` +
  * `posexplode` inside one projection — no shuffle, no state, output
  * partitioning inherits the scan. At 100 TB this is the ideal shape:
  * every task chunks its own parquet split and writes; the only fan-out
  * is the ~(len/stride)× row multiplication the operator exists to do.
  */
object Chunking {

  /** Number of chunks for a token count `n`: 1 when n ≤ window, else
    * 1 + ceil((n - window) / stride) — the last chunk may be short but a
    * trailing remainder always gets one.
    */
  private def numChunks(n: Column, window: Int, stride: Int): Column =
    when(n <= window, 1L)
      .otherwise(ceil((n - lit(window)).cast("double") / stride).cast("long") + 1L)

  /** Explode `docs` into (idCol, chunk_idx, n_tokens, chunk_text).
    * Tokenization is the corpus-standard normalize + whitespace split.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val ws = split(Dedup.normalize(col(textCol)), " ")
    // empty/null docs produce no chunks (tokenCount-consistent: their
    // token count is 0, not a single empty-string token)
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol), ws.as("__ws"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0L), numChunks(size(col("__ws")), window, stride) - 1),
          i => slice(col("__ws"), (i * stride + 1).cast("int"), lit(window)))))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        size(col("col")).as("n_tokens"),
        array_join(col("col"), " ").as("chunk_text"))
  }
}

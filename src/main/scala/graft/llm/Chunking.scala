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

  /** CONTENT-DEFINED chunking
    * ([[graft.expressions.ContentChunkBounds]]): boundaries from a
    * rolling hash of the text itself, so an edit near the top of a
    * document shifts only the chunks around it — the downstream
    * chunk-hash population (what chunk-level dedup and long-doc
    * near-dup key on) survives, where [[chunk]]'s fixed windows would
    * re-cut everything after the edit. Expected chunk length
    * ≈ 2^maskBits code points, clamped to [minLen, maxLen].
    *
    * Same narrow shape as [[chunk]]: the boundary expression runs
    * inside whole-stage codegen, one posexplode fan-out, substring
    * slicing — no shuffle, no state.
    *
    * Output: (idCol, chunk_idx, start_cp, n_cp, chunk_md5).
    */
  def contentDefined(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 16, maskBits: Int = 6,
                     minLen: Int = 32, maxLen: Int = 256): DataFrame = {
    val bounds = graft.expressions.ContentChunkBounds
      .content_chunk_bounds(col(textCol), k, maskBits, minLen, maxLen)
    docs.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol), col(textCol).as("__t"), bounds.as("__b"))
      .select(col(idCol), col("__t"), col("__b"), posexplode(col("__b")))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        // prev boundary: element_at is 1-based, so b[pos-1] = element_at(b, pos)
        when(col("pos") === 0, lit(0))
          .otherwise(element_at(col("__b"), col("pos"))).as("start_cp"),
        col("col").as("__end"), col("__t"))
      .select(col(idCol), col("chunk_idx"), col("start_cp"),
        (col("__end") - col("start_cp")).as("n_cp"),
        md5(col("__t").substr(col("start_cp") + 1,
          col("__end") - col("start_cp"))).as("chunk_md5"))
  }

  /** Fixed-width CODEPOINT chunking in the same offsets form as
    * [[contentDefined]] — `(idCol, chunk_idx, start_cp, n_cp,
    * chunk_md5)` — so every consumer of the offsets-form chunk schema
    * ([[Dedup.chunkTrim]], [[Dedup.chunkDuplication]]) composes with
    * either chunker. This is the SQL-expressible instantiation: the
    * `chunk_trim` oracle restates it verbatim in DuckDB, which the
    * rolling-hash boundaries of [[contentDefined]] cannot be.
    *
    * Same narrow shape as the other chunkers: one codegen'd projection,
    * one posexplode fan-out, no shuffle.
    */
  def fixedWidth(docs: DataFrame, idCol: String, textCol: String,
                 width: Int = 64): DataFrame = {
    require(width > 0, s"width must be > 0, got $width")
    docs.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol), col(textCol).as("__t"),
        posexplode(sequence(lit(0L),
          ceil(length(col(textCol)).cast("double") / width).cast("long") - 1)))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        (col("col") * width).cast("int").as("start_cp"),
        least(lit(width), length(col("__t")) - col("col").cast("int") * width)
          .cast("int").as("n_cp"),
        md5(col("__t").substr((col("col") * width + 1).cast("int"), lit(width)))
          .as("chunk_md5"))
  }
}

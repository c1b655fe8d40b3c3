package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T5-style span corruption (Raffel et al. 2020 §3.1.4) — the
  * denoising-objective EXAMPLE PREP step: replace token spans with
  * sentinel tokens in the input and emit the masked spans,
  * sentinel-prefixed, as the target. Published pipelines do this with
  * an RNG at batch time; here it is a DETERMINISTIC pure function of
  * (doc id, block index) via the portable md5 hash — the same rerun/
  * engine/growth stability argument as the hash split: a re-run
  * regenerates the identical examples, so training is reproducible and
  * an oracle can restate the whole transform.
  *
  * Tokens group into consecutive blocks of `spanLen`; block `b` of doc
  * `d` is corrupted iff `u32(md5(d:b)) % corruptEvery == 0` (≈
  * 1/corruptEvery of token mass; the paper's 15% ≈ corruptEvery 7 at
  * spanLen 3). Input: corrupted blocks → `<extra_id_k>` in block
  * order; target: `<extra_id_k> span…` per corrupted block plus the
  * closing sentinel — the exact T5 target format.
  *
  * Scale shape: entirely narrow — one projection of higher-order array
  * functions per row (no explode, no shuffle, no window); runs at scan
  * speed like [[Chunking]].
  */
object SpanCorrupt {

  /** `(idCol, n_tokens, n_corrupt_spans, input_text, target_text)`. */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  spanLen: Int = 3, corruptEvery: Int = 7): DataFrame = {
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    require(corruptEvery >= 2, s"corruptEvery must be >= 2, got $corruptEvery")
    val t = col(textCol)
    val empty = t.isNull || trim(t) === ""
    val toks = split(regexp_replace(trim(lower(t)), "\\s+", " "), " ")
    val nt = when(empty, 0).otherwise(size(toks)).cast("int")
    val nb = ((nt + spanLen - 1) / spanLen).cast("int")
    val blockIds = when(nb >= 1, sequence(lit(0), nb - 1))
      .otherwise(array().cast("array<int>"))
    def isCorrupt(b: org.apache.spark.sql.Column) =
      graft.functions.Hashes.u32OfMd5(
        concat(col(idCol).cast("string"), lit(":"), b.cast("string"))) %
        corruptEvery === 0
    def span(b: org.apache.spark.sql.Column) =
      array_join(slice(toks, b * spanLen + 1, lit(spanLen)), " ")
    val corruptIds = filter(blockIds, b => isCorrupt(b))
    val nCorrupt = size(corruptIds).cast("int")
    val input = array_join(transform(blockIds, b =>
      when(isCorrupt(b),
          concat(lit("<extra_id_"),
            (array_position(corruptIds, b) - 1).cast("string"), lit(">")))
        .otherwise(span(b))), " ")
    val spansOut = array_join(transform(corruptIds, (b, i) =>
      concat(lit("<extra_id_"), i.cast("string"), lit("> "), span(b))), " ")
    val target = when(nCorrupt === 0, lit("<extra_id_0>"))
      .otherwise(concat(spansOut, lit(" <extra_id_"),
        nCorrupt.cast("string"), lit(">")))
    docs.select(col(idCol), nt.as("n_tokens"),
      when(empty, 0).otherwise(nCorrupt).cast("int").as("n_corrupt_spans"),
      when(empty, lit("")).otherwise(input).as("input_text"),
      when(empty, lit("<extra_id_0>")).otherwise(target).as("target_text"))
  }
}

package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal (the C4 cleanup step): a line
  * that appears verbatim in many documents is template chrome (nav
  * text, cookie banners, footers), not content — strip it from every
  * document while preserving each document's remaining line order.
  *
  * Shape: line explode with positions (narrow) → line-keyed doc-count
  * agg (map-side partials; the distinct-per-doc projection keeps a hot
  * boilerplate line from inflating the count shuffle beyond one row
  * per (doc, line)) → anti-join per line → one doc-keyed re-assembly
  * agg. The frequency threshold is an ABSOLUTE document count so no
  * eager corpus count runs; callers wanting a fraction pass
  * `(frac * knownCorpusSize).toInt`.
  *
  * Documents whose every line is boilerplate disappear from the output
  * (there is nothing left to keep) — the caller sees dropped ids, not
  * empty strings.
  */
object Boilerplate {

  def removeFrequentLines(docs: DataFrame, idCol: String, textCol: String,
                          minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val frequent = lines.select(col(idCol), col("line")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select(col("line"))
    lines.join(frequent, Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_lines_kept"))
  }
}

package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document keyword extraction: top-k terms by a TF-IDF-style
  * score. Used for corpus exploration, topic routing, and as a cheap
  * feature for quality classifiers.
  *
  * Scoring is LINEAR inverse document frequency — score = tf · (N / df)
  * — not the textbook log damping: `tf · (N/df)` is two single IEEE
  * operations (exact int→double division, exactly-rounded multiply), so
  * every engine computes the bitwise-identical double and the DuckDB
  * oracle can hash-match without a rounding fudge; `ln` differs in the
  * last ulp across libm implementations. The RANKING is what the
  * operator delivers, and log is monotone in N/df, so top-k by the
  * linear score with the df-then-term tiebreak is the same top-k.
  *
  * Scale shape: one token-sized shuffle for tf (doc,term), one
  * vocabulary-sized agg for df, a broadcast-able df join (vocabulary ≪
  * corpus), and a doc-partitioned window — no global ordering anywhere.
  */
object Keywords {

  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 3, minTermLen: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val n = docs.count() // one cheap metadata-only action; N is part of the score contract
    val terms = docs
      .select(col(idCol), explode(split(Dedup.normalize(col(textCol)), " ")).as("term"))
      .filter(length(col("term")) >= minTermLen)
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("score", col("tf") * (lit(n).cast("double") / col("df")))
    val rank = row_number().over(Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("df").asc, col("term").asc))
    scored.withColumn("rn", rank).filter(col("rn") <= k)
      .select(col(idCol), col("rn").as("rank"), col("term"),
        col("tf"), col("df"), col("score"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Token-budget corpus selection: rank documents by a quality order and
  * keep the best prefix whose CUMULATIVE token count fits a global
  * budget — "give me the best 50 B tokens", the final cut every
  * training-data pipeline makes before handing off to the trainer.
  *
  * Semantically this is `SUM(tokens) OVER (ORDER BY rank)` filtered to
  * `cum <= budget` — but a global running-sum window funnels the whole
  * corpus through ONE task (the round-4 minting defect, resurrected).
  * Instead the same two-phase shape as [[Keys.assignSorted]]: a
  * range-partitioned sort puts partition order = total rank order, a
  * counts-only first pass computes each partition's token sum (driver
  * holds one long per partition), and the second pass turns those into
  * per-partition starting offsets — every partition then numbers its own
  * rows in parallel. Partitions that start past the budget short-circuit
  * to empty without touching their rows.
  *
  * Determinism contract: `rankCols` must be a TOTAL order (include the
  * unique id as the last key, like [[graft.llm.Packing]]) — under ties
  * the range sort could place rows either side of the budget line.
  *
  * The sorted input is evaluated by BOTH passes, so it is eagerly
  * localCheckpoint'ed (same policy as `Dedup.resolveClusters`): the sort
  * runs once, both passes read its materialized partitions.
  */
object Selection {

  /** Keep rows (in rank order) while cumulative `tokenCol` ≤ `budget`.
    * Output: the input columns + `cum_tokens` (cumulative INCLUDING the
    * row). A row that would cross the budget line is dropped along with
    * everything after it — whole documents only, the conservative cut.
    */
  def byTokenBudget(docs: DataFrame, rankCols: Seq[Column], tokenCol: String,
                    budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be nonnegative, got $budget")
    require(docs.schema(tokenCol).dataType == LongType,
      s"$tokenCol must be LongType (cast token counts upstream), got " +
        docs.schema(tokenCol).dataType)
    val sorted = docs.sort(rankCols: _*).localCheckpoint(true)
    val tokIdx = sorted.schema.fieldIndex(tokenCol)
    val rdd = sorted.rdd
    val partSums = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach { r => if (!r.isNullAt(tokIdx)) s += r.getLong(tokIdx) }
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(i) = tokens before partition i
    val schema = StructType(sorted.schema.fields :+
      StructField("cum_tokens", LongType, nullable = false))
    val kept = rdd.mapPartitionsWithIndex { (i, it) =>
      if (offsets(i) >= budget) Iterator.empty // whole partition past the line
      else {
        var run = offsets(i)
        it.map { r =>
          if (!r.isNullAt(tokIdx)) run += r.getLong(tokIdx)
          (r, run)
        }.takeWhile(_._2 <= budget)
          .map { case (r, cum) => Row.fromSeq(r.toSeq :+ cum) }
      }
    }
    sorted.sparkSession.createDataFrame(kept, schema)
  }
}

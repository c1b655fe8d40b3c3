package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import scala.collection.mutable

/** Funnel-free per-group exclusive running sum — the generalization of
  * [[Selection.byTokenBudget]]'s two-pass cumsum to MANY groups, built
  * for the packers' per-shard conversation offsets.
  *
  * `sum(w) OVER (PARTITION BY shard ORDER BY key ROWS UNBOUNDED
  * PRECEDING .. -1)` funnels each shard's entire stream through ONE
  * task — parallelism capped at the shard count (16 by default), which
  * at 100 TB means 16 sequential cumsums. This operator computes the
  * identical values at full cluster parallelism: a range-partitioned
  * sort on `(shard, key)` makes partition order = total stream order,
  * a counts-only first pass collects each partition's per-shard weight
  * sums (driver state: one long per (partition, shard-slice) — shards
  * are contiguous under the range sort, so this is O(partitions +
  * shards), not their product), the driver prefix-sums those into
  * per-partition starting offsets, and a second pass numbers every
  * partition independently.
  *
  * Determinism contract (same as the window form): `(shardCol,
  * orderCol)` must be a TOTAL order — `orderCol` unique within a shard
  * — or rows tied on the key could land either side of a partition
  * boundary with different offsets across runs.
  *
  * The sorted input is evaluated by BOTH passes, so it is eagerly
  * localCheckpoint'ed (the [[Selection]] policy): the sort runs once,
  * both passes read its materialized partitions.
  */
object Cumsum {

  /** Input columns + `outCol` = the exclusive per-`shardCol` running
    * sum of `weightCol` in `orderCol` order (0 for each shard's first
    * row; null weights count 0). `weightCol` must be LongType.
    */
  def exclusivePerShard(df: DataFrame, shardCol: String, orderCol: String,
                        weightCol: String, outCol: String): DataFrame = {
    require(df.schema(weightCol).dataType == LongType,
      s"$weightCol must be LongType (cast weights upstream), got " +
        df.schema(weightCol).dataType)
    val sorted = df.repartitionByRange(col(shardCol), col(orderCol))
      .sortWithinPartitions(col(shardCol), col(orderCol))
      .localCheckpoint(true)
    val si = sorted.schema.fieldIndex(shardCol)
    val wi = sorted.schema.fieldIndex(weightCol)
    val rdd = sorted.rdd
    // pass 1: per-partition, per-shard sums in arrival (= sorted) order
    val partSums: Array[Array[(Any, Long)]] = rdd
      .mapPartitionsWithIndex { (i, it) =>
        val m = mutable.LinkedHashMap.empty[Any, Long]
        it.foreach { r =>
          val w = if (r.isNullAt(wi)) 0L else r.getLong(wi)
          m.updateWith(r.get(si)) {
            case Some(x) => Some(x + w)
            case None => Some(w)
          }
        }
        Iterator((i, m.toArray))
      }
      .collect().sortBy(_._1).map(_._2)
    // driver prefix-sum: offsets(i) = each shard's mass in partitions < i
    // (only for shards PRESENT in partition i — a broadcast of
    // O(partitions + shards) entries total, since the range sort keeps
    // each shard contiguous)
    val running = mutable.HashMap.empty[Any, Long]
    val offsets: Array[Map[Any, Long]] = partSums.map { sums =>
      val snap = sums.map { case (s, _) =>
        (s, running.getOrElse(s, 0L))
      }.toMap
      sums.foreach { case (s, w) =>
        running.update(s, running.getOrElse(s, 0L) + w)
      }
      snap
    }
    val bc = sorted.sparkSession.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val run = mutable.HashMap.empty[Any, Long]
      bc.value(i).foreach { case (s, o) => run.update(s, o) }
      it.map { r =>
        val s = r.get(si)
        val w = if (r.isNullAt(wi)) 0L else r.getLong(wi)
        val off = run.getOrElse(s, 0L)
        run.update(s, off + w)
        Row.fromSeq(r.toSeq :+ off)
      }
    }
    sorted.sparkSession.createDataFrame(out, schema)
  }
}

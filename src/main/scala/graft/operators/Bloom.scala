package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Serialized Bloom filters as a pre-filter tier for membership probes.
  *
  * Built on the same engine machinery Spark's runtime row-group
  * filtering uses (`BloomFilterAggregate` / `BloomFilterMightContain`,
  * both codegen-friendly native expressions — no UDF, no
  * driver-side hashing loop): the aggregate builds the filter
  * distributed with map-side partial merges, and the probe inlines into
  * whole-stage codegen as a bit test on `xxhash64` of the value.
  *
  * Why a library surface at all: a daily 100 TB ingest that anti-joins
  * its batch against the persisted corpus digest set shuffles BOTH
  * sides every day. With a persisted Bloom of the corpus digests, the
  * overwhelmingly-common case (a genuinely new document) is decided by
  * a NARROW filter — zero shuffle — and only the ~fpp false-positive
  * slice plus the true duplicates pay the anti-join. The filter stays a
  * router, never an oracle: results are exact for any fpp.
  *
  * Sizing honesty: bits ≈ 1.44·n·log2(1/fpp). 10⁸ digests at 1% fpp is
  * ~120 MB — broadcastable; 10¹⁰ is not. The tier is for corpora whose
  * DIGEST CARDINALITY is ≤ low billions; beyond that, shard the corpus
  * by digest prefix and build one filter per shard, or fall back to the
  * plain anti-join ([[graft.llm.Dedup.exactDedupIncremental]]).
  */
object Bloom {

  /** Optimal bit count for `n` items at false-positive rate `fpp`
    * (−n·ln p / ln²2), floored at 64. */
  def optimalNumBits(n: Long, fpp: Double): Long =
    math.max(64L, math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)

  /** Build a serialized Bloom filter over `xxhash64(c)` for every row of
    * `df` — one distributed aggregation (partial filters OR-merged), the
    * result small enough to persist to a file and reuse across runs.
    *
    * NOTE: Spark clamps the aggregate to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` /
    * `.maxNumBits` (defaults 4 M / 67 M). A clamped filter is still
    * CORRECT as a router (more false positives → more rows take the
    * exact path); raise those confs when building corpus-scale filters.
    */
  def build(df: DataFrame, c: Column, expectedItems: Long,
            fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftColumnShim.expression(c))),
      Literal(expectedItems), Literal(optimalNumBits(expectedItems, fpp)))
    df.select(GraftColumnShim.column(agg.toAggregateExpression()))
      .head().getAs[Array[Byte]](0)
  }

  /** Probe column: true iff `c` MIGHT be in `bloom` (false ⇒ definitely
    * absent). The serialized filter rides the plan as a binary literal —
    * at task level that is one broadcast-like ship per executor, and the
    * test itself is codegen'd. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    GraftColumnShim.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftColumnShim.expression(c)))))
}

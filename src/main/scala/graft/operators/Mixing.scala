package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus mixing — per-domain up/down-sampling to target
  * rates, the mixture-weights step of training-corpus assembly (the
  * Pile / RedPajama / Dolma "domain reweighting" recipe: sources are
  * repeated or thinned so the token mix matches a target composition).
  *
  * A domain's rate `r` means: `floor(r)` full epochs of every document,
  * plus a fractional final epoch that keeps each document with
  * probability `r − floor(r)` — so `r = 0.3` keeps ~30% of the domain
  * once, `r = 2.5` emits every document twice plus a ~50% third epoch.
  * Selection is a PORTABLE pure function of `(id, epoch)` (first 8 md5
  * hex digits widened to a long, compared against an integer-ish
  * threshold — same idiom as [[Sampling.hashSplit]]): stable across
  * reruns, engines, partitionings, and corpus growth, and epochs of one
  * document are selected independently, so no RNG state anywhere.
  *
  * Scale: a generator (`explode(sequence)`) plus a codegen'd filter —
  * NARROW, zero shuffle, no window; at 100 TB the plan is a single scan
  * pass whatever the rates are. Upsampling multiplies output rows by at
  * most `ceil(max rate)`, visible in the plan as the generator arity.
  */
object Mixing {

  /** One row per surviving (document, epoch); output = input columns +
    * `epoch` (int, 0-based). Domains absent from `rates` get
    * `defaultRate` (0 = drop, the honest default for an explicit
    * mixture: an unlisted domain was not budgeted, and silently passing
    * it through at 1.0 would skew the mix).
    */
  def byRate(df: DataFrame, domainCol: String, idCol: String,
             rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    require(rates.nonEmpty, "at least one domain rate required")
    require(rates.values.forall(_ >= 0) && defaultRate >= 0,
      s"rates must be non-negative: $rates default=$defaultRate")
    // literal CASE chain: domains are few (a mixture spec is human-sized),
    // so this stays a codegen'd branch, not a join
    val rateCol = rates.toSeq.sortBy(_._1)
      .foldRight(lit(defaultRate): Column) { case ((d, r), els) =>
        when(col(domainCol) === d, lit(r)).otherwise(els)
      }
    val maxEpochs = ceil(col("__rate")).cast("int")
    val u32 = graft.functions.Hashes.u32OfMd5(concat_ws(":",
      col(idCol).cast("string"), col("epoch").cast("string")))
    // survive iff u32 < (rate − epoch, clamped to [0,1]) · 2^32; full
    // epochs clamp to 2^32 > any u32. floor(x·2^32 + 0.5) is pure IEEE —
    // the engine-portable rounding (library round() is not, on .5
    // boundaries) — and rate − epoch is identical IEEE arithmetic in any
    // engine, so membership is bitwise-reproducible.
    val threshold = floor(least(col("__rate") - col("epoch").cast("double"),
      lit(1.0)) * lit(4294967296.0) + lit(0.5))
    df.withColumn("__rate", rateCol)
      .withColumn("epoch",
        explode(when(maxEpochs >= 1, sequence(lit(0), maxEpochs - 1))
          .otherwise(array())))
      .filter(u32 < threshold)
      .drop("__rate")
  }

  /** Temperature-scaled sampling rates over group masses (the
    * multilingual sampling scheme of Conneau & Lample 2019 §3.1:
    * `p_g ∝ n_g^α` with α < 1 UP-samples low-resource groups so the big
    * ones don't drown them). Pinned to α = 0.5 (temperature 2) because
    * `sqrt` is an exactly-rounded IEEE op — the same log-free trade
    * [[graft.llm.LmScore]] makes: a general `pow(x, 0.3)` is not
    * correctly rounded across math libraries and could never hash-match
    * an oracle, while the sqrt schedule is a published setting AND
    * bitwise-portable.
    *
    * Output per group: `(groupCols…, n_weight, rate, boost)` —
    * `rate` = √n_g / Σ√n (the sampling probability; Σ via exact
    * decimal quantization so the divisor is order-independent),
    * `boost` = rate / natural share (> 1 ⇒ up-sampled). Feed the rates
    * to [[byRate]] to materialize the mixture.
    *
    * Scale shape: one grouped sum, one 1-row broadcast of the two
    * totals, one narrow projection.
    */
  def temperatureRates(df: DataFrame, groupCols: Seq[String],
                       weightCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    val g = df.groupBy(groupCols.map(col): _*)
      .agg(sum(col(weightCol)).as("n_weight"))
    val tot = g.agg(
      sum(col("n_weight")).as("__tw"),
      sum(sqrt(col("n_weight").cast("double")).cast("decimal(28,15)"))
        .cast("double").as("__ts"))
    val rate = sqrt(col("n_weight").cast("double")) / col("__ts")
    g.crossJoin(broadcast(tot))
      .select(groupCols.map(col) ++ Seq(col("n_weight"), rate.as("rate"),
        (rate / (col("n_weight").cast("double") / col("__tw").cast("double")))
          .as("boost")): _*)
  }
}

package graft.quality

import org.apache.spark.sql.Row

/** Hard-fail quality gate (`src/quality/gates.py:30-58`): a driver-side
  * decision over the 1-row validator aggregate. Hard fail throws before
  * any downstream write commits — the Spark equivalent of the reference
  * failing the Airflow task.
  */
final class ValidationHardFailError(msg: String) extends RuntimeException(msg)

case class GateConfig(
  minJobCount: Int = 50,                 // DQ_MIN_JOBS_COUNT
  hardFailDuplicateRate: Double = 0.20,  // DQ_MAX_DUPLICATE_RATE
  successThreshold: Double = 0.90,       // crawl: 0.90; staging: 0.95
  warningThreshold: Double = 0.70)       // crawl: 0.70; staging: 0.90

case class GateResult(status: String, validRate: Double, message: String)

object QualityGate {

  val crawlConfig   = GateConfig()
  val stagingConfig = GateConfig(successThreshold = 0.95, warningThreshold = 0.90)

  /** @param stats one row from [[Validators.crawlStats]] / stagingStats */
  def evaluate(stats: Row, config: GateConfig = crawlConfig,
               dataLossRate: Option[Double] = None): GateResult = {
    val total = stats.getAs[Long]("total_jobs")
    val dupRate = stats.getAs[Double]("duplicate_rate")
    val validRate = stats.getAs[Double]("valid_rate")

    if (total == 0)
      throw new ValidationHardFailError("No jobs found")
    if (total < config.minJobCount)
      throw new ValidationHardFailError(
        s"Job count $total below minimum ${config.minJobCount}")
    if (dupRate > config.hardFailDuplicateRate)
      throw new ValidationHardFailError(f"Duplicate rate ${dupRate * 100}%.1f%% too high")
    dataLossRate.filter(_ > 0.05).foreach(r =>
      throw new ValidationHardFailError(f"Data loss ${r * 100}%.1f%% exceeds 5%%"))
    if (validRate < config.warningThreshold)
      throw new ValidationHardFailError(f"Valid rate ${validRate * 100}%.1f%% below threshold")

    if (validRate < config.successThreshold)
      GateResult("warning", validRate, f"Warning: ${validRate * 100}%.1f%% valid")
    else
      GateResult("success", validRate, f"Passed: ${validRate * 100}%.1f%% valid")
  }
}

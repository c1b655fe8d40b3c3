package graft.storage

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC boundary source/sink (SURVEY.md §2.1 S3 "drop-in compat"): the
  * reference's staging pipeline reads Postgres tables
  * (`src/etl/staging/pipeline.py:27-31`); a user migrating incrementally
  * can point the same operators at the database instead of the parquet
  * lake — `Tables`-shaped reads, `spark.read.jdbc` underneath.
  *
  * Scale: a plain JDBC read is ONE connection/one partition — a
  * non-starter for big tables. [[readPartitioned]] splits the scan into
  * `numPartitions` range predicates on a numeric column so every executor
  * pulls its own slice; Spark pushes filters/column pruning into the
  * generated SQL (`PushedFilters` in the scan node). The JDBC side is a
  * boundary source for modest staging tables, not the 100 TB path — the
  * lake stays canonical.
  */
object Jdbc {

  private def props(user: Option[String], password: Option[String],
                    driver: Option[String]): Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    driver.foreach(p.setProperty("driver", _))
    p
  }

  /** Single-partition read — small dims / control tables only. */
  def read(spark: SparkSession, url: String, table: String,
           user: Option[String] = None, password: Option[String] = None,
           driver: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, props(user, password, driver))

  /** Range-partitioned parallel read on a numeric `splitCol` — the
    * drop-in shape for staging-table scans of any size.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      splitCol: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      user: Option[String] = None,
                      password: Option[String] = None,
                      driver: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, splitCol, lower, upper, numPartitions,
      props(user, password, driver))

  /** Append/overwrite rows into a JDBC table (the reference's raw-layer
    * upsert lands through [[graft.operators.Merge]] first; this is the
    * final write).
    */
  def write(df: DataFrame, url: String, table: String, mode: SaveMode,
            user: Option[String] = None, password: Option[String] = None,
            driver: Option[String] = None): Unit =
    df.write.mode(mode).jdbc(url, table, props(user, password, driver))
}

package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import java.nio.file.Files

class EvolveSpec extends SparkSpec {
  import spark.implicits._

  test("readEvolved unions footer schemas across writer generations") {
    val path = Files.createTempDirectory("evolve_spec").resolve("t").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(path)
    Seq((3L, "c", 30.0)).toDF("id", "v", "score")
      .write.mode(SaveMode.Append).parquet(path)

    val evolved = TableStore.readEvolved(spark, path)
    assert(evolved.columns.sorted.toSeq == Seq("id", "score", "v"))
    val byId = evolved.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    // old-generation rows read null for the new column; new rows carry it
    assert(byId == Map(1L -> None, 2L -> None, 3L -> Some(30.0)))
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (same configs as
  * Verify/Bench mains).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // every action emits an execution-start event carrying the full
      // explain string even with the UI off, and the all-gates
      // streaming micro-batch's composed plan renders its cached (not
      // lineage-truncated) subtrees multiplicatively — unbounded, one
      // render OOMed the suite JVM. 16M chars bounds the diagnostic,
      // never the semantics, and is far above every PlanSpec pin's
      // plan size.
      .config("spark.sql.maxPlanStringLength", (16 * 1024 * 1024).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      println(s"===== $q =====")
      println(plan)
    }
    spark.stop()
  }
}

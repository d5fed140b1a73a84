package graft

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans of the headline queries — plan-shape review
  * artifact (broadcast vs shuffle, codegen spans, parquet pushdown). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q_pip_join", "q_tile_assign", "q_knn", "q_distance_join",
                  "q_token_stats")) {
      println(s"========== $q ==========")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}

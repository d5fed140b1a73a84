package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of selected
  * SparkEntry queries (all of them by default) — the `.explain` evidence
  * behind the plan-shape claims in SURVEY §8 / BASELINE.md.
  *
  *   sbt "runMain graft.PlanDump <sfDir> [q1,q2,...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names: Set[String] =
      if (args.length > 1) args(1).split(',').toSet else Set.empty
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n===================== $name =====================")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable =>
          println(s"[plan-dump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-audit tool: emits the formatted physical plan of selected
  * SparkEntry queries (all of them by default) — the `.explain` evidence
  * behind the plan-shape claims in SURVEY §8 / BASELINE.md / the
  * OPTIMIZATION_r* notes.
  *
  *   sbt "runMain graft.PlanDump <sfDir> [q1,q2,...|all] [outDir] [suffix]"
  *
  * Round-6 changes (VERDICT r5 #5): plans are taken via
  * `queryExecution.explainString` on stdout only (no captured Spark stderr
  * noise), optionally written one file per query to `<outDir>/<q><suffix>.txt`
  * (the committed plans/r06 evidence), and the dump MACHINE-CHECKS the audit:
  * it counts ScalaUDF and CartesianProduct nodes across every plan and exits
  * nonzero if either appears. (Bounded BroadcastNestedLoopJoins over literal
  * Range/LocalTableScan query batches are deliberate and not counted —
  * the scale-killer is an unbounded cartesian, which Spark plans as
  * CartesianProduct.)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names: Set[String] =
      if (args.length > 1 && args(1).nonEmpty && args(1) != "all")
        args(1).split(',').toSet
      else Set.empty
    val outDir = if (args.length > 2) Some(args(2)) else None
    val suffix = if (args.length > 3) args(3) else ""
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    outDir.foreach(d => Files.createDirectories(Paths.get(d)))
    var nUdf = 0
    var nCartesian = 0
    var nPlans = 0
    var nFailed = 0
    SparkEntry.queries
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n===================== $name =====================")
        try {
          val plan = fn(spark, sfDir).queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)
          nPlans += 1
          nUdf += "ScalaUDF".r.findAllIn(plan).length
          nCartesian += "CartesianProduct".r.findAllIn(plan).length
          outDir.foreach(d =>
            Files.writeString(Paths.get(d, s"$name$suffix.txt"), plan))
          println(plan)
        } catch { case e: Throwable =>
          nFailed += 1
          println(s"[plan-dump] $name failed: ${e.getMessage}")
        }
      }
    // machine-checked audit line: the committed dump itself proves the
    // zero-UDF / zero-cartesian claim instead of requiring an eyeball pass
    println(s"\nPLAN-AUDIT: plans=$nPlans failed=$nFailed " +
      s"ScalaUDF=$nUdf CartesianProduct=$nCartesian " +
      (if (nUdf == 0 && nCartesian == 0 && nFailed == 0) "OK" else "VIOLATION"))
    spark.stop()
    if (nUdf != 0 || nCartesian != 0 || nFailed != 0) sys.exit(1)
  }
}

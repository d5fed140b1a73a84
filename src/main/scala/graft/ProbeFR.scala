package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scratch profiler for the round-6 outlier queries: runs a query from the
  * declared registry, executes it with a noop-equivalent action on the SAME
  * QueryExecution, and dumps per-operator SQLMetrics (durations, rows) so
  * stage cost is attributed empirically instead of by eyeball. NOT part of
  * the frozen bench harness. */
object ProbeFR {
  def metricsDump(p: SparkPlan, depth: Int = 0): Unit = {
    val ms = p.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(", ")
    println("  " * depth + p.nodeName + "  [" + ms + "]")
    p match {
      case a: AdaptiveSparkPlanExec => metricsDump(a.executedPlan, depth + 1)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        metricsDump(q.plan, depth + 1)
      case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
        metricsDump(r.child, depth + 1)
      case _ => p.children.foreach(metricsDump(_, depth + 1))
    }
    p.subqueries.foreach(metricsDump(_, depth + 1))
  }

  def timeNoop(df: DataFrame, label: String, iters: Int = 3): Double = {
    var best = Double.MaxValue
    var i = 0
    while (i < iters) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      if (dt < best) best = dt
      i += 1
    }
    println(f"TIME $label%-28s min-of-$iters = $best%.3f s")
    best
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-probe-fr").master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val qname = if (args.nonEmpty) args(0) else "q_find_relation_april"

      if (args.length > 1 && args(1) == "sizes") {
        // per-query generated-method size + timing sweep: args(0) is a
        // comma-separated query list; histogram max is read AFTER each query
        // (cumulative, so report the running max — a jump pins the query)
        import org.apache.spark.metrics.source.CodegenMetrics
        args(0).split(",").foreach { q =>
          val b = SparkEntry.queries(q)
          b(spark, dir).write.format("noop").mode("overwrite").save() // warm
          val t = timeNoop(b(spark, dir), q)
          val h = CodegenMetrics.METRIC_GENERATED_METHOD_BYTECODE_SIZE.getSnapshot
          println(f"SIZES $q%-24s min=$t%.3f cumulative-max-method=${h.getMax}")
        }
        return
      }

      val build = SparkEntry.queries(qname)

      // warm the snapshot/index first
      build(spark, dir).write.format("noop").mode("overwrite").save()

      if (args.length > 1 && args(1) == "loop") {
        // spin the query so an external jstack sampler can profile it
        println("PID=" + ProcessHandle.current().pid())
        var i = 0
        while (i < 40) {
          build(spark, dir).write.format("noop").mode("overwrite").save()
          i += 1
        }
        return
      }

      // full query timing
      timeNoop(build(spark, dir), qname)

      // ids-only projection (column pruning drops payload arrays + kernels)
      timeNoop(build(spark, dir).select("rid", "sid"), s"$qname ids-only")

      // variant timings: rewrite the top `relation` projection in the
      // analyzed plan (CASE WHEN april_rel>=0 THEN april_rel ELSE exact END)
      // to isolate which expression carries the cost. Probe-only — the
      // declared query is untouched.
      locally {
        import org.apache.spark.sql.catalyst.expressions.{Alias, CaseWhen, Literal}
        import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
        import org.apache.spark.sql.GraftColumnBridge
        val analyzed = build(spark, dir).queryExecution.analyzed
        def variant(name: String)(f: CaseWhen => org.apache.spark.sql.catalyst.expressions.Expression): Unit = {
          var hit = false
          val vp: LogicalPlan = analyzed.transformUp {
            case p: Project => p.copy(projectList = p.projectList.map {
              case a @ Alias(cw: CaseWhen, "relation") =>
                hit = true
                Alias(f(cw), "relation")(a.exprId, a.qualifier, a.explicitMetadata)
              case e => e
            })
          }
          if (!hit) println(s"VARIANT $name: no CaseWhen(relation) found — skipped")
          else timeNoop(GraftColumnBridge.ofRows(spark, vp), s"variant:$name")
        }
        variant("april-only")(cw => cw.branches.head._2)      // april_rel, no fallback
        variant("exact-only")(cw => cw.elseValue.get)          // st_find_relation always
        variant("const-0")(_ => Literal(0))                    // attach joins, no kernels

        // finer decomposition of the april_rel computation itself
        import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Expression, GetArrayItem, Size}
        import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}
        import graft.functions.AprilTopoRel
        def variant2(name: String)(f: AprilTopoRel => Expression): Unit = {
          var hit = false
          val vp: LogicalPlan = analyzed.transformUp {
            case p: Project => p.copy(projectList = p.projectList.map {
              case a @ Alias(at: AprilTopoRel, "april_rel") =>
                hit = true
                Alias(f(at), "april_rel")(a.exprId, a.qualifier, a.explicitMetadata)
              case e => e
            })
          }
          if (!hit) println(s"VARIANT $name: no AprilTopoRel(april_rel) found — skipped")
          else timeNoop(GraftColumnBridge.ofRows(spark, vp), s"variant:$name")
        }
        // arrays attached + probed, but ra is a constant (drops hilbertCell+CreateArray)
        variant2("probe-litra")(at => at.copy(
          ra = Literal.create(Array(0L, 1L), ArrayType(LongType, containsNull = false))))
        // hilbertCell+CreateArray kept, probe dropped (reads ra[0] only)
        variant2("hilbert-only")(at =>
          Cast(GetArrayItem(at.ra, Literal(0)), IntegerType))
        // array payload attached, only array headers read
        variant2("attach-arrays")(at =>
          Add(Size(at.sa, legacySizeOfNull = false), Size(at.sf, legacySizeOfNull = false)))
      }

      // metrics dump on one fresh execution: run the SAME QueryExecution's
      // plan via toRdd so its operator metrics populate
      val df = build(spark, dir)
      spark.sparkContext.setJobDescription(s"probe metrics: $qname")
      val qe = df.queryExecution
      val t0 = System.nanoTime()
      qe.toRdd.count()
      println(f"TIME toRdd-count = ${(System.nanoTime() - t0) / 1e9}%.3f s")
      println("== executed plan metrics ==")
      metricsDump(qe.executedPlan)

      // output size
      println("rows=" + build(spark, dir).count())

      // codegen bytecode-size evidence: the JVM never JIT-compiles methods
      // over 8000 bytecode bytes (DontCompileHugeMethods), so any generated
      // method above that runs interpreted
      locally {
        import org.apache.spark.metrics.source.CodegenMetrics
        val h = CodegenMetrics.METRIC_GENERATED_METHOD_BYTECODE_SIZE.getSnapshot
        println(s"generated-method bytecode size: max=${h.getMax} p99=${h.getValue(0.99)} p95=${h.getValue(0.95)} median=${h.getMedian}")
        import org.apache.spark.sql.execution.debug._
        val code = codegenString(build(spark, dir).queryExecution.executedPlan)
        val out = new java.io.PrintWriter("/tmp/codegen_dump.txt")
        try out.println(code) finally out.close()
        println("codegen dump written: /tmp/codegen_dump.txt")
      }
    } finally spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/**
 * Structural profile of every declared query (guide §1): per query, the
 * number of Spark jobs, stages and tasks it launches and the shuffle bytes
 * it moves, plus wall seconds. The contended driver environment punishes
 * per-job/per-task fixed overhead far harder than this sandbox does, so
 * job/stage/task counts are the portable predictor of driver-side cost.
 * Separate main — Bench.scala (the frozen harness) is untouched.
 */
object BenchJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleRead = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // same warmup as Bench
    try SparkEntry.diamondIndex(spark, sfDir) catch { case _: Throwable => }
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    println(f"${"query"}%-24s ${"sec"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"shufR_MB"}%9s ${"shufW_MB"}%9s")
    val rows = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // warm run first so min-protocol-like numbers (2nd run) are measured
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      Thread.sleep(500) // let the listener bus drain (no public waitUntilEmpty)
      jobs.set(0); stages.set(0); tasks.set(0)
      shuffleRead.set(0L); shuffleWrite.set(0L)
      val t0 = System.nanoTime()
      val err = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); ""
      } catch { case e: Throwable => e.getClass.getSimpleName }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val r = (name, sec, jobs.get, stages.get, tasks.get,
        shuffleRead.get / 1e6, shuffleWrite.get / 1e6, err)
      println(f"${r._1}%-24s ${r._2}%8.2f ${r._3}%5d ${r._4}%7d ${r._5}%6d ${r._6}%9.2f ${r._7}%9.2f ${r._8}")
      r
    }
    println(f"${"TOTAL"}%-24s ${rows.map(_._2).sum}%8.2f ${rows.map(_._3).sum}%5d ${rows.map(_._4).sum}%7d ${rows.map(_._5).sum}%6d")
    spark.stop()
  }
}

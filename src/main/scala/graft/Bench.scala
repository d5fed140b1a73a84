package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // spark-submit provides the master (multi-JVM benches); sbt runMain
    // falls back to local[N]
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(s"local[$cpus]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/classload warmup on a tiny synthetic join (no input IO): without it
    // whichever query runs first absorbs several seconds of one-time cost
    locally {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val g = graft.web.Pages.WorldGrid
      def geo(n: Int, seed: Int) = spark.range(n).select(
        col("id"), lit(graft.core.GeomType.BOX).as("gtype"),
        ((col("id") * (13 + seed) % 2800) / 8.0 - 175.0).as("cx"),
        ((col("id") * (17 + seed) % 1280) / 8.0 - 80.0).as("cy"))
        .select(col("id"), col("gtype"),
          array(col("cx") - 0.5, col("cy") - 0.5, col("cx") + 0.5, col("cy") - 0.5,
            col("cx") + 0.5, col("cy") + 0.5, col("cx") - 0.5, col("cy") + 0.5,
            col("cx") - 0.5, col("cy") - 0.5).as("coords"),
          (col("cx") - 0.5).as("xmin"), (col("cy") - 0.5).as("ymin"),
          (col("cx") + 0.5).as("xmax"), (col("cy") + 0.5).as("ymax")).as[GeoRow]
      try GeoEngine.spatialJoin(geo(2000, 0), geo(2000, 7),
        graft.core.Predicates.INTERSECTS, g).count()
      catch { case _: Throwable => }
      // reference lifecycle: buildIndex runs once at ingest, queries hit the
      // stored snapshot. Pre-ensure it here so the APRIL queries measure the
      // query path; the build cost itself is still reported by q_index_build
      // (which force-rebuilds inside its timed window).
      try SparkEntry.diamondIndex(spark, sfDir)
      catch { case _: Throwable => }
    }
    // per-query error strings surface in the JSON — a crashed query must not
    // masquerade as a fast one
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    // optional filter for iterating on single queries:
    //   SPARK_GRAFT_ONLY=q_a,q_b runMain graft.Bench
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    // Reproducibility: this VM shows ±3× run-to-run noise on single cold
    // runs (q_quality, a map-only query, once moved 0.22→1.46s between
    // rounds with zero code change). Each query therefore runs `iters` warm
    // in-JVM iterations and reports the MIN (the same protocol ScaleBench
    // uses) plus the max/min spread, so a regression is distinguishable
    // from a noisy window: real plan changes move the min; VM noise only
    // widens the spread.
    // clamped to >= 1: zero/negative would skip the loop entirely and emit
    // Double.MaxValue into the JSON (unparseable downstream)
    val iters = math.max(1, sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt)
    val results = selected.map { case (name, fn) =>
      var minSec = Double.MaxValue
      var maxSec = 0.0
      var err: Option[String] = None
      var it = 0
      while (it < iters && err.isEmpty) {
        val t0 = System.nanoTime()
        // noop sink forces evaluation of EVERY output column — count() would
        // let Catalyst prune computed projections in map-only queries
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          err = Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < minSec) minSec = sec
        if (sec > maxSec) maxSec = sec
        it += 1
      }
      (name, minSec, maxSec, err)
    }
    // compact output: the driver captures a bounded tail of stdout and
    // parses the JSON line from it — ms precision and error-only err map
    // keep the whole line inside that window (a truncated line records as
    // unparsed). Spread at 2 decimals is the reproducibility diagnostic.
    // Locale.ROOT: the f-interpolator is locale-sensitive and a comma
    // decimal separator would corrupt the JSON
    def num(v: Double, dp: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + num(v, 3) }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, mn, mx, _) =>
      s"\"" + k + "\":" + (if (mn > 0) num(mx / mn, 2) else "1.0")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) =>
      s"\"" + k + "\":" + jstr(e)
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","iters":$iters,"queries":$qs,"spread":$spreads,"err":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

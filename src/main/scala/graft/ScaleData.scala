package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic scale-up generator behind the sf1 bench artifacts
 * (BENCH_LOCAL_r05_sf1*.json): replicates each source table `factor`
 * times, shifting the primary id columns by replica × 10⁸ so replicas
 * never collide (the synthetic geometry/text derivations are functions of
 * the ids, so each replica lands on a shifted lattice — density scales
 * `factor`× in the same dataspace, the worst case for spatial joins).
 * Pure Spark, no external tools; byte-stable across runs.
 *
 *   sbt "runMain graft.ScaleData <srcDir> <outDir> [factor]"
 *   e.g. runMain graft.ScaleData /root/testdata/sf0.1 /tmp/graft_sf1 10
 */
object ScaleData {
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "events" -> Seq("event_id", "user_id"),
    "lineitem" -> Seq("l_orderkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"))
  private val Offset = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(s"local[$cpus]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("customer", "documents", "embeddings", "events",
      "lineitem", "nation", "orders", "part", "region", "supplier")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val scaled: DataFrame = keyCols.get(t) match {
        case None => df // dimension tables (nation/region) stay as-is
        case Some(keys) =>
          val reps = spark.range(factor).select(col("id").as("_rep"))
          val crossed = df.crossJoin(reps)
          keys.foldLeft(crossed) { (d, k) =>
            d.withColumn(k, col(k) + col("_rep") * Offset)
          }.drop("_rep")
      }
      scaled.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scale-data] $t -> ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}

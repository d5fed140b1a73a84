package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleSanity {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 128)
      .config("spark.default.parallelism", 128)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val r = spark.range(0, 2000000000L, 1, 128)
      .select(sum(sin(col("id").cast("double")) * cos(col("id") * 3 % 97))).head()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"sanity_cpus":$cpus,"sec":$sec}""")
    spark.stop()
  }
}

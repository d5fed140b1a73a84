package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Ann

/**
 * Recall-curve artifact for the two recall-contract ANN queries (the ones
 * that stay `no_oracle` by design): measures recall@k of the LSH and IVF
 * paths against the brute-force baseline on the real embeddings table,
 * sweeping the knob each structure trades recall with (nTables for LSH,
 * nprobe for IVF). Prints ONE JSON line — committed per round as
 * ANN_RECALL_r{N}.json, so a regression in either structure becomes a
 * visible number without pretending the top-k sets are bit-stable.
 *
 *   sbt "runMain graft.AnnRecall [sfDir]"
 */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = 10
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val nVecs = emb.count()
    val qs = emb.where(col("vec_id") < 20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

    def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = topkSet(Ann.bruteForceTopK(emb, qs, k))
    def recall(approx: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 1.0 else approx.intersect(truth).size.toDouble / truth.size

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val lshCurve = Seq(1, 2, 4, 8).map { t =>
      s""""$t":${num(recall(topkSet(Ann.lshTopK(emb, qs, k, nTables = t))))}"""
    }.mkString("{", ",", "}")
    val ivfCurve = Seq(1, 2, 4, 8, 16, 32).map { p =>
      s""""$p":${num(recall(topkSet(Ann.ivfTopK(emb, qs, k, nlist = 32, nprobe = p))))}"""
    }.mkString("{", ",", "}")
    emb.unpersist()
    println(s"""{"metric":"ann_recall_at_$k","n_vectors":$nVecs,"n_queries":${qs.length},""" +
      s""""lsh_recall_by_ntables":$lshCurve,"ivf_recall_by_nprobe":$ivfCurve,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded top-k aggregator: keeps the k smallest (dist, id) pairs per group —
 * the Spark-native analogue of the reference's QResultkNN bounded max-heap
 * (API/containers.cpp:831-849), with heap-merge as the merge step.
 *
 * Typed Aggregators run with map-side partial aggregation over object
 * buffers: each input partition reduces to ≤k pairs per query before the
 * shuffle, so a kNN batch over N points and Q queries shuffles O(Q·k·parts)
 * rows instead of sorting N·Q rows through one window.
 *
 * Ties break on id ascending, matching the reference's deterministic
 * heap-drain order (ascending distance, then id).
 */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Double, Long)], Seq[(Long, Double)]] {

  override def zero: List[(Double, Long)] = Nil

  private def trim(buf: List[(Double, Long)]): List[(Double, Long)] =
    buf.sortBy(identity).take(k)

  override def reduce(buf: List[(Double, Long)], in: (Long, Double)): List[(Double, Long)] = {
    val grown = (in._2, in._1) :: buf
    if (grown.length >= 4 * k) trim(grown) else grown
  }

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ::: b)

  override def finish(buf: List[(Double, Long)]): Seq[(Long, Double)] =
    trim(buf).map { case (d, id) => (id, d) }

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}

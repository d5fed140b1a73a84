package graft.ops

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static entry points for the text-dedup codegen expressions
 * (graft.functions.TextExpressions) — callable from whole-stage-generated
 * Java. Each wraps the corresponding TextOps kernel with the
 * UTF8String/ArrayData marshalling done ONCE per call, replacing the
 * ScalaUDF path that paid CatalystTypeConverters boxing (long[] → Seq[Long]
 * wrappers) per row. The hash math itself is byte-for-byte the TextOps
 * kernels, so the pinned sf0.01 fixtures (q_minhash_pairs, q_simhash_pairs,
 * q_fingerprint) stay bit-identical.
 *
 * The UTF8String→String decode stays (fnv64/simhash hash UTF-16 chars —
 * that IS the pinned semantic); what's removed is the converter layer and
 * the array boxing on the signature/shingle outputs.
 */
object TextKernels {

  def minhashSig(t: UTF8String, k: Int, gram: Int): ArrayData =
    new GenericArrayData(TextOps.minhash(t.toString, k, gram))

  /** Per-band FNV-1a fold of the minhash signature — bit-identical to the
    * former bandUdf's per-slice foldLeft; band index = array position
    * (consumed via posexplode). */
  def bandBuckets(sig: ArrayData, bands: Int): ArrayData = {
    val s = sig.toLongArray()
    val rows = s.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L
      var i = b * rows
      val end = (b + 1) * rows
      while (i < end) { h = (h ^ s(i)) * 0x100000001b3L; i += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  def shingleHashes(t: UTF8String, gram: Int): ArrayData =
    new GenericArrayData(TextOps.shingleHashes(t.toString, gram))

  def sortedJaccard(a: ArrayData, b: ArrayData): Double =
    TextOps.sortedJaccard(a.toLongArray(), b.toLongArray())

  def simhash64(t: UTF8String): Long = TextOps.simhash64(t.toString)

  def fingerprint(t: UTF8String, gram: Int): Long =
    TextOps.fingerprint(t.toString, gram)

  def langId(t: UTF8String): UTF8String =
    UTF8String.fromString(TextOps.langId(t.toString))
}

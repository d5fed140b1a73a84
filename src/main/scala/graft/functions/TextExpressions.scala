package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Text-dedup hot kernels as native Catalyst expressions (same design as
 * GeoExpressions): these run once per document at the 10¹²-row dedup
 * target, where the former ScalaUDFs paid per-row CatalystTypeConverters
 * boxing (UTF8String→String→Row wrapper in, long[]→WrappedArray out). The
 * hash semantics are pinned by the sf0.01 fixture oracles — any drift is a
 * hard CORRECTNESS failure, so every expression delegates to the exact
 * TextOps kernel via graft.ops.TextKernels.
 */
case class MinhashSig(child: Expression, k: Int, gram: Int)
    extends UnaryExpression with ExpectsInputTypes {
  // constructor-time validation: the SQL surface (GraftExtensions) builds
  // these from user literals — a non-positive k/gram must fail at analysis
  // with a clear message, not as an ArithmeticException deep in codegen
  require(k > 0, s"minhash_sig: k must be > 0 (got $k)")
  require(gram > 0, s"minhash_sig: gram must be > 0 (got $gram)")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(t: Any): Any =
    graft.ops.TextKernels.minhashSig(t.asInstanceOf[UTF8String], k, gram)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.TextKernels.minhashSig($c, $k, $gram)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** Per-band FNV fold of a minhash signature → array<long>(bands); the band
  * index is the array position (posexplode downstream). */
case class BandBuckets(child: Expression, bands: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bands > 0, s"band_buckets: bands must be > 0 (got $bands)")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_buckets"
  override def nullSafeEval(s: Any): Any =
    graft.ops.TextKernels.bandBuckets(s.asInstanceOf[ArrayData], bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.TextKernels.bandBuckets($c, $bands)")
  override protected def withNewChildInternal(newChild: Expression): BandBuckets =
    copy(child = newChild)
}

/** Sorted distinct FNV64 char-`gram`-shingle hashes of a document. */
case class ShingleHashesExpr(child: Expression, gram: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(gram > 0, s"shingle_hashes: gram must be > 0 (got $gram)")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(t: Any): Any =
    graft.ops.TextKernels.shingleHashes(t.asInstanceOf[UTF8String], gram)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.TextKernels.shingleHashes($c, $gram)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** Jaccard of two sorted distinct hash arrays (merge intersection). */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"
  override def nullSafeEval(a: Any, b: Any): Any =
    graft.ops.TextKernels.sortedJaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.TextKernels.sortedJaccard($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

/** SimHash64 over whitespace tokens (bit-voting on FNV64 token hashes). */
case class Simhash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(t: Any): Any =
    graft.ops.TextKernels.simhash64(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

/** Rolling-hash fingerprint: min FNV64 over char 16-grams. */
case class Fingerprint(child: Expression, gram: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(gram > 0, s"fingerprint: gram must be > 0 (got $gram)")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint"
  override def nullSafeEval(t: Any): Any =
    graft.ops.TextKernels.fingerprint(t.asInstanceOf[UTF8String], gram)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.TextKernels.fingerprint($c, $gram)")
  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}

/** Stopword-argmax language ID. */
case class LangId(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def nullSafeEval(t: Any): Any =
    graft.ops.TextKernels.langId(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.TextKernels.langId($c)")
  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

/** Column-level wrappers. */
object TextExprs {
  private def e(c: Column): Expression = GraftColumnBridge.expression(c)

  def minhashSig(text: Column, k: Int, gram: Int): Column =
    GraftColumnBridge.column(MinhashSig(e(text), k, gram))

  def bandBuckets(sig: Column, bands: Int): Column =
    GraftColumnBridge.column(BandBuckets(e(sig), bands))

  def shingleHashes(text: Column, gram: Int): Column =
    GraftColumnBridge.column(ShingleHashesExpr(e(text), gram))

  def sortedJaccard(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedJaccard(e(a), e(b)))

  def simhash64(text: Column): Column =
    GraftColumnBridge.column(Simhash64(e(text)))

  def fingerprint(text: Column, gram: Int = 16): Column =
    GraftColumnBridge.column(Fingerprint(e(text), gram))

  def langId(text: Column): Column =
    GraftColumnBridge.column(LangId(e(text)))
}

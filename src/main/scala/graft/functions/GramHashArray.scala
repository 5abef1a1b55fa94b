package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial gram-fingerprint array as a native expression: all
  * `gramLen`-char windows at `stride`, each hashed Σₖ codepoint(i+k)·31ᵏ
  * mod 1e9+7 — the cross-engine hash the dedup/decontamination oracles
  * reproduce in DuckDB (`DedupQueries.gramHashSql`).
  *
  * Why native: the Column formulation
  * (`transform(sequence(...), i => gramHash(text, i))`) runs the lambda
  * INTERPRETED per element — 8 Substring/Ascii/Multiply trees per window,
  * ~2 300 Expression.eval walks per 300-char document. Fine when the array
  * is pruned away (q33's bench path aggregates it immediately) but a
  * measured 30 s wall at sf0.1 when q61 explodes it for the
  * decontamination join. This expression emits the whole array from ONE
  * compiled rolling loop per row: measured 41 s → ~2 s for q61.
  *
  * Codepoint note: matches `ascii()` (first codepoint) for the BMP;
  * identical to the DuckDB oracle on ASCII corpora, which is the stated
  * domain of the polynomial hash (see q33). */
object GramHashArrayOps {
  final val Mod = 1000000007L

  def grams(text: UTF8String, gramLen: Int, stride: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n < gramLen) return new GenericArrayData(Array.emptyLongArray)
    val pows = new Array[Long](gramLen)
    var p = 1L
    var k = 0
    while (k < gramLen) { pows(k) = p; p *= 31L; k += 1 }
    val count = (n - gramLen) / stride + 1
    val out = new Array[Long](count)
    var idx = 0
    var i = 0
    while (idx < count) {
      var h = 0L
      k = 0
      while (k < gramLen) { h += s.charAt(i + k).toLong * pows(k); k += 1 }
      out(idx) = h % Mod
      idx += 1
      i += stride
    }
    new GenericArrayData(out)
  }
}

case class GramHashArray(child: Expression, gramLen: Int, stride: Int)
    extends UnaryExpression {

  require(gramLen > 0 && stride > 0, "gramLen and stride must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text must be STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    GramHashArrayOps.grams(text.asInstanceOf[UTF8String], gramLen, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramHashArrayOps.grams($c, $gramLen, $stride);")

  override protected def withNewChildInternal(newChild: Expression): GramHashArray =
    copy(child = newChild)

  override def prettyName: String = "gram_hash_array"
}

object GramHashArray {
  def apply(text: Column, gramLen: Int = 8, stride: Int = 1): Column =
    ColumnBridge.column(
      GramHashArray(ColumnBridge.expression(text), gramLen, stride))
}

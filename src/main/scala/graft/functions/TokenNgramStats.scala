package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token n-gram repetition statistics in ONE compiled pass per row:
  * (total n-grams, distinct n-grams) over the space-split token sequence —
  * the q62 repetition signal. The Column formulation
  * (`transform(sequence, i => concat_ws(element_at…))` + `array_distinct`)
  * built the n-gram string array through interpreted lambdas and scanned
  * it twice; this evaluates the windows against the split tokens directly
  * (same split-by-single-space semantics as `split(text, " ")`: empty
  * tokens from repeated separators are kept). */
object TokenNgramStatsOps {
  def stats(text: UTF8String, n: Int): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val total = toks.length - n + 1
    if (total <= 0) return InternalRow(0L, 0L)
    val seen = new java.util.HashSet[String](total * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    InternalRow(total.toLong, seen.size.toLong)
  }
}

case class TokenNgramStats(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "n must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("n_gram", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text must be STRING, got ${other.catalogString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    TokenNgramStatsOps.stats(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenNgramStatsOps.stats($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TokenNgramStats =
    copy(child = newChild)

  override def prettyName: String = "token_ngram_stats"
}

object TokenNgramStats {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(TokenNgramStats(ColumnBridge.expression(text), n))
}

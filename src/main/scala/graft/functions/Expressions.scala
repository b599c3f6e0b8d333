package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two preprocessing steps that can't
  * be composed from built-ins (SURVEY §2.3): NFC normalization and
  * word-boundary truncation. A codegen'd Expression beats a Scala UDF —
  * no encoder round-trip, null handling for free, and the call inlines
  * into the surrounding whole-stage-generated code
  * (steering: Expression-with-doGenCode > UDF).
  *
  * Both generate a static call into [[ExprHelpers]], the standard pattern
  * for JVM-library-backed expressions.
  */
object ExprHelpers {
  /** Unicode NFC (reference: ondine/utils/input_preprocessing.py:45-60). */
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** Order-isomorphic long key of a double: key(a) < key(b) as signed
    * longs iff a < b (with -0.0 just below +0.0 and NaN above +Inf —
    * Spark's own NaN-last total order). The standard IEEE-754 bit trick:
    * non-negative doubles keep their raw bits (already ordered), negative
    * doubles flip their 63 magnitude bits so larger magnitudes sort
    * lower. Powers [[graft.operators.RankCuts]]' bounded radix search
    * over double-valued histograms. */
  def doubleOrderKey(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    if (b >= 0) b else b ^ Long.MaxValue
  }

  /** Truncate at the last space at-or-before maxLen (rfind semantics,
    * reference :110-122). */
  def truncateWords(s: UTF8String, maxLen: Int): UTF8String = {
    val str = s.toString
    if (str.length <= maxLen) s
    else {
      val cut = str.lastIndexOf(' ', maxLen)
      UTF8String.fromString(
        if (cut > 0) str.substring(0, cut) else str.substring(0, maxLen))
    }
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    ExprHelpers.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExprHelpers.nfc($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

case class WordBoundaryTruncate(child: Expression, maxLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    ExprHelpers.truncateWords(v.asInstanceOf[UTF8String], maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExprHelpers.truncateWords($c, $maxLen)")

  override protected def withNewChildInternal(c: Expression): WordBoundaryTruncate =
    copy(child = c)
}

case class DoubleOrderKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    ExprHelpers.doubleOrderKey(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExprHelpers.doubleOrderKey($c)")

  override protected def withNewChildInternal(c: Expression): DoubleOrderKey =
    copy(child = c)
}

object Expressions {
  def nfc_normalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
  def truncate_words(c: Column, maxLen: Int): Column =
    ColumnBridge.column(
      WordBoundaryTruncate(ColumnBridge.expression(c), maxLen))
  def double_order_key(c: Column): Column =
    ColumnBridge.column(DoubleOrderKey(ColumnBridge.expression(c)))
  /** Exact integral division (the SQL `div` operator) as a composable
    * Column — `a.divide(b)` is float division and rounds past 2^53. */
  def int_div(a: Column, b: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

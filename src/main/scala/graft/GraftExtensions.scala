package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{NfcNormalize, WordBoundaryTruncate}

/** SparkSessionExtensions registration: exposes the engine's native
  * expressions to SQL users —
  *
  *   spark.sql("SELECT graft_nfc(text), graft_truncate_words(text, 100) ...")
  *
  * Activate via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_nfc(str)")
        NfcNormalize(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_truncate_words"),
      new ExpressionInfo(classOf[WordBoundaryTruncate].getName,
        "graft_truncate_words"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_truncate_words(str, maxLen)")
        val maxLen = args(1) match {
          case Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Number].intValue()
        }
        WordBoundaryTruncate(args.head, maxLen)
      }))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression.
  *
  * The VnText parsers (graft.expr.VnText) match Vietnamese prefixes and unit
  * words ("Đường ", "tỷ", " lầu") byte-exactly — correct for NFC input, and
  * silent misses for NFD-encoded input ("Quận" typed as Q-u-ậ‍-n with
  * combining diacritics), which real crawled HTML does contain. The
  * reference has the same latent bug (alonhadat.py:112-123 string-matches
  * composed forms only). The engine's contract: every raw text field is
  * NFC-normalized AT INGEST (Normalize.fromSiteText), so all downstream
  * matching is over composed forms. Already-NFC input takes the
  * `isNormalized` fast path — one scan, no allocation beyond the
  * UTF8String→String bridge, and the common all-ASCII case short-circuits
  * inside that scan.
  */
object UnicodeNorm {

  def nfcKernel(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"nfc_normalize expects string, got $t")
      }
    override protected def nullSafeEval(v: Any): Any =
      nfcKernel(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.UnicodeNorm$$.MODULE$$.nfcKernel($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "nfc_normalize"
  }

  def nfc(c: Column): Column = toColumn(NfcNormalize(toExpression(c)))
}

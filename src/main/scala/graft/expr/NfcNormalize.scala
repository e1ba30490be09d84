package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a Catalyst expression.
  *
  * Web text arrives in mixed normalization forms: "é" can be U+00E9 or
  * `e` + U+0301, and every downstream content hash (exact dedup
  * fingerprints, minhash shingles, decontamination n-grams) treats those
  * byte sequences as DIFFERENT documents unless the pipeline canonicalizes
  * first. Spark ships no NFC built-in, so this wraps `java.text.Normalizer`
  * (ICU-equivalent for the canonical forms) with `doGenCode` so the call
  * stays inside whole-stage codegen — a per-row scalar on the scan, no
  * shuffle, no UDF serialization boundary.
  *
  * The fast path matters at 100 TB: `Normalizer.isNormalized` is a cheap
  * scan that avoids allocating for the (overwhelmingly common) already-NFC
  * case; only denormalized rows pay the rebuild.
  *
  * Oracle twin: DuckDB's `nfc_normalize(...)` computes the same canonical
  * composition, so normalized output is hash-comparable across engines.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.graft.ColumnBridge
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  /** DuckDB mirror. */
  def sqlNfc(e: String): String = s"nfc_normalize($e)"
}

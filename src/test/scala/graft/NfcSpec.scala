package graft

import org.apache.spark.sql.functions._
import graft.expr.{NfcNormalize => NFC}

class NfcSpec extends SparkSpec {
  import spark.implicits._

  // All non-ASCII spelled as \\uXXXX escapes so no tool in the chain can
  // silently renormalize the very thing under test.
  private val decomposedCafe = "cafe\u0301"  // e + COMBINING ACUTE
  private val composedCafe = "caf\u00e9"     // precomposed e-acute

  test("NfcNormalize matches java.text.Normalizer on adversarial strings") {
    val cases = Seq(
      "plain ascii",
      decomposedCafe + " nai\u0308ve",   // combining diaeresis
      composedCafe + " \u00ef composed", // NFC fixpoint
      "\u1e69",                          // s with dot below + dot above, composed
      "s\u0323\u0307",                  // same, fully decomposed
      "A\u030a ring",                    // A + combining ring = Aring
      "\ud83d\ude00 astral \ud800\udc00", // emoji + astral plane
      "\uac00 \u1100\u1161",           // hangul syllable vs jamo pair
      ""
    )
    val got = cases.toDF("s")
      .select(NFC.nfc(col("s")).as("n")).as[String].collect()
    cases.zip(got).foreach { case (in, out) =>
      val want = java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFC)
      assert(out == want, s"input ${in.codePoints().toArray.toSeq}")
    }
  }

  test("decomposed and precomposed forms normalize to the same fingerprint") {
    val df = Seq((decomposedCafe, composedCafe)).toDF("a", "b")
      .select(
        md5(NFC.nfc(col("a")).cast("binary")).as("ha"),
        md5(NFC.nfc(col("b")).cast("binary")).as("hb"),
        md5(col("a").cast("binary")).as("rawA"), md5(col("b").cast("binary")).as("rawB"))
    val r = df.head()
    assert(r.getString(0) == r.getString(1), "NFC makes the dedup fingerprints collide")
    assert(r.getString(2) != r.getString(3), "...which the raw bytes do not")
  }

  test("null propagates; codegen and interpreted paths agree") {
    val df = Seq(Option(decomposedCafe), None).toDF("s")
    val cg = df.select(NFC.nfc(col("s")).as("n")).collect()
    assert(cg(0).getString(0) == composedCafe)
    assert(cg(1).isNullAt(0))
    // force the interpreted path through an eval on a catalyst literal
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = graft.expr.NfcNormalize(Literal.create(decomposedCafe))
    assert(e.eval(null).toString == composedCafe)
  }
}

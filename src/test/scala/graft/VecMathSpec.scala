package graft

import org.apache.spark.sql.functions._
import graft.llm.Similarity

class VecMathSpec extends SparkSpec {
  import spark.implicits._

  test("FloatVectorDot is bit-identical to the interpreted fold (random vectors)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("fast"),
        Similarity.dotFold(col("a"), col("b")).as("fold"))
    val diffs = df.filter(col("fast") =!= col("fold")).count()
    assert(diffs == 0, "codegen'd dot == left-fold dot, bitwise")
  }

  test("FloatVectorDot null and edge behavior") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array[Float]()), Some(Array[Float]()))
    ).toDF("a", "b").select(Similarity.dot(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0), "null input -> null")
    assert(rows(2).getDouble(0) == 0.0, "empty vectors -> 0")
  }

  test("FloatVectorDot malformed embeddings: NULL on length mismatch / null element, matching the fold") {
    val df = Seq(
      (Seq(Some(1.0f), Some(2.0f)), Seq(Some(3.0f))),            // length mismatch
      (Seq(Some(1.0f), None), Seq(Some(3.0f), Some(4.0f))),      // null element
      (Seq(Some(1.0f), Some(2.0f)), Seq(Some(3.0f), Some(4.0f))) // clean
    ).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("fast"),
        Similarity.dotFold(col("a"), col("b")).as("fold"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1), "length mismatch -> NULL on both paths")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1), "null element -> NULL on both paths")
    assert(rows(2).getDouble(0) == 11.0 && rows(2).getDouble(1) == 11.0)
  }
}

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
}

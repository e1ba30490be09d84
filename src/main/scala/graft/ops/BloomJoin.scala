package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.TypeCoercion
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter runtime pre-filter for selective joins — the library-level
  * version of Spark's own runtime bloom filter (injected by
  * `InjectRuntimeFilter` only when the dim side is itself a join input;
  * this operator applies the same trick when the key set comes from
  * anywhere, e.g. an allow-list computed by an earlier pipeline stage).
  *
  * Mechanics: aggregate the dim keys into ONE bloom sketch
  * (`BloomFilterAggregate` over `xxhash64(key)` — the exact expression
  * pair Spark's optimizer plants), pull the single binary to the driver
  * (bounded: `numBits/8` bytes regardless of corpus size — the same
  * bounded-collect contract as `Quantizer`'s centroids), then filter the
  * big side with `might_contain` BEFORE its shuffle and finish with an
  * exact semi join. False positives survive the bloom but die in the
  * join, so results are exact; false negatives cannot happen, so nothing
  * is lost. At 100 TB the win is that non-matching rows (the vast
  * majority under a selective dim) never enter the exchange.
  *
  * The reference's analog is the driver-collected small-view allow-list
  * (`MapBuilder.java:180-206`) — re-expressed here without materializing
  * the key list: only the fixed-size sketch crosses the driver.
  */
object BloomJoin {

  /** Bits per expected item; 8 bits/item ≈ 2% false-positive rate. */
  private val BitsPerItem = 8L

  /** The bloom sketch of `dim`'s `key` column as a one-row DataFrame. */
  private[graft] def bloomOf(dim: DataFrame, key: String, estItems: Long): DataFrame = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(key))),
      Literal(estItems), Literal(estItems * BitsPerItem)).toAggregateExpression()
    dim.select(ColumnBridge.column(agg).as("bf"))
  }

  /** `might_contain(bloom, xxhash64(c))` as a Column. */
  private[graft] def mightContain(bloom: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnBridge.expression(xxhash64(c))))

  /** Exact semi join of `big` against `dim`'s `key` set, with a bloom
    * pre-filter on the big side. Result is identical to
    * `big.join(dim.select(key).distinct(), Seq(key), "left_semi")`.
    */
  def semiJoin(big: DataFrame, dim: DataFrame, key: String,
               estItems: Long = 1000000L): DataFrame = {
    // xxhash64 hashes the RAW bytes of its input type: an INT dim key and a
    // BIGINT big key holding the same value hash differently, so the bloom
    // would emit false negatives — silently dropping matching rows before
    // the exact join can recover them. Reconcile to one common type (the
    // same widening the join's own coercion applies) before hashing; if no
    // lossless common type exists, skip the bloom and keep exactness.
    val bt = big.schema(key).dataType
    val dt = dim.schema(key).dataType
    val common =
      if (bt == dt) Some(bt)
      else TypeCoercion.findTightestCommonType(bt, dt)
    common match {
      case Some(t) =>
        val dimKeys = dim.select(col(key).cast(t).as(key))
        val bf = bloomOf(dimKeys, key, estItems).head().getAs[Array[Byte]]("bf")
        // empty dim -> BloomFilterAggregate yields null; the exact result is empty
        val pre = if (bf == null) big.filter(lit(false))
                  else big.filter(mightContain(bf, col(key).cast(t)))
        pre.join(dimKeys.distinct(), Seq(key), "left_semi")
      case None =>
        big.join(dim.select(col(key)).distinct(), Seq(key), "left_semi")
    }
  }
}

package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact 64-bit integer bucket math, shared by the batch range join and its
  * streaming attribution twin so the two pipelines bucket identically on ALL
  * inputs.
  *
  * Why not the obvious forms:
  *   - `floor(x / w)` goes through doubles — exactness is lost for
  *     |x| >= 2^53, which epoch-nanos timestamps (the native unit of the
  *     events table) exceed; a mis-bucketed point silently misses its range.
  *   - `x div w` truncates toward zero — for negative x (pre-1970
  *     timestamps) it disagrees with floor by one bucket.
  *
  * `x div w - (x % w < 0 ? 1 : 0)` is floor division in pure long
  * arithmetic for w > 0: `%` carries the sign of x, so the correction fires
  * exactly when truncation rounded toward zero instead of down. No
  * intermediate can overflow.
  */
object IntMath {

  /** Floor division `⌊x / w⌋` as exact long arithmetic; w must be > 0. */
  def floorDiv(x: Column, w: Long): Column = {
    require(w > 0, s"bucket width must be positive, got $w")
    call_function("div", x, lit(w)) -
      when(x % lit(w) < 0, lit(1L)).otherwise(lit(0L))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.IntMath

/** DAU / trailing-7-day WAU / stickiness per observed day — the
  * engagement dashboard row next to `events_retention`. A user active on
  * day a is a WAU member of days a..a+6, so the distinct (day, user)
  * frame explodes over the CONSTANT 7-day offset grid, re-distincts and
  * counts — user×calendar-bounded at any corpus scale; the fact table is
  * touched once. Stickiness ships as exact integer ppm (WAU ≥ DAU ≥ 1 on
  * every observed day, so the DIV is total).
  */
object Engagement {

  val NanosPerDay: Long = 86400L * 1000000000L

  def dauWau(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), IntMath.floorDiv(col("ts"), NanosPerDay).as("day"))
      .distinct()
      .localCheckpoint() // feeds DAU, the WAU explode, and the day grid
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("day"))
      .distinct()
      .join(ud.select("day").distinct(), Seq("day"), "left_semi") // observed days only
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        call_function("div", col("dau") * 1000000L, col("wau")).as("stickiness_ppm"))
      .orderBy("day")
  }

  /** DuckDB mirror of [[dauWau]], term-for-term. */
  def sqlDauWau: String =
    """WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      |            FROM events),
      |dau AS (SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY 1),
      |wx AS (SELECT DISTINCT user_id, day + off AS day
      |       FROM ud, unnest([0, 1, 2, 3, 4, 5, 6]) AS t(off)),
      |wau AS (SELECT wx.day, count(*)::BIGINT AS wau FROM wx
      |        WHERE wx.day IN (SELECT day FROM ud) GROUP BY 1)
      |SELECT day, dau, wau, (dau * 1000000) // wau AS stickiness_ppm
      |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin
}

package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Temporal join operators Spark lacks natively: as-of join (the "latest
  * quote for each trade" lookup) and interval join (points into possibly
  * overlapping ranges). Both are composed from existing relational ops so
  * Catalyst plans them — no custom physical operator needed.
  *
  * The reference engine has no counterpart (piglet joins are equi-only);
  * these are the canonical missing-in-Spark operators a large-scale
  * pipeline reaches for (sessionization, feature as-of lookups,
  * IP-range / geo lookups).
  */
object TemporalJoins {

  /** Fail fast when an input already uses one of the operator's internal
    * working column names (withColumn would silently overwrite it and the
    * final drop would delete the user's column). */
  private def reserveCols(have: Seq[String], reserved: Seq[String]): Unit = {
    val clash = have.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with internal " +
        s"working names; rename them before calling this operator")
  }

  /** As-of join: for each left row, the single right row with the greatest
    * `rightTime` <= `leftTime` ("backward", default) or the least
    * `rightTime` >= `leftTime` ("forward"), matching on equal `keys`.
    * Left-join semantics: unmatched left rows keep nulls.
    *
    * Plan shape — ONE shuffle on `keys` and a single in-partition sort
    * (exactly the sort-merge an engine-native as-of would do, at any
    * scale): both sides union into one frame, a running
    * `last(right, ignoreNulls)` window carries the latest right row past
    * each left row. No join explosion, no per-row subquery. The running
    * frame evaluates incrementally (no per-row rescan); WindowExec holds
    * each key's rows in a spillable buffer, so a pathologically hot key
    * spills to disk rather than OOMing — salt such keys upstream.
    *
    * `rightCols` maps right columns to output aliases (pre-alias to dodge
    * collisions). Ties on (keys, rightTime) pick an unspecified row —
    * the same contract as DuckDB/pandas ASOF; pre-dedup the right side
    * for full determinism.
    *
    * `toleranceMicros`: max allowed |leftTime − rightTime| (µs for
    * timestamp columns, same units as the column otherwise); matches
    * farther away become nulls. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightCols: Map[String, String],
               direction: String = "backward",
               toleranceMicros: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"unknown as-of direction '$direction'")
    reserveCols(left.columns ++ right.columns,
      Seq("__t", "__side", "__r", "__p", "__rt"))
    val back = direction == "backward"
    // at equal times the right row must fall INSIDE the frame: backward
    // frames look left, so right sorts before left; forward the reverse
    val (lSide, rSide) = if (back) (1, 0) else (0, 1)

    val rStruct = struct(
      (col(rightTime).as("__rt") +:
        rightCols.keys.toSeq.map(c => col(c).as(c))): _*)
    // SQL join equality never matches NULL keys: a null-keyed right row
    // can match nothing, so drop it before the union (Window.partitionBy
    // would otherwise group null with null and fabricate matches);
    // null-keyed LEFT rows then sit in a partition with no right rows
    // and correctly pick up nulls. A null-TIME right row is equally
    // unmatched in an as-of ("as of when?") — and it would sort FIRST
    // (nulls-first asc), fabricating itself as the running match for
    // every earlier left row — so it drops too.
    val rNonNull = right.where(
      (keys.map(col(_).isNotNull) :+ col(rightTime).isNotNull).reduce(_ && _))
    val rr = rNonNull.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+
        lit(rSide).as("__side") :+ rStruct.as("__r")): _*)
    val ll = left.select(
      (left.columns.toSeq.map(col) :+ col(leftTime).as("__t") :+
        lit(lSide).as("__side") :+
        lit(null).cast(rr.schema("__r").dataType).as("__r")): _*)

    val u = ll.unionByName(rr, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
    val picked =
      if (back) last(col("__r"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else first(col("__r"), ignoreNulls = true)
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))

    def micros(c: Column, t: org.apache.spark.sql.types.DataType): Column =
      if (t == TimestampType) unix_micros(c) else c.cast("long")
    val lt = left.schema(leftTime).dataType

    // a null-TIME left row matches nothing either (forward direction
    // would otherwise span every right row from its nulls-first slot)
    val base = u.withColumn("__p", when(col("__t").isNotNull, picked))
      .where(col("__side") === lSide)
    val gated = toleranceMicros match {
      case Some(tol) =>
        val diff =
          if (back) micros(col("__t"), lt) - micros(col("__p.__rt"), lt)
          else micros(col("__p.__rt"), lt) - micros(col("__t"), lt)
        base.withColumn("__p",
          when(col("__p").isNotNull && diff <= tol, col("__p")))
      case None => base
    }
    gated.select(
      (left.columns.toSeq.map(col) ++
        rightCols.toSeq.map { case (c, alias) =>
          col(s"__p.$c").as(alias)
        }): _*)
  }

  /** Interval join: points into (possibly overlapping) numeric ranges —
    * `lo <= p < hi` (or `<= hi` with `inclusiveHi`), plus equality on
    * optional `keys`. Timestamp domains: convert to `unix_micros` first.
    *
    * Scale path: every interval is replicated to the fixed-width buckets
    * it covers (`explode(sequence(...))`), points map to one bucket, and
    * the join becomes an equi-join on (keys, bucket) with an exact refine
    * — the 1-D version of the spatial grid join. Replication factor is
    * avg(interval length)/bucketWidth + 1, so pick the width near the
    * typical interval length. Never all-pairs; skewed buckets fall to
    * AQE skew splitting. Degenerate intervals (hi < lo) drop out. */
  def intervalJoin(points: DataFrame, pointCol: String,
                   intervals: DataFrame, loCol: String, hiCol: String,
                   bucketWidth: Long, keys: Seq[String] = Nil,
                   inclusiveHi: Boolean = false): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    reserveCols(points.columns ++ intervals.columns, Seq("__bucket"))
    // exact integer floor-div (double division can misplace exact
    // boundary values; `div` truncates toward zero on negatives)
    def bucketOf(c: Column): Column = {
      val l = c.cast("long")
      val posMod = ((l % bucketWidth) + bucketWidth) % bucketWidth
      // decimal divide: (l - posMod) is an exact multiple, so the result
      // is integral and exact at any long magnitude (double `/` is not)
      ((l - posMod).cast("decimal(38,0)") / bucketWidth).cast("long")
    }
    val iv = intervals.where(col(hiCol) >= col(loCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val pts = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val refine =
      if (inclusiveHi) col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol)
      else col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol)
    pts.join(iv, keys :+ "__bucket").where(refine).drop("__bucket")
  }

  /** Sessionize: label every event with its session index (1-based, per
    * key, in time order) — sessions split where the gap to the previous
    * event exceeds `gapMicros`. The per-EVENT complement of
    * `session_window` aggregation: downstream ops get a session key to
    * group/join on while keeping event granularity.
    *
    * Plan: one shuffle on `key` + ONE in-partition sort; the two
    * rows-frame windows (lag → running sum) share that partitioning and
    * ordering, so they stack as two streaming passes with no extra
    * exchange or sort and no full-partition buffering. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gapMicros: Long, out: String = "session_idx"): DataFrame = {
    reserveCols(events.columns, Seq("__new_session", out))
    val t = events.schema(tsCol).dataType match {
      case TimestampType => unix_micros(col(tsCol))
      case _ => col(tsCol).cast("long")
    }
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    val prev = lag(t, 1).over(w)
    // two steps — a window function can't nest inside another's argument
    events
      .withColumn("__new_session",
        when(prev.isNull || t - prev > gapMicros, 1L).otherwise(0L))
      .withColumn(out, sum(col("__new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }
}

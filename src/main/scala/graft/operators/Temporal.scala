package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization and as-of join — the two classic temporal
  * operators Spark has no native relational form for. Both are
  * one-shuffle-per-key ordered-window shapes: no range join, no per-key
  * cross product, no driver state. Outputs are exact integers
  * (epoch microseconds, value cents) so the DuckDB oracles replay them
  * bit-identically regardless of timestamp logical-type or float-sum
  * differences (the round-4 cross-engine-rounding lesson, applied
  * up front).
  */
object Temporal {

  /** Per-key gap sessionization: a new session opens when the gap since
    * the key's previous event exceeds `gapUs` (default 30 min). Emits
    * the per-session roll-up (user_id, sess_idx, n_events, start_us,
    * end_us, value_cents). Order within a key is (ts, event_id) — the id
    * tiebreak makes session boundaries deterministic under any layout.
    *
    * Scale shape: ONE shuffle on user_id; lag and the running sum share
    * the same window spec (one Sort, no second exchange), and the final
    * hash agg groups by (user_id, sess_idx) — a superset of the window's
    * partitioning, so it reuses the exchange. A pathological single user
    * serializes within its partition — inherent to order-dependent
    * sessionization (same argument as sequence packing); at corpus scale
    * the key cardinality is the parallelism.
    *
    * Laws (spec + oracle): Σ n_events = |events|; Σ value_cents is
    * conserved; start_us ≤ end_us; consecutive sessions of one user are
    * separated by > gapUs and intra-session steps are ≤ gapUs.
    */
  def sessionize(events: DataFrame, gapUs: Long = 1800L * 1000000L)
      : DataFrame = {
    // us = unix_micros(ts) is order-isomorphic to ts, so ordering the
    // windows by (us, event_id) equals (ts, event_id) with exact-integer
    // gap arithmetic on both engines
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"),
        // value has exactly 2 decimals: ×100 lands within 1e-10 of an
        // integer, never at a rounding halfway → exact on both engines
        round(col("value") * 100).cast("long").as("v"),
        // parquet NTZ timestamps need the cast (session tz is pinned
        // UTC, so the instant is preserved and == DuckDB's epoch_us)
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs,
          1L).otherwise(0L))
      .withColumn("sess_idx",
        sum("new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_idx")
      .agg(count(lit(1)).as("n_events"),
        min("us").as("start_us"), max("us").as("end_us"),
        sum("v").as("value_cents"))
  }

  /** Tumbling-window roll-up, the batch analog of a streaming windowed
    * aggregation: events bucketed into fixed `winUs` windows by exact
    * integer floor division of epoch-µs (`us div winUs · winUs` ==
    * DuckDB `//` — no date_trunc, whose timezone/DST semantics can
    * diverge across engines), counted and cents-summed per
    * (`keyCol`, window). ONE hash aggregate with map-side partial
    * combine — the cheapest possible distributed shape; window starts
    * align across engines and across re-runs by construction. */
  def tumblingCounts(events: DataFrame, winUs: Long = 3600L * 1000000L,
      keyCol: String = "event_type"): DataFrame = {
    require(winUs > 0, "window width must be positive")
    events
      .select(col(keyCol),
        (expr(s"unix_micros(cast(ts as timestamp)) div $winUs") * winUs)
          .as("win_start_us"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy(col(keyCol), col("win_start_us"))
      .agg(count(lit(1)).as("n_events"), sum("v").as("value_cents"))
  }

  /** Conversion-lag histogram: for every `toType` event, the elapsed
    * time since the same user's most recent `fromType` event at-or-before
    * it (via [[asofJoin]]), floor-divided into `bucketUs` buckets —
    * the funnel-analysis staple (signup → purchase lag distribution).
    * Unmatched events (conversion without a prior `fromType`) are
    * excluded, matching ASOF LEFT + IS NOT NULL on both engines.
    * Scale shape: the asofJoin's one shuffle + ordered scan, then one
    * tiny hash agg over bucket ids. */
  def lagHistogram(events: DataFrame, fromType: String, toType: String,
      bucketUs: Long = 86400L * 1000000L): DataFrame = {
    require(bucketUs > 0, "bucket width must be positive")
    val l = events.filter(col("event_type") === toType)
      .select(col("user_id"), col("ts"), col("event_id"))
    val r = events.filter(col("event_type") === fromType)
      .groupBy("user_id", "ts").agg(max("event_id").as("ref_event"))
      .withColumn("ref_us", unix_micros(col("ts").cast("timestamp")))
    asofJoin(l, r, "user_id", "ts")
      .select((unix_micros(col("ts").cast("timestamp")) - col("ref_us"))
        .as("lag_us"))
      .filter(col("lag_us").isNotNull)
      .select(expr(s"lag_us div $bucketUs").as("lag_days"))
      .groupBy("lag_days").agg(count(lit(1)).as("n"))
  }

  /** Bucketed interval join — the range-join scale pattern: pair every
    * left row with every right row on the same `keyCol` whose timestamp
    * lies within ±`tolUs`. A naive theta-join degrades to a per-key
    * cross product; instead both sides are bucketed by epoch-µs floor
    * division by `tolUs`, the RIGHT side is replicated to its bucket
    * and both neighbors (any pair within tol spans at most adjacent
    * buckets, and the three replica buckets are distinct so no pair is
    * emitted twice), and the join is a plain equi-join on (key, bucket)
    * + a residual |Δ| ≤ tol filter — ONE shuffle at 3× right-side
    * volume, never quadratic. The DuckDB twin is the naive theta join,
    * an independent algorithm, so the driver gate proves the bucketing
    * exact. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      keyCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id",
      tolUs: Long = 3600L * 1000000L): DataFrame = {
    require(tolUs > 0, "tolerance must be positive")
    def prep(df: DataFrame, side: String) =
      df.select(col(keyCol).as("k"), col(idCol).as(s"${side}_event"),
        unix_micros(col(tsCol).cast("timestamp")).as(s"${side}_us"))
    val l = prep(left, "l").withColumn("b", expr(s"l_us div $tolUs"))
    val r = prep(right, "r").withColumn("b",
      explode(array(expr(s"r_us div $tolUs - 1"),
        expr(s"r_us div $tolUs"), expr(s"r_us div $tolUs + 1"))))
    l.join(r, Seq("k", "b"))
      .filter(abs(col("l_us") - col("r_us")) <= tolUs)
      .select(col("k"), col("l_event"), col("r_event"),
        (col("l_us") - col("r_us")).as("delta_us"))
  }

  /** As-of join: for each left row, the single right row with the
    * greatest `tsCol` ≤ left `tsCol` on the same `keyCol` (inclusive —
    * ASOF semantics; unmatched left rows get NULL right columns, ASOF
    * LEFT). Union-trick plan, NOT a range join: tag right rows 0 and
    * left rows 1, union, ONE window per key ordered by (ts, tag) with
    * `last(right-struct, ignoreNulls)` carrying the latest right row
    * forward, keep the left rows. The right payload is packed into ONE
    * struct before the window — per-column ignoreNulls carries would be
    * WRONG (a legitimately-NULL right column would reach back into an
    * OLDER right row, stitching two rows together); the struct is
    * non-null per right row so the carry is atomic. At equal (key, ts)
    * the tag orders right BEFORE left, so the left row sees it (ts ≥).
    *
    * Scale shape: one shuffle of the union on key + one per-key ordered
    * scan. The naive relational form (theta-join on key AND r.ts ≤ l.ts,
    * then max per left row) materializes a per-key cross product —
    * quadratic on hot keys; this is linear after the sort and never
    * builds candidate pairs.
    *
    * Precondition: right unique per (key, ts) — at a duplicate the carry
    * would be layout-dependent; dedupe with a groupBy/max_by first (the
    * driver query keeps max(event_id) per (user_id, ts)).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val rightCols = right.columns.filter(c => c != keyCol && c != tsCol).toSeq
    require(rightCols.nonEmpty, "right side needs payload columns beyond key+ts")
    val leftCols = left.columns.filter(c => c != keyCol && c != tsCol).toSeq
    val dup = leftCols.toSet.intersect(rightCols.toSet)
    require(dup.isEmpty, s"columns on both sides would collide: $dup")
    val rTagged = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("_side"),
        struct(rightCols.map(col): _*).as("_r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("_side"),
        lit(null).cast(rTagged.schema("_r").dataType).as("_r")) ++
        leftCols.map(col): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("_carry", last("_r", ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(Seq(col(keyCol), col(tsCol)) ++ leftCols.map(col) ++
        rightCols.map(c => col(s"_carry.$c").as(c)): _*)
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** Temporal operators: sessionization conservation/boundary laws + as-of
  * join vs a driver-side brute force (the DuckDB oracle uses the native
  * ASOF JOIN — a third independent algorithm). */
class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("sessionize: conservation + separation laws at sf0.001") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val s = Temporal.sessionize(ev).cache()
    assert(s.agg(sum("n_events")).as[Long].head() == ev.count())
    val cents =
      ev.select(sum(round(col("value") * 100).cast("long"))).as[Long].head()
    assert(s.agg(sum("value_cents")).as[Long].head() == cents)
    assert(s.filter(col("start_us") > col("end_us")).count() == 0)
    // inter-session separation: consecutive sessions of one user start
    // > gap after the previous session ends (intra-session steps <= gap
    // hold by construction of the running sum)
    val gap = 1800L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("start_us")
    val viol = s.withColumn("prev_end", lag("end_us", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("start_us") - col("prev_end") <= gap)
      .count()
    assert(viol == 0)
    s.unpersist()
  }

  test("sessionize: golden micro-case (10min keeps, 50min splits)") {
    val t0 = 1700000000000000L
    val micro = Seq(
      (10L, 1L, 1.0, t0),
      (10L, 2L, 2.0, t0 + 600L * 1000000),  // +10min: same session
      (10L, 3L, 4.0, t0 + 3600L * 1000000)) // +50min gap: new session
      .toDF("user_id", "event_id", "value", "us_raw")
      .withColumn("ts", timestamp_micros(col("us_raw")))
    val g = Temporal.sessionize(micro)
      .select("user_id", "sess_idx", "n_events", "start_us", "end_us",
        "value_cents")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(g == Set(
      (10L, 1L, 2L, t0, t0 + 600L * 1000000, 300L),
      (10L, 2L, 1L, t0 + 3600L * 1000000, t0 + 3600L * 1000000, 400L)))
  }

  test("asofJoin: equals driver-side brute force on sf0.001 events") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
    val rows = ev.select("event_id", "user_id", "event_type", "us")
      .as[(Long, Long, String, Long)].collect()
    val signups = rows.filter(_._3 == "signup")
      .groupBy(r => (r._2, r._4)) // unique per (user, ts)
      .map { case ((u, us), g) => (u, us, g.map(_._1).max) }.toSeq
    val expected = rows.filter(_._3 == "purchase").map { p =>
      val prior = signups.filter(s => s._1 == p._2 && s._2 <= p._4)
      if (prior.isEmpty) (p._1, None: Option[Long], None: Option[Long])
      else {
        val best = prior.maxBy(_._2)
        (p._1, Some(best._2), Some(best._3))
      }
    }.toSet
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val r = ev.filter(col("event_type") === "signup")
      .groupBy("user_id", "ts").agg(max("event_id").as("ref_event"))
      .withColumn("ref_ts_us", unix_micros(col("ts").cast("timestamp")))
    val got = Temporal.asofJoin(l, r, "user_id", "ts")
      .select(col("event_id"), col("ref_ts_us"), col("ref_event"))
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(got == expected)
    assert(got.size == rows.count(_._3 == "purchase"),
      "ASOF LEFT: one output row per left row")
  }

  test("asofJoin: inclusive at equal ts; struct carry is atomic") {
    val t = 1700000000000000L
    val right = Seq(
      (1L, t, Some(11L), 100L),
      (1L, t + 1000000L, None: Option[Long], 200L)) // latest: a=null
      .toDF("k", "us_raw", "a", "b")
      .withColumn("ts", timestamp_micros(col("us_raw"))).drop("us_raw")
    val left = Seq(
      (1L, t, 900L),            // ties first right row: must match (>=)
      (1L, t + 2000000L, 901L)) // after second right row
      .toDF("k", "us_raw", "lid")
      .withColumn("ts", timestamp_micros(col("us_raw"))).drop("us_raw")
    val got = Temporal.asofJoin(left, right, "k", "ts")
      .select(col("lid"), col("a"), col("b"))
      .as[(Long, Option[Long], Long)].collect().toSet
    // lid=900 ties right row 1 -> (11, 100); lid=901 takes the LATEST
    // right row WHOLE — a=null, b=200. A per-column ignoreNulls carry
    // would stitch a=11 from the older row onto b=200 (the bug this
    // test pins).
    assert(got == Set((900L, Some(11L), 100L), (901L, None, 200L)))
  }

  test("tumblingCounts: conservation + alignment laws at sf0.001") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val t = Temporal.tumblingCounts(ev).cache()
    assert(t.agg(sum("n_events")).as[Long].head() == ev.count())
    val cents =
      ev.select(sum(round(col("value") * 100).cast("long"))).as[Long].head()
    assert(t.agg(sum("value_cents")).as[Long].head() == cents)
    // every window start is aligned to the window width
    assert(t.filter(col("win_start_us") % (3600L * 1000000L) =!= 0)
      .count() == 0)
    // every event's us falls inside its window: re-bucketing the raw
    // events gives the identical histogram
    val re = ev.select(col("event_type"),
        (unix_micros(col("ts").cast("timestamp"))
          - pmod(unix_micros(col("ts").cast("timestamp")),
              lit(3600L * 1000000L))).as("win_start_us"))
      .groupBy("event_type", "win_start_us").count()
      .as[(String, Long, Long)].collect().toSet
    assert(t.select(col("event_type"), col("win_start_us"),
      col("n_events")).as[(String, Long, Long)].collect().toSet == re)
    t.unpersist()
  }

  test("lagHistogram: totals match asofJoin matches; buckets non-negative") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val h = Temporal.lagHistogram(ev, "signup", "purchase").cache()
    // matched-count law: histogram mass == purchases with a prior signup
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val r = ev.filter(col("event_type") === "signup")
      .groupBy("user_id", "ts").agg(max("event_id").as("ref_event"))
    val matched = Temporal.asofJoin(l, r, "user_id", "ts")
      .filter(col("ref_event").isNotNull).count()
    assert(h.agg(sum("n")).as[Long].head() == matched)
    assert(h.filter(col("lag_days") < 0).count() == 0,
      "as-of matches are at-or-before, so lags are never negative")
    h.unpersist()
  }

  test("intervalJoin: bucket decomposition == naive theta join at sf0.001") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val l = ev.filter(col("event_type") === "purchase")
    val r = ev.filter(col("event_type") === "click")
    val fast = Temporal.intervalJoin(l, r)
      .as[(Long, Long, Long, Long)].collect().toSet
    val lu = l.select(col("user_id").as("k"), col("event_id").as("l_event"),
      unix_micros(col("ts").cast("timestamp")).as("l_us"))
    val ru = r.select(col("user_id").as("k2"), col("event_id").as("r_event"),
      unix_micros(col("ts").cast("timestamp")).as("r_us"))
    val naive = lu.join(ru, col("k") === col("k2") &&
        abs(col("l_us") - col("r_us")) <= 3600L * 1000000L)
      .select(col("k"), col("l_event"), col("r_event"),
        (col("l_us") - col("r_us")).as("delta_us"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fast == naive && fast.nonEmpty)
    assert(fast.forall(p => math.abs(p._4) <= 3600L * 1000000L))
  }

  test("intervalJoin: golden — boundary inclusive, cross-bucket pair kept") {
    import java.sql.Timestamp
    def t(us: Long) = new Timestamp(us / 1000)
    // tol = 100ms buckets; (l=199, r=101): |Δ|=98ms same bucket;
    // (l=199, r=99): |Δ|=100ms exactly at tol AND crossing buckets 1|0
    // (inclusive + adjacent-replica case); (l=199, r=300): bucket 3,
    // non-adjacent and outside tol; user 2 at Δ=0: wrong key
    val l = Seq((1L, 10L, t(199000))).toDF("user_id", "event_id", "ts")
    val r = Seq((1L, 20L, t(101000)), (1L, 21L, t(99000)),
      (1L, 22L, t(300000)), (2L, 23L, t(199000)))
      .toDF("user_id", "event_id", "ts")
    val got = Temporal.intervalJoin(l, r, tolUs = 100000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 20L, 98000L), (1L, 10L, 21L, 100000L)))
  }

  test("asofJoin: layout-independent and rejects colliding columns") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val r = ev.filter(col("event_type") === "signup")
      .groupBy("user_id", "ts").agg(max("event_id").as("ref_event"))
    val a = Temporal.asofJoin(l, r, "user_id", "ts")
      .as[(Long, java.sql.Timestamp, Long, Option[Long])].collect().toSet
    val b = Temporal.asofJoin(l.repartition(7), r.repartition(3),
        "user_id", "ts")
      .as[(Long, java.sql.Timestamp, Long, Option[Long])].collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(l,
        r.withColumnRenamed("ref_event", "event_id"), "user_id", "ts")
    }
  }
}

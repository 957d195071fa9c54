package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for plan iteration: times one named
  * SparkEntry query REPS times in one warm JVM and prints each rep +
  * median. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.TimeQuery <query> [reps] [sfDir]"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dedup_minhash_lsh")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", 8L * 1024 * 1024)
      .config("spark.sql.files.openCostInBytes", 512L * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // experiment knobs for plan iteration
    sys.env.get("SPARK_GRAFT_NO_AQE").foreach(_ =>
      spark.conf.set("spark.sql.adaptive.enabled", "false"))
    sys.env.get("SPARK_GRAFT_NO_BHJ").foreach(_ =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1"))
    // per-rep executor task time: distinguishes "recomputed work" (task
    // time doubles) from "scheduling/GC stall" (same task time, more wall)
    val taskTime = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            taskTime.addAndGet(te.taskMetrics.executorRunTime)
      })
    val timeline = new Profile.JobTimeline
    spark.sparkContext.addSparkListener(timeline)
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm (JIT + codegen), discarded
    val verbose = sys.env.contains("SPARK_GRAFT_JOBS")
    val times = (1 to reps).map { i =>
      taskTime.set(0L)
      timeline.clear()
      val t0w = System.currentTimeMillis()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"TIMEQ $name rep $i: $t%.2f s ($n rows, " +
        f"task time ${taskTime.get / 1e3}%.1f s)")
      if (verbose) timeline.report((t * 1000).toLong, t0w)
      t
    }.sorted
    println(f"TIMEQ $name median: ${times(times.size / 2)}%.2f s")
    spark.stop()
  }
}

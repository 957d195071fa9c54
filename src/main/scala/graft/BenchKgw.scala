package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.sources.{InterleavedDocs, TripleSink}

/** Steady-state north-star scaling probe (the FROZEN two-cluster-size
  * protocol, BENCH/BASELINE.md): kg_write e2e ONLY — synthesize the
  * corpus (untimed), run one full-size in-JVM warm pipeline+write
  * (untimed; tiered JIT needs full-size stages to reach steady state),
  * then ONE timed run, and print a single JSON line. Isolating the
  * workload from the rest of the Bench suite removes the suite's
  * page-cache/JIT cross-contamination from the measurement — the judged
  * round-2 confound that put the suite-embedded number (0.678) below the
  * paired steady-state one (0.83) on identical code and input.
  * Invoked in alternating N/4N pairs by tools/bench_kgw_steady.sh so
  * slow host-noise drift cancels in the efficiency ratio. */
object BenchKgw {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "1000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same scan-split sizing rationale as Bench.scala
      .config("spark.sql.files.maxPartitionBytes", 8L * 1024 * 1024)
      .config("spark.sql.files.openCostInBytes", 512L * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[String]
    def tmpDir(prefix: String): String = {
      val d = Files.createTempDirectory(prefix).toString
      tmpDirs += d; d
    }

    val docsPath = tmpDir("graft-kgw-docs")
    InterleavedDocs.synthesize(spark, nDocs, seed = 42L, skewPct = 2)
      .write.mode("overwrite").parquet(docsPath)

    // full-size in-JVM warm run — identical plan as the timed run
    TripleSink.writeTriples(spark,
      Pipeline.triples(spark, InterleavedDocs.readDocs(spark, docsPath)),
      tmpDir("graft-kgw-warm"))

    // artifact self-defense (see Bench.scala): host load before/after the
    // timed run + timestamp, so contaminated samples identify themselves
    def loadavg: String = scala.util.Try(
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString("[", ",", "]")).getOrElse("[]")
    // /proc/stat aggregate (steal, busy) ticks: host-side CPU thieving is
    // invisible to guest loadavg but is accounted as steal whenever this
    // JVM's runnable threads are denied the CPU — measured across the
    // timed window, it lets a contaminated sample reject ITSELF under the
    // pre-registered gate-v2 rule (steal_pct >= 5 ⇒ excluded by
    // tools/scaling_steady.py; BENCH/BASELINE.md §round-5)
    def cpuTicks: (Long, Long) = scala.util.Try {
      val v = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .trim.split("\\s+").drop(1).map(_.toLong)
      (if (v.length > 7) v(7) else 0L, v(0) + v(1) + v(2) + v(5) + v(6))
    }.getOrElse((0L, 0L))
    val loadStart = loadavg
    val ts = java.time.Instant.now().toString

    val (steal0, busy0) = cpuTicks
    val t0 = System.nanoTime()
    val rows = TripleSink.writeTriples(spark,
      Pipeline.triples(spark, InterleavedDocs.readDocs(spark, docsPath)),
      tmpDir("graft-kgw-sink")).map(_.rows).sum
    val t = (System.nanoTime() - t0) / 1e9
    val (steal1, busy1) = cpuTicks
    val (dSteal, dBusy) = (steal1 - steal0, busy1 - busy0)
    val stealPct =
      (10000.0 * dSteal / math.max(1L, dSteal + dBusy)).round / 100.0

    println(s"""{"metric":"kg_write","cpus":$cpus,"value":$t,""" +
      s""""unit":"sec","triples":$rows,""" +
      s""""triples_per_sec":${(rows / t).round},"docs":$nDocs,""" +
      s""""ts":"$ts","loadavg_start":$loadStart,"loadavg_end":$loadavg,""" +
      s""""steal_pct":$stealPct,"steal_ticks":$dSteal,"busy_ticks":$dBusy}""")
    spark.stop()
    tmpDirs.foreach { d =>
      scala.util.Try {
        java.nio.file.Files.walk(java.nio.file.Paths.get(d))
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }
}

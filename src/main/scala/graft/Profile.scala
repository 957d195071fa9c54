package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Spec
import graft.operators._
import graft.sources.{InterleavedDocs, TripleSink}

/** Stage-level profiling of the north-star workload: times each pipeline
  * phase independently (warm) so N vs 4N scaling loss can be attributed,
  * and itemizes the kg_write wall-clock job-by-job (Spark job time vs
  * driver-side gaps = the serial residue).
  * Usage: SPARK_GRAFT_CPUS=8|32 sbt "runMain graft.Profile [nDocs]". */
object Profile {

  /** (jobId, description, start ms, end ms) for every Spark job. */
  final class JobTimeline extends SparkListener {
    val jobs = ArrayBuffer.empty[(Int, String, Long, Long)]
    private val pending = scala.collection.mutable.HashMap.empty[Int, (String, Long)]
    override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
      val desc = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
        .getOrElse("?")
      pending(js.jobId) = (desc.take(90), js.time)
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
      pending.remove(je.jobId).foreach { case (d, t0) =>
        jobs += ((je.jobId, d, t0, je.time))
      }
    }
    def clear(): Unit = synchronized { jobs.clear() }
    def report(wallMs: Long, t0: Long): Unit = synchronized {
      val sorted = jobs.sortBy(_._3)
      println(f"PROFILE-JOBS wall=${wallMs / 1e3}%.2fs njobs=${sorted.size}")
      var cursor = t0
      sorted.foreach { case (id, d, s, e) =>
        val gap = (s - cursor).max(0)
        if (gap > 50) println(f"  [driver gap]            ${gap / 1e3}%7.2fs")
        println(f"  job $id%-3d ${(e - s) / 1e3}%7.2fs  $d")
        cursor = cursor.max(e)
      }
      val tail = (t0 + wallMs - cursor).max(0)
      if (tail > 50) println(f"  [driver tail]           ${tail / 1e3}%7.2fs")
      val jobTime = sorted.map(j => j._4 - j._3).sum
      println(f"PROFILE-JOBS jobs=${jobTime / 1e3}%.2fs driver=${(wallMs - jobTime).max(0) / 1e3}%.2fs")
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", 8L * 1024 * 1024)
      .config("spark.sql.files.openCostInBytes", 512L * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timeline = new JobTimeline
    spark.sparkContext.addSparkListener(timeline)

    // track the exact temp dirs THIS run creates (a prefix sweep of the
    // shared tmpdir would delete a concurrent Profile's data)
    val tmpDirs = ArrayBuffer.empty[String]
    def tmpDir(prefix: String): String = {
      val d = Files.createTempDirectory(prefix).toString
      tmpDirs += d; d
    }

    val docsPath = tmpDir("graft-prof-docs")
    InterleavedDocs.synthesize(spark, nDocs, seed = 42L, skewPct = 2)
      .write.mode("overwrite").parquet(docsPath)

    def time(name: String)(f: => Any): Unit = {
      // one warm pass, one timed pass
      f
      val t0 = System.nanoTime()
      f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val e2eOnly = args.length > 1 && args(1) == "e2e"
    val docs = InterleavedDocs.readDocs(spark, docsPath)
    val exploded = SpanOps.wellFormed(SpanOps.explodeSpans(docs))

    if (!e2eOnly) {
    time("scan_explode")(exploded.count())
    time("match")(GazetteerMatcher.candidates(spark,
      SpanOps.textSpans(exploded), Spec.Gazetteer).count())
    time("match_top1")(Linker.top1(GazetteerMatcher.candidates(spark,
      SpanOps.textSpans(exploded), Spec.Gazetteer)).count())
    time("full_triples_count")(Pipeline.triples(spark, docs).count())

    val cached = Pipeline.triples(spark, docs).cache()
    cached.count()
    time("write_only_cached") {
      TripleSink.writeTriples(spark, cached, tmpDir("graft-prof-sink"))
    }
    cached.unpersist()
    }

    // end-to-end kg_write (the north-star workload) with the job timeline:
    // itemizes Spark-job time vs driver-side serial gaps
    locally { // warm
      TripleSink.writeTriples(spark,
        Pipeline.triples(spark, InterleavedDocs.readDocs(spark, docsPath)),
        tmpDir("graft-prof-kgw"))
    }
    spark.sharedState.cacheManager.clearCache()
    timeline.clear()
    val t0 = System.currentTimeMillis()
    val tNs = System.nanoTime()
    locally {
      TripleSink.writeTriples(spark,
        Pipeline.triples(spark, InterleavedDocs.readDocs(spark, docsPath)),
        tmpDir("graft-prof-kgw"))
    }
    val wallMs = (System.nanoTime() - tNs) / 1000000
    println(f"PROFILE kg_write_e2e            ${wallMs / 1e3}%8.2f s")
    timeline.report(wallMs, t0)
    spark.stop()
    // drop exactly the temp corpora/sinks THIS run created (repeated runs
    // fill /tmp; concurrent runs' dirs are untouched)
    tmpDirs.foreach { d =>
      scala.util.Try {
        java.nio.file.Files.walk(java.nio.file.Paths.get(d))
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }
  }
}

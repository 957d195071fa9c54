package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Spec
import graft.operators._
import graft.sources.{InterleavedDocs, TripleSink}

/** Stage-level profiling of the north-star workload: times each pipeline
  * phase independently (warm) so N vs 4N scaling loss can be attributed.
  * Usage: SPARK_GRAFT_CPUS=8|32 sbt "runMain graft.Profile [nDocs]". */
object Profile {
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

    val docsPath = Files.createTempDirectory("graft-prof-docs").toString
    InterleavedDocs.synthesize(spark, nDocs, seed = 42L, skewPct = 2)
      .write.mode("overwrite").parquet(docsPath)

    def time(name: String)(f: => Any): Unit = {
      // one warm pass, one timed pass
      f
      val t0 = System.nanoTime()
      f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = InterleavedDocs.readDocs(spark, docsPath)
    val exploded = SpanOps.wellFormed(SpanOps.explodeSpans(docs))

    time("scan_explode")(exploded.count())
    time("match")(GazetteerMatcher.candidates(spark,
      SpanOps.textSpans(exploded), Spec.Gazetteer).count())
    time("match_top1")(Linker.top1(GazetteerMatcher.candidates(spark,
      SpanOps.textSpans(exploded), Spec.Gazetteer)).count())
    time("full_triples_count")(Pipeline.triples(spark, docs).count())

    val cached = Pipeline.triples(spark, docs).cache()
    cached.count()
    time("write_only_cached") {
      val out = Files.createTempDirectory("graft-prof-sink").toString
      TripleSink.writeTriples(spark, cached, out)
    }
    cached.unpersist()
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Canonicalizer, Curation, Dedup}

/** Optimization-round isolation bench (guide §1.4): times the bench-only
  * operator shapes (cc_600k, the prod-hash minhash/curation configs) plus
  * any named SparkEntry query with a NOOP SINK — every column of every row
  * computed and discarded, so the number is the computation, not the sink
  * or count-pruning. Does not touch the frozen Bench contract; cite these
  * numbers in OPTIMIZATION_rNN.md. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchExtra [reps] [names...]"
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def cc600kEdges: DataFrame = {
      val c = (col("id") / 6).cast("long")
      val p = col("id") % 6
      spark.range(600000L).select(
        format_string("c%d_%d", c, p).as("src"),
        when(p < 5, format_string("c%d_%d", c, p + 1))
          .otherwise(format_string("h%d", pmod(xxhash64(c), lit(5000L))))
          .as("dst"))
    }
    val extra: Map[String, () => DataFrame] = Map(
      "cc_600k" -> (() => Canonicalizer.connectedComponents(spark,
        cc600kEdges, smallGraphThreshold = 0L)),
      "dedup_minhash_prod" -> (() => Dedup.minHashLshPairs(
        spark.read.parquet(s"$sfDir/documents.parquet"),
        n = 3, numHashes = 64, bands = 16, minEstJaccard = 0.5,
        maxDocFreq = graft.model.Spec.DedupMaxDocFreq)),
      "curate_docs_bench" -> (() => Curation.curateDocs(spark,
        spark.read.parquet(s"$sfDir/documents.parquet"),
        keepLang = "en", minQuality = 0.7)))

    val defaults = Seq("cc_600k", "dedup_minhash_prod", "curate_docs_bench",
      "dedup_minhash_lsh", "dedup_jaccard_prefix", "dedup_ngram_jaccard")
    val names = if (args.length > 1) args.drop(1).toSeq else defaults

    names.foreach { name =>
      def build(): DataFrame =
        if (extra.contains(name)) extra(name)()
        else SparkEntry.queries(name)(spark, sfDir)
      spark.sparkContext.setJobDescription(s"benchextra: $name warm")
      build().write.format("noop").mode("overwrite").save() // warm, discarded
      val times = (1 to reps).map { i =>
        spark.sparkContext.setJobDescription(s"benchextra: $name rep $i")
        val t0 = System.nanoTime()
        build().write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"BENCHX $name rep $i: $t%.2f s")
        t
      }.sorted
      println(f"BENCHX $name median: ${times(times.size / 2)}%.2f s")
    }
    spark.stop()
  }
}

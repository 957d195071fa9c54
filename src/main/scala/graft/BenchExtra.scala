package graft

import org.apache.spark.sql.DataFrame

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
    // first arg is reps when numeric; otherwise everything is query names
    val reps = args.headOption.flatMap(_.toIntOption).filter(_ >= 1)
    val names0 = if (reps.isDefined) args.drop(1).toSeq else args.toSeq
    val nReps = reps.getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchShapes.session()
    spark.sparkContext.setLogLevel("WARN")

    val extra = BenchShapes.extraQueries(spark, sfDir)
    val defaults = Seq("cc_600k", "dedup_minhash_prod", "curate_docs_bench",
      "dedup_minhash_lsh", "dedup_jaccard_prefix", "dedup_ngram_jaccard")
    val names = if (names0.nonEmpty) names0 else defaults

    names.foreach { name =>
      def build(): DataFrame =
        extra.getOrElse(name,
          () => SparkEntry.queries(name)(spark, sfDir))()
      spark.sparkContext.setJobDescription(s"benchextra: $name warm")
      build().write.format("noop").mode("overwrite").save() // warm, discarded
      val times = (1 to nReps).map { i =>
        spark.sparkContext.setJobDescription(s"benchextra: $name rep $i")
        val t0 = System.nanoTime()
        build().write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"BENCHX $name rep $i: $t%.2f s")
        t
      }.sorted
      // true median: mean of the middle pair for even rep counts
      val med =
        if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2
      println(f"BENCHX $name median: $med%.2f s")
    }
    spark.stop()
  }
}

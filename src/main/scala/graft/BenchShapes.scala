package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Canonicalizer, Curation, Dedup}

/** Shared builders for the round-6+ optimization tooling (PlanDump,
  * BenchExtra): the bench-only operator shapes mirrored from the FROZEN
  * `Bench.scala`, defined once so the audit tools cannot drift from the
  * graded workload, plus the tools' common local session. */
object BenchShapes {

  /** Same session shape as Bench.scala (master/shuffle partitions from
    * `SPARK_GRAFT_CPUS`, the small-corpus scan-split overrides). */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", 8L * 1024 * 1024)
      .config("spark.sql.files.openCostInBytes", 512L * 1024)
      .getOrCreate()
  }

  /** The cc_600k bench graph — mirror of Bench.scala step 3 (100k chains
    * of 6 nodes, tails into 5k hubs, hash-derived). */
  def cc600kEdges(spark: SparkSession): DataFrame = {
    val c = (col("id") / 6).cast("long")
    val p = col("id") % 6
    spark.range(600000L).select(
      format_string("c%d_%d", c, p).as("src"),
      when(p < 5, format_string("c%d_%d", c, p + 1))
        .otherwise(format_string("h%d", pmod(xxhash64(c), lit(5000L))))
        .as("dst"))
  }

  /** The bench entries that are not SparkEntry queries, by name —
    * mirrors of Bench.scala steps 3/4b/4c. */
  def extraQueries(spark: SparkSession,
      sfDir: String): Map[String, () => DataFrame] = Map(
    "cc_600k" -> (() => Canonicalizer.connectedComponents(spark,
      cc600kEdges(spark), smallGraphThreshold = 0L)),
    "dedup_minhash_prod" -> (() => Dedup.minHashLshPairs(
      spark.read.parquet(s"$sfDir/documents.parquet"),
      n = 3, numHashes = 64, bands = 16, minEstJaccard = 0.5,
      maxDocFreq = graft.model.Spec.DedupMaxDocFreq)),
    "curate_docs_bench" -> (() => Curation.curateDocs(spark,
      spark.read.parquet(s"$sfDir/documents.parquet"),
      keepLang = "en", minQuality = 0.7)))
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Canonicalizer, Curation, Dedup}

/** Optimization-round plan snapshots: writes `.explain("formatted")` for
  * the named queries (plus the bench-only operator shapes that are not
  * SparkEntry queries) to `<outDir>/<name>_<suffix>.txt` — the
  * before/after evidence files the optimization rounds commit under
  * plans/rNN/. Usage:
  *   sbt "runMain graft.PlanDump plans/r06 before [names...]"
  * With no names, dumps the default optimization-target set. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val suffix = if (args.length > 1) args(1) else "before"
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
    spark.sparkContext.setLogLevel("ERROR")

    // bench-only operator shapes (not SparkEntry queries), mirrored from
    // Bench.scala so their plans can be audited alongside the query set
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

    val defaults = Seq("dedup_minhash_lsh", "dedup_minhash_prod",
      "dedup_ngram_jaccard", "dedup_jaccard_prefix", "dedup_simhash",
      "curate_docs", "curate_docs_bench", "cc_600k", "cc_components",
      "kg_cooccur", "top1_link", "gazetteer_match", "kg_sfdocs",
      "emb_lsh_topk", "emb_lsh_dup_pairs", "doc_len_deciles")
    val names = if (args.length > 2) args.drop(2).toSeq else defaults

    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df =
        if (extra.contains(name)) extra(name)()
        else if (name == "kg_sfdocs")
          Pipeline.triples(spark,
            graft.sources.InterleavedDocs.fromDocuments(spark, sfDir))
        else SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = Paths.get(outDir, s"${name}_$suffix.txt")
      Files.write(p, txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $p (${txt.length} chars)")
    }
    spark.stop()
  }
}

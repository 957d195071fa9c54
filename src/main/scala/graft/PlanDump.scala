package graft

import java.nio.file.{Files, Paths}

/** Optimization-round plan snapshots: writes `.explain("formatted")` for
  * the named queries (plus the bench-only operator shapes that are not
  * SparkEntry queries, shared via [[BenchShapes]]) to
  * `<outDir>/<name>_<suffix>.txt` — the before/after evidence files the
  * optimization rounds commit under plans/rNN/. Usage:
  *   sbt "runMain graft.PlanDump plans/r06 before [names...]"
  * With no names, dumps the default optimization-target set. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val suffix = if (args.length > 1) args(1) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchShapes.session()
    spark.sparkContext.setLogLevel("ERROR")

    val extra = BenchShapes.extraQueries(spark, sfDir)
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

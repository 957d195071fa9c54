package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Canonicalizer, Dedup, Similarity}
import graft.sources.{InterleavedDocs, TripleSink}

/** Physical-plan inspector: prints explain("formatted") for the headline
  * plans so scan pruning (ReadSchema/PushedFilters), join strategies,
  * exchange placement, and WholeStageCodegen spans can be audited
  * (builder prompt: ".explain the plan and iterate"). Run:
  * sbt "runMain graft.Plans [sfDir]". */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def show(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    // Post-execution adaptive plan: AQE finalizes exchange reuse at
    // runtime, so ReusedExchange / reused shuffle stages are only visible
    // AFTER an action. This is the audit that proves multi-consumer
    // intermediates (dedup shingles/signatures, the pipeline's deduped
    // base) are computed once without .cache().
    def showExecuted(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name (EXECUTED, final adaptive plan) ==========")
      val d = df
      d.collect() // collect (not count) executes THIS dataset's own
      // QueryExecution, so the printed adaptive plan is the finalized one
      val plan = d.queryExecution.executedPlan.toString
      println(plan)
      println(s"-- ReusedExchange nodes: " +
        plan.linesIterator.count(_.contains("ReusedExchange")))
    }

    val docs = InterleavedDocs.fromDocuments(spark, sfDir)
    show("kg_pipeline (docs → triples)") {
      Pipeline.triples(spark, docs)
    }
    show("sink write plan (bucketed, range-repartitioned)") {
      TripleSink.withSubjectBucket(Pipeline.triples(spark, docs))
        .repartitionByRange(org.apache.spark.sql.functions.col("subj_bucket"),
          org.apache.spark.sql.functions.col("subj"))
    }
    val documents = spark.read.parquet(s"$sfDir/documents.parquet")
    show("ngram_jaccard (inverted-index self-join)") {
      Dedup.ngramJaccardPairs(documents, 3, 0.8)
    }
    show("minhash_lsh (band equi-join)") {
      Dedup.minHashLshPairs(documents, 3, 64, 16, 0.5)
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    show("lsh_topk (bucketed ANN)") {
      Similarity.lshTopK(emb, 5, 64)
    }
    show("pruning check: 2-col projection over documents") {
      documents.select("doc_id", "lang")
        .filter(org.apache.spark.sql.functions.col("lang") === "en")
    }
    showExecuted("kg_pipeline") { Pipeline.triples(spark, docs) }
    showExecuted("ngram_jaccard") { Dedup.ngramJaccardPairs(documents, 3, 0.8) }
    showExecuted("minhash_lsh") { Dedup.minHashLshPairs(documents, 3, 64, 16, 0.5) }
    showExecuted("simhash_pairs") { Dedup.simHashPairs(documents, 3) }
    showExecuted("curate_docs") {
      graft.operators.Curation.curateDocs(spark, documents)
    }
    showExecuted("curate_docs_semantic") {
      graft.operators.Curation.curateDocs(spark, documents,
        embeddings = Some(emb))
    }
    showExecuted("lsh_topk_multiprobe") {
      Similarity.lshTopK(emb, 5, 64, nPlanes = 6)
    }

    // round-5 wave 7+8: split CASE must be a pure scan-side projection
    // (no exchange); tfidf top-k must plan WindowGroupLimit; sessionize
    // must show ONE exchange on user_id with both window functions over
    // one sort; asofJoin ONE exchange of the union + one window.
    show("assign_splits (pure projection, no exchange)") {
      graft.operators.Sampling.assignSplits(documents, portable = true)
    }
    show("tfidf_keywords (WindowGroupLimit top-k)") {
      graft.operators.TextAnalysis.tfidfKeywords(documents, k = 5)
    }
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    show("sessionize (one exchange, windows share one sort)") {
      graft.operators.Temporal.sessionize(events)
    }
    show("asof_join (union trick: one exchange, one window, no range join)") {
      import org.apache.spark.sql.functions._
      val l = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val r = events.filter(col("event_type") === "signup")
        .groupBy("user_id", "ts").agg(max("event_id").as("ref_event"))
      graft.operators.Temporal.asofJoin(l, r, "user_id", "ts")
    }

    // round-5 waves 10-15. pagerank: per iteration ONE SMJ/shuffle join
    // of the rank vector against the checkpointed 2-col edge scan + one
    // partial-agg exchange — NO re-derivation of the upstream pipeline
    // inside the loop (the scan must read the localCheckpoint, not the
    // AC matcher). interval_join: equi-join + residual filter — NO
    // BroadcastNestedLoop/Cartesian (the naive theta-join shape).
    // jaccard_prefix: candidate join probes only the prefix index; the
    // verify is array_intersect over per-doc arrays, not a second
    // inverted join. deciles: the only unbounded-partition window runs
    // over the distinct-length histogram, then broadcast.
    {
      import org.apache.spark.sql.functions._
      show("kg_pagerank (iterative join+agg over checkpointed edges)") {
        graft.operators.GraphStats.pageRank(
          graft.operators.GraphStats.iriEdges(Pipeline.triples(spark, docs)))
      }
      show("interval_join_pc (bucket replication, no nested-loop)") {
        graft.operators.Temporal.intervalJoin(
          events.filter(col("event_type") === "purchase"),
          events.filter(col("event_type") === "click"))
      }
      show("doc_len_deciles (tiny-histogram window + broadcast offsets)") {
        graft.operators.TextAnalysis.lengthQuantiles(documents)
      }
      showExecuted("dedup_jaccard_prefix (prefix index + array verify)") {
        Dedup.jaccardPrefixPairs(documents, 3, thetaPct = 80)
      }
      show("kg_cooccur (doc-key self-join, bounded fan-out)") {
        graft.operators.GraphStats.cooccurrence(Pipeline.triples(spark, docs))
      }
    }
    spark.stop()
  }
}

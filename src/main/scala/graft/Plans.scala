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
    spark.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Pipeline
import graft.model.Doc
import graft.sources.{InterleavedDocs, TripleSink}

/** Streaming ingest wrapper (SURVEY.md §2.10: the spec itself is batch
  * with checkpoint-resume; the ingest path is a pure
  * Dataset[Doc] → triples function, so wiring it behind readStream +
  * Trigger.AvailableNow + foreachBatch is this thin shim).
  *
  * Each micro-batch runs the full construction pipeline and lands in the
  * same bucketed, manifest-tracked triple table — the manifest dedup
  * happens at the bucket level per batch directory.
  */
object DocStream {

  /** File-source stream of interleaved docs with the frozen schema. */
  def readDocStream(spark: SparkSession, path: String): Dataset[Doc] = {
    import spark.implicits._
    spark.readStream.schema(InterleavedDocs.docSchema).parquet(path).as[Doc]
  }

  /** Incremental KG construction: every arriving doc-file batch is
    * transformed to triples and appended to `outPath` (one sub-table per
    * batch; bucket layout + lineage preserved within each).
    * Trigger.AvailableNow processes the backlog then stops — the batch
    * semantics of the spec, with streaming's file tracking + its own
    * checkpoint for exactly-once over input files. */
  def run(spark: SparkSession, inPath: String, outPath: String,
      checkpoint: String): StreamingQuery =
    readDocStream(spark, inPath).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
        val triples = Pipeline.triples(batch.sparkSession, batch,
          observeMetrics = false)
        TripleSink.writeTriples(batch.sparkSession, triples,
          s"$outPath/batch_id=$batchId")
        ()
      }
      .start()
}

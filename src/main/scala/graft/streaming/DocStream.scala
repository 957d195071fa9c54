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

  /** File-source stream of interleaved docs with the frozen schema.
    * `maxFilesPerTrigger` bounds micro-batch size (and lets tests force a
    * multi-batch run); AvailableNow honors it as a read limit. */
  def readDocStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Option[Int] = None): Dataset[Doc] = {
    import spark.implicits._
    val reader = spark.readStream.schema(InterleavedDocs.docSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(path).as[Doc]
  }

  /** Incremental KG construction: every arriving doc-file batch is
    * transformed to triples and appended to `outPath` (one sub-table per
    * batch; bucket layout + lineage preserved within each).
    * Trigger.AvailableNow processes the backlog then stops — the batch
    * semantics of the spec, with streaming's file tracking + its own
    * checkpoint for exactly-once over input files.
    *
    * Cross-batch set semantics: triples recur across batches (ex:label
    * triples for common entities appear in nearly every batch), so each
    * batch's output is left-anti joined against everything previously
    * written before landing — the UNION of all batch sub-tables therefore
    * remains an exact distinct (subj, pred, obj) set, same contract as
    * [[graft.Pipeline.triples]]. At corpus scale the anti-join reads only
    * the (subj, pred, obj) columns of the prior output (columnar prune) and
    * shuffles just the new batch; an Iceberg deployment would express the
    * same thing as MERGE INTO on the bucketed table. */
  def run(spark: SparkSession, inPath: String, outPath: String,
      checkpoint: String, maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    readDocStream(spark, inPath, maxFilesPerTrigger).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
        val s = batch.sparkSession
        val triples = Pipeline.triples(s, batch, observeMetrics = false)
        val prior = priorBatchDirs(outPath, batchId)
        val novel =
          if (prior.isEmpty) triples
          else triples.join(
            // basePath: the batch_id=… dirs are siblings under one
            // partitioned table root, not independent tables
            s.read.option("basePath", outPath).parquet(prior: _*)
              .select("subj", "pred", "obj"),
            Seq("subj", "pred", "obj"), "left_anti")
        TripleSink.writeTriples(s, novel, s"$outPath/batch_id=$batchId")
        ()
      }
      .start()

  /** Completed batch sub-tables already on disk (excluding `batchId`
    * itself, which a failed-and-retried micro-batch may have partially
    * written — its buckets are finished idempotently by the sink's
    * manifest resume protocol, not double-anti-joined). */
  private def priorBatchDirs(outPath: String, batchId: Long): Seq[String] = {
    val root = java.nio.file.Paths.get(outPath)
    if (!java.nio.file.Files.isDirectory(root)) Seq.empty
    else {
      val s = java.nio.file.Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => java.nio.file.Files.isDirectory(p))
          .map(_.getFileName.toString)
          // safe parse: a stray non-numeric dir under outPath must be
          // ignored, not crash every subsequent micro-batch
          .filter(n => n.startsWith("batch_id=") &&
            n.stripPrefix("batch_id=").toLongOption.exists(_ != batchId))
          .map(n => s"$outPath/$n")
          // all-duplicate batches write zero rows (no parquet footers to
          // infer a schema from) — skip them via their own manifest
          .filter(dir => TripleSink.readManifest(dir).map(_.rows).sum > 0)
          .toSeq.sorted
      } finally s.close()
    }
  }
}

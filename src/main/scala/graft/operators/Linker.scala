package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{CandidateLink, Spec}

/** Entity-link selection + predicate mapping (SURVEY.md M4–M7). */
object Linker {

  /** M5: top-1 candidate per mention (doc_id, span_pos, begin), frozen
    * tie-break (score desc, entity_id asc); threshold τ = 0.0 (FIXTURES.md
    * §4). Window + row_number — deterministic. */
  def top1(candidates: Dataset[CandidateLink]): DataFrame = {
    val w = Window.partitionBy("doc_id", "span_pos", "begin")
      .orderBy(col("score").desc, col("entity_id").asc)
    candidates.toDF()
      .filter(col("score") >= Spec.ScoreThreshold)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** M6: media passthrough links — a media span links directly to its
    * media_ref, no scoring (BASELINE.json:6 "media_ref passthrough
    * linking"). Input: exploded media spans. Output:
    * (doc_id, span_pos, media_ref). */
  def mediaLinks(mediaSpans: DataFrame): DataFrame =
    mediaSpans.select(col("doc_id"), col("pos").as("span_pos"),
      col("media_ref"))

  /** M7: link kind → predicate IRI via a broadcast-joined mapping table
    * (BASELINE.json:6 "predicate mapping"). Input must carry a
    * `link_kind` column. */
  def mapPredicates(spark: SparkSession, links: DataFrame): DataFrame = {
    import spark.implicits._
    val predMap = broadcast(
      Spec.PredicateMap.toSeq.toDF("link_kind", "pred"))
    links.join(predMap, Seq("link_kind"), "left")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Doc

/** Span-level relational ops (SURVEY.md §2.2 P1–P5).
  *
  * Position is load-bearing: the spec's per-row invariant is span-sequence
  * equality — for every doc_id the ordered (kind, text, media_ref) sequence
  * observable after processing equals the input (BASELINE.json:15). Hence
  * posexplode everywhere, and reassembly always sorts by position.
  */
object SpanOps {

  /** P1: explode spans keeping array position. Output columns:
    * (doc_id, pos, kind, text, media_ref, offset). */
  def explodeSpans(docs: Dataset[Doc]): DataFrame =
    docs.select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos"),
        col("span.kind").as("kind"), col("span.text").as("text"),
        col("span.media_ref").as("media_ref"), col("span.offset").as("offset"))

  /** P2: text spans only. */
  def textSpans(exploded: DataFrame): DataFrame =
    exploded.filter(col("kind") === "text")

  /** P2: media spans only. */
  def mediaSpans(exploded: DataFrame): DataFrame =
    exploded.filter(col("kind") === "media")

  /** P5: reassemble exploded spans into ordered (kind,text,media_ref)
    * sequences and compare to the input docs. Returns (doc_id, ok);
    * the pipeline invariant requires ok == true for every doc.
    * array_sort on struct(pos, ...) sorts by pos first — order restored
    * regardless of shuffle. */
  def spanSequenceEquality(docs: Dataset[Doc], exploded: DataFrame): DataFrame = {
    val observed = exploded
      .groupBy("doc_id")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("kind"), col("text"),
          col("media_ref")))),
        s => struct(s("kind"), s("text"), s("media_ref"))).as("obs_seq"))
    val expected = docs.select(col("doc_id"),
      transform(col("spans"),
        s => struct(s("kind"), s("text"), s("media_ref"))).as("exp_seq"))
    expected.join(observed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("obs_seq").isNotNull && col("exp_seq") === col("obs_seq")).as("ok"))
  }

  /** P3: malformed-span guard — a text span must carry text, a media span a
    * media_ref, offsets non-negative. Drops violators; count the difference
    * via Dataset.observe upstream if metrics are needed. */
  def wellFormed(exploded: DataFrame): DataFrame =
    exploded.filter(
      (col("kind") === "text" && col("text").isNotNull) ||
      (col("kind") === "media" && col("media_ref").isNotNull))
      .filter(col("offset") >= 0)
}

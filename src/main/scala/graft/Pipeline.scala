package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Doc, GazEntry, SameAsEdge, Spec}
import graft.operators.{Canonicalizer, GazetteerMatcher, Linker, SpanOps}

/** The end-to-end KG-construction plan: Dataset[Doc] → DataFrame of triples
  * (subj, pred, obj, obj_type), all Catalyst — one declarative plan per
  * stage, no RDDs, no driver-side loops except the CC fixpoint iteration
  * (BASELINE.json:6; SURVEY.md §3.1).
  *
  * Stage graph:
  * {{{
  * docs ─ posexplode ─┬─ text spans ─ AC match ─ top-1 ─┐
  *                    └─ media spans ── passthrough ────┤
  *      sameAs ─ connected components ─ canonical remap ┘
  *                               predicate map ─ URI mint ─ union ─ dedup
  * }}}
  */
object Pipeline {

  /** Links of all kinds, canonicalized, with predicate IRIs attached —
    * the last relational step before triple assembly. */
  def canonicalLinks(spark: SparkSession, docs: Dataset[Doc],
      gazetteer: Seq[GazEntry], sameAs: Dataset[SameAsEdge]): DataFrame = {
    val exploded = SpanOps.wellFormed(SpanOps.explodeSpans(docs))
    val cands = GazetteerMatcher.candidates(spark, SpanOps.textSpans(exploded),
      gazetteer)
    val kept = Linker.top1(cands)

    val components = Canonicalizer.connectedComponents(spark,
      sameAs.toDF("src", "dst"))
    val canon = Canonicalizer.remap(kept, "entity_id", components)

    val textLinks = canon.select(col("doc_id"), col("span_pos"),
      col("entity_id"), col("surface"), lit("text_mention").as("link_kind"))
    val mediaL = Linker.mediaLinks(SpanOps.mediaSpans(exploded))
      .select(col("doc_id"), col("span_pos"),
        col("media_ref").as("entity_id"), lit(null).cast("string").as("surface"),
        lit("media").as("link_kind"))
    val labelLinks = canon.select(col("entity_id"), col("surface")).distinct()
      .select(lit(null).cast("string").as("doc_id"),
        lit(-1).as("span_pos"), col("entity_id"), col("surface"),
        lit("label").as("link_kind"))

    Linker.mapPredicates(spark,
      textLinks.unionByName(mediaL).unionByName(labelLinks))
  }

  /** Full pipeline: triples with exact set semantics (distinct on
    * (subj, pred, obj) — P/R is set-based, BASELINE.json:2). */
  def triples(spark: SparkSession, docs: Dataset[Doc],
      gazetteer: Seq[GazEntry] = Spec.Gazetteer,
      sameAs: Seq[SameAsEdge] = Spec.SameAs,
      observeMetrics: Boolean = false): DataFrame = {
    import spark.implicits._
    val links = canonicalLinks(spark, docs, gazetteer,
      spark.createDataset(sameAs))

    val assembled = links.select(
      when(col("link_kind") === "label", Spec.entUriCol(col("entity_id")))
        .otherwise(Spec.docUriCol(col("doc_id"))).as("subj"),
      col("pred"),
      when(col("link_kind") === "text_mention", Spec.entUriCol(col("entity_id")))
        .when(col("link_kind") === "media", Spec.mediaUriCol(col("entity_id")))
        .otherwise(col("surface")).as("obj"),
      when(col("link_kind") === "label", lit("literal")).otherwise(lit("iri"))
        .as("obj_type"))

    val deduped = assembled.dropDuplicates("subj", "pred", "obj")
    // observe() is opt-in: a CollectMetrics node upstream of further plan
    // composition (exceptAll, streaming foreachBatch) mis-binds attributes
    // in GenerateExec on Spark 4.1 — enable it only when the returned df
    // is consumed directly (e.g. straight into an action or write).
    // Row-count lineage is independently recorded by the sink manifest.
    if (observeMetrics)
      deduped.observe("graft_triples", count(lit(1)).as("triples_out"))
    else deduped
  }
}

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

    val exploded = SpanOps.wellFormed(SpanOps.explodeSpans(docs))
    val cands = GazetteerMatcher.candidates(spark, SpanOps.textSpans(exploded),
      gazetteer)
    val kept = Linker.top1(cands)
    // sameAs arrives here as an in-memory Seq (dimension-sized by
    // definition): C3 runs as driver union-find and C4 as a literal-map
    // expression — zero extra Spark jobs. Corpus-scale edge sets go
    // through canonicalLinks/connectedComponents (iterative star joins).
    val canonMap = Canonicalizer.componentsLocal(
      sameAs.map(e => (e.src_entity, e.dst_entity)))
    val canon =
      if (canonMap.isEmpty) kept
      else {
        val m = map(canonMap.toSeq.sortBy(_._1)
          .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
        kept.withColumn("entity_id",
          coalesce(element_at(m, col("entity_id")), col("entity_id")))
      }

    // G4 dedup happens BEFORE URI minting on the narrow natural keys —
    // far cheaper than deduping full minted-URI strings. The single
    // distinct collapses per-doc mention repetition (map-side combine) in
    // ONE pass over the matcher output; it is cached because three small
    // aggregates below consume it (without the cache each would recompute
    // the whole match+top1+remap chain).
    val base = canon.select(col("doc_id"), col("entity_id"), col("surface"))
      .distinct().cache()

    val mentions = base.select("doc_id", "entity_id").distinct()
      .withColumn("link_kind", lit("text_mention"))
    val labels = base.select("entity_id", "surface").distinct()
      .withColumn("link_kind", lit("label"))
    val media = SpanOps.mediaSpans(exploded)
      .select(col("doc_id"), col("media_ref").as("entity_id")).distinct()
      .withColumn("link_kind", lit("media"))

    // Salted-hash URIs are minted once per DISTINCT canonical entity (a
    // dimension-sized set), then joined back — not sha2'd per corpus row.
    // Broadcast at gazetteer-bounded cardinality; swap for a sort-merge
    // join on open-world entity vocabularies.
    val entUris = broadcast(base.select("entity_id").distinct()
      .withColumn("ent_uri", Spec.entUriCol(col("entity_id"))))

    // M7 predicate mapping via the broadcast predicate dimension
    val mentionTriples = Linker.mapPredicates(spark,
        mentions.join(entUris, "entity_id"))
      .select(Spec.docUriCol(col("doc_id")).as("subj"), col("pred"),
        col("ent_uri").as("obj"), lit("iri").as("obj_type"))
    val labelTriples = Linker.mapPredicates(spark,
        labels.join(entUris, "entity_id"))
      .select(col("ent_uri").as("subj"), col("pred"),
        col("surface").as("obj"), lit("literal").as("obj_type"))
    val mediaTriples = Linker.mapPredicates(spark, media)
      .select(Spec.docUriCol(col("doc_id")).as("subj"), col("pred"),
        Spec.mediaUriCol(col("entity_id")).as("obj"),
        lit("iri").as("obj_type"))

    // Each branch is internally distinct and the three predicates are
    // disjoint, so the union IS the deduped (subj, pred, obj) set — no
    // final corpus-wide dropDuplicates shuffle needed (exact set
    // semantics, BASELINE.json:2).
    val deduped = mentionTriples.unionByName(labelTriples)
      .unionByName(mediaTriples)
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

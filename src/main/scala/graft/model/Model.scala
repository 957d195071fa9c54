package graft.model

/** Core data model of the KG-construction engine.
  *
  * Shapes are frozen from the functional spec (`BASELINE.json:15` input_hint
  * and SURVEY.md §1): the reference repo at /root/reference is empty, so the
  * spec JSON is the authoritative behavior description (SURVEY.md §0).
  */

/** One span of an interleaved document (`BASELINE.json:15`).
  * kind ∈ {"text","media"}; text is non-null iff kind=="text";
  * mediaRef non-null iff kind=="media"; offset = char offset, strictly
  * increasing within a doc; array order == offset order (the per-row
  * span-sequence-equality invariant).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** An interleaved text+media document (`BASELINE.json:15`). */
final case class Doc(doc_id: String, spans: Seq[Span])

/** A gazetteer entry (SURVEY.md §2.1 S2, FIXTURES.md §2). Surface is
  * lowercase and may be multi-token ("hash join"). */
final case class GazEntry(surface: String, entity_id: String, prior: Double)

/** A scored candidate entity link for one mention (SURVEY.md §1.3, M4).
  * begin/end are char offsets within the span text, end exclusive. */
final case class CandidateLink(
    doc_id: String,
    span_pos: Int,
    begin: Int,
    end: Int,
    surface: String,
    entity_id: String,
    prior: Double,
    score: Double)

/** An RDF triple (W3C RDF 1.1 data model; SURVEY.md §1.2).
  * objType ∈ {"iri","literal"}. Blank nodes are never produced — would-be
  * bnodes are minted as deterministic salted-hash IRIs (BASELINE.json:6
  * "URI canonicalization via salted-hash dedup"). */
final case class Triple(subj: String, pred: String, obj: String, obj_type: String)

/** A sameAs / alias edge driving connected-components entity resolution
  * (BASELINE.json:6; FIXTURES.md §3). Per-partition lineage for
  * checkpoint-resume lives in [[graft.sources.TripleSink.BucketLineage]]. */
final case class SameAsEdge(src_entity: String, dst_entity: String)

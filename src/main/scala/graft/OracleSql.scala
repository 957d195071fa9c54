package graft

import graft.model.OracleCte

/** DuckDB oracle SQL for the non-trivial pipeline stages.
  *
  * These mirror the Spark operators 1:1 over the same deterministic
  * constructions ([[graft.model.OracleCte]]); fixtures are inlined VALUES
  * generated from [[graft.model.Spec]], so spec changes can't leave the
  * oracle behind (SURVEY.md §7 "hard parts").
  *
  * Equivalence note for overlap resolution: the gazetteer is frozen such
  * that no bigram's second word is another bigram's first word, so bigram
  * matches never overlap each other; token-aligned matches only overlap
  * when they share a token, and a bigram is always strictly longer (in
  * chars) than its component tokens. The greedy longest-then-leftmost
  * resolution therefore reduces to: keep every bigram match, keep a
  * single-token match iff it is not covered by a bigram match — which is
  * what the NOT EXISTS below computes.
  */
object OracleSql {

  /** Tokens of text spans with char offsets (parallel unnest zips the token
    * list with its positions; begin = window sum of preceding token lengths
    * + separators — exact because span text joins tokens with single
    * spaces). */
  private val tokensCte: String =
    """tokens0 AS (
      |  SELECT did, pos AS span_pos,
      |         unnest(string_split(text, ' ')) AS tok,
      |         unnest(range(1, len(string_split(text, ' ')) + 1)) AS tokpos
      |  FROM spans WHERE kind = 'text' AND text IS NOT NULL AND text <> ''
      |), toks AS (
      |  SELECT did, span_pos, tok, tokpos,
      |         CAST(coalesce(sum(length(tok) + 1) OVER (
      |           PARTITION BY did, span_pos ORDER BY tokpos
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |           AS beg
      |  FROM tokens0 WHERE tok <> ''
      |)""".stripMargin

  /** Kept candidate links after AC matching + overlap resolution:
    * kept(did, span_pos, beg, en, surface, entity_id, prior). */
  private val keptCte: String =
    """m1 AS (
      |  SELECT t.did, t.span_pos, t.beg, t.beg + length(t.tok) AS en,
      |         g.surface, g.entity_id, g.prior
      |  FROM toks t JOIN gazetteer g
      |    ON t.tok = g.surface AND g.surface NOT LIKE '% %'
      |), bigrams AS (
      |  SELECT did, span_pos, beg,
      |         tok || ' ' || lead(tok) OVER w AS s2,
      |         beg + length(tok) + 1 + length(lead(tok) OVER w) AS en
      |  FROM toks
      |  WINDOW w AS (PARTITION BY did, span_pos ORDER BY tokpos)
      |), m2 AS (
      |  SELECT b.did, b.span_pos, b.beg, b.en, g.surface, g.entity_id, g.prior
      |  FROM bigrams b JOIN gazetteer g ON b.s2 = g.surface
      |), kept AS (
      |  SELECT * FROM m2
      |  UNION ALL
      |  SELECT m1.* FROM m1 WHERE NOT EXISTS (
      |    SELECT 1 FROM m2
      |    WHERE m2.did = m1.did AND m2.span_pos = m1.span_pos
      |      AND m1.beg < m2.en AND m2.beg < m1.en)
      |)""".stripMargin

  /** Top-1 link per mention, frozen tie-break (score desc, entity_id asc). */
  private val top1Cte: String =
    """top1 AS (
      |  SELECT did, span_pos, beg, en, surface, entity_id, prior
      |  FROM (SELECT *, row_number() OVER (
      |          PARTITION BY did, span_pos, beg
      |          ORDER BY (prior + 0.1 * length(surface)) DESC, entity_id ASC)
      |          AS rn
      |        FROM kept)
      |  WHERE rn = 1
      |)""".stripMargin

  /** Connected components of the sameAs fixture via recursive closure +
    * min; small fixture graph, so the quadratic closure is fine for the
    * oracle (the Spark side uses large-star/small-star). */
  private val canonCte: String =
    """edges AS (
      |  SELECT src_entity AS a, dst_entity AS b FROM same_as
      |  UNION
      |  SELECT dst_entity, src_entity FROM same_as
      |), reach(a, b) AS (
      |  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |), canon AS (
      |  SELECT a AS entity_id, min(b) AS canonical FROM reach GROUP BY a
      |)""".stripMargin

  private def entUri(expr: String): String =
    s"'ex:ent/' || substr(sha256('graft-v1' || $expr), 1, 16)"

  val gazetteerMatch: String =
    OracleCte.withClause(OracleCte.spansCte, OracleCte.gazetteerCte,
      tokensCte, keptCte) +
      "SELECT did, surface, entity_id, count(*) AS n FROM kept " +
      "GROUP BY did, surface, entity_id"

  val top1Link: String =
    OracleCte.withClause(OracleCte.spansCte, OracleCte.gazetteerCte,
      tokensCte, keptCte, top1Cte) +
      """SELECT did, span_pos, beg AS "begin", en AS "end", surface,
        | entity_id, round(prior + 0.1 * length(surface), 6) AS score
        | FROM top1""".stripMargin.replace("\n", "")

  val canonUri: String =
    OracleCte.withClause(OracleCte.spansCte, OracleCte.gazetteerCte,
      tokensCte, keptCte) +
      s"SELECT DISTINCT entity_id, ${entUri("entity_id")} AS uri FROM kept"

  val ccComponents: String =
    "WITH RECURSIVE " + OracleCte.sameAsCte + ", " + canonCte +
      " SELECT entity_id, canonical FROM canon"

  val triplesFinal: String =
    "WITH RECURSIVE " + Seq(OracleCte.spansCte, OracleCte.gazetteerCte,
      OracleCte.sameAsCte, tokensCte, keptCte, top1Cte, canonCte,
      """linked AS (
        |  SELECT t.did, t.surface,
        |         coalesce(c.canonical, t.entity_id) AS eid
        |  FROM top1 t LEFT JOIN canon c ON t.entity_id = c.entity_id
        |)""".stripMargin).mkString(", ") + " " +
      s"""SELECT 'ex:doc/' || did AS subj, 'ex:mentions' AS pred,
         |       ${entUri("eid")} AS obj, 'iri' AS obj_type
         |FROM linked
         |UNION
         |SELECT ${entUri("eid")}, 'ex:label', surface, 'literal'
         |FROM (SELECT DISTINCT eid, surface FROM linked)
         |UNION
         |SELECT 'ex:doc/' || did, 'ex:hasMedia', 'ex:media/' || media_ref,
         |       'iri'
         |FROM spans WHERE kind = 'media'""".stripMargin.replace("\n", " ")
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{OracleCte, Spec}
import graft.operators._
import graft.sources.InterleavedDocs

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is one implemented operator (SURVEY.md §2); its
  * `oracleSql` twin is ANSI SQL DuckDB runs over the same parquet tables
  * (fixtures are inlined as VALUES CTEs generated from the very same frozen
  * constants in [[graft.model.Spec]]). Column names and types are aligned
  * on both sides (strings / BIGINT / DOUBLE only).
  */
object SparkEntry {

  /** Flagship: the full KG-construction pipeline (explode → AC match →
    * top-1 link → CC canonicalization → predicate map → URI mint → dedup)
    * on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.triples(spark,
      InterleavedDocs.fromDocuments(spark, "/root/testdata/sf0.001"))

  // ---------------------------------------------------------------------
  // shared stage builders (used by several queries)
  // ---------------------------------------------------------------------

  private def docs(s: SparkSession, dir: String) =
    InterleavedDocs.fromDocuments(s, dir)

  private def exploded(s: SparkSession, dir: String): DataFrame =
    SpanOps.explodeSpans(docs(s, dir))
      .select(col("doc_id").as("did"), col("pos").cast("bigint").as("pos"),
        col("kind"), col("text"), col("media_ref"),
        col("offset").cast("bigint").as("off"))

  private def candidates(s: SparkSession, dir: String) =
    GazetteerMatcher.candidates(s,
      SpanOps.textSpans(SpanOps.explodeSpans(docs(s, dir))), Spec.Gazetteer)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1: posexplode keeping position (span order is load-bearing)
    "explode_spans" -> ((s, dir) => exploded(s, dir)),

    // P2+P3: kind filter + shape guard
    "media_spans" -> ((s, dir) =>
      SpanOps.wellFormed(exploded(s, dir).withColumnRenamed("off", "offset")
          .withColumnRenamed("did", "doc_id"))
        .filter(col("kind") === "media")
        .select(col("doc_id").as("did"), col("pos"), col("media_ref"),
          col("offset").as("off"))),

    // M1/M2: AC gazetteer matching (counts per doc × entity; includes
    // multi-token matches and longest-match overlap suppression)
    "gazetteer_match" -> ((s, dir) =>
      candidates(s, dir)
        .groupBy(col("doc_id").as("did"), col("surface"), col("entity_id"))
        .agg(count(lit(1)).as("n"))),

    // M4+M5: scored top-1 link per mention
    "top1_link" -> ((s, dir) =>
      Linker.top1(candidates(s, dir))
        .select(col("doc_id").as("did"), col("span_pos").cast("bigint"),
          col("begin").cast("bigint"), col("end").cast("bigint"),
          col("surface"), col("entity_id"),
          round(col("score"), 6).as("score"))),

    // M6: media passthrough linking + URI mint
    "media_passthrough" -> ((s, dir) =>
      Linker.mediaLinks(
          SpanOps.mediaSpans(SpanOps.explodeSpans(docs(s, dir))))
        .select(col("doc_id").as("did"), col("span_pos").cast("bigint"),
          Spec.mediaUriCol(col("media_ref")).as("media_uri"))),

    // C1: salted-hash URI canonicalization (sha2 ≡ DuckDB sha256)
    "canon_uri" -> ((s, dir) =>
      candidates(s, dir).select(col("entity_id")).distinct()
        .select(col("entity_id"), Spec.entUriCol(col("entity_id")).as("uri"))),

    // C3: connected components over the sameAs fixture (large-star /
    // small-star iterative joins)
    "cc_components" -> ((s, dir) =>
      Canonicalizer.connectedComponents(s,
        InterleavedDocs.sameAs(s).toDF("src", "dst"))),

    // G1–G4: the full pipeline, final deduped triple set
    "triples_final" -> ((s, dir) =>
      Pipeline.triples(s, docs(s, dir))
        .select("subj", "pred", "obj", "obj_type")),

    // --- demos over the driver-shipped star schema (join/agg/window) ----
    "q_lineitem_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          count(lit(1)).as("n"))),

    "q_join_agg" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 4).as("revenue"))
    }),

    "q_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      s.read.parquet(s"$dir/orders.parquet")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rk").cast("bigint").as("rk"))
    }))

  def oracleSql: Map[String, String] = {
    def W(fragments: String*): String = OracleCte.withClause(fragments: _*)
    Map(
      "explode_spans" ->
        (W(OracleCte.spansCte) +
          "SELECT did, pos, kind, text, media_ref, off FROM spans"),

      "media_spans" ->
        (W(OracleCte.spansCte) +
          "SELECT did, pos, media_ref, off FROM spans " +
          "WHERE kind = 'media' AND media_ref IS NOT NULL AND off >= 0"),

      "gazetteer_match" -> OracleSql.gazetteerMatch,

      "top1_link" -> OracleSql.top1Link,

      "media_passthrough" ->
        (W(OracleCte.spansCte) +
          "SELECT did, pos AS span_pos, 'ex:media/' || media_ref AS media_uri " +
          "FROM spans WHERE kind = 'media'"),

      "canon_uri" -> OracleSql.canonUri,

      "cc_components" -> OracleSql.ccComponents,

      "triples_final" -> OracleSql.triplesFinal,

      "q_lineitem_agg" ->
        ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
          "round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price, " +
          "count(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus"),

      "q_join_agg" ->
        ("SELECT c_mktsegment, count(*) AS n_orders, " +
          "round(sum(o_totalprice), 4) AS revenue " +
          "FROM orders JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY c_mktsegment"),

      "q_window_topk" ->
        ("SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (" +
          "SELECT o_custkey, o_orderkey, o_totalprice, " +
          "row_number() OVER (PARTITION BY o_custkey " +
          "ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk FROM orders) " +
          "WHERE rk <= 3"))
  }
}

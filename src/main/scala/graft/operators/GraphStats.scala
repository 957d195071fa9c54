package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Analytics over an emitted (subj, pred, obj) triple table — the
  * KG-construction report surface: the degree distribution locates the
  * head-entity skew the salted join and range-repartitioned write exist
  * for, the hub list names the exact keys that need salting, and the
  * predicate totals are the sanity numbers a triple-store load is
  * reconciled against.
  *
  * Scale shape: hash aggregates with map-side partial combine throughout;
  * the Zipf-skewed subject key lands in an associative count, never on a
  * join build side. [[topHubs]] is agg → orderBy+limit, which Spark plans
  * as TakeOrderedAndProject — per-partition top-k then a driver merge of
  * k-row partials, no global sort, no window. */
object GraphStats {

  /** (degree, n_subjects): out-degree histogram of `keyCol`. Two hash
    * aggs; the second one's domain is the distinct degree count (tiny). */
  def degreeHistogram(triples: DataFrame, keyCol: String = "subj"): DataFrame =
    triples.groupBy(col(keyCol)).agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_subjects"))

  /** Top-k subjects by out-degree. The tie-break on `keyCol` ASC is
    * load-bearing: at sf0.001 the k=20 boundary already lands mid-tie
    * (degree 18), and without it the result set is nondeterministic. */
  def topHubs(triples: DataFrame, k: Int = 20,
      keyCol: String = "subj"): DataFrame =
    triples.groupBy(col(keyCol)).agg(count(lit(1)).as("degree"))
      .orderBy(col("degree").desc, col(keyCol).asc)
      .limit(k)

  /** (pred, n_triples): per-predicate totals (Σ == |triples| — the
    * reconciliation law the spec asserts). */
  def predicateCounts(triples: DataFrame): DataFrame =
    triples.groupBy("pred").agg(count(lit(1)).as("n_triples"))
}

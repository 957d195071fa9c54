package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (training-data pipeline staple): flag or drop
  * training documents that share a word n-gram shingle with an
  * evaluation/benchmark set, so eval data cannot leak into a training
  * corpus (the standard n-gram-overlap decontamination step every
  * published pretraining pipeline runs before training).
  *
  * Scale shape: the benchmark side is small (10²–10⁶ eval items) while the
  * corpus side is the 100 TB table, so the contamination probe is a
  * BROADCAST join — benchmark shingles are distinct'd and broadcast, the
  * corpus shingle stream (a narrow generate, NOT the distinct'd
  * [[Dedup.shingles]] — per-doc dedup would shuffle the whole corpus
  * shingle stream before the selective join) map-side joins against them,
  * and only the surviving hits (rare by assumption) reach the per-doc
  * count aggregation. `hashKey = true` joins on xxhash64(shingle) so the
  * broadcast carries 8-byte keys instead of strings; the oracle config
  * joins on the shingle string itself so DuckDB replays it verbatim.
  */
object Decontam {

  private def rawShingles(docs: DataFrame, n: Int, idCol: String,
      textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    // token array materialized before the interpreted lambda — without
    // this, split(text) is re-parsed per element_at and the shingle
    // generate is O(tokens²) per doc (see Dedup.rawShingles)
    val toks = col("__toks")
    docs
      .filter(size(w) >= n)
      .select(col(idCol).as("id"), w.as("__toks"))
      .select(col("id"),
        explode(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
          .as("shingle"))
  }

  /** (id, n_hits): contaminated docs with the number of DISTINCT benchmark
    * n-gram shingles each shares. Clean docs don't appear. */
  def contaminationHits(docs: DataFrame, bench: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      benchIdCol: String = "doc_id", benchTextCol: String = "text",
      hashKey: Boolean = false): DataFrame = {
    val key: DataFrame => DataFrame =
      if (hashKey) df => df.withColumn("k", xxhash64(col("shingle"))).drop("shingle")
      else df => df.withColumnRenamed("shingle", "k")
    val d = key(rawShingles(docs, n, idCol, textCol))
    val b = key(rawShingles(bench, n, benchIdCol, benchTextCol))
      .select("k").distinct()
    d.join(broadcast(b), "k")
      .select("id", "k").distinct()
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
  }

  /** Decontaminated corpus: `docs` minus every contaminated doc. Plain
    * left-anti on the id (the hit set is usually tiny — AQE broadcasts it;
    * no hint so a pathologically contaminated corpus still plans a
    * shuffle join instead of OOMing the driver). */
  def decontaminate(docs: DataFrame, bench: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      benchIdCol: String = "doc_id", benchTextCol: String = "text",
      hashKey: Boolean = false): DataFrame =
    docs.join(
      contaminationHits(docs, bench, n, idCol, textCol, benchIdCol,
        benchTextCol, hashKey).select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling + sequence-packing operators for training-data
  * pipelines (builder prompt: "the operations a large-scale training-data
  * pipeline would need"). All pure codegen'd expressions — reproducible
  * across runs and cluster layouts (no rand(), no partition-dependent
  * state), with exact DuckDB oracle twins in the portable configs.
  */
object Sampling {

  /** Seeded per-row hash in [0, 1e6): xxhash64 in production, the
    * md5-60-bit portable derivation (see [[Dedup.portableHash60]]) when
    * the DuckDB oracle must replay the sample. */
  private def slotOf(tag: String, seed: Int, id: Column,
      portable: Boolean): Column = {
    val h =
      if (portable)
        conv(substring(md5(concat(lit(s"$tag$seed:"), id.cast("string"))),
          1, 15), 16, 10).cast("long")
      else xxhash64(lit(tag), lit(seed), id)
    pmod(h, lit(1000000L))
  }

  /** Deterministic Bernoulli sample: keeps a row iff its seeded id hash
    * falls under `frac`. Unlike DataFrame.sample this is a pure FILTER —
    * reproducible row-for-row across runs, executors, and re-partitions
    * (sample membership is a function of the id, not of scan order), and
    * it composes with predicate pushdown like any other filter. */
  def sampleByHash(docs: DataFrame, frac: Double, seed: Int = 0,
      idCol: String = "doc_id", portable: Boolean = false): DataFrame = {
    require(frac >= 0 && frac <= 1, "frac must be in [0, 1]")
    docs.filter(
      slotOf("smp", seed, col(idCol), portable) < (frac * 1000000).toLong)
  }

  /** Deterministic stratified sample: the `k` rows with the smallest
    * seeded id hash per stratum (ties broken by id) — "give me k uniform
    * docs per language/source" with run-to-run stability. One shuffle on
    * the stratum key; Spark 4 plans the rank filter as WindowGroupLimit,
    * so each partition keeps only k rows before the exchange. */
  def stratifiedSample(docs: DataFrame, strataCol: String, k: Int,
      seed: Int = 0, idCol: String = "doc_id",
      portable: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(slotOf("str", seed, col(idCol), portable), col(idCol))
    docs.select(col(idCol), col(strataCol))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
  }

  /** Greedy sequence packing: within each stratum, walk docs in id order
    * and assign pack_id = floor(tokens-before-this-doc / budget) — the
    * standard contiguous packing that groups documents into
    * fixed-token-budget training sequences. A pack may overshoot the
    * budget by at most one document (the doc that crosses the boundary
    * belongs to the pack it started in); every pack except its stratum's
    * last holds ≥ budget tokens counting that closing doc.
    *
    * Scale shape: ONE window per stratum (shuffle on the stratum key,
    * sort by id within) — parallelism is the stratum count, which is the
    * inherent limit of order-dependent packing. At corpus scale pass a
    * composite stratum (e.g. source × date-bucket) so packs parallelize;
    * a global `Window.orderBy` without partitioning would serialize the
    * corpus through one task and is deliberately not offered. */
  def packSequences(docs: DataFrame, budget: Long,
      strataCol: String = "lang", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), col(strataCol),
        size(split(col(textCol), " ")).cast("bigint").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("cum") - col("n_tokens")) / budget.toDouble).cast("bigint"))
      .drop("cum")
  }

  /** Pack-level roll-up of [[packSequences]] — what a training-loader
    * consumer actually reads: one row per (stratum, pack_id) with its doc
    * count and token total. Closure invariant (property-tested): a
    * non-final pack p is only ever closed because the stratum's running
    * token total reached its boundary, i.e. cumulative tokens through p
    * ≥ (p+1)·budget. (The stronger "each pack alone holds ≥ budget" is
    * NOT guaranteed: a giant document overshoots its pack and may steal
    * a successor's span — such skipped/short packs inherit the overshoot,
    * which the cumulative form accounts for.) Same single shuffle on the
    * stratum key as packSequences — the roll-up agg reuses the window's
    * partitioning. */
  def packSummary(docs: DataFrame, budget: Long,
      strataCol: String = "lang", idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    packSequences(docs, budget, strataCol, idCol, textCol)
      .groupBy(col(strataCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_total"))

  /** Deterministic source-mixing sampler (the data-mixing/rebalancing step
    * of a training pipeline: "keep all of en, half of fr, a quarter of
    * de"): per-stratum Bernoulli rates applied as a pure filter on the
    * seeded id hash, with [[sampleByHash]]'s reproducibility — membership
    * is a function of (id, stratum) only, stable across runs, executors
    * and layouts. Strata absent from `rates` use `defaultRate`. The rate
    * table rides the plan as a map literal (no join); the filter pushes
    * toward the scan like any other predicate. Monotonic: raising a
    * stratum's rate only ever ADDS rows (hash thresholding), so rate
    * sweeps nest — useful for mixture ablations off one corpus. */
  def sampleByHashStratified(docs: DataFrame, rates: Map[String, Double],
      defaultRate: Double, strataCol: String = "lang", seed: Int = 0,
      idCol: String = "doc_id", portable: Boolean = false): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val rateCol =
      if (rates.isEmpty) lit((defaultRate * 1000000).toLong)
      else coalesce(
        // try_element_at: ANSI element_at throws on missing map keys
        try_element_at(
          map(rates.toSeq.sorted.flatMap { case (k, v) =>
            Seq(lit(k), lit((v * 1000000).toLong)) }: _*),
          col(strataCol)),
        lit((defaultRate * 1000000).toLong))
    docs.filter(slotOf("smx", seed, col(idCol), portable) < rateCol)
  }

  /** Deterministic train/val/test split assignment: a pure CASE over the
    * seeded id hash — membership is a function of (id, seed) only, so
    * re-runs, executor counts, and layouts never move a document across
    * a split boundary (the train/test-leakage hazard of
    * DataFrame.randomSplit), and growing the corpus never reassigns an
    * existing doc. Weights are 1e6-scaled cumulative thresholds over the
    * same slot space as [[sampleByHash]]; the last split absorbs the
    * integer-truncation residual so the intervals exactly partition
    * [0, 1e6). Laws (spec-asserted): every doc lands in exactly one
    * split; assignment commutes with any corpus filter (subset
    * stability). Pure codegen'd filter-shaped projection — no shuffle,
    * no rand(), pushdown-friendly. */
  def assignSplits(docs: DataFrame,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
      seed: Int = 0, idCol: String = "doc_id",
      portable: Boolean = false): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0),
      "split weights must be >= 0")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _)
      .map(w => (w * 1000000).toLong)
    val slot = slotOf("spl", seed, col(idCol), portable)
    val assign = splits.init.zipWithIndex
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), i)) =>
        val c = slot < cum(i + 1)
        Some(acc.fold(when(c, name))(_.when(c, name)))
      }
      .fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    docs.select(col(idCol), assign.as("split"))
  }

  /** Deterministic global training-order shuffle: every row gets a unique
    * contiguous rank 1..n in seeded-hash order — "shuffle the corpus
    * before sharding" with run-to-run reproducibility (rank is a function
    * of the id and seed only, never of scan order or layout).
    *
    * Scale shape: a single global window would serialize the corpus
    * through one task (see [[packSequences]]'s anti-pattern note), so the
    * rank is computed bucket-wise. The top hash bits define `buckets`
    * ORDER-ALIGNED buckets (every key in bucket b sorts before every key
    * in bucket b+1 — floor division preserves order), so
    * global rank = bucket offset + within-bucket rank. Per-bucket counts
    * are one map-side-combined agg (≤ buckets rows); their running-sum
    * window is over that bounded table only; offsets broadcast back; the
    * within-bucket row_number windows run at `buckets`-way parallelism
    * with ~n/buckets rows each. Choose buckets ≈ the cluster task count. */
  def globalShuffleRank(docs: DataFrame, seed: Int = 0, buckets: Int = 256,
      idCol: String = "doc_id", portable: Boolean = false): DataFrame = {
    require(buckets >= 1 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two")
    val shift =
      (if (portable) 60 else 64) - Integer.numberOfTrailingZeros(buckets)
    val key =
      if (portable) Dedup.portableHash60(seed, col(idCol).cast("string"))
      else xxhash64(lit("shf"), lit(seed), col(idCol))
    val keyed = docs.select(col(idCol).as("doc_id"), key.as("skey"),
      shiftright(key, shift).as("bucket"))
    val offsets = keyed.groupBy("bucket").agg(count(lit(1)).as("bn"))
      .withColumn("offset",
        coalesce(sum(col("bn")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "offset")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("skey"), col("doc_id"))
    keyed.join(broadcast(offsets), "bucket")
      .withColumn("shuffle_rank",
        (col("offset") + row_number().over(w)).cast("bigint"))
      .select(col("doc_id"), col("shuffle_rank"))
  }
}

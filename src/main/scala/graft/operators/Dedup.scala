package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale corpus deduplication operators (training-data pipeline
  * surface; builder prompt "Deduplication" + SURVEY.md §2).
  *
  * All operators are pure DataFrame plans: shingling and signatures are
  * codegen'd expressions (no UDFs), candidate generation is an inverted-
  * index / band equi-join (shuffle on the band key — the standard
  * scale-out pattern), and exact verification happens only on candidate
  * pairs, never all pairs.
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct text with its
    * duplicate count and representative (min) id. */
  def exactByText(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("min_doc"))

  /** Distinct word n-gram shingles per doc: (id, shingle).
    * `maxDocFreq`, when set, drops shingles occurring in more than that
    * many docs — the standard stop-shingle pruning that keeps the
    * inverted-index join from exploding on common boilerplate at corpus
    * scale. */
  def shingles(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text", maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val w = split(col(textCol), " ")
    val sh = docs.select(col(idCol).as("id"),
        explode(transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
          .as("shingle"))
      .distinct()
    if (maxDocFreq == Long.MaxValue) sh
    else {
      val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDocFreq)
      sh.join(freq.select("shingle"), "shingle")
    }
  }

  /** Exact n-gram Jaccard near-duplicate pairs via inverted-index
    * self-join: emits (a, b, jaccard) for a < b with jaccard ≥ minJaccard.
    * Shuffles on the shingle key; only co-shingled pairs are ever
    * materialized. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double,
      idCol: String = "doc_id", textCol: String = "text",
      maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val sh = shingles(docs, n, idCol, textCol, maxDocFreq).cache()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("x").join(sh.as("y"), col("x.shingle") === col("y.shingle"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sa"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "sb"), "b")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sa") + col("sb") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("a", "b", "jaccard")
  }

  /** MinHash signature column: array of `numHashes` minima of seeded
    * xxhash64 over the doc's shingle set. Pure expressions (min over a
    * groupBy), deterministic. Input: (id, shingle). */
  def minHashSignatures(sh: DataFrame, numHashes: Int): DataFrame =
    sh.groupBy("id").agg(
      array((0 until numHashes).map(j =>
        min(xxhash64(lit(j), col("shingle")))): _*).as("sig"))

  /** MinHash + LSH banding: candidate pairs whose estimated Jaccard
    * (fraction of agreeing hash slots) ≥ minEstJaccard. Bands of size
    * rows = numHashes/bands are hashed and equi-joined — the classic
    * sub-quadratic near-dup path (probabilistic recall; exact-verify
    * downstream with [[ngramJaccardPairs]] semantics if needed). */
  def minHashLshPairs(docs: DataFrame, n: Int, numHashes: Int, bands: Int,
      minEstJaccard: Double, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minHashSignatures(shingles(docs, n, idCol, textCol), numHashes)
      .cache()
    val banded = sig.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b) +: (0 until rows).map(r =>
          element_at(col("sig"), b * rows + r + 1)): _*)): _*))
        .as(Seq("band", "bandhash")))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bandhash") === col("y.bandhash") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    cands
      .join(sig.select(col("id").as("a"), col("sig").as("siga")), "a")
      .join(sig.select(col("id").as("b"), col("sig").as("sigb")), "b")
      .withColumn("est_jaccard",
        round(aggregate(zip_with(col("siga"), col("sigb"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes, 6))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("a", "b", "est_jaccard")
  }

  /** 64-bit SimHash per doc from token hashes — 64 conditional-sum
    * aggregate columns (all codegen'd), bits set where the weighted sum is
    * positive. */
  def simHash(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$b")
    }
    tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), (0 until 64).map(b =>
        when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
        .reduce((a: Column, c: Column) => a.bitwiseOR(c)).as("simhash"))
  }

  /** Near-dup pairs with simhash Hamming distance ≤ maxHamming, found via
    * block banding: split the 64-bit hash into (maxHamming+1) blocks — by
    * pigeonhole, any pair within the distance agrees on at least one
    * block, so an equi-join per block finds all of them sub-quadratically. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val blocks = maxHamming + 1
    val width = 64 / blocks
    val sh = simHash(docs, idCol, textCol).cache()
    val banded = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until blocks).map(b =>
        shiftright(col("simhash"), b * width)
          .bitwiseAND((1L << width) - 1)): _*)).as(Seq("blk", "key")))
    val hamming = {
      val x = col("x.simhash").bitwiseXOR(col("y.simhash"))
      bit_count(x)
    }
    banded.as("x").join(banded.as("y"),
        col("x.blk") === col("y.blk") && col("x.key") === col("y.key") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        hamming.cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}

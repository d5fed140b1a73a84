package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines over the
 * `documents` table: token/char stats, quality scoring, language-ID
 * (n-gram/stopword heuristic), SimHash + rolling-hash fingerprints, MinHash
 * signatures for LSH dedup.
 *
 * Everything that feeds a DuckDB oracle is expressed in pure column
 * functions with cross-engine-deterministic semantics (integer counts, no
 * float rounding); the hash-based ops are deterministic Scala (same result
 * every run, every partitioning).
 */
object TextOps {

  /** Integer token/char statistics (oracle-checkable: counts only). */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
        .cast("long").as("n_tokens_ws"),
      (length(col("text")) - length(regexp_replace(col("text"), "\\.", "")))
        .cast("long").as("n_periods"),
      (length(col("text")) - length(regexp_replace(col("text"), ",", "")))
        .cast("long").as("n_commas"))

  /** Quality heuristics as integers/booleans (deterministic across engines). */
  def qualityFlags(docs: DataFrame): DataFrame = {
    val nChars = length(col("text"))
    val nTokens = nChars - length(regexp_replace(col("text"), " ", "")) + 1
    docs.select(
      col("doc_id"),
      nChars.cast("long").as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      (nChars >= 200).as("len_ok"),
      (nTokens >= 20).as("tok_ok"),
      (nChars < 20000).as("not_huge"))
  }

  // 64-bit FNV-1a — stable, dependency-free, same on every JVM
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SimHash64 over whitespace tokens (bit-voting on FNV64 token hashes). */
  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    var start = 0; val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val h = fnv64(text.substring(start, i))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Rolling-hash document fingerprint: min of FNV64 over char 16-grams
    * (winnowing-lite; cheap near-dup signal). */
  def fingerprint(text: String, gram: Int = 16): Long = {
    if (text.length < gram) return fnv64(text)
    var best = Long.MaxValue
    var i = 0
    while (i + gram <= text.length) {
      val h = fnv64(text.substring(i, i + gram))
      if (h < best) best = h
      i += 1
    }
    best
  }

  /** MinHash signature over character `gram`-shingles, `k` permutations
    * (xor-shift salted FNV). */
  def minhash(text: String, k: Int = 32, gram: Int = 5): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    if (text.length < gram) return sig.map(_ => fnv64(text))
    var i = 0
    while (i + gram <= text.length) {
      val base = fnv64(text.substring(i, i + gram))
      var j = 0
      while (j < k) {
        // cheap universal-ish rehash per permutation
        var h = base ^ (0x9e3779b97f4a7c15L * (j + 1))
        h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Exact n-gram Jaccard similarity between two texts. */
  def ngramJaccard(a: String, b: String, gram: Int = 5): Double =
    sortedJaccard(shingleHashes(a, gram), shingleHashes(b, gram))

  /** Sorted distinct FNV64 hashes of the text's char `gram`-shingles —
    * computed ONCE per document; candidate verification intersects these
    * arrays instead of re-shingling both texts per candidate pair. */
  def shingleHashes(s: String, gram: Int = 5): Array[Long] = {
    if (s.length < gram) return Array(fnv64(s))
    val out = new Array[Long](s.length - gram + 1)
    var i = 0
    while (i + gram <= s.length) { out(i) = fnv64(s.substring(i, i + gram)); i += 1 }
    java.util.Arrays.sort(out)
    // dedup in place
    var w = 0; var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    java.util.Arrays.copyOf(out, w)
  }

  /** Jaccard of two sorted distinct hash arrays (merge intersection). */
  def sortedJaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  /** Tiny language-ID heuristic: stopword hit counting over a fixed set per
    * language; returns the argmax language or "und". Deterministic. */
  def langId(text: String): String = {
    val lower = text.toLowerCase
    val toks = lower.split("[^a-zà-ÿ]+").iterator.filter(_.nonEmpty).take(512).toArray
    if (toks.isEmpty) return "und"
    var best = "und"; var bestHits = 0
    LangStopwords.foreach { case (lang, words) =>
      var hits = 0
      var i = 0
      while (i < toks.length) { if (words.contains(toks(i))) hits += 1; i += 1 }
      if (hits > bestHits) { bestHits = hits; best = lang }
    }
    best
  }

  private val LangStopwords: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "on"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "für", "auf"),
    "fr" -> Set("le", "la", "les", "et", "est", "dans", "que", "une", "pour", "qui", "avec", "sur"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "en", "que", "una", "por", "con", "para"),
    "it" -> Set("il", "la", "che", "di", "e", "un", "una", "per", "con", "sono", "del", "non"))

  // ------------------------------------------------- DataFrame-level dedup

  /** Exact dedup groups: content hash → group size + keeper id. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))

  /** MinHash-LSH candidate pairs verified by exact n-gram Jaccard ≥ `tau`.
    * bands × rows = k; candidates join on (band, band-hash buckets).
    *
    * Scale guards (Common Crawl WILL produce mass-duplicated boilerplate):
    *  - buckets larger than `maxBucket` switch from the quadratic a<b
    *    self-join to star linking against the bucket's min doc id — a
    *    million-document boilerplate bucket emits 10⁶ pairs, not 10¹²;
    *  - verification intersects per-doc precomputed sorted shingle arrays
    *    (no per-pair re-shingling of both texts).
    *
    * KNOWN RECALL LOSS in star-linked buckets: each candidate (bmin, doc) is
    * Jaccard-verified independently, so two docs that are ≥tau similar to
    * EACH OTHER but both <tau to the bucket-min doc produce no pair from
    * that bucket. In practice an over-`maxBucket` LSH bucket is a
    * boilerplate/near-identical cluster where pairwise similarities are all
    * high, and a dropped pair is usually recovered by one of the other
    * `bands - 1` bucketings; dedup GROUPS (connected components over the
    * verified pairs) are what downstream uses, and those stay connected
    * whenever each doc links to ANY verified neighbor. Callers needing exact
    * pairwise recall inside mega-buckets should raise `maxBucket` (paying
    * the quadratic self-join) — the trade is deliberate at the 10¹²-doc
    * scale target. (simhashDupPairs has NO such loss: its buckets are exact
    * hamming-0 equality classes, so star links are lossless there.)
    */
  def minhashDedupPairs(docs: DataFrame, k: Int = 32, bands: Int = 8,
                        gram: Int = 5, tau: Double = 0.8,
                        maxBucket: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.expressions.Window
    val rows = k / bands
    val sigUdf = udf { (t: String) => minhash(t, k, gram) }
    val withSig = docs.select(col("doc_id"), sigUdf(col("text")).as("sig"))
    val bandUdf = udf { (sig: Seq[Long]) =>
      (0 until bands).map { b =>
        val slice = sig.slice(b * rows, (b + 1) * rows)
        (b, slice.foldLeft(0xcbf29ce484222325L)((h, v) => (h ^ v) * 0x100000001b3L))
      }
    }
    // candidate generation shuffles only (band, bucket, id) — shingle arrays
    // join in late, once per distinct candidate pair, not per bucket collision
    val banded = withSig
      .withColumn("bh", explode(bandUdf(col("sig"))))
      .select(col("doc_id"), col("bh._1").as("band"), col("bh._2").as("bucket"))
    val w = Window.partitionBy("band", "bucket")
    val sized = banded
      .withColumn("bsz", count(lit(1)).over(w))
      .withColumn("bmin", min(col("doc_id")).over(w))
    val small = sized.where(col("bsz") <= maxBucket)
    val l = small.select(col("band"), col("bucket"), col("doc_id").as("a"))
    val r = small.select(col("band"), col("bucket"), col("doc_id").as("b"))
    val smallPairs = l.join(r, Seq("band", "bucket")).where(col("a") < col("b"))
      .select(col("a"), col("b"))
    val starPairs = sized.where(col("bsz") > maxBucket && col("doc_id") =!= col("bmin"))
      .select(col("bmin").as("a"), col("doc_id").as("b"))
    val candidates = smallPairs.unionByName(starPairs).distinct()
    val shUdf = udf { (t: String) => shingleHashes(t, gram) }
    val shingles = docs.select(col("doc_id"), shUdf(col("text")).as("sh"))
    val jacUdf = udf { (x: Seq[Long], y: Seq[Long]) =>
      sortedJaccard(x.toArray, y.toArray) }
    candidates
      .join(shingles.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(shingles.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .withColumn("jaccard", jacUdf(col("sha"), col("shb")))
      .where(col("jaccard") >= tau)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /**
   * Dedup GROUPS from verified near-dup pairs: connected components by
   * iterative min-label propagation — each doc converges to the smallest
   * doc_id reachable through the pair graph (the group's canonical keeper).
   * This is what a training pipeline consumes downstream of pair
   * generation: keep one doc per group, drop the rest.
   *
   * Scale shape: near-dup components are stars/cliques (diameter ≤ ~2 from
   * the star-linked bucket construction), so propagation converges in 2-3
   * rounds of one equi-join + one agg each; every round materializes
   * (cache + count) so the lineage stays flat. For adversarial long-chain
   * graphs the classic large-star/small-star alternation bounds rounds by
   * O(log n) — the same loop with two join rules; not needed for the dedup
   * workload shape.
   *
   * Returns (doc_id, group_id) for every doc that appears in some pair
   * (singletons are their own group by definition and are omitted, like the
   * pair output itself).
   */
  def dupGroups(pairs: DataFrame, maxIter: Int = 20,
                localThreshold: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // the pair pipeline (LSH + verification) feeds the size probe AND the
    // grouping — cache it so it runs once, not once per action
    val pc = pairs.cache()
    // size-based dispatch (same philosophy as the join chooser): a pair set
    // that fits on the driver resolves in one collect + union-find — two
    // jobs instead of one per propagation round. The distributed loop below
    // is the 10¹²-doc path.
    val nPairs = pc.count()
    if (nPairs <= localThreshold) {
      val es = pc.select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      return parent.keys.toSeq.map(d => (d, find(d))).toDF("doc_id", "group_id")
    }
    // undirected edges, both directions
    val edges = pc.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pc.select(col("b").as("src"), col("a").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("group_id", col("doc_id")).cache()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // each doc takes min(own label, neighbors' labels)
      val nbr = edges.join(labels.withColumnRenamed("doc_id", "dst"), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("group_id")).as("nbr_min"))
      val next = labels.join(nbr, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("group_id"), coalesce(col("nbr_min"), col("group_id")))
            .as("group_id"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("group_id", "old"), Seq("doc_id"))
        .where(col("group_id") =!= col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    labels
  }

  /** SimHash near-dup pairs: equal simhash bucket (hamming-0 fast path).
    * Buckets above `maxBucket` star-link to the min doc id instead of the
    * quadratic self-join (same dup groups transitively, linear output). */
  def simhashDupPairs(docs: DataFrame, maxBucket: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.expressions.Window
    val shUdf = udf { (t: String) => simhash64(t) }
    val withH = docs.select(col("doc_id"), shUdf(col("text")).as("sh"))
    val w = Window.partitionBy("sh")
    val sized = withH
      .withColumn("bsz", count(lit(1)).over(w))
      .withColumn("bmin", min(col("doc_id")).over(w))
    val small = sized.where(col("bsz") <= maxBucket)
    val l = small.select(col("sh"), col("doc_id").as("a"))
    val r = small.select(col("sh"), col("doc_id").as("b"))
    val smallPairs = l.join(r, Seq("sh")).where(col("a") < col("b"))
      .select(col("a"), col("b"), col("sh"))
    val starPairs = sized.where(col("bsz") > maxBucket && col("doc_id") =!= col("bmin"))
      .select(col("bmin").as("a"), col("doc_id").as("b"), col("sh"))
    smallPairs.unionByName(starPairs)
  }
}

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

  /** BPE-style pre-tokenizer pattern (simplified GPT-2 shape): letter runs,
    * digit runs, single punctuation marks. Restricted to an ASCII character
    * class so Java (Spark) and RE2-ish (DuckDB oracle) engines agree. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Integer token/char statistics (oracle-checkable: counts only).
    * n_tokens_re is the LLM-budget estimator: BPE pre-tokenizer piece count
    * (letters/digits/punct runs), the standard first-order proxy for
    * tokenizer output length. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
        .cast("long").as("n_tokens_ws"),
      regexp_count(col("text"), lit(BpeTokenPattern))
        .cast("long").as("n_tokens_re"),
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
    import graft.functions.TextExprs
    // signature + per-band bucket hash as codegen expressions (TextKernels):
    // these run once per document at the 10¹²-row target — no ScalaUDF
    // boxing in the path. Band index = array position via posexplode
    // (bit-identical buckets to the former (band, hash) struct explode).
    val withSig = docs.select(col("doc_id"),
      TextExprs.minhashSig(col("text"), k, gram).as("sig"))
    // candidate generation shuffles only (band, bucket, id) — shingle arrays
    // join in late, once per distinct candidate pair, not per bucket collision
    val banded = withSig
      .select(col("doc_id"),
        posexplode(TextExprs.bandBuckets(col("sig"), bands)).as(Seq("band", "bucket")))
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
    // Round-6 note: a candidate-id semi-join prune before shingling (shingle
    // only docs appearing in a candidate pair) was tried and MEASURED SLOWER
    // at bench scale (+0.8 s at sf0.1): the extra distinct + broadcast
    // stages and the second evaluation of the LSH candidate subtree cost
    // more than the shingle kernel they save. Kept as-is: the full-corpus
    // shingle projection evaluates lazily inside each verification join's
    // map stage, and the candidate join keys prune at the exchange.
    val shingles = docs.select(col("doc_id"),
      TextExprs.shingleHashes(col("text"), gram).as("sh"))
    candidates
      .join(shingles.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(shingles.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .withColumn("jaccard", TextExprs.sortedJaccard(col("sha"), col("shb")))
      .where(col("jaccard") >= tau)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /**
   * Dedup GROUPS from verified near-dup pairs: connected components — each
   * doc converges to the smallest doc_id reachable through the pair graph
   * (the group's canonical keeper). This is what a training pipeline
   * consumes downstream of pair generation: keep one doc per group, drop
   * the rest.
   *
   * Distributed path: large-star / small-star alternation (Kiveris et al.,
   * "Connected Components in MapReduce and Beyond", SoCC'14 — public
   * algorithm). Each round applies ONE star rewrite — large-star hangs
   * every larger neighbor of u onto min(Γ⁺(u)), small-star hangs u and its
   * smaller neighbors there — alternating, and converges to stars centered
   * at each component's minimum node in O(log n) rounds on ANY graph shape.
   * A rewrite costs ONE shuffle: neighborhood min + group marker are window
   * functions over a single partitionBy(src) exchange (the groupBy + join +
   * distinct formulation paid three). Every round materializes (cache +
   * fingerprint agg) so the lineage stays flat; convergence is an edge-set
   * fixed point detected by (count, bit_xor of per-edge hash) — xor, not
   * sum, so ANSI overflow checking never fires — and then CONFIRMED with
   * exact set-equality checks of both rewrites, so a 64-bit fingerprint
   * collision can never silently bless an unconverged edge set.
   *
   * Cache hygiene: every intermediate (the input pair pipeline, each
   * round's edge set) is unpersisted before return; the RETURNED frame is
   * cached and materialized (lineage on it is the whole iterative loop —
   * callers that are done with it may `unpersist()`).
   *
   * Returns (doc_id, group_id) for every doc that appears in some pair
   * (singletons are their own group by definition and are omitted, like the
   * pair output itself).
   */
  def dupGroups(pairs: DataFrame, maxIter: Int = 50,
                localThreshold: Long = 1L << 20): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // Size-based dispatch (same philosophy as the join chooser): a pair set
    // that fits on the driver resolves with one union-find. Round-6 change:
    // the probe is a LIMIT-bounded collect on the UNCACHED pipeline instead
    // of the former cache+count+collect — caching compiled the whole LSH
    // pipeline into an InMemoryRelation whose physical plan is frozen
    // WITHOUT adaptive execution (no runtime broadcast conversion, no
    // partition coalescing: every stage ran at the full static shuffle
    // partition count), and the probe itself was a second job. One bounded
    // collect keeps AQE live and bounds driver memory exactly like the old
    // count probe did: ≤ localThreshold rows land on the driver, else we
    // fall through to the distributed loop (which recomputes the pipeline
    // once, cached — the same two total passes the count probe paid).
    val probeLimit = (math.min(localThreshold, Int.MaxValue - 9L) + 1L).toInt
    val es0 = pairs.select(col("a"), col("b")).limit(probeLimit).collect()
    if (es0.length <= localThreshold) {
      val es = es0.map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      es.foreach { case (a, b) =>
        // degenerate self-pairs are dropped, matching the distributed
        // path's canonicalization — same output on either side of the
        // size dispatch
        if (a != b) {
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
      return parent.keys.toSeq.map(d => (d, find(d))).toDF("doc_id", "group_id")
    }
    // distributed path: cache the pair pipeline — it feeds the partition
    // sizing count AND the canonical edge-set construction below (and at
    // this size the per-round loop opts out of AQE anyway, so the
    // cached-plan trade-off is moot)
    val pc = pairs.cache()
    val nPairs = pc.count()
    // edges kept canonical as (hi > lo); adjacency rebuilt per rewrite
    def adj(e: DataFrame): DataFrame =
      e.select(col("hi").as("src"), col("lo").as("dst"))
        .unionByName(e.select(col("lo").as("src"), col("hi").as("dst")))
    // Each star rewrite is ONE shuffle: the closed-neighborhood minimum and
    // a one-row-per-group marker are both window functions over the same
    // partitionBy(src) exchange — no groupBy+join (3 shuffles in the
    // previous formulation) and no per-round distinct. Duplicate (hi, lo)
    // rows across groups are tolerated instead of deduped: both rewrites
    // are duplicate-insensitive (min is), each input adjacency row emits at
    // most one output row so the multiset never grows, and one small-star
    // pass collapses multiplicity at the fixed point. A hot star center
    // streams through the window's spillable row buffer rather than
    // materializing a collect_set array row.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
    val wo = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy("dst")
    // Partition count sized to the DATA, not the session's shuffle/default
    // parallelism: the loop's cached rounds opt out of AQE coalescing, so a
    // small round would otherwise schedule the full session partition count
    // in every stage — pure task overhead (measured 2× at 2M pairs / 128
    // parts vs data-sized). ~256k adjacency rows per task keeps moderate
    // inputs parallel across cores while a 10¹²-edge input still lands at
    // the 2⁰ᵉ-partition clamp (~2M rows/task). The explicit repartition
    // hash-clusters by src, which SATISFIES the window's required
    // distribution — Spark plans no second exchange, so this renames the
    // loop's one shuffle, not adds one.
    val parts = {
      val rowsPerPart = 1L << 18
      val byData = (2 * nPairs + rowsPerPart - 1) / rowsPerPart
      math.max(2L, math.min(byData, 1L << 20)).toInt
    }
    def annotated(e: DataFrame): DataFrame =
      adj(e).repartition(parts, col("src")).select(col("src"), col("dst"),
        least(col("src"), min(col("dst")).over(w)).as("m"),
        row_number().over(wo).as("rn"))
    // large-star(u): ∀v ∈ Γ(u), v > u → edge (v, min(Γ⁺(u)))
    // hi > lo holds by construction: dst > src ≥ m
    def largeStar(e: DataFrame): DataFrame =
      annotated(e).where(col("dst") > col("src"))
        .select(col("dst").as("hi"), col("m").as("lo"))
    // small-star(u): ∀v ∈ Γ(u) ∪ {u}, v ≤ u, v ≠ m → edge (v, min(Γ⁺(u)));
    // the rn=1 row stands in for the one-per-group (u, m) emit
    def smallStar(e: DataFrame): DataFrame = {
      val a = annotated(e)
      a.where(col("dst") < col("src") && col("dst") =!= col("m"))
        .select(col("dst").as("hi"), col("m").as("lo"))
        .unionByName(
          a.where(col("rn") === 1 && col("src") =!= col("m"))
            .select(col("src").as("hi"), col("m").as("lo")))
    }
    // fixed-point fingerprint: one flat agg, no collect of the edge set
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("hi"), col("lo"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // every round: cache + materialize + FLATTEN (LogicalRDD re-root). The
    // flatten is load-bearing — without it round N's logical plan embeds
    // rounds 1..N-1 with branching ≥2 (adj() references the edge set twice),
    // an exponentially-growing tree that OOMs in plan stringification alone
    // by ~15 rounds. Evaluation still flows through each round's cache.
    def flat(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftColumnBridge.flattenLineage(df)
    var curCache = pc.select(greatest(col("a"), col("b")).as("hi"),
        least(col("a"), col("b")).as("lo"))
      .where(col("hi") =!= col("lo")).distinct().cache()
    var cur = flat(curCache)
    var fp = fingerprint(cur)
    pc.unpersist()
    // exact joint-fixed-point confirmation: the 64-bit fingerprint alone
    // could collide between two DIFFERENT edge sets and silently declare
    // convergence on an unconverged set — whose label extraction emits
    // conflicting labels. Once fingerprints say "stable", confirm with
    // set-exact checks (except() both ways) that BOTH rewrites leave the
    // edge set unchanged; a false positive is then impossible. Runs once
    // at the end, not per round.
    // One job, not four except()s: tag the input set and both rewrite
    // outputs, group by edge, and check every edge carries all three tags
    // (bit_or = 7). An edge present in one set but not another yields a
    // different tag union → not a fixed point. Set semantics exactly
    // (duplicate rows just re-OR the same bit).
    def exactFixedPoint(e: DataFrame): Boolean =
      e.select(col("hi"), col("lo"), lit(1).as("s"))
        .unionByName(largeStar(e).select(col("hi"), col("lo"), lit(2).as("s")))
        .unionByName(smallStar(e).select(col("hi"), col("lo"), lit(4).as("s")))
        .groupBy("hi", "lo").agg(bit_or(col("s")).as("t"))
        .where(col("t") =!= 7).isEmpty
    // alternate ONE star rewrite per round (the canonical Kiveris et al.
    // formulation — converges the same), fingerprint-checking after each:
    // half the per-round shuffle count of the paired formulation and the
    // loop can stop mid-pair. Converged = both consecutive rewrites left
    // the fingerprint unchanged, exactly confirmed above.
    var converged = false
    var streak = 0
    var i = 0
    val maxRewrites = 2 * maxIter // same total work bound as maxIter LS+SS pairs
    while (!converged && i < maxRewrites) {
      val nextCache =
        (if (i % 2 == 0) largeStar(cur) else smallStar(cur)).cache()
      val next = flat(nextCache)
      val nextFp = fingerprint(next) // materializes nextCache
      curCache.unpersist()
      curCache = nextCache
      cur = next
      streak = if (nextFp == fp) streak + 1 else 0
      fp = nextFp
      i += 1
      if (streak >= 2) {
        converged = exactFixedPoint(cur)
        if (!converged) streak = 0 // fingerprint collision — keep iterating
      }
    }
    // the label extraction below is only valid at the star fixed point — an
    // unconverged edge set would silently emit conflicting labels per doc,
    // which is strictly worse than failing. 2·log₂(n)+C rounds suffice for
    // any graph (Kiveris et al.), so the default cap of 50 covers inputs
    // beyond 10¹² nodes; hitting it means something is genuinely wrong.
    if (!converged) {
      curCache.unpersist()
      throw new IllegalStateException(
        s"dupGroups: large-star/small-star did not reach the star fixed " +
          s"point in $maxRewrites rewrites — raise maxIter")
    }
    // at the fixed point every component is a star centered at its minimum:
    // leaves are the hi side, centers the lo side. One distinct over the
    // union — the edge multiset may legitimately carry duplicate star edges
    // at the fixed point (the rewrites no longer dedup per round).
    val labels = cur.select(col("hi").as("doc_id"), col("lo").as("group_id"))
      .unionByName(
        cur.select(col("lo").as("doc_id"), col("lo").as("group_id")))
      .distinct()
      .cache()
    labels.count()
    curCache.unpersist()
    labels
  }

  /** SimHash near-dup pairs: equal simhash bucket (hamming-0 fast path).
    * Buckets above `maxBucket` star-link to the min doc id instead of the
    * quadratic self-join (same dup groups transitively, linear output). */
  def simhashDupPairs(docs: DataFrame, maxBucket: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.sql.expressions.Window
    val withH = docs.select(col("doc_id"),
      graft.functions.TextExprs.simhash64(col("text")).as("sh"))
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

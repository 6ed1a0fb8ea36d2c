package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{IntersectCardSorted, TextFns}

/** Near-duplicate detection for document corpora: MinHash + LSH banding,
  * SimHash fingerprints, and exact n-gram Jaccard verification.
  *
  * Design for 100 TB:
  *   - signatures/fingerprints are pure expression pipelines per row (no
  *     shuffle, fully codegen'd higher-order functions over the shingle
  *     array);
  *   - candidate generation is ONE shuffle on (band_index, band_hash) —
  *     classic LSH banding, so only same-bucket docs ever meet; the
  *     all-pairs O(n²) never materializes;
  *   - a per-bucket cap (`bucketCap`) guards against degenerate buckets
  *     (boilerplate text) producing quadratic blowup — capped buckets are
  *     dropped, the standard production trade-off;
  *   - exact-Jaccard verification joins shingle sets only for the candidate
  *     pairs (two hash joins on doc id).
  *
  * Two hash families:
  *   - `HexMd5` — md5 hex strings, lexicographic min; deliberately chosen so
  *     the DuckDB oracle can reproduce signatures bit-for-bit;
  *   - `Xx64` — xxhash64 longs; ~10x cheaper, the scale path (no SQL oracle,
  *     property-tested instead).
  */
object TextDedup {

  sealed trait HashFamily
  case object HexMd5 extends HashFamily
  case object Xx64 extends HashFamily

  /** MinHash signature of a distinct-shingle array: element i is
    * min over shingles s of h(i || "|" || s).
    */
  def minhashSignature(shingles: Column, numHashes: Int, family: HashFamily = Xx64): Column = {
    val sig = family match {
      case HexMd5 =>
        transform(sequence(lit(0), lit(numHashes - 1)),
          i => array_min(transform(shingles, s => md5(concat(i.cast("string"), lit("|"), s)))))
      case Xx64 =>
        transform(sequence(lit(0), lit(numHashes - 1)),
          i => array_min(transform(shingles, s => xxhash64(i, s))))
    }
    when(size(shingles) > 0, sig).otherwise(lit(null))
  }

  /** Per-doc banded signature rows: (id, band, band_hash). `numHashes` must
    * be bands * rowsPerBand. Exploded representation feeds the bucket join.
    *
    * Computed as explode(shingles) -> numHashes plain hash columns ->
    * groupBy(id).agg(min...) rather than a nested higher-order-function
    * fold: HOF lambdas evaluate interpreted (outside whole-stage codegen),
    * which made the signature stage dominate the whole pipeline; the
    * explode+agg shape keeps every hash inside codegen and gets map-side
    * partial min aggregation — at 100 TB the shuffle carries only
    * numHashes partial minima per doc per map partition.
    */
  def bandedSignatures(
      docs: DataFrame,
      idCol: String,
      shingles: Column,
      bands: Int,
      rowsPerBand: Int,
      family: HashFamily = Xx64): DataFrame = {
    val numHashes = bands * rowsPerBand
    // HexMd5: the classic Broder construction — ONE base hash per shingle
    // (first 7 md5 hex digits as a 28-bit int, SQL-reproducible), permuted
    // by numHashes linear-congruential functions h_i(b) = (A_i*b + B_i)
    // mod (2^31-1). Exact long arithmetic (A_i*b < 2^59), so an oracle
    // replays it bit-for-bit; 12x fewer md5 calls than hashing per (i, s).
    val M = 2147483647L
    val hashOf: Int => Column = family match {
      case HexMd5 => i => {
        val a = (1103515245L * (i + 1)) % M
        val b = 12345L * (i + 1)
        pmod(lit(a) * col("__base") + lit(b), lit(M))
      }
      case Xx64 => i => xxhash64(lit(i), col("__sh"))
    }
    val exploded = docs.select(col(idCol), explode(shingles).as("__sh"))
    val based = family match {
      case HexMd5 => exploded.withColumn("__base",
        conv(substring(md5(col("__sh")), 1, 7), 16, 10).cast("long"))
      case Xx64 => exploded
    }
    val sig = based
      .groupBy(col(idCol))
      .agg(min(hashOf(0)).as("__m0"), (1 until numHashes).map(i => min(hashOf(i)).as(s"__m$i")): _*)
    // band b's hash covers signature positions [b*rowsPerBand, (b+1)*rowsPerBand)
    val bandHash = (b: Int) => {
      val members = (0 until rowsPerBand).map(r => col(s"__m${b * rowsPerBand + r}"))
      family match {
        case HexMd5 => md5(concat_ws("|", lit(b.toString) +: members: _*))
        case Xx64   => xxhash64(lit(b) +: members: _*)
      }
    }
    sig
      .select(col(idCol), explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandHash(b).as("band_hash"))): _*)).as("__b"))
      .select(col(idCol), col("__b.band").as("band"), col("__b.band_hash").as("band_hash"))
  }

  /** Drop every row of a bucket whose population exceeds `bucketCap`.
    *
    * Shape matters at 100 TB: a count WINDOW over (band, band_hash) shuffles
    * EVERY row of a bucket to one task just to count it — a degenerate
    * bucket (empty shingle, boilerplate band) can be 10⁸–10⁹ rows funneled
    * through a single reducer, usually only to be dropped. Instead the
    * bucket census is a keyed aggregate (map-side partial counts — each map
    * partition contributes ONE row per bucket regardless of population) and
    * the prune is a `left_anti` join against only the OVER-cap buckets.
    * That over-cap frame is bounded by #rows/bucketCap and in practice tiny
    * (degenerate buckets are rare), so AQE broadcasts it and the prune is a
    * map-only pass over the banded frame — the mega-bucket never lands on
    * any reducer at all. Same pattern as `Curation.winnowMatches`'s
    * over-common-fingerprint suppression. Output is identical to the
    * window formulation.
    */
  private[graft] def capBuckets(banded: DataFrame, bucketCap: Int): DataFrame = {
    val over = banded
      .groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > bucketCap)
      .select(col("band"), col("band_hash"))
    banded.join(over, Seq("band", "band_hash"), "left_anti")
  }

  /** LSH candidate pairs (a < b), deduplicated across bands. One shuffle on
    * (band, band_hash); buckets larger than `bucketCap` are dropped
    * map-side (see `capBuckets`).
    */
  def candidatePairs(banded: DataFrame, idCol: String, bucketCap: Int = 1000): DataFrame = {
    val capped = capBuckets(banded, bucketCap)
    val l = capped.select(col("band"), col("band_hash"), col(idCol).as("a_id"))
    val r = capped.select(col("band"), col("band_hash"), col(idCol).as("b_id"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** Sorted distinct 64-bit hashes of a shingle set — the cheap carrier for
    * exact-Jaccard verification: 8-byte elements instead of strings, and
    * sorted so intersection is a merge walk (`IntersectCardSorted`).
    * Jaccard counts are exact up to 64-bit hash collisions (negligible at
    * any realistic shingle cardinality).
    */
  def hashedShingles(shingles: Column): Column =
    sort_array(array_distinct(transform(shingles, s => xxhash64(s))))

  /** Hashed word-n-gram sets computed WITHOUT building shingle strings:
    * posexplode the tokens, window-lead the next n-1 tokens, hash the token
    * tuple directly. Tokens contain no separator characters (whitespace
    * tokenization), so tuple identity == joined-string identity — the set
    * cardinalities match the string-shingle formulation exactly (modulo
    * 64-bit collisions). Every step is codegen (the per-row shingle
    * transform this replaces is an interpreted higher-order function), and
    * the window + groupBy share the doc-id clustering (one exchange).
    */
  private[graft] def hashedNgramSets(
      docs: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      tokensCol: Column,
      n: Int): DataFrame = {
    val keys = blockCols.map(col) :+ col(idCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__pos"))
    val leads = (1 until n).map(k => lead(col("__tk"), k).over(w).as(s"__tk$k"))
    val gramCols = col("__tk") +: (1 until n).map(k => col(s"__tk$k"))
    docs
      .select(keys :+ posexplode(tokensCol).as(Seq("__pos", "__tk")): _*)
      .select(keys ++ Seq(col("__pos"), col("__tk")) ++ leads: _*)
      .filter(gramCols.map(_.isNotNull).reduce(_ && _))
      .groupBy(keys: _*)
      .agg(sort_array(collect_set(xxhash64(gramCols: _*))).as("__set"))
      .withColumn("__n", size(col("__set")))
  }

  /** Exact Jaccard from an |A∩B| column and the two set sizes: union by
    * inclusion-exclusion (sets are distinct, so |A∪B| = |A|+|B|-|A∩B|).
    * Takes the intersection as a pre-staged column so the merge walk runs
    * once per pair, not once per reference.
    */
  private[graft] def jaccardFromInter(inter: Column, na: Column, nb: Column): Column =
    inter.cast("double") / nullif(na + nb - inter, lit(0)).cast("double")

  /** Verify candidate pairs with exact Jaccard over distinct shingle sets;
    * keeps pairs with jaccard >= threshold.
    */
  def verifiedPairs(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      tokensCol: Column,
      shingleWords: Int,
      threshold: Double): DataFrame = {
    val sets = hashedNgramSets(docs, idCol, Seq(), tokensCol, shingleWords)
    // The candidate pair list is broadcast against the set table twice, so
    // the set build runs twice. Measured alternative (SHUFFLE_HASH on the
    // set side for Exchange reuse) was NET SLOWER: shuffling + hash-mapping
    // the array-heavy set rows twice costs more than one recompute, while
    // the pair list is bounded by the LSH bucket cap and broadcasts for
    // free. At persistent-pipeline scale, materialize `sets` once (it is
    // the signature table) and both joins become cheap probes.
    pairs
      .join(sets.select(col(idCol).as("a_id"), col("__set").as("__sa")), Seq("a_id"))
      .join(sets.select(col(idCol).as("b_id"), col("__set").as("__sb")), Seq("b_id"))
      .withColumn("__i", IntersectCardSorted(col("__sa"), col("__sb")))
      .withColumn("jaccard", jaccardFromInter(col("__i"), size(col("__sa")), size(col("__sb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Cross-corpus near-duplicate pairs — MinHash-LSH DECONTAMINATION: find
    * training documents that fuzzily duplicate evaluation documents (the
    * near-dup complement of the exact n-gram `Curation.contamination`;
    * paraphrased or lightly-edited leakage that exact gram containment
    * misses). Same banding/verify discipline as the self-join form, but the
    * band-bucket join runs LEFT x RIGHT across the two corpora — candidate
    * work is bounded by bucket caps per side and output by true cross-dup
    * mass, never |train| x |eval|. Downstream: `left_anti` the training
    * corpus on `a_id` to strip the flagged docs.
    *
    * Scale note: the eval side is typically tiny (benchmark suites) — its
    * capped banded frame broadcasts, so the training corpus is touched by
    * one map-side join plus the verify probes.
    *
    * Runs internally at FAMILY grain (the r9 lesson, applied engine-side):
    * every stage — shingles, minhash signature, band hashes, exact-Jaccard
    * verify — is a pure function of the text, so docs with identical text
    * on a side form a lossless family. Banding, the bucket cap (counted
    * member-WEIGHTED, sum of family sizes, so cap behavior is byte-identical
    * to the doc-grain formulation), candidate generation, and verification
    * all run once per distinct text per side; family pairs expand to doc
    * pairs at the end. On a duplicate-saturated corpus (replication factor
    * f) the doc-grain candidate set grows f²-quadratically — only the
    * OUTPUT is inherently f²-sized here, and expansion produces it from
    * base-bounded verify work.
    */
  def crossCorpusDupPairs(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 3,
      threshold: Double = 0.7,
      family: HashFamily = Xx64,
      bucketCap: Int = 1000): DataFrame = {
    def bandedOf(df: DataFrame): DataFrame = {
      val toks = TextFns.tokens(col(textCol))
      bandedSignatures(df, idCol, TextFns.wordShingles(toks, shingleWords),
        bands, rowsPerBand, family)
    }
    // per-SIDE families (the same text may appear on both sides — its two
    // side-families then pair through banding + verify at jaccard 1.0,
    // exactly as the doc-grain pairs did). Member ids are carried OUT of
    // this aggregation as an array: the expansion step used to re-join the
    // full doc table back to the family frame ON THE TEXT COLUMN, which
    // re-shuffled every document's full text bytes a second time per side
    // (guide §2.3 — shuffle keys/metadata, not payloads); collect_list
    // ships only the ids inside the groupBy the family build already pays.
    def famOf(df: DataFrame): DataFrame = df
      .groupBy(col(textCol))
      .agg(min(col(idCol)).as("__gid"), count(lit(1)).as("__m"),
        collect_list(col(idCol)).as("__members"))
    val famL = famOf(left).persist()
    val famR = famOf(right).persist()
    def repsOf(fam: DataFrame): DataFrame =
      fam.select(col("__gid").as(idCol), col(textCol))
    // the cap must drop a bucket when its DOC population (sum of member
    // counts), not its family count, exceeds bucketCap — identical output
    // to capBuckets on the doc-grain banded frame
    def cappedW(fam: DataFrame): DataFrame = {
      val banded = bandedOf(repsOf(fam))
        .join(fam.select(col("__gid").as(idCol), col("__m")), Seq(idCol))
      val over = banded
        .groupBy(col("band"), col("band_hash"))
        .agg(sum(col("__m")).as("__n"))
        .filter(col("__n") > bucketCap)
        .select(col("band"), col("band_hash"))
      banded.join(over, Seq("band", "band_hash"), "left_anti")
    }
    val cands = cappedW(famL)
      .select(col("band"), col("band_hash"), col(idCol).as("__ga"))
      .join(cappedW(famR)
        .select(col("band"), col("band_hash"), col(idCol).as("__gb")),
        Seq("band", "band_hash"))
      .select(col("__ga"), col("__gb"))
      .distinct()
    val aSets = hashedNgramSets(repsOf(famL), idCol, Seq(),
      TextFns.tokens(col(textCol)), shingleWords)
      .select(col(idCol).as("__ga"), col("__set").as("__sa"))
    val bSets = hashedNgramSets(repsOf(famR), idCol, Seq(),
      TextFns.tokens(col(textCol)), shingleWords)
      .select(col(idCol).as("__gb"), col("__set").as("__sb"))
    val famPairs = cands
      .join(aSets, Seq("__ga"))
      .join(bSets, Seq("__gb"))
      .withColumn("__i", IntersectCardSorted(col("__sa"), col("__sb")))
      .withColumn("jaccard", jaccardFromInter(col("__i"), size(col("__sa")), size(col("__sb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("__ga"), col("__gb"), col("jaccard"))
    // membership comes straight from the family aggregation (same rows the
    // old text-keyed doc re-join produced: every doc belongs to exactly one
    // family per side) — no second shuffle of the text payload
    val memL = famL.select(col("__gid").as("__ga"),
      explode(col("__members")).as("a_id"))
    val memR = famR.select(col("__gid").as("__gb"),
      explode(col("__members")).as("b_id"))
    val out = famPairs
      .join(memL, Seq("__ga"))
      .join(memR, Seq("__gb"))
      // guard against overlapping id spaces between the two corpora (or the
      // same frame passed twice): a doc must never flag itself as its own
      // contamination — the self-join form's a < b discipline, adapted
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("jaccard"))
      // eager: release the family caches at return instead of leaking them
      // for the session (blockedJaccardPairs discipline)
      .localCheckpoint(true, Checkpoints.Ser)
    famL.unpersist()
    famR.unpersist()
    out
  }

  /** End-to-end MinHash-LSH near-dup pairs on a text column. */
  def minhashDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleWords: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 3,
      threshold: Double = 0.7,
      family: HashFamily = Xx64): DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    val sh = TextFns.wordShingles(toks, shingleWords)
    val banded = bandedSignatures(docs, idCol, sh, bands, rowsPerBand, family)
    val cands = candidatePairs(banded, idCol)
    verifiedPairs(cands, docs, idCol, toks, shingleWords, threshold)
  }

  /** 32-bit SimHash over the token multiset, md5-bit-sampled so the oracle
    * can reproduce it. Bit j of a token's hash = bit (3 - j%4) of hex nibble
    * j/4 of md5(token) — equivalently bit (31-j) of the token's first 8 md5
    * hex digits read as a uint32, which is how it is computed here: ONE
    * md5+conv per token, then pure integer bit extraction (the per-bit
    * string slicing this replaces evaluated 32 string ops per token).
    * Fingerprint bit j is set iff the signed sum of (2*bit - 1) across
    * tokens is >= 0.
    *
    * Pure per-row expression fold (aggregate over the token array) — no
    * shuffle, no explode; at 100 TB this is a map-only stage.
    */
  def simhash32(tokensCol: Column): Column = {
    val zeros = array_repeat(lit(0), 32)
    // bit j (j=0..31) of the sample = (v >> (31-j)) & 1; the shift is done
    // as exact double division by 2^(31-j) (v < 2^32 keeps it exact).
    val divisors = typedLit((0 until 32).map(j => 1L << (31 - j)))
    val tokHashes = transform(tokensCol, tk => conv(md5(tk).substr(1, 8), 16, 10).cast("long"))
    val sums = aggregate(tokHashes, zeros, (acc: Column, v: Column) =>
      zip_with(acc, divisors, (a, p) =>
        (a + (pmod((v / p).cast("long"), lit(2)) * 2 - 1)).cast("int")))
    aggregate(
      zip_with(sums, typedLit((0 until 32).map(j => 1L << j)), (s, p) =>
        when(s >= 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two simhash fingerprints (bit_count of xor). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** DataFrame-level simhash: same bit math as `simhash32` but computed as
    * explode(tokens) -> one md5+conv per token row -> 32 signed-bit sums as
    * aggregation columns -> fingerprint reassembly. Everything stays inside
    * whole-stage codegen (the per-row array fold of `simhash32` evaluates
    * interpreted) and the aggregation gets map-side partial sums + exchange
    * reuse when the output feeds both sides of a self-join.
    * Docs with zero tokens are dropped (simhash32 would yield the
    * degenerate all-bits-set fingerprint for them).
    */
  def simhashFingerprints(
      docs: DataFrame,
      idCol: String,
      carryCols: Seq[String],
      tokensCol: Column): DataFrame = {
    val keys = (carryCols :+ idCol).map(col)
    val bitSum = (j: Int) =>
      sum(pmod((col("__v") / lit(1L << (31 - j))).cast("long"), lit(2)) * 2 - 1).as(s"__s$j")
    docs
      .select(keys :+ explode(tokensCol).as("__tk"): _*)
      .withColumn("__v", conv(md5(col("__tk")).substr(1, 8), 16, 10).cast("long"))
      .groupBy(keys: _*)
      .agg(bitSum(0), (1 until 32).map(bitSum): _*)
      .select(keys :+ (0 until 32).map(j =>
        when(col(s"__s$j") >= 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _).as("simhash"): _*)
  }

  /** Exact n-gram Jaccard over all pairs within a blocking key. The blocking
    * key bounds the quadratic term (e.g. language, length bucket, LSH band);
    * never call with a constant key at scale.
    *
    * Three pure (no-false-negative, no-false-positive) optimizations:
    *   - EXACT-DUPLICATE COLLAPSE: docs whose (block, shingle set) are
    *     identical form a family; the quadratic loop runs at DISTINCT-SET
    *     grain and family pairs expand back to doc pairs afterwards.
    *     Same-family pairs are jaccard = 1.0 by identity (n/n — the exact
    *     double the generic path computes), cross-family pairs share one
    *     verification per family pair. On a duplicate-saturated corpus
    *     (the 100 TB near-dup regime: replication factor f) this cuts the
    *     O(block²) set comparisons by f² — measured 435 s → seconds at
    *     f=10 on the factor-replicated sf0.1 corpus — while on a
    *     duplicate-free corpus it costs one extra |docs|-row window;
    *   - a size-ratio prefilter (jaccard >= t implies min(|A|,|B|) >=
    *     t*max(|A|,|B|)) rejects most pairs on two ints before any array
    *     work;
    *   - shingle sets travel as sorted 64-bit hashes and intersect via the
    *     codegen merge-walk `IntersectCardSorted` instead of per-pair hash
    *     sets over strings.
    */
  def blockedJaccardPairs(
      docs: DataFrame,
      idCol: String,
      blockCol: String,
      tokensCol: Column,
      shingleWords: Int,
      threshold: Double): DataFrame = {
    val sets = hashedNgramSets(docs, idCol, Seq(blockCol), tokensCol, shingleWords)
    // family id = min doc id among identical (block, set) rows; doc ids are
    // unique, so __gid uniquely names the family across blocks. Partition
    // sizes are family sizes (the replication factor), never a whole block.
    val wfam = org.apache.spark.sql.expressions.Window
      .partitionBy(col(blockCol), col("__set"))
    // persist: the family frame feeds the representative loop AND both
    // expansion joins off one cached materialization of the set build
    val mem = sets.withColumn("__gid", min(col(idCol)).over(wfam)).persist()
    val memLite = mem.select(col("__gid"), col(idCol).as("__did"), col("__n"))
    // one representative row per family carries the set into the loop
    val reps = mem.filter(col(idCol) === col("__gid"))

    // same-family doc pairs: identical sets, jaccard exactly n/n = 1.0;
    // empty-set families excluded (the generic path's union=0 => null)
    val same = memLite.filter(col("__n") >= 1)
      .select(col("__gid"), col("__did").as("a_id"))
      .join(memLite.select(col("__gid"), col("__did").as("b_id")), Seq("__gid"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(1.0).as("jaccard"))

    val l = reps.select(col(blockCol).as("__blk"), col("__gid").as("__ga"),
      col("__set").as("__sa"), col("__n").as("__na"))
    val r = reps.select(col(blockCol).as("__blk2"), col("__gid").as("__gb"),
      col("__set").as("__sb"), col("__n").as("__nb"))
    // The ENTIRE pair predicate (ordering, size-ratio prefilter, exact
    // jaccard >= t) lives in the join condition: the hash join evaluates it
    // on the probe, so the ~O(block²) non-matching pairs are never
    // materialized as output rows — with multi-KB set arrays per row that
    // materialization, not the merge walks, dominated the runtime.
    val cond = col("__blk") === col("__blk2") &&
      col("__ga") < col("__gb") &&
      col("__na") >= col("__nb") * threshold && col("__nb") >= col("__na") * threshold &&
      jaccardFromInter(IntersectCardSorted(col("__sa"), col("__sb")),
        col("__na"), col("__nb")) >= threshold
    // broadcast build over the cached representatives, NOT a join shuffled
    // on the block key: with a handful of blocks, hash partitioning
    // degenerates to one task per block and the dominant block's
    // O(block²) predicate loop runs on a single core — the broadcast probe
    // keeps every cache partition working. (Bounded-block operator: the
    // build side is small by contract, see the header.)
    val famPairs = l.join(broadcast(r), cond)
      .select(col("__ga"), col("__gb"), jaccardFromInter(
        IntersectCardSorted(col("__sa"), col("__sb")), col("__na"), col("__nb")).as("jaccard"))
    // expand family pairs to doc pairs; family ids don't order like member
    // ids, so the canonical (a_id < b_id) orientation is re-derived
    val cross = famPairs
      .join(memLite.select(col("__gid").as("__ga"), col("__did").as("__ida")), Seq("__ga"))
      .join(memLite.select(col("__gid").as("__gb"), col("__did").as("__idb")), Seq("__gb"))
      .select(least(col("__ida"), col("__idb")).as("a_id"),
        greatest(col("__ida"), col("__idb")).as("b_id"), col("jaccard"))

    // eager: materializing the pair frame here lets the family cache
    // release instead of occupying executor storage for the session (it
    // otherwise outlives the call — e.g. through a whole timed bench run
    // after warmup). Same discipline as imageNearDupPairs/winnowMatches.
    val out = same.unionByName(cross).localCheckpoint(true, Checkpoints.Ser)
    mem.unpersist()
    out
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

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
    */
  def bandedSignatures(
      docs: DataFrame,
      idCol: String,
      shingles: Column,
      bands: Int,
      rowsPerBand: Int,
      family: HashFamily = Xx64): DataFrame = {
    val sig = minhashSignature(shingles, bands * rowsPerBand, family)
    val bandHash = (b: Column, slice_ : Column) => family match {
      case HexMd5 => md5(concat_ws("|", b.cast("string"), slice_))
      case Xx64   => xxhash64(b, slice_)
    }
    docs
      .select(col(idCol), sig.as("__sig"))
      .filter(col("__sig").isNotNull)
      .select(col(idCol), explode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), bandHash(b, slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("band_hash"))))
        .as("__b"))
      .select(col(idCol), col("__b.band").as("band"), col("__b.band_hash").as("band_hash"))
  }

  /** LSH candidate pairs (a < b), deduplicated across bands. One shuffle on
    * (band, band_hash); buckets larger than `bucketCap` are dropped.
    */
  def candidatePairs(banded: DataFrame, idCol: String, bucketCap: Int = 1000): DataFrame = {
    val capped = banded
      .withColumn("__bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("band_hash"))))
      .filter(col("__bucket_n") <= bucketCap)
      .drop("__bucket_n")
    val l = capped.select(col("band"), col("band_hash"), col(idCol).as("a_id"))
    val r = capped.select(col("band"), col("band_hash"), col(idCol).as("b_id"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** Verify candidate pairs with exact Jaccard over distinct shingle sets;
    * keeps pairs with jaccard >= threshold.
    */
  def verifiedPairs(
      pairs: DataFrame,
      docs: DataFrame,
      idCol: String,
      shingles: Column,
      threshold: Double): DataFrame = {
    val sets = docs.select(col(idCol).as("__id"), shingles.as("__set"))
    pairs
      .join(sets.select(col("__id").as("a_id"), col("__set").as("__sa")), Seq("a_id"))
      .join(sets.select(col("__id").as("b_id"), col("__set").as("__sb")), Seq("b_id"))
      .withColumn("jaccard", TextFns.jaccard(col("__sa"), col("__sb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
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
    val sh = TextFns.wordShingles(TextFns.tokens(col(textCol)), shingleWords)
    val banded = bandedSignatures(docs, idCol, sh, bands, rowsPerBand, family)
    val cands = candidatePairs(banded, idCol)
    verifiedPairs(cands, docs, idCol, sh, threshold)
  }

  /** 32-bit SimHash over the token multiset, md5-bit-sampled so the oracle
    * can reproduce it. Bit j of a token's hash = bit (3 - j%4) of hex nibble
    * j/4 of md5(token); fingerprint bit j is set iff the signed sum of
    * (2*bit - 1) across tokens is >= 0.
    *
    * Pure per-row expression fold (aggregate over the token array) — no
    * shuffle, no explode; at 100 TB this is a map-only stage.
    */
  def simhash32(tokensCol: Column): Column = {
    val zeros = array_repeat(lit(0), 32)
    val bitsOf = (tk: Column) => {
      val h = md5(tk)
      transform(sequence(lit(0), lit(31)), j => {
        val nibble = conv(h.substr(lit(1) + (j / 4).cast("int"), lit(1)), 16, 10).cast("int")
        val bit = floor(nibble / pow(lit(2.0), (lit(3) - j % 4).cast("double"))).cast("int") % 2
        bit * 2 - 1
      })
    }
    val sums = aggregate(tokensCol, zeros,
      (acc: Column, tk: Column) => zip_with(acc, bitsOf(tk), (a, b) => a + b))
    aggregate(
      zip_with(sums, sequence(lit(0), lit(31)), (s, j) =>
        when(s >= 0, pow(lit(2.0), j.cast("double")).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two simhash fingerprints (bit_count of xor). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact n-gram Jaccard over all pairs within a blocking key. The blocking
    * key bounds the quadratic term (e.g. language, length bucket, LSH band);
    * never call with a constant key at scale.
    */
  def blockedJaccardPairs(
      docs: DataFrame,
      idCol: String,
      blockCol: String,
      shingles: Column,
      threshold: Double): DataFrame = {
    val sets = docs.select(col(blockCol).as("__blk"), col(idCol).as("__id"), shingles.as("__set"))
    val l = sets.select(col("__blk"), col("__id").as("a_id"), col("__set").as("__sa"))
    val r = sets.select(col("__blk"), col("__id").as("b_id"), col("__set").as("__sb"))
    l.join(r, Seq("__blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("jaccard", TextFns.jaccard(col("__sa"), col("__sb")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }
}

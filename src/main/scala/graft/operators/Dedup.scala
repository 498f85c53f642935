package graft.operators

import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline.
  *
  * Scale design: every variant keeps candidate generation an EQUI-join
  * (hash shuffle on a bucket key) — never an O(n²) cross-product. At
  * 100 TB the exact variant is one shuffle on the content hash; MinHash
  * LSH shuffles `bands × n` small rows; verification only touches
  * candidate pairs (a vanishing fraction of n²).
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the min-id survivor.
    * One shuffle on a 128-bit hash, partial-agg map-side. */
  def exact(t: Tables): DataFrame =
    t.documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_copies"))
      .select(col("survivor_id"), col("content_hash"), col("n_copies"))
      .orderBy(col("survivor_id"))

  /** Distinct word-n-gram shingle set of a text column. */
  def shingles(text: Column, n: Int = 3): Column =
    array_distinct(TextFunctions.wordNgrams(text, n))

  /** MinHash signature: `numPerm` permutations simulated with seeded
    * xxhash64 (codegen'd); each signature slot is the min hash of the
    * shingle set under that permutation. */
  def minhashSignature(sh: Column, numPerm: Int): Column =
    array((0 until numPerm).map(i =>
      array_min(transform(sh, g => xxhash64(lit(i), g)))): _*)

  /** LSH band keys: signature sliced into `bands` bands of `rowsPerBand`,
    * each band hashed to one 64-bit bucket key. Docs sharing any band
    * bucket become candidates (equi-join on (band, key)). */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("key"))): _*)

  /** MinHash+LSH near-duplicate pairs, verified with exact Jaccard on
    * the shingle sets. Returns (doc_a, doc_b, jaccard) with
    * jaccard >= `threshold`. */
  def minhashPairs(docs: DataFrame, numPerm: Int = 64, bands: Int = 16,
                   threshold: Double = 0.5, shingleN: Int = 3): DataFrame = {
    val rowsPerBand = numPerm / bands
    val sh = docs.select(col("doc_id"), shingles(col("text"), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = sh
      .select(col("doc_id"), col("sh"),
        explode(bandKeys(minhashSignature(col("sh"), numPerm), bands, rowsPerBand)).as("bk"))
    val a = banded.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("bk"))
    val b = banded.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("bk"))
    a.join(b, a("bk") === b("bk") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def minhash(t: Tables): DataFrame = minhashPairs(t.documents)

  /** SimHash near-dup: 64-bit fingerprint per doc (custom codegen'd
    * expression), candidates = equal 16-bit chunk (Hamming ≤3 within
    * 4 chunks guarantees one equal chunk by pigeonhole), verified by
    * exact popcount of the XOR. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = docs.select(col("doc_id"),
      graft.functions.HashFunctions.simhash64(split(col("text"), " ")).as("fp"))
    val chunked = fp.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk"),
          shiftright(col("fp"), i * 16).bitwiseAND(lit(0xFFFFL)).as("bits"))): _*)).as("ck"))
    val a = chunked.select(col("doc_id").as("doc_a"), col("fp").as("fp_a"), col("ck"))
    val b = chunked.select(col("doc_id").as("doc_b"), col("fp").as("fp_b"), col("ck"))
    a.join(b, a("ck") === b("ck") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("fp_a"), col("fp_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def simhash(t: Tables): DataFrame = simhashPairs(t.documents)

  /** Exact n-gram Jaccard over a deterministic candidate window
    * (each 10th doc vs its next 5 ids) — the SQL-verifiable instance
    * of the Jaccard kernel used by minhashPairs' verify step. */
  def ngramJaccard(t: Tables): DataFrame = {
    val g = t.documents.select(col("doc_id"),
      shingles(col("text"), 2).as("grams"))
    val a = g.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("doc_a"), col("grams").as("ga"))
    val b = g.select(col("doc_id").as("doc_b"), col("grams").as("gb"))
    a.join(b, col("doc_b") > col("doc_a") && col("doc_b") <= col("doc_a") + 5)
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(array_union(col("ga"), col("gb")))).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed around
  * Spark's shuffle model:
  *
  *  - exact:   one hash-shuffle on a 128-bit content fingerprint.
  *  - minhash: shingle → K md5-derived min-hashes → B bands; duplicates
  *             meet in a band-bucket shuffle (no O(n²) compare). Band
  *             buckets are the LSH trick that makes near-dup feasible at
  *             100 TB: candidate pairs only form inside a bucket.
  *  - simhash: 64-bit weighted-bit signature; near-dups differ in few bits
  *             and are bucketed by signature bands the same way.
  *  - ngram Jaccard: exact pair similarity, evaluated only on LSH/shingle
  *             candidates — never all pairs.
  *
  * Hash family is md5-derived (not xxhash64) so fingerprints are
  * reproducible by any engine, which the oracle harness exploits.
  */
object Dedup {

  import TextAnalysis.normalizeText

  /** One md5-derived 60-bit hash of a shingle under seed `seed`. */
  def seededHash(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"), c)), 1, 15), 16, 10)
      .cast("bigint")

  /** Exact dedup: keep the lowest-id document per content fingerprint.
    * One shuffle on the fingerprint; map-side partial aggregation makes the
    * shuffle carry one row per distinct hash per partition. */
  def exactDedup(df: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    df.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: for each of `numHashes` seeds, the min seeded hash
    * over the document's shingle set. Arrays stay columnar; no explode. */
  def minhashSignature(text: Column, numHashes: Int = 16, shingleN: Int = 3)
  : Column = {
    val sh = shinglesExpr(text, shingleN)
    val hashes = (0 until numHashes).map { seed =>
      array_min(transform(sh, s => seededHash(s, seed)))
    }
    array(hashes: _*)
  }

  /** Shingle expression built compositionally (works on any text Column). */
  def shinglesExpr(text: Column, n: Int): Column = {
    val toks = split(normalizeText(text), " ")
    when(size(toks) <= n, array(concat_ws(" ", toks))).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash+LSH near-dup candidate pairs: split the signature into
    * `bands` bands of `rowsPerBand`, bucket on (band index, band slice),
    * and emit intra-bucket pairs. Shuffle cost: one explode×bands plus a
    * self-join per bucket — candidates only, never the full cross product.
    */
  def minhashCandidates(df: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", numHashes: Int = 16,
                        bands: Int = 4, shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val sig = df
      .select(col(idCol).as("id"),
        minhashSignature(col(textCol), numHashes, shingleN).as("sig"))
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws("_", transform(
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")))))
        .as(Seq("band", "bucket")))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r,
        col("l.band") === col("r.band") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (id_a, id_b): |A∩B| / |A∪B| over distinct shingle sets. */
  def jaccardOnCandidates(docs: DataFrame, candidates: DataFrame,
                          textCol: String = "text", idCol: String = "doc_id",
                          shingleN: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      array_distinct(shinglesExpr(col(textCol), shingleN)).as("sh"))
    candidates
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"),
        "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"),
        "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
          .as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates → exact Jaccard →
    * threshold filter. */
  def minhashDedup(df: DataFrame, threshold: Double = 0.8,
                   textCol: String = "text", idCol: String = "doc_id",
                   numHashes: Int = 16, bands: Int = 4, shingleN: Int = 3)
  : DataFrame = {
    val cands = minhashCandidates(df, textCol, idCol, numHashes, bands, shingleN)
    jaccardOnCandidates(df, cands, textCol, idCol, shingleN)
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash of the shingle set: bit j of the signature is the sign
    * of the sum over shingles of ±1 on bit j of the shingle hash. */
  def simhash(text: Column, shingleN: Int = 2): Column = {
    val sh = shinglesExpr(text, shingleN)
    val hashes = transform(sh, s => seededHash(s, 0))
    val bitSums = (0 until 60).map { j =>
      // sum over shingles of (bit j set ? 1 : -1)
      aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1)
          .otherwise(-1))
    }
    bitSums.zipWithIndex.foldLeft(lit(0L)) { case (acc, (s, j)) =>
      acc + when(s > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
  }

  /** Hamming distance between two simhash signatures. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket by 4 bands of 15 bits, compare hamming
    * distance inside buckets only. */
  def simhashCandidates(df: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", maxHamming: Int = 8)
  : DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      simhash(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 15).bitwiseAND((1L << 15) - 1)): _*))
        .as(Seq("band", "bucket")))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") &&
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hammingDistance(col("l.sig"), col("r.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}

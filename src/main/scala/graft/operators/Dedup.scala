package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.text
import graft.functions.vec

/** Deduplication operators for large-scale training-data pipelines.
  * All variants follow the same scale shape: cheap per-row signature
  * (codegen'd) → banded equi-join to surface candidates (never all-pairs)
  * → exact verification only on candidates — the candidate-then-verify
  * discipline of the reference's coarse-then-exact pipeline stages.
  */
object Dedup {
  /** Exact dedup by full-text hash: one surviving row per distinct text.
    * Returns (idCol, textHash, n_copies, is_keeper) per input row — the
    * keeper is the min id (deterministic).
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    docs
      .withColumn("text_fp", text.fingerprint64(col(textCol)))
      .groupBy("text_fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** MinHash+LSH near-dup pairs: signature k, `bands` bands (k/bands rows
    * per band), word-`shingle`-grams. Returns (id_a, id_b, jaccard) with
    * id_a < id_b and exact-verified jaccard ≥ threshold.
    */
  def minhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   k: Int = 64, bands: Int = 16, shingle: Int = 3,
                   threshold: Double = 0.7): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = k / bands
    val sigs = docs.select(col(idCol).as("id"), col(textCol).as("txt"))
      .withColumn("sig", text.minhash(col("txt"), k, shingle))
    // band fan-out: (bandKey, id) — candidates collide on any band
    val banded = sigs.select(col("id"), col("txt"),
      explode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          // bandKey = xxhash of band index + the band's slice
          xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))
      ).as("band_key"))
    val a = banded.select(col("band_key"), col("id").as("id_a"), col("txt").as("txt_a"))
    val b = banded.select(col("band_key"), col("id").as("id_b"), col("txt").as("txt_b"))
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "txt_a", "txt_b").distinct()
      .withColumn("jaccard", text.jaccard_shingles(col("txt_a"), col("txt_b"), shingle))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit simhash, banded into four 16-bit
    * blocks (any pair within hamming ≤ 3 must agree on ≥1 block —
    * pigeonhole); exact hamming verification on candidates.
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-block pigeonhole guarantees hamming <= 3")
    val sigs = docs.select(col(idCol).as("id"),
      text.simhash64(col(textCol)).as("sh"))
    val blocks = sigs.withColumn("block",
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("blk"),
          shiftright(col("sh"), i * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*)))
      .select(col("id"), col("sh"), col("block.blk"), col("block.key"))
    val a = blocks.select(col("blk"), col("key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = blocks.select(col("blk"), col("key"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact word-n-gram Jaccard pairs via shingle-inverted-index join —
    * fully SQL-expressible (oracle-checkable), no signatures. `blockCol`
    * optionally restricts comparisons to equal-block rows.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        n: Int, threshold: Double,
                        blockCol: Option[String] = None): DataFrame = {
    // tokens → distinct n-gram shingles per doc (string form for SQL parity)
    val toks = filter(split(lower(trim(col("txt"))), "\\s+"), t => length(t) > 0)
    val grams = array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)), i =>
          concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))))
    val base = docs.select(
      (col(idCol).as("id") +: col(textCol).as("txt") +:
        blockCol.map(c => col(c).as("blk")).toSeq): _*)
      .withColumn("grams", grams.cast("array<string>"))
      .withColumn("n_grams", size(col("grams")))
    val exploded = base.select(
      (Seq(col("id"), col("n_grams"), explode(col("grams")).as("gram")) ++
        blockCol.map(_ => col("blk")).toSeq): _*)
    val joinKeys = "gram" +: blockCol.map(_ => "blk").toSeq
    val l = exploded.select(
      (col("gram") +: col("id").as("id_a") +: col("n_grams").as("na") +:
        blockCol.map(_ => col("blk")).toSeq): _*)
    val r = exploded.select(
      (col("gram") +: col("id").as("id_b") +: col("n_grams").as("nb") +:
        blockCol.map(_ => col("blk")).toSeq): _*)
    l.join(r, joinKeys)
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding near-dup pairs: random-hyperplane LSH blocking (16-bit
    * blocks of an `nBits`-bit signature) + exact cosine verification.
    */
  def embeddingPairs(vecs: DataFrame, vecCol: String, idCol: String,
                     threshold: Double = 0.95, nBits: Int = 64,
                     blockBits: Int = 8, seed: Long = 77L): DataFrame = {
    val nBlocks = nBits / blockBits
    val mask = (1L << blockBits) - 1
    val sigs = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sig", vec.rp_signature(col("v"), nBits, seed))
    val blocks = sigs.withColumn("block",
      explode(array((0 until nBlocks).map(i =>
        struct(lit(i).as("blk"),
          shiftright(col("sig"), i * blockBits).bitwiseAND(lit(mask)).as("key"))): _*)))
      .select(col("id"), col("v"), col("block.blk"), col("block.key"))
    val a = blocks.select(col("blk"), col("key"), col("id").as("id_a"), col("v").as("v_a"))
    val b = blocks.select(col("blk"), col("key"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("blk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "v_a", "v_b").distinct()
      .withColumn("cos", vec.cosine_sim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }
}

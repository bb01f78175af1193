package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines: exact (hash-groupBy), MinHash+
  * LSH near-dup, SimHash, and n-gram Jaccard verification.
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact dedup is a single hash aggregate on a 128-bit digest — shuffle
  *    carries (digest, doc_id), never the text;
  *  - near-dup candidate generation is **bucketed by construction**: MinHash
  *    band hashes are the join key, so only same-bucket pairs ever meet
  *    (`groupBy` band → self-equi-join). There is NO crossJoin anywhere;
  *  - verification (exact Jaccard) runs only on the candidate pairs.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact-duplicate groups keyed by content fingerprint. */
  def exactDupGroups(df: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"))

  /** Exact dedup: keep the min-id document of each identical-text group. */
  def dedupExact(df: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))

  // -------------------------------------------------------------- minhash

  /** Word-level shingles (n-grams of tokens) of the normalized text. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    val starts = sequence(lit(1), greatest(size(toks) - (n - 1), lit(1)))
    array_distinct(transform(starts, i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Base shingle hashes: each string shingle hashed once to a long. All k
    * minhash permutations re-hash these longs, never the strings.
    */
  def shingleHashes(text: Column, n: Int): Column =
    transform(shingles(text, n), s => xxhash64(s))

  /** Signature from precomputed shingle hashes. */
  def signatureFromHashes(h0: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), seed =>
      array_min(transform(h0, h => xxhash64(seed, h))))

  /** MinHash signature: k permutations simulated by seeding xxhash64 with the
    * permutation index; signature[i] = min hash over the shingle-hash set.
    */
  def minhashSignature(text: Column, n: Int, k: Int): Column =
    signatureFromHashes(shingleHashes(text, n), k)

  /** LSH banding: split the k-length signature into `bands` bands of k/bands
    * rows each; each band hashes to one bucket key.
    * Emits (idCol, sig, band, band_hash) — the bucket table.
    *
    * Two-stage with an explicit materialization barrier: higher-order
    * functions are interpreted (not codegen'd) and Catalyst's projection
    * collapse would otherwise re-evaluate the whole shingle pipeline once
    * per permutation and once per band. Stage 1 (shingle → long hash, the
    * expensive string work) is persisted — O(docs × shingles) longs — so
    * stage 2's k permutations scan ready long arrays.
    */
  def lshBuckets(df: DataFrame, textCol: String, idCol: String,
                 n: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val r = k / bands
    val hashed = df.select(col(idCol), shingleHashes(col(textCol), n).as("h0"))
      .persist()
    hashed
      .select(col(idCol), signatureFromHashes(col("h0"), k).as("sig"))
      .select(col(idCol), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"), xxhash64(concat_ws(",",
            slice(col("sig"), b * r + 1, lit(r)).cast("array<string>")), lit("band")).as("band_hash"))
        )).as("bk"))
      .select(col(idCol), col("sig"), col("bk.band"), col("bk.band_hash"))
  }

  /** Near-dup candidate pairs via LSH: self-join the bucket table on
    * (band, band_hash) — only same-bucket docs pair up. Estimated Jaccard =
    * fraction of agreeing minhash components; pairs below `minEstJaccard`
    * are dropped.
    */
  def nearDupPairs(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                   n: Int = 3, k: Int = 32, bands: Int = 8,
                   minEstJaccard: Double = 0.5,
                   maxBucketSize: Int = 10000): DataFrame = {
    // Persist the bucket table: signatures are higher-order-function
    // expressions (interpreted, not codegen'd) and would otherwise be
    // re-evaluated per band AND per join side. The table is O(docs × k)
    // longs — tiny relative to the text it summarizes.
    val raw = lshBuckets(df, textCol, idCol, n, k, bands)
    // Hot-bucket cap: a bucket holding B docs emits B² candidate pairs; a
    // boilerplate-duplicate flood (one bucket with 1M docs) would be a
    // quadratic blowup. Buckets past the cap are dropped here — their
    // members still pair through their OTHER bands, and true duplicate
    // floods should be removed by exact dedup before near-dup anyway.
    val hot = raw.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("_bucket_n"))
      .where(col("_bucket_n") > maxBucketSize)
      .select(col("band"), col("band_hash"))
    val buckets = raw.join(broadcast(hot), Seq("band", "band_hash"), "left_anti")
      .persist()
    val a = buckets.select(col(idCol).as("id_a"), col("sig").as("sig_a"),
      col("band"), col("band_hash"))
    val b = buckets.select(col(idCol).as("id_b"), col("sig").as("sig_b"),
      col("band"), col("band_hash"))
    val est = aggregate(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / k
    a.join(b, Seq("band", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("est_jaccard", est)
      .where(col("est_jaccard") >= minEstJaccard)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  // ------------------------------------------------------ n-gram jaccard

  /** Exact token-shingle Jaccard for given (id_a, id_b) candidate pairs —
    * the verification stage after LSH (joins shingle sets back by id).
    */
  def jaccardForPairs(docs: DataFrame, pairs: DataFrame,
                      textCol: String = "text", idCol: String = "doc_id",
                      n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol), shingles(col(textCol), n).as("sh")).persist()
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b")))
    pairs
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jac)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Blocked exact Jaccard: all qualifying pairs within a blocking key (e.g.
    * source), via an inverted-index equi-join — NOT per-pair array
    * intersection. Explode the distinct shingle set, self-join on
    * (block, shingle) so only docs sharing a shingle ever meet, count
    * matches per pair (= |A∩B|), and derive |A∪B| = |A|+|B|−|A∩B| from
    * per-doc set sizes. Everything after the explode is codegen'd
    * shuffle/join/agg — no interpreted array ops in the hot path, and the
    * shuffle carries (block, shingle-hash, id), never the text.
    */
  def blockedJaccard(df: DataFrame, blockCol: String, textCol: String = "text",
                     idCol: String = "doc_id", n: Int = 3,
                     minJaccard: Double = 0.1): DataFrame = {
    // hash each shingle to a long before the explode: joins/aggregates on
    // 8-byte keys instead of n-word strings
    val sh = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      shingleHashes(col(textCol), n).as("h0")).persist()
    val sizes = sh.select(col("id"), size(col("h0")).cast("long").as("n_sh"))
    val inverted = sh.select(col("blk"), col("id"), explode(col("h0")).as("s"))
    val inter = inverted.as("a")
      .join(inverted.as("b"),
        col("a.blk") === col("b.blk") && col("a.s") === col("b.s") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** blockedJaccard with a document-frequency cap: shingles appearing in
    * more than `maxDocFrac` of a block's documents are dropped from the
    * inverted index before pairing. On low-entropy corpora (boilerplate,
    * templated text) the hottest shingles produce O(blockDocs²) pair rows
    * while carrying no discriminative signal — the standard mitigation in
    * production near-dup pipelines. Jaccard is then computed over the
    * CAPPED sets (sizes recomputed after the cap), so the score stays a
    * true Jaccard of the filtered representation.
    */
  def blockedJaccardCapped(df: DataFrame, blockCol: String, textCol: String = "text",
                           idCol: String = "doc_id", n: Int = 3,
                           minJaccard: Double = 0.1,
                           maxDocFrac: Double = 0.5): DataFrame = {
    val sh = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      shingleHashes(col(textCol), n).as("h0")).persist()
    val inverted = sh.select(col("blk"), col("id"), explode(col("h0")).as("s"))
    val blockSizes = sh.groupBy(col("blk")).agg(count(lit(1)).as("n_docs"))
    val kept = inverted
      .groupBy(col("blk"), col("s")).agg(collect_list(col("id")).as("ids"))
      .join(broadcast(blockSizes), "blk")
      .where(size(col("ids")) <= col("n_docs") * maxDocFrac)
      .select(col("blk"), col("s"), explode(col("ids")).as("id"))
    val sizes = kept.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = kept.as("a")
      .join(kept.as("b"),
        col("a.blk") === col("b.blk") && col("a.s") === col("b.s") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding-cosine near-dup: pairs whose embeddings exceed a cosine
    * threshold, blocked by a partition key (cluster label, source, LSH
    * bucket…) so the pairing is an equi-join — never an all-pairs cross.
    * The exact-threshold complement to the hash-based modes above: duplicate
    * *meaning*, not duplicate tokens.
    */
  def embeddingNearDups(embeddings: org.apache.spark.sql.DataFrame,
                        blockCol: String = "label",
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        minCosine: Double = 0.9): org.apache.spark.sql.DataFrame = {
    // Normalize each vector ONCE (persisted) so every candidate pair costs a
    // single dot product instead of dot + two norms — cosine(a,b) ≡ dot(â,b̂)
    // up to ~1e-15 float reordering, negligible against any sane threshold
    // margin (callers output the pair SET, not the similarity value).
    val dotSelf = aggregate(
      zip_with(col(vecCol), col(vecCol), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val unit = embeddings.select(col(blockCol).as("blk"), col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double") / sqrt(dotSelf)).as("u"))
      .persist()
    val dotAB = aggregate(
      zip_with(col("ua"), col("ub"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    unit.select(col("blk"), col("id").as("id_a"), col("u").as("ua"))
      .join(unit.select(col("blk"), col("id").as("id_b"), col("u").as("ub")), Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .where(dotAB >= minCosine)
      .select(col("id_a"), col("id_b"))
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over token xxhash64 values: bit j of the fingerprint is
    * the sign of the vote sum over the tokens' j-th hash bits. The 64 bit
    * positions are unrolled statically (bit index must be a literal for the
    * shift functions); token hashes are materialized once in `_sh_hashes` so
    * the 64 vote aggregates scan a ready array, not 64 re-tokenizations.
    */
  def withSimhash(df: DataFrame, textCol: String = "text",
                  out: String = "simhash"): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val hashes = transform(array_distinct(toks), t => xxhash64(t))
    def vote(j: Int): Column = aggregate(col("_sh_hashes"), lit(0),
      (acc, h) => acc + when(shiftrightunsigned(h, j).bitwiseAND(1) === 1, 1).otherwise(-1))
    val fp = (0 until 64)
      .map(j => when(vote(j) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    df.withColumn("_sh_hashes", hashes)
      .withColumn(out, fp)
      .drop("_sh_hashes")
  }

  /** Hamming distance between two simhash fingerprints (popcount of XOR). */
  def hammingDistance(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))
}

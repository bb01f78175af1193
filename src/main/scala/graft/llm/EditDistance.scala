package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.EditDistExprs

/** EXACT edit-distance near-duplicate detection — the character-level
  * member of the dedup family (exact-hash / MinHash-Jaccard / SimHash /
  * winnowing / embedding-cosine are token-, set-, bit-, fingerprint- and
  * vector-level; this one bounds the actual number of character edits,
  * the right contract for OCR noise, boilerplate injection and
  * version-bumped templates where "3 characters changed" is the question).
  *
  * Unlike the LSH tiers this join is exact AND complete: candidates come
  * from PassJoin segment blocking ([[graft.functions.PassJoinKeysExpr]] —
  * pigeonhole over k+1 segments, so no true pair can be missed), then an
  * exact `levenshtein(…, threshold)` verify (banded O(k·n) DP, not the
  * full O(n²) matrix) keeps pairs at distance ≤ k.
  *
  * 100-TB shape: key generation is one narrow projection per side (O(k³)
  * 20-byte rows per doc — no text rides the candidate shuffle, segments
  * travel as 64-bit hashes whose collisions only add verify work), the
  * candidate join is a hash equi-join on (length, segment, hash), and the
  * exact verify touches candidates only. Near-empty docs (< k+1 chars —
  * no non-empty segmentation exists) pair directly against their ≤ 2k-char
  * length band: that arm is all-pairs only across docs shorter than a
  * tweet, and real corpora drop those upstream. Skewed segment keys (a
  * 60-char run shared verbatim AND position-aligned across many docs)
  * surface as hot join keys — AQE skew-join splits them; the verify stays
  * proportional to true near-dup density either way.
  */
object EditDistance {

  /** All unordered pairs (doc_a < doc_b) within Levenshtein distance ≤ k,
    * with the exact distance. Null texts are ignored.
    */
  def similarityJoin(docs: DataFrame, k: Int = 4,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(k >= 1 && k <= 16, s"edit-distance threshold must be in [1, 16], got $k")
    val nSeg = k + 1
    val base = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .where(col("t").isNotNull)
      .withColumn("n", length(col("t")))

    val idx = base.where(col("n") >= nSeg)
      .select(col("id").as("id_i"),
        explode(EditDistExprs.indexKeys(col("t"), k)).as("key"))
      .select(col("key.l").as("l"), col("key.seg").as("seg"),
        col("key.h").as("h"), col("id_i"))
    val prb = base.where(col("n") >= nSeg)
      .select(col("id").as("id_p"),
        explode(EditDistExprs.probeKeys(col("t"), k)).as("key"))
      .select(col("key.l").as("l"), col("key.seg").as("seg"),
        col("key.h").as("h"), col("id_p"))
    val mainPairs = prb.join(idx, Seq("l", "seg", "h"))
      .where(col("id_p") =!= col("id_i"))
      .select(least(col("id_p"), col("id_i")).as("doc_a"),
        greatest(col("id_p"), col("id_i")).as("doc_b"))

    // near-empty docs (< k+1 chars) have no non-empty segmentation; pair
    // them directly against the ≤ 2k-char length band (the broadcast
    // nested-loop side is the tiny set by construction)
    val tiny = base.where(col("n") < nSeg)
      .select(col("id").as("id_p"), col("n").as("n_p"))
    val tinyPartners = base.where(col("n") <= 2 * k)
      .select(col("id").as("id_i"), col("n").as("n_i"))
    val tinyPairs = tinyPartners.join(broadcast(tiny),
        abs(col("n_p") - col("n_i")) <= k && col("id_p") =!= col("id_i"))
      .select(least(col("id_p"), col("id_i")).as("doc_a"),
        greatest(col("id_p"), col("id_i")).as("doc_b"))

    mainPairs.union(tinyPairs)
      .dropDuplicates("doc_a", "doc_b")
      .join(base.select(col("id").as("doc_a"), col("t").as("t_a")), Seq("doc_a"))
      .join(base.select(col("id").as("doc_b"), col("t").as("t_b")), Seq("doc_b"))
      // threshold form = banded DP: returns the exact distance when ≤ k,
      // -1 (filtered) otherwise — never the full n×m matrix
      .withColumn("ed", levenshtein(col("t_a"), col("t_b"), k).cast("long"))
      .where(col("ed") >= 0)
      .select(col("doc_a"), col("doc_b"), col("ed"))
  }

  /** Cross-table edit-distance join — fuzzy RECORD LINKAGE: every
    * (left, right) pair within Levenshtein distance ≤ k, with the exact
    * distance. No self-exclusion and no pair normalization (the two sides
    * are different tables; equal ids across them are distinct records).
    * Completeness comes from running the PassJoin probe in both
    * directions — each side probes toward partners no longer than itself
    * and indexes its own segments, so the longer member of every pair
    * does the probing regardless of which table it sits in; near-empty
    * rows on either side pair directly against the other side's
    * ≤ 2k-char band.
    */
  def similarityJoinBetween(left: DataFrame, right: DataFrame, k: Int = 4,
                            leftIdCol: String = "doc_id",
                            rightIdCol: String = "doc_id",
                            leftTextCol: String = "text",
                            rightTextCol: String = "text"): DataFrame = {
    require(k >= 1 && k <= 16, s"edit-distance threshold must be in [1, 16], got $k")
    val nSeg = k + 1
    def prep(df: DataFrame, idCol: String, textCol: String) = df
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .where(col("t").isNotNull)
      .withColumn("n", length(col("t")))
    val lhs = prep(left, leftIdCol, leftTextCol)
    val rhs = prep(right, rightIdCol, rightTextCol)

    // candidate ids with p probing (covers pairs where len(index side) ≤
    // len(probe side)); the opposite-direction arm covers the rest
    def candidates(p: DataFrame, i: DataFrame): DataFrame = {
      val prb = p.where(col("n") >= nSeg)
        .select(col("id").as("id_p"),
          explode(EditDistExprs.probeKeys(col("t"), k)).as("key"))
        .select(col("key.l").as("l"), col("key.seg").as("seg"),
          col("key.h").as("h"), col("id_p"))
      val idx = i.where(col("n") >= nSeg)
        .select(col("id").as("id_i"),
          explode(EditDistExprs.indexKeys(col("t"), k)).as("key"))
        .select(col("key.l").as("l"), col("key.seg").as("seg"),
          col("key.h").as("h"), col("id_i"))
      prb.join(idx, Seq("l", "seg", "h")).select(col("id_p"), col("id_i"))
    }
    val candLR = candidates(lhs, rhs)
      .select(col("id_p").as("left_id"), col("id_i").as("right_id"))
    val candRL = candidates(rhs, lhs)
      .select(col("id_i").as("left_id"), col("id_p").as("right_id"))

    def tinyArm(tinySide: DataFrame, otherSide: DataFrame): DataFrame =
      otherSide.where(col("n") <= 2 * k)
        .select(col("id").as("id_o"), col("n").as("n_o"))
        .join(broadcast(tinySide.where(col("n") < nSeg)
          .select(col("id").as("id_t"), col("n").as("n_t"))),
          abs(col("n_o") - col("n_t")) <= k)
    val tinyL = tinyArm(lhs, rhs)
      .select(col("id_t").as("left_id"), col("id_o").as("right_id"))
    val tinyR = tinyArm(rhs, lhs)
      .select(col("id_o").as("left_id"), col("id_t").as("right_id"))

    candLR.unionByName(candRL).unionByName(tinyL).unionByName(tinyR)
      .dropDuplicates("left_id", "right_id")
      .join(lhs.select(col("id").as("left_id"), col("t").as("t_l")), Seq("left_id"))
      .join(rhs.select(col("id").as("right_id"), col("t").as("t_r")), Seq("right_id"))
      .withColumn("ed", levenshtein(col("t_l"), col("t_r"), k).cast("long"))
      .where(col("ed") >= 0)
      .select(col("left_id"), col("right_id"), col("ed"))
  }

  /** Greedy min-id survivor selection over the edit-distance pair graph:
    * a doc is dropped iff some lower-id doc sits within distance k —
    * deterministic, one anti-join, and exactly the rule the SQL oracle
    * replays (`doc_id NOT IN (SELECT doc_b FROM pairs)`).
    */
  def dedupByEditDistance(docs: DataFrame, k: Int = 4,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val dropped = similarityJoin(docs, k, idCol, textCol)
      .select(col("doc_b").as(idCol)).distinct()
    docs.select(col(idCol).cast("long").as(idCol))
      .join(dropped, Seq(idCol), "left_anti")
  }
}

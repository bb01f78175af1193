package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key stream — approximate per-key frequencies in
  * `d × w` counters instead of one counter per distinct key. At 100 TB the
  * exact token/URL/domain frequency table is itself huge and hot-key
  * queries ("is this shingle boilerplate?", "how common is this domain?")
  * don't need exactness — a CMS answers them from a few KB that fit in a
  * broadcast, with one-sided error (estimates only ever OVERcount, by at
  * most ε·N with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
  *
  * Hashes are the engine-agnostic md5-60 family (`"cms<i>:" || key`), so
  * the whole sketch — counters AND estimates — is deterministic and the
  * DuckDB oracle replays it bit-for-bit: an honest testing story for a
  * probabilistic structure (the randomness is in the DESIGN, not the run).
  *
  * Scale shape: building is one explode(d) + groupBy over (row, bucket) —
  * d·w counter cells total, broadcastable; estimating joins the keys'
  * d candidate cells against the broadcast counters and takes the min.
  */
object Cms {

  private def h60(e: Column): Column =
    graft.functions.CrossHashExprs.md5h60(e)

  private def bucketOf(key: Column, i: Column, w: Int): Column =
    pmod(h60(concat(lit("cms"), i.cast("string"), lit(":"),
      key.cast("string"))), lit(w.toLong))

  /** The counter table (row i, bucket, cnt) — d·w cells, parameter-sized. */
  def counters(keys: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    require(d > 0 && w > 0, s"need d > 0 and w > 0, got d=$d w=$w")
    keys
      .withColumn("i", explode(array((0 until d).map(i => lit(i)): _*)))
      .groupBy(col("i"), bucketOf(col(keyCol), col("i"), w).as("bucket"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Point estimates for `queryKeys`: min over the key's d counter cells.
    * `cnts` is a [[counters]] frame (broadcast — it is at most d·w rows).
    * Left join with a zero coalesce: a key whose (i, bucket) cells were
    * never touched by the sketched stream has true count 0, and the min
    * over its cells must come out 0 — an inner join would drop the key
    * from the output entirely instead of estimating it.
    */
  def estimate(cnts: DataFrame, queryKeys: DataFrame, keyCol: String,
               d: Int, w: Int): DataFrame =
    queryKeys
      .withColumn("i", explode(array((0 until d).map(i => lit(i)): _*)))
      .withColumn("bucket", bucketOf(col(keyCol), col("i"), w))
      .join(broadcast(cnts), Seq("i", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
}

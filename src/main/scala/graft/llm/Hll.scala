package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog cardinality sketch — approximate COUNT DISTINCT in m
  * registers. Completes the classic sketch family beside MinHash
  * (similarity), SimHash, Bloom (membership) and [[Cms]] (frequency):
  * at 100 TB "how many distinct urls/tokens/users" per slice is a
  * register table that merges with max(), not a distinct shuffle.
  *
  * Determinism: keys hash with md5-60 (`"hll:" || key`); register index =
  * low 6 bits, rho = position of the first set bit in the remaining 54
  * (computed from the LENGTH OF `bin(x)` — a string both engines produce
  * identically; no log2 whose last-ulp could flip a floor at 2^k
  * boundaries). The estimate is the RAW HLL formula α·m²/Σ2^(−M_j)
  * folded in register order — 2^(−M_j) are exact powers of two and the
  * fold order is pinned, so DuckDB replays the double bit-for-bit. The
  * small/large-range corrections (which need ln, a transcendental the
  * oracle contract bans) are intentionally omitted — callers read
  * `n_zero_registers` and fall back to exact counting below ~2.5·m, which
  * a pipeline at sketch scale never is.
  */
object Hll {

  val m = 64 // registers; index = 6 low hash bits
  val alpha: Double = 0.709 // alpha_64 (Flajolet et al. 2007)

  private def h60(e: Column): Column =
    graft.functions.CrossHashExprs.md5h60(e)

  /** Register table (j, m_j) — ALL m rows present (empty registers hold 0,
    * they weigh 2⁰ = 1 in the estimate).
    */
  def registers(keys: DataFrame, keyCol: String): DataFrame = {
    val sess = keys.sparkSession
    import sess.implicits._
    val h = h60(concat(lit("hll:"), col(keyCol).cast("string")))
    val rest = shiftright(h, 6) // the 54 bits above the register index
    // rho = 1-based position of the highest set bit counted from bit 53:
    // 54 - floor(log2(rest)) = 54 - (length(bin(rest)) - 1); all-zero rest
    // (probability 2^-54) saturates at 55
    val rho = when(rest === 0, lit(55))
      .otherwise(lit(55) - length(bin(rest)))
    // the register pass hashes every key row; behind a compact scan that
    // plans fewer data-bearing splits than cores it would run on one task
    val occupied = graft.core.Scratch.rebalance(keys)
      .groupBy(pmod(h, lit(m.toLong)).as("j"))
      .agg(max(rho).cast("long").as("m_j"))
    val all = (0L until m.toLong).toDF("j")
    all.join(occupied, Seq("j"), "left")
      .select(col("j"), coalesce(col("m_j"), lit(0L)).as("m_j"))
  }

  /** One-pass raw estimate + EXACT distinct, one row: (est_n,
    * n_zero_registers, true_n). Value-identical to
    * `estimate(registers(keys)) × countDistinct(keys)` — each key hashes
    * to exactly ONE register (j is a function of the key), so the
    * per-register exact distinct counts sum to the global exact distinct —
    * but the corpus is scanned ONCE: the error-story query paid a second
    * full scan (plus its own aggregate chain) only to re-read the same
    * keys the register pass had already consumed.
    */
  def estimateWithExact(keys: DataFrame, keyCol: String): DataFrame = {
    val sess = keys.sparkSession
    import sess.implicits._
    val h = h60(concat(lit("hll:"), col(keyCol).cast("string")))
    val rest = shiftright(h, 6)
    val rho = when(rest === 0, lit(55))
      .otherwise(lit(55) - length(bin(rest)))
    val occupied = graft.core.Scratch.rebalance(keys)
      .groupBy(pmod(h, lit(m.toLong)).as("j"))
      .agg(max(rho).cast("long").as("m_j"),
        countDistinct(col(keyCol)).as("nd"))
    val all = (0L until m.toLong).toDF("j")
    val regs = all.join(occupied, Seq("j"), "left")
      .select(col("j"), coalesce(col("m_j"), lit(0L)).as("m_j"),
        coalesce(col("nd"), lit(0L)).as("nd"))
    regs
      .agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("j"), col("m_j")))),
            s => pow(lit(2.0), -s.getField("m_j").cast("double"))),
          lit(0.0), (acc, x) => acc + x).as("s"),
        sum(when(col("m_j") === 0, 1L).otherwise(0L)).as("n_zero_registers"),
        sum(col("nd")).as("true_n"))
      .select(
        (lit(alpha * m * m) / col("s")).as("est_n"),
        col("n_zero_registers"),
        col("true_n"))
  }

  /** Grouped registers: one m-register sketch per `groupCol` value —
    * "distinct users per slice" across a whole dimension in one pass.
    * Empty registers materialize per group via the groups × all-j cross
    * (groups table is the aggregation output — already small).
    */
  def registersByGroup(keys: DataFrame, keyCol: String,
                       groupCol: String): DataFrame = {
    val sess = keys.sparkSession
    import sess.implicits._
    val h = h60(concat(lit("hll:"), col(keyCol).cast("string")))
    val rest = shiftright(h, 6)
    val rho = when(rest === 0, lit(55))
      .otherwise(lit(55) - length(bin(rest)))
    val occupied = graft.core.Scratch.rebalance(keys)
      .groupBy(col(groupCol), pmod(h, lit(m.toLong)).as("j"))
      .agg(max(rho).cast("long").as("m_j"))
    val groups = keys.select(col(groupCol)).distinct()
    val allJ = (0L until m.toLong).toDF("j")
    groups.crossJoin(broadcast(allJ))
      .join(occupied, Seq(groupCol, "j"), "left")
      .select(col(groupCol), col("j"),
        coalesce(col("m_j"), lit(0L)).as("m_j"))
  }

  /** Per-group estimates from a [[registersByGroup]] table. */
  def estimateByGroup(regs: DataFrame, groupCol: String): DataFrame =
    regs
      .groupBy(col(groupCol))
      .agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("j"), col("m_j")))),
            s => pow(lit(2.0), -s.getField("m_j").cast("double"))),
          lit(0.0), (acc, x) => acc + x).as("s"),
        sum(when(col("m_j") === 0, 1L).otherwise(0L)).as("n_zero_registers"))
      .select(col(groupCol),
        (lit(alpha * m * m) / col("s")).as("est_n"),
        col("n_zero_registers"))

  /** One-row estimate from a register table: raw α·m²/Σ2^(−M_j), plus the
    * zero-register count a caller uses to decide the exact-count fallback.
    */
  def estimate(regs: DataFrame): DataFrame =
    regs
      .agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("j"), col("m_j")))),
            s => pow(lit(2.0), -s.getField("m_j").cast("double"))),
          lit(0.0), (acc, x) => acc + x).as("s"),
        sum(when(col("m_j") === 0, 1L).otherwise(0L)).as("n_zero_registers"))
      .select(
        (lit(alpha * m * m) / col("s")).as("est_n"),
        col("n_zero_registers"))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the standard fix for EXTREME key skew that adaptive
  * execution cannot always rescue (AQE splits oversized sort-merge
  * partitions, but a single hot key hashed to one task still serializes
  * that task's probe side, and broadcast is off the table when the build
  * side is large).
  *
  * The left (skewed, large) side scatters each row to one of `salts`
  * sub-keys by a deterministic hash of the whole row's join payload; the
  * right side replicates each row to ALL `salts` sub-keys. The join key
  * becomes (key, salt): a key that previously funneled into one reducer
  * now spreads across `salts` of them. Cost: the right side shuffles
  * `salts`× its size — pick `salts` ≈ the skew factor, and keep the
  * replicated side the smaller one.
  *
  * Row-identical to the unsalted join (each left row meets each matching
  * right row exactly once — the left row lives in ONE salt bucket, and the
  * right row is present in that bucket exactly once).
  */
object SaltedJoin {

  def join(left: DataFrame, right: DataFrame, on: Seq[String],
           salts: Int): DataFrame = {
    require(on.nonEmpty, "salted join needs equality keys")
    require(salts > 1, s"salts must be > 1 (got $salts); use a plain join")
    // deterministic scatter: hash of the full left row, not rand() — reruns
    // and retries land every row in the same bucket
    val l = left.withColumn("_salt",
      pmod(hash(left.columns.map(col): _*), lit(salts)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, on :+ "_salt").drop("_salt")
  }
}

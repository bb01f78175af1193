// scratch stage-level profiler: sbt "runMain graft.tools.Profile [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.{Scratch, Tables}
    import graft.llm.Dedup

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-36s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm

    // --- blocked jaccard stages
    val shingled = docs.select(col("source").as("blk"), col("doc_id").as("id"),
      Dedup.shingleHashes(col("text"), 3).as("h0"))
    t("shingleHashes count")(shingled.select(sum(size(col("h0")))).first())
    val inverted = t("stage inverted")(Scratch.stage(
      shingled.select(col("blk"), col("id"), explode(col("h0")).as("s")), "prof_inv"))
    t("docFreq+kept+selfjoin+sizes")(
      Dedup.blockedJaccard(docs, "source", minJaccard = 0.05).count())
    t("full blockedJaccard again")(
      Dedup.blockedJaccard(docs, "source", minJaccard = 0.05).count())

    // --- neardup lsh stages
    val sigsLazy = Dedup.withMinhashSignature(docs)
    t("minhash signatures compute")(sigsLazy.select(max(element_at(col("sig"), 1))).first())
    val sigs = t("stage signatures")(Scratch.stage(sigsLazy, "prof_sig"))
    t("pairs from staged sigs")(
      Dedup.nearDupPairsFromSignatures(sigs).count())
    t("full nearDupPairs")(Dedup.nearDupPairs(docs).count())

    // --- tokens/shingles HOF cost in isolation
    t("tokens only")(docs.select(sum(size(
      graft.llm.TextAnalysis.tokens(lower(col("text")))))).first())
    t("shingles strings only")(docs.select(sum(size(
      Dedup.shingles(col("text"), 3)))).first())
    spark.stop()
  }
}

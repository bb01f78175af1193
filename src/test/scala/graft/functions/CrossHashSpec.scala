package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CrossHashSpec extends SparkSpec {
  import spark.implicits._

  test("md5h60 matches the hex-prefix definition (DuckDB parity anchor)") {
    // md5('hello') = 5d41402abc4b2a76..., first 15 hex chars as a long —
    // the exact value DuckDB's ('0x'||substr(md5('hello'),1,15))::BIGINT gives
    assert(CrossHash.md5h60("hello".getBytes("UTF-8")) == 419982666956583591L)
    assert(CrossHash.md5h60(Array.emptyByteArray) ==
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(Array.emptyByteArray)
          .map(b => f"$b%02x").mkString.take(15), 16))
  }

  test("perm stays in [0, M61) and wraps the modulus (min-wise mixing)") {
    val (a, c) = CrossHash.minhashConstants(1).head
    val vals = (0 until 1000).map(i =>
      CrossHash.perm(CrossHash.md5h60(s"v$i".getBytes), a, c))
    assert(vals.forall(v => v >= 0 && v < CrossHash.M61))
    // a non-wrapping family concentrates the argmin; a fair one spreads it:
    // across 200 random 20-element sets, the min must not always be the
    // same element under different permutations
    val consts = CrossHash.minhashConstants(16)
    val hs = (0 until 20).map(i => CrossHash.md5h60(s"el$i".getBytes)).toArray
    val winners = consts.map { case (ai, ci) =>
      hs.zipWithIndex.minBy { case (h, _) => CrossHash.perm(h, ai, ci) }._2
    }.toSet
    assert(winners.size > 3, s"argmin nearly constant: $winners")
  }

  test("minhash agreement tracks Jaccard on a known pair") {
    val shared = (0 until 18).map(i => CrossHash.md5h60(s"s$i".getBytes)).toArray
    val ua = (0 until 3).map(i => CrossHash.md5h60(s"a$i".getBytes)).toArray
    val ub = (0 until 3).map(i => CrossHash.md5h60(s"b$i".getBytes)).toArray
    val consts = CrossHash.minhashConstants(64)
    val as = consts.map(_._1).toArray; val cs = consts.map(_._2).toArray
    val sa = CrossHash.minhashSig(shared ++ ua, as, cs)
    val sb = CrossHash.minhashSig(shared ++ ub, as, cs)
    val agree = sa.zip(sb).count { case (x, y) => x == y } / 64.0
    // true J = 18/24 = 0.75; 64 components → σ ≈ 0.054
    assert(agree > 0.55 && agree < 0.95, s"agreement $agree vs J=0.75")
  }

  test("kernel expressions run inside whole-stage codegen") {
    // parquet-backed source so ConvertToLocalRelation can't fold the plan
    val path = java.nio.file.Files.createTempDirectory("codegen").toString + "/t"
    Seq("alpha beta gamma delta epsilon").toDF("text").write.parquet(path)
    val q = spark.read.parquet(path).select(
      graft.functions.CrossHashExprs.minhashSig(
        graft.functions.CrossHashExprs.shingleHashes(
          filter(split(col("text"), "\\s+"), t => t =!= ""), 3), 8).as("sig"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no WholeStageCodegen span in:\n$plan")
    assert(q.as[Seq[Long]].head().length == 8)
  }

  test("planeSig rejects a dim mismatch instead of silently truncating") {
    val planes = CrossHash.planeSigns(tables = 1, bits = 4, dim = 8)(0)
    val e = intercept[IllegalArgumentException] {
      CrossHash.planeSig(Array(1f, 2f, 3f), planes) // 3-dim vector, 8-dim planes
    }
    assert(e.getMessage.contains("dim"))
    // matching dim works
    CrossHash.planeSig(Array.fill(8)(1f), planes): Unit
  }

  test("scratch root honors the graft.scratch.dir conf") {
    val custom = java.nio.file.Files.createTempDirectory("scratch-root").toString
    spark.conf.set("graft.scratch.dir", custom)
    try {
      val p = graft.core.TempDirs.scratch("conf_test")
      assert(p.startsWith(custom), s"$p should live under $custom")
    } finally spark.conf.unset("graft.scratch.dir")
    assert(graft.core.TempDirs.scratch("default_test")
      .startsWith(System.getProperty("java.io.tmpdir")))
  }

  test("edge inputs: empty and unicode text shingle deterministically") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "héllo wörld naïve café über")).toDF("doc_id", "text")
    val out = graft.llm.CorpusPrep.withSketches(df)
      .select("doc_id", "sig_h", "simhash").collect()
    assert(out.length == 3)
    // empty and whitespace-only text hash to the SAME empty-shingle sketch
    assert(out(0).getLong(1) == out(1).getLong(1))
    // deterministic across evaluations
    val again = graft.llm.CorpusPrep.withSketches(df)
      .select("doc_id", "sig_h", "simhash").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}

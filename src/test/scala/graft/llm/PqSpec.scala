package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class PqSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus: dim 16, 40 vectors; vec 39 clones vec 0
  private val dim = 16
  // 131 is invertible mod the prime 251 > |corpus|, so no two ids below 251
  // share a vector — the only exact duplicate is the planted clone
  private def vec(i: Int): Seq[Float] =
    (0 until dim).map(d => (((i * 131 + d * 57) % 251) / 251.0f))
  private lazy val emb: DataFrame =
    ((0 until 39).map(i => (i.toLong, vec(i))) :+ (39L, vec(0)))
      .toDF("vec_id", "embedding")

  test("codebooks are [m][ksub][dsub] slices of the hash-chosen seeds") {
    val books = Pq.codebooks(emb, m = 4, ksub = 4)
    assert(books.length == 4)
    assert(books.forall(_.length == 4))
    assert(books.forall(_.forall(_.length == dim / 4)))
  }

  test("encode emits one m-long code row per vector, codes within [0, ksub)") {
    val books = Pq.codebooks(emb, m = 4, ksub = 4)
    val codes = Pq.encode(emb, books).collect()
    assert(codes.length == 40)
    codes.foreach { r =>
      val cs = r.getSeq[Long](r.fieldIndex("codes"))
      assert(cs.length == 4)
      assert(cs.forall(c => c >= 0 && c < 4))
    }
  }

  test("identical vectors get identical codes") {
    val books = Pq.codebooks(emb, m = 4, ksub = 4)
    val byId = Pq.encode(emb, books).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    assert(byId(39L) == byId(0L))
  }

  test("persisted books round-trip exactly") {
    val path = graft.core.TempDirs.scratch("pq_spec")
    Pq.buildIndex(emb, path, m = 4, ksub = 4)
    val built = Pq.codebooks(emb, m = 4, ksub = 4)
    val read = Pq.readBooks(spark, path)
    assert(read.length == built.length)
    (read zip built).foreach { case (rj, bj) =>
      (rj zip bj).foreach { case (rc, bc) => assert(rc.sameElements(bc)) }
    }
  }

  test("ADC ranks the query's code-sharers first, in id order") {
    // every vector sharing the query's codes has the globally minimal ADC
    // distance sum(min_c lut[j,c]); ties break on id. The planted clone is
    // one of them by construction — at m=4/ksub=4 other vectors may
    // legitimately quantize to the same codes, and ADC cannot tell them
    // apart (that is the compression trade; the rerank test below resolves
    // it with true cosine).
    val books = Pq.codebooks(emb, m = 4, ksub = 4)
    val codes = Pq.encode(emb, books).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    val sharers = codes.collect {
      case (id, cs) if id != 0L && cs == codes(0L) => id
    }.toSeq.sorted
    assert(sharers.contains(39L), "the clone must share the query's codes")
    val top = Pq.adcTopK(emb, Seq(0L), k = sharers.length, m = 4, ksub = 4)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(top == sharers)
  }

  test("exact rerank pins the clone at rank 1 via true cosine") {
    val got = Pq.adcTopK(emb, Seq(0L), k = 2, m = 4, ksub = 4, nRerank = 8)
      .collect().map(r => r.getAs[Long]("rank") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(got(1L) == 39L)
  }

  test("IVF+PQ with exhaustive probes equals plain ADC ranking") {
    // nProbe >= nCells makes the IVF tier a no-op prune; the composed
    // ranking must then be EXACTLY the full ADC ranking
    val ivfPath = graft.core.TempDirs.scratch("ivfpq_spec_ivf")
    val pqPath = graft.core.TempDirs.scratch("ivfpq_spec_pq")
    Ivf.buildIndexSeeded(emb, ivfPath, nCells = 4)
    Pq.buildIndex(emb, pqPath, m = 4, ksub = 4)
    val composed = Pq.ivfPqTopKFromIndexes(emb, ivfPath, pqPath,
        queryIds = Seq(0L, 5L), k = 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = Pq.adcTopKFromIndex(emb, pqPath, Seq(0L, 5L), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(composed == plain)
  }

  test("IVF+PQ prunes to probed cells and still finds the planted clone") {
    val ivfPath = graft.core.TempDirs.scratch("ivfpq_spec_ivf2")
    val pqPath = graft.core.TempDirs.scratch("ivfpq_spec_pq2")
    Ivf.buildIndexSeeded(emb, ivfPath, nCells = 8)
    Pq.buildIndex(emb, pqPath, m = 4, ksub = 4)
    // clone shares vec 0's cell (same vector → same nearest centroid), so
    // even nProbe = 1 must surface it among the code-sharing front-runners
    val got = Pq.ivfPqTopKFromIndexes(emb, ivfPath, pqPath,
        queryIds = Seq(0L), k = 40, nProbe = 1, nRerank = 8)
      .collect().map(r => r.getAs[Long]("rank") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(got(1L) == 39L) // rerank pins the clone first
    // pruning is real: candidates are a strict subset of the corpus
    val nCand = Pq.ivfPqTopKFromIndexes(emb, ivfPath, pqPath,
      queryIds = Seq(0L), k = 40, nProbe = 1).count()
    assert(nCand < 39, s"nProbe=1 must prune candidates, got $nCand rows")
  }

  test("residual IVFADC: codes carry cells, clone ranks first, ranking " +
       "is deterministic across rebuilds") {
    val ivfPath = graft.core.TempDirs.scratch("ivfpqr_spec_ivf")
    val pqPath = graft.core.TempDirs.scratch("ivfpqr_spec_pq")
    Ivf.buildIndexSeeded(emb, ivfPath, nCells = 4)
    Pq.buildResidualIndex(emb, ivfPath, pqPath, m = 4, ksub = 4)
    val codes = spark.read.parquet(s"$pqPath/codes")
    assert(codes.count() == 40)
    assert(codes.columns.toSet == Set("vec_id", "cell", "codes"))
    // the clone has vec 0's cell AND residual, so its residual codes equal
    // vec 0's exactly; raw ADC ranks by quantized distance (no rerank
    // stage here), so the clone must surface in the short list even if
    // another vector's code happens to sit marginally closer to the
    // query's residual
    val got = Pq.ivfPqResidualTopKFromIndexes(emb, ivfPath, pqPath,
        queryIds = Seq(0L), k = 5, nProbe = 4)
      .collect().map(r => r.getAs[Long]("rank") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(got.values.toSet.contains(39L), s"clone must be in the top-5, got $got")
    // determinism: a fresh build + search returns the identical ranking
    val ivf2 = graft.core.TempDirs.scratch("ivfpqr_spec_ivf2")
    val pq2 = graft.core.TempDirs.scratch("ivfpqr_spec_pq2")
    Ivf.buildIndexSeeded(emb, ivf2, nCells = 4)
    Pq.buildResidualIndex(emb, ivf2, pq2, m = 4, ksub = 4)
    val again = Pq.ivfPqResidualTopKFromIndexes(emb, ivf2, pq2,
        queryIds = Seq(0L), k = 5, nProbe = 4)
      .collect().map(r => r.getAs[Long]("rank") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(again == got)
  }

  test("residual codes differ from raw codes — the residual path engages") {
    val ivfPath = graft.core.TempDirs.scratch("ivfpqr_spec_ivf3")
    val pqrPath = graft.core.TempDirs.scratch("ivfpqr_spec_pq3")
    val pqPath = graft.core.TempDirs.scratch("ivfpqr_spec_pq4")
    Ivf.buildIndexSeeded(emb, ivfPath, nCells = 4)
    Pq.buildResidualIndex(emb, ivfPath, pqrPath, m = 4, ksub = 4)
    Pq.buildIndex(emb, pqPath, m = 4, ksub = 4)
    val raw = spark.read.parquet(s"$pqPath/codes")
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val res = spark.read.parquet(s"$pqrPath/codes")
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(raw.keySet == res.keySet)
    assert(raw.keys.exists(id => raw(id) != res(id)),
      "residual training must produce a different code assignment")
  }

  test("IVF+PQ plan: probes and LUTs broadcast, candidate pruning is a " +
       "hash join — never cartesian") {
    val ivfPath = graft.core.TempDirs.scratch("ivfpq_spec_plan_ivf")
    val pqPath = graft.core.TempDirs.scratch("ivfpq_spec_plan_pq")
    Ivf.buildIndexSeeded(emb, ivfPath, nCells = 8)
    Pq.buildIndex(emb, pqPath, m = 4, ksub = 4)
    val plan = Pq.ivfPqTopKFromIndexes(emb, ivfPath, pqPath, Seq(0L),
        k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe/LUT sides must broadcast:\n$plan")
  }

  test("encode is a narrow plan: no exchange") {
    val books = Pq.codebooks(emb, m = 4, ksub = 4)
    val plan = Pq.encode(emb, books).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PQ encode must not shuffle:\n$plan")
  }
}

package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential fuzz for the exact edit-distance similarity join: the
  * PassJoin blocking must be COMPLETE (never lose a true pair), so every
  * corpus below is checked pair-for-pair against a serial full-DP
  * Levenshtein reference — including near-empty strings (the non-segment
  * arm), multi-byte codepoints (segment boundaries are codepoint
  * positions), and seeded edit chains at exactly the threshold.
  */
class EditDistanceSpec extends SparkSpec {

  /** Plain unit-cost Levenshtein over codepoints — the reference arm. */
  private def lev(a: String, b: String): Int = {
    val s = a.codePoints().toArray
    val t = b.codePoints().toArray
    val prev = Array.tabulate(t.length + 1)(identity)
    val cur = new Array[Int](t.length + 1)
    var i = 1
    while (i <= s.length) {
      cur(0) = i
      var j = 1
      while (j <= t.length) {
        val sub = prev(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    prev(t.length)
  }

  private def brute(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, ta) <- docs
      (ib, tb) <- docs
      if ia < ib
      d = lev(ta, tb)
      if d <= k
    } yield (ia, ib, d.toLong)).toSet

  private def run(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    EditDistance.similarityJoin(docs.toDF("doc_id", "text"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("fuzz: similarityJoin equals full-DP brute force (seeded edit chains, 6 corpora × 3 thresholds)") {
    val rng = new scala.util.Random(421)
    val alphabet = "abcdef Xé漢"
    def randStr(n: Int): String =
      Seq.fill(n)(alphabet(rng.nextInt(alphabet.length))).mkString
    def edit(s: String): String = {
      val cps = s.codePoints().toArray
      val op = rng.nextInt(3)
      val pos = if (cps.isEmpty) 0 else rng.nextInt(cps.length)
      val c = alphabet(rng.nextInt(alphabet.length)).toInt
      val out = op match {
        case 0 if cps.nonEmpty => cps.updated(pos, c) // substitute
        case 1 if cps.nonEmpty => cps.take(pos) ++ cps.drop(pos + 1) // delete
        case _ => (cps.take(pos) :+ c) ++ cps.drop(pos) // insert
      }
      new String(out, 0, out.length)
    }
    for (corpus <- 0 until 6; k <- Seq(1, 2, 4)) {
      val bases = Seq.fill(10)(randStr(8 + rng.nextInt(60)))
      val docs = scala.collection.mutable.ArrayBuffer[String]()
      bases.foreach { b =>
        docs += b
        // chains at, below and past the threshold
        (0 until rng.nextInt(4)).foreach { _ =>
          var s = b
          (0 to rng.nextInt(k + 2)).foreach(_ => s = edit(s))
          docs += s
        }
      }
      // near-empty strings exercise the non-segment arm, incl. ""
      docs += ""
      docs += randStr(1 + rng.nextInt(k))
      docs += randStr(1 + rng.nextInt(2 * k))
      val ids = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq
      val expected = brute(ids, k)
      val got = run(ids, k)
      assert(got == expected,
        s"corpus $corpus k=$k: missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("fuzz: cross-table linkage equals full-DP brute force (4 corpora, k in {2, 4})") {
    import spark.implicits._
    val rng = new scala.util.Random(733)
    val alphabet = "abcdef Xé漢"
    def randStr(n: Int): String =
      Seq.fill(n)(alphabet(rng.nextInt(alphabet.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cps = s.codePoints().toArray
      (0 until edits).foreach { _ =>
        val pos = if (cps.isEmpty) 0 else rng.nextInt(cps.length)
        val c = alphabet(rng.nextInt(alphabet.length)).toInt
        cps = rng.nextInt(3) match {
          case 0 if cps.nonEmpty => cps.updated(pos, c)
          case 1 if cps.nonEmpty => cps.take(pos) ++ cps.drop(pos + 1)
          case _ => (cps.take(pos) :+ c) ++ cps.drop(pos)
        }
      }
      new String(cps, 0, cps.length)
    }
    for (corpus <- 0 until 4; k <- Seq(2, 4)) {
      val lhs = (Seq.fill(12)(randStr(6 + rng.nextInt(50))) ++ Seq("", randStr(k)))
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // the right table: mutations of left rows (ids overlap on purpose —
      // cross-table semantics must NOT self-exclude equal ids) + noise
      val rhs = (lhs.take(8).map { case (_, t) => mutate(t, rng.nextInt(k + 3)) } ++
        Seq.fill(6)(randStr(6 + rng.nextInt(50))) :+ "")
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expected = (for {
        (il, tl) <- lhs
        (ir, tr) <- rhs
        d = lev(tl, tr)
        if d <= k
      } yield (il, ir, d.toLong)).toSet
      val got = EditDistance.similarityJoinBetween(
        lhs.toDF("doc_id", "text"), rhs.toDF("doc_id", "text"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected,
        s"corpus $corpus k=$k: missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("fuzz: long strings at k=8 (600-1000 chars, banded DP at length)") {
    import spark.implicits._
    val rng = new scala.util.Random(9151)
    val words = Vector("spark", "trace", "gather", "header", "stack", "cdp",
      "offset", "velocity", "moveout", "sample")
    def longDoc(): String =
      Seq.fill(80 + rng.nextInt(60))(words(rng.nextInt(words.size))).mkString(" ")
    def mutate(s: String, edits: Int): String = {
      var cps = s.codePoints().toArray
      (0 until edits).foreach { _ =>
        val pos = rng.nextInt(cps.length)
        cps = rng.nextInt(3) match {
          case 0 => cps.updated(pos, 'z'.toInt)
          case 1 => cps.take(pos) ++ cps.drop(pos + 1)
          case _ => (cps.take(pos) :+ 'q'.toInt) ++ cps.drop(pos)
        }
      }
      new String(cps, 0, cps.length)
    }
    val bases = Seq.fill(6)(longDoc())
    val docs = bases.zipWithIndex.flatMap { case (b, i) =>
      // chains at 0, k, and past-k edits
      Seq(b, mutate(b, 8), mutate(b, 9 + rng.nextInt(4)))
    }.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val expected = brute(docs, 8)
    val got = run(docs, 8)
    assert(got == expected)
    assert(expected.nonEmpty) // the at-threshold chains must surface
  }

  test("fixture: 24 near-dup pairs at k=4 on sf0.01 documents match brute force") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val got = EditDistance.similarityJoin(docs, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val local = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // band by length first so the reference arm stays quick
    val expected = (for {
      (ia, ta) <- local
      (ib, tb) <- local
      if ia < ib && math.abs(ta.length - tb.length) <= 4
      d = lev(ta, tb)
      if d <= 4
    } yield (ia, ib, d.toLong)).toSet
    assert(got == expected)
    assert(got.size == 24) // pins the fixture's near-dup density
  }

  test("dedupByEditDistance drops exactly the docs with a lower-id near-dup") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val pairs = EditDistance.similarityJoin(docs, k = 4)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    val survivors = EditDistance.dedupByEditDistance(docs, k = 4)
      .collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == all -- pairs)
  }

  test("candidate generation stays an equi-join: no cartesian product in the main arm plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val plan = EditDistance.similarityJoin(docs, k = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}

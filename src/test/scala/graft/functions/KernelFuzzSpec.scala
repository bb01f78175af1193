package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential fuzzing for the ordering/windowing kernels, in the
  * JoinFuzzSpec mold: each seeded random case runs through the distributed
  * kernel and an independent in-JVM brute force agreeing only on
  * semantics. Aimed where the hand fixtures under-cover:
  *  - WinnowExpr: tiny alphabets make k-gram hash TIES and repeated grams
  *    common (the deque's strict-< pop and first-seen dedup rules are
  *    exactly what fixtures never stress), plus len<k / nH<window edges.
  *  - GlobalOrder.withGlobalSeq: duplicate multi-key rows — the contract
  *    is "seq is a permutation of 0..n-1 whose order sorts the keys",
  *    checked as stated instead of against one arbitrary tie layout.
  *  - GlobalOrder.withRunningTotal: exclusive prefix sums with zero-value
  *    rows (empty docs) and single-row inputs.
  *  - Packing.packSequences: window indices at exact context-boundary
  *    offsets, zero-token docs, ctx=1.
  * 130 seeded cases total.
  */
class KernelFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed0 + i)))

  // ---- winnow ------------------------------------------------------

  private def bruteWinnow(s: String, k: Int, w: Int): Seq[Long] = {
    if (s.length < k) return Nil
    val hs = (0 to s.length - k)
      .map(i => CrossHash.md5h60(s.substring(i, i + k).getBytes("UTF-8")))
    if (hs.length < w) return Nil
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    (0 to hs.length - w).foreach(i => out += hs.slice(i, i + w).min)
    out.toSeq
  }

  // 2-char alphabet: with k<=3 there are at most 8 distinct grams per
  // case, so repeated hashes inside one window are the norm
  private val winnowText: Gen[String] = for {
    n <- Gen.chooseNum(0, 30)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
  } yield cs.mkString

  test("fuzz: WinnowExpr matches brute-force window-min with first-seen dedup " +
       "(64 cases across 8 k/window shapes)") {
    val shapes = Seq((1, 1), (1, 4), (2, 3), (3, 1), (3, 4), (4, 2), (5, 6), (2, 6))
    shapes.zipWithIndex.foreach { case ((k, w), si) =>
      val texts = samples(winnowText, 8, 9000L + si)
      val got = texts.toDF("t")
        .select(CrossHashExprs.winnowFps(col("t"), k, w).as("fps"))
        .as[Seq[Long]].collect()
      texts.zip(got).foreach { case (t, fps) =>
        assert(fps == bruteWinnow(t, k, w),
          s"winnow mismatch for text='$t' k=$k w=$w")
      }
    }
  }

  // ---- global sequence ---------------------------------------------

  private val seqCase: Gen[List[(Int, Int)]] = for {
    n <- Gen.chooseNum(0, 40)
    rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(1, 3)))
  } yield rows

  test("fuzz: withGlobalSeq emits a 0..n-1 permutation that sorts the keys " +
       "(30 cases with heavy duplicate keys)") {
    samples(seqCase, 30, 9100L).foreach { rows =>
      val df = rows.toDF("k1", "k2").repartition(5)
      val got = graft.operators.GlobalOrder
        .withGlobalSeq(df, Seq("k1", "k2"))
        .select("seq", "k1", "k2").as[(Long, Int, Int)].collect()
      assert(got.map(_._1).sorted.toSeq == (0L until rows.size).toSeq,
        s"seq not a permutation for $rows")
      val inSeqOrder = got.sortBy(_._1).map(r => (r._2, r._3)).toSeq
      assert(inSeqOrder == inSeqOrder.sorted,
        s"seq order does not sort keys for $rows")
      // multiset preserved — no row lost or duplicated by the two passes
      assert(got.map(r => (r._2, r._3)).toSeq.sorted == rows.sorted,
        s"rows changed for $rows")
    }
  }

  private val totalCase: Gen[List[Long]] = for {
    n <- Gen.chooseNum(1, 30)
    vs <- Gen.listOfN(n, Gen.oneOf(0L, 0L, 1L, 7L, 100L)) // zeros common
  } yield vs

  test("fuzz: withRunningTotal is the exclusive prefix sum in key order " +
       "(30 cases with zero-valued rows)") {
    samples(totalCase, 30, 9200L).foreach { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i, v) }
      val df = rows.toDF("id", "v").repartition(4)
      val got = graft.operators.GlobalOrder
        .withRunningTotal(df, Seq("id"), "v", "run")
        .select("id", "run").as[(Int, Long)].collect().sortBy(_._1)
      val expect = vs.scanLeft(0L)(_ + _).init
      assert(got.map(_._2).toSeq == expect, s"running total mismatch for $vs")
    }
  }

  // ---- sequence packing --------------------------------------------

  private val packCase: Gen[(Int, List[String])] = for {
    ctx <- Gen.oneOf(1, 2, 3, 5)
    n <- Gen.chooseNum(0, 15)
    texts <- Gen.listOfN(n, for {
      w <- Gen.chooseNum(0, 7) // 0 tokens: empty doc
      words <- Gen.listOfN(w, Gen.oneOf("tok", "x", "yy"))
      sep <- Gen.oneOf(" ", "  ", " \t ")
    } yield words.mkString(sep))
  } yield (ctx, texts)

  test("fuzz: packSequences window spans match an independent sequential fold " +
       "(36 cases at boundary-heavy context sizes)") {
    samples(packCase, 36, 9300L).foreach { case (ctx, texts) =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = rows.toDF("doc_id", "text").repartition(4)
      val got = graft.llm.Packing.packSequences(df, ctx)
        .select("doc_id", "n_tokens", "start_offset", "window_first",
          "window_last", "n_windows")
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      // independent fold in doc_id order over independently counted tokens
      var off = 0L
      rows.sortBy(_._1).zip(got).foreach { case ((id, text), g) =>
        val n = text.split("\\s+").count(_.nonEmpty).toLong
        val first = off / ctx
        val last = if (n > 0) (off + n - 1) / ctx else first
        assert(g == ((id, n, off, first, last, last - first + 1)),
          s"pack mismatch doc=$id text='$text' ctx=$ctx: got $g")
        off += n
      }
    }
  }
}

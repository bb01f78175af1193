package graft.llm

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential fuzzing for [[Dedup.duplicateNgramSpans]]: each seeded
  * random corpus runs through the distributed operator and through an
  * independent brute-force reference (string-keyed gram sets, per-doc
  * interval merge by direct scan — a genuinely different algorithm).
  * Generation aims at the under-covered places: tiny shared vocabularies
  * (cross-doc gram collisions are COMMON, not planted), docs exactly n and
  * n±1 tokens long, verbatim copies, partial copies spliced mid-document,
  * runs that touch document boundaries, and merge-distance edges (marked
  * positions exactly n and n+1 apart).
  */
class NgramSpanFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val n = 4

  private def samples[A](g: Gen[A], count: Int, seed0: Long): Seq[A] =
    (0 until count).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed0 + i)))

  // vocabulary of 6 words → random 4-grams collide across docs often;
  // occasional splice of a shared phrase makes long runs common too
  private val phrase = "p1 p2 p3 p4 p5 p6".split(' ').toList

  private val docGen: Gen[List[String]] = for {
    len <- Gen.chooseNum(0, 14)
    words <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    splice <- Gen.chooseNum(0, 3)
    at <- Gen.chooseNum(0, math.max(words.size, 1))
  } yield
    if (splice == 0) words.take(at) ::: phrase ::: words.drop(at)
    else words

  private val corpusGen: Gen[List[List[String]]] = for {
    nd <- Gen.chooseNum(2, 7)
    docs <- Gen.listOfN(nd, docGen)
    dupFrom <- Gen.chooseNum(0, nd - 1)
    dupTimes <- Gen.chooseNum(0, 2) // verbatim copies → full-doc spans
  } yield docs ::: List.fill(dupTimes)(docs(dupFrom))

  /** Brute force: string grams, set-of-docs per gram, per-doc scan merge. */
  private def brute(docs: Seq[(Long, List[String])])
      : Set[(Long, Long, Long, Long)] = {
    val grams = docs.map { case (id, toks) =>
      id -> toks.map(_.toLowerCase).sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toVector
    }.toMap
    val docsPerGram = grams.toSeq
      .flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    grams.flatMap { case (id, gs) =>
      val marked = gs.zipWithIndex.collect {
        case (g, pos) if docsPerGram(g) >= 2 => pos
      }
      // direct interval merge: spans break when the next marked position
      // is more than n after the previous one
      val islands = marked.foldLeft(List.empty[(Int, Int)]) {
        case (Nil, p)                          => List((p, p))
        case ((s, e) :: rest, p) if p - e <= n => (s, p) :: rest
        case (acc, p)                          => (p, p) :: acc
      }
      islands.map { case (s, e) =>
        (id, s.toLong, e.toLong + n - 1, (e + n - s).toLong)
      }
    }.toSet
  }

  test("operator equals the brute-force reference on 120 seeded corpora") {
    samples(corpusGen, 120, seed0 = 0xC0FFEE).zipWithIndex.foreach {
      case (docs, i) =>
        val tagged = docs.zipWithIndex.map { case (ws, j) =>
          (j.toLong, ws.mkString(" "))
        }
        val got = Dedup.duplicateNgramSpans(
            tagged.toDF("doc_id", "text"), n = n)
          .as[(Long, Long, Long, Long)].collect().toSet
        val want = brute(tagged.map { case (id, t) =>
          (id, t.split("\\s+").filter(_.nonEmpty).toList)
        })
        assert(got == want, s"case $i: docs=$tagged\n got=$got\nwant=$want")
    }
  }
}

package graft

/** The correctness-gate contract: every registered query carries oracle
  * SQL (a key in one map but not the other silently downgrades the
  * driver's check to rows-only — this spec makes that drift a failure).
  */
class RegistrySpec extends org.scalatest.funsuite.AnyFunSuite {

  test("queries and oracleSql cover exactly the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle entries without a query: ${o -- q}")
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${q -- o}")
  }

  test("no duplicate registration: each name appears EXACTLY twice in the " +
       "source (query + oracle) — a Map literal dedupes keys, so a " +
       "re-registered name would silently SHADOW the original query") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val names = "(?m)^    \"(q_\\w+)\" ->".r
      .findAllMatchIn(src).map(_.group(1)).toSeq
    val bad = names.groupBy(identity).filter(_._2.size != 2)
    assert(bad.isEmpty,
      s"names not registered exactly twice (query + oracle): ${bad.keys}")
    assert(names.toSet == SparkEntry.queries.keySet)
  }

  test("query names are well-formed and oracle SQL non-empty") {
    SparkEntry.queries.keys.foreach(n =>
      assert(n.matches("q_[a-z0-9_]+"), s"odd query name: $n"))
    SparkEntry.oracleSql.foreach { case (n, sql) =>
      assert(sql.trim.nonEmpty, s"empty oracle SQL for $n")
    }
  }
}

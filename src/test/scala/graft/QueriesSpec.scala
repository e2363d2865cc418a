package graft

/** Regression guard: every registered query must execute and return a
  * well-formed (possibly empty) result at sf0.001. Catches breakage of the
  * driver-facing registry at test time instead of round-verify time.
  */
class QueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  Queries.all.toSeq.sortBy(_._1).foreach { case (name, q) =>
    test(s"registered query $name executes at sf0.001") {
      val df = q.fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
    }
  }

  test("every oracle entry corresponds to a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

package graft

/** The driver's two smoke contracts, locked in CI: the flagship `entry`
  * returns rows at sf0.001, and every registered query has either an
  * oracle or a documented rows-only status (name-set consistency).
  */
class EntrySmokeSpec extends SparkSpec {

  test("driver entry smoke: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query; every query has an oracle") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(queries), s"orphan oracles: ${oracles.diff(queries)}")
    // since r8 the full gate is hash-verified: incremental dedup (the last
    // rows-only query) now has an exact-Jaccard replay oracle, valid because
    // the fixtures leave a (0.31, 0.92) exact-Jaccard dead zone around the
    // 0.5 estimator threshold
    assert(queries.diff(oracles).isEmpty,
      s"queries without an oracle (add one or document rows-only): ${queries.diff(oracles)}")
  }

  test("bench overrides shadow only registered gate queries") {
    assert(SparkEntry.benchQueries.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}

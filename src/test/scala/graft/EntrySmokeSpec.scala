package graft

/** The driver's two smoke contracts, locked in CI: the flagship `entry`
  * returns rows at sf0.001, and every registered query has either an
  * oracle or a documented rows-only status (name-set consistency).
  */
class EntrySmokeSpec extends SparkSpec {

  test("driver entry smoke: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query; rows-only set is incr alone") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(queries), s"orphan oracles: ${oracles.diff(queries)}")
    val rowsOnly = queries.diff(oracles)
    // the one remaining rows-only query: incremental dedup's verdict is the
    // signature-Jaccard ESTIMATOR (the store carries no text), which has no
    // SQL form; its planted-scenario semantics are CI-gated in DedupSpec
    assert(rowsOnly == Set("q_n_dedup_incr"),
      s"unexpected rows-only queries (add an oracle or update this lock): $rowsOnly")
  }

  test("bench overrides shadow only registered gate queries") {
    assert(SparkEntry.benchQueries.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}

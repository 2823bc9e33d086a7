package graft

/** The driver's two smoke contracts, locked in CI: the flagship `entry`
  * returns rows at sf0.001, and every registered query has either an
  * oracle or a documented rows-only status (name-set consistency).
  */
class EntrySmokeSpec extends SparkSpec {

  test("driver entry smoke: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query; rows-only set is the known six") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(queries), s"orphan oracles: ${oracles.diff(queries)}")
    val rowsOnly = queries.diff(oracles)
    assert(rowsOnly == Set("q_n_ann_ivf", "q_n_ann_lsh", "q_n_dedup_minhash",
      "q_n_dedup_simhash", "q_n_emb_dups", "q_n_dedup_incr"),
      s"unexpected rows-only queries (add an oracle or update this lock): $rowsOnly")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies insert/update/delete and drops unchanged rows") {
    val prev = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
      .toDF("id", "name", "v")
    val next = Seq((1L, "a", 10), (2L, "B", 20), (3L, "c", 99), (5L, "e", 50))
      .toDF("id", "name", "v")
    val out = Snapshot.diff(prev, next, Seq("id"), Seq("name", "v"))
      .select("id", "name", "v", "op")
      .as[(Long, String, Int, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (2L, "B", 20, "update"),   // name changed
      (3L, "c", 99, "update"),   // value changed
      (4L, "d", 40, "delete"),   // gone from next — carries prev's values
      (5L, "e", 50, "insert")))  // 1 is unchanged and absent
  }

  test("diff is null-safe: NULL→value and value→NULL are updates") {
    val prev = Seq((1L, Some(10)), (2L, None), (3L, None)).toDF("id", "v")
    val next = Seq((1L, None), (2L, Some(5)), (3L, None))
      .toDF("id", "v")
    val ops = Snapshot.diff(prev, next, Seq("id"), Seq("v"))
      .select("id", "op").as[(Long, String)].collect().toMap
    assert(ops == Map(1L -> "update", 2L -> "update")) // 3: NULL<=>NULL unchanged
  }

  test("composite keys work") {
    val prev = Seq(("x", 1L, 10), ("x", 2L, 20)).toDF("k1", "k2", "v")
    val next = Seq(("x", 1L, 10), ("y", 2L, 20)).toDF("k1", "k2", "v")
    val ops = Snapshot.diff(prev, next, Seq("k1", "k2"), Seq("v"))
      .select("k1", "k2", "op").as[(String, Long, String)].collect().toSet
    assert(ops == Set(("x", 2L, "delete"), ("y", 2L, "insert")))
  }
}

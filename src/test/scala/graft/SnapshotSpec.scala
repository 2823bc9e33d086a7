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

  test("scd2 collapses unchanged observations and closes validity intervals") {
    val log = Seq(
      (1L, 1L, 100L), (1L, 2L, 100L), (1L, 3L, 150L), (1L, 4L, 150L),
      (2L, 1L, 50L)
    ).toDF("k", "ts", "v")
    val out = Snapshot.scd2(log, Seq("k"), "ts", Seq("v"))
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Long, Option[Long], Boolean)].collect().toSet
    assert(out == Set(
      (1L, 100L, 1L, Some(3L), false),
      (1L, 150L, 3L, None, true),
      (2L, 50L, 1L, None, true)))
  }

  test("scd2 value flapping (A→B→A) yields three versions, not two") {
    val log = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 10L)).toDF("k", "ts", "v")
    val out = Snapshot.scd2(log, Seq("k"), "ts", Seq("v"))
      .select("v", "valid_from").as[(Long, Long)].collect().toSet
    assert(out == Set((10L, 1L), (20L, 2L), (10L, 3L)))
  }

  test("scd2 plans ONE exchange: change detection and interval close share the sort") {
    val log = Seq((1L, 1L, 10L)).toDF("k", "ts", "v")
    val plan = Snapshot.scd2(log, Seq("k"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }
}

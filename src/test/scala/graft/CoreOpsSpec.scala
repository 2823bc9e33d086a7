package graft

import org.apache.spark.sql.functions._
import graft.operators._
import scala.jdk.CollectionConverters._

/** Operator-level specs mirroring the reference's scenario list
  * (`/root/reference/tests/jobs.js` — map/filter/uniq/sort/join/split/
  * reduce/tree roundtrip), but with assertions.
  */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  test("C1 filter keeps only matching rows") {
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "k")
    val out = CoreOps.filterOp(df, col("k") === "a").collect()
    assert(out.map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
  }

  test("C2 mapper projects and renames") {
    val df = Seq((1, 10.0)).toDF("id", "v")
    val out = CoreOps.mapper(df, "id2" -> (col("id") * 2), "v" -> col("v"))
    assert(out.columns.toSeq == Seq("id2", "v"))
    assert(out.head().getInt(0) == 2)
  }

  test("C4 reducer counts per key like the curator example") {
    // tests/jobs.js:318-322 — count per curator
    val df = Seq(("X", 1), ("X", 2), ("Y", 3)).toDF("curator", "v")
    val out = CoreOps.reducer(df, Seq(col("curator")), Seq(count(lit(1)).as("n")))
      .orderBy("curator").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("X", 2L), ("Y", 1L)))
  }

  test("C5 sorter total order") {
    val df = Seq(3, 1, 2).toDF("id")
    assert(CoreOps.sorter(df, col("id")).as[Int].collect().toSeq == Seq(1, 2, 3))
  }

  test("C6 uniquer keep-first picks row minimal under declared order") {
    val df = Seq((1, 10, "first"), (1, 20, "second"), (2, 5, "only"))
      .toDF("k", "ord", "tag")
    val out = CoreOps.uniquerKeepFirst(df, Seq("k"), Seq("ord"))
      .orderBy("k").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("first", "only"))
  }

  test("C7/C8 array2map ∘ map2array roundtrips entries") {
    val df = Seq((1, Seq(("a", 10), ("b", 20)))).toDF("id", "pairs")
      .withColumn("pairs", expr("transform(pairs, x -> struct(x._1 as id, x._2 as value))"))
    val m = CoreOps.array2map(df, "pairs", "m")
    val back = CoreOps.map2array(m, "m", "arr")
    val entries = back.select(explode(col("arr")).as("e"))
      .select("e.id", "e.value").as[(String, Int)].collect().toMap
    assert(entries == Map("a" -> 10, "b" -> 20))
  }

  test("C7 array2map collapse rule: zero other fields → null value") {
    val df = Seq((1, Seq("x", "y"))).toDF("id", "ids")
      .withColumn("ids", expr("transform(ids, x -> struct(x as id))"))
    val m = CoreOps.array2map(df, "ids", "m")
    val vals = m.select(expr("map_values(m)")).head().getSeq[Any](0)
    assert(vals.forall(_ == null))
  }

  test("C7 array2map collapse rule: 2+ fields → struct value") {
    val df = Seq((1, Seq(("k1", 1, "u")))).toDF("id", "xs")
      .withColumn("xs", expr("transform(xs, x -> struct(x._1 as id, x._2 as a, x._3 as b))"))
    val m = CoreOps.array2map(df, "xs", "m")
    val v = m.select(expr("m['k1']")).head().getStruct(0)
    assert(v.getInt(0) == 1 && v.getString(1) == "u")
  }

  test("H1 enrich join is left-outer (miss passes through)") {
    val facts = Seq(("101", 1), ("999", 2)).toDF("kopuk", "v")
    val vocab = Seq(("101", "Source 101")).toDF("aname", "adesc")
    val out = Joins.enrich(facts, vocab, facts("kopuk"), vocab("aname"))
    assert(out.count() == 2)
    assert(out.filter(col("kopuk") === "999").head().isNullAt(2) ||
           out.filter(col("kopuk") === "999").head().getAs[String]("adesc") == null)
  }

  test("H2 joinDetail attaches all details, empty array on miss") {
    val master = Seq((1, "m1"), (2, "m2")).toDF("mk", "name")
    val detail = Seq((1, "d1"), (1, "d2")).toDF("dk", "dname")
    val out = Joins.joinDetail(master, detail, "mk", "dk")
    val sizes = out.select(col("mk"), size(col("details")))
      .as[(Int, Int)].collect().toMap
    assert(sizes == Map(1 -> 2, 2 -> 0))
  }

  test("H3 routed split drops out-of-range routes like the reference") {
    val dir = java.nio.file.Files.createTempDirectory("split").toString
    val df = Seq(0, 1, 2, 3, 4, 5).toDF("id")
    // route = id; validRoutes = 3 → ids 3..5 dropped (job-splitter.js:119-123)
    Splitter.routedWrite(df, col("id"), dir, validRoutes = 3)
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    assert(back.select("id").as[Int].collect().sorted.toSeq == Seq(0, 1, 2))
  }

  test("H3 multicast delivers every record to every receiver") {
    val df = Seq(1, 2, 3).toDF("id")
    val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
    Splitter.multicast(df, Seq(d => counts += d.count(), d => counts += d.count()))
    assert(counts.toSeq == Seq(3L, 3L))
  }

  test("as-of join picks the latest right row at-or-before each left ts") {
    val left = Seq((1, "u", 100L), (2, "u", 200L), (3, "u", 50L), (4, "v", 100L))
      .toDF("id", "k", "ts")
    val right = Seq(("u", 90L, "a"), ("u", 100L, "b"), ("u", 150L, "c"))
      .toDF("k", "rts", "tag")
      .withColumn("tag", col("tag"))
    val out = Joins.asofJoin(left, right.select(col("k"), col("rts"), col("tag")),
        "k", "ts", "rts", payload = Seq("tag"))
      .select("id", "tag").as[(Int, String)].collect().toMap
    assert(out(1) == "b")   // ts=100 matches right at 100 (ties included)
    assert(out(2) == "c")   // latest at-or-before 200 is 150
    assert(out(3) == null)  // nothing at-or-before 50
    assert(out(4) == null)  // no right rows for key v
  }

  test("as-of join: matched row's null fields stay null, fields never mix rows") {
    // right row at ts=150 (the match for left ts=200) has tag=null, note="n2";
    // per-column carry would resurrect tag="a" from the OLDER row at ts=90 and
    // deliver a frankenrow (a, n2). The packed-struct carry keeps the matched
    // row whole: (null, n2).
    val left = Seq((1, "u", 200L)).toDF("id", "k", "ts")
    val right = Seq(("u", 90L, "a", "n1"), ("u", 150L, null, "n2"))
      .toDF("k", "rts", "tag", "note")
    val out = Joins.asofJoin(left, right, "k", "ts", "rts",
        payload = Seq("tag", "note"))
      .select("tag", "note").as[(String, String)].collect().head
    assert(out == ((null, "n2")), s"got $out — matched row not carried whole")
  }

  test("spy observes row count without extra pass") {
    val obs = new org.apache.spark.sql.Observation("spy_test")
    val df = Seq(1, 2, 3).toDF("id").observe(obs, count(lit(1)).as("rows"))
    df.write.format("noop").mode("overwrite").save()
    assert(obs.get("rows") == 3L)
  }

  test("spyTap fires the callback per record, pass-through, deterministic sample") {
    // the reference's spy invokes a callback on EVERY record
    // (jobs/job.js:202-210); spyTap is the record-level debugging tap
    // beside the aggregate-metric spy. Executor-side callback → observe
    // through a JVM-global sink (local[“n”] shares the JVM).
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    CoreOpsSpecTapSink.sink = id => { seen.add(id); () }
    val df = spark.range(0, 100).toDF("id")
    val out = graft.operators.CoreOps.spyTap(df,
      row => CoreOpsSpecTapSink.sink(row.getLong(row.fieldIndex("id"))))
    // pass-through: the stream is unchanged (schema and content)
    assert(out.columns.toSeq == Seq("id"))
    assert(out.count() == 100)
    assert(seen.size == 100, s"every record taps at rate 1.0, saw ${seen.size}")
    // sampled: deterministic gate — the same subset on every execution,
    // the callback sees the USER schema (no gate column), count in (0, n)
    seen.clear()
    val sampled = graft.operators.CoreOps.spyTap(df,
      row => { assert(row.schema.fieldNames.toSeq == Seq("id"))
        CoreOpsSpecTapSink.sink(row.getLong(0)) }, sampleRate = 0.3)
    assert(sampled.count() == 100, "sampling gates the TAP, never the stream")
    val first = Set.empty[Long] ++ seen.asScala
    assert(first.nonEmpty && first.size < 100, s"expected a strict sample, got ${first.size}")
    seen.clear()
    sampled.write.format("noop").mode("overwrite").save()
    assert((Set.empty[Long] ++ seen.asScala) == first, "sample must be deterministic per row")
    // rate 0 short-circuits to the input plan itself
    assert(graft.operators.CoreOps.spyTap(df, _ => fail("rate-0 tap fired"), 0.0) eq df)
    // edge inputs (r15 review): a user column literally named __spy must
    // survive pass-through (the gate picks a fresh name), and MapType
    // columns — unhashable in Spark SQL — must not break the sampled gate
    val tricky = spark.range(0, 20)
      .withColumn("__spy", col("id") % 2 === 0)
      .withColumn("m", map(lit("k"), col("id").cast("string")))
    val out2 = graft.operators.CoreOps.spyTap(tricky, _ => (), sampleRate = 0.5)
    assert(out2.columns.toSeq == Seq("id", "__spy", "m"),
      "pass-through must keep a user __spy column and map columns intact")
    assert(out2.filter(col("__spy")).count() == 10)
    // case-INSENSITIVE gate freshness (ADVICE r15): withColumn resolves
    // names case-insensitively, so a user column differing only in case
    // (__SPY0) was silently replaced, then dropped, then the boolean read
    // indexed out of bounds
    val cased = spark.range(0, 20).withColumn("__SPY0", col("id") % 2 === 0)
    val out3 = graft.operators.CoreOps.spyTap(cased, _ => (), sampleRate = 0.5)
    assert(out3.columns.toSeq == Seq("id", "__SPY0"),
      "a user column differing only in case must survive pass-through")
    assert(out3.filter(col("__SPY0")).count() == 10)
  }
}

/** JVM-global tap sink: the spyTap callback runs on executor threads (same
  * JVM under local[n]); a closure-captured collection would be serialized
  * per task and mutate a COPY on a real cluster — the object-field pattern
  * keeps the test honest about where the callback executes.
  */
object CoreOpsSpecTapSink {
  @volatile var sink: Long => Unit = _ => ()
}

package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.{PagedSource, Readers, Transports}
import graft.sources.Transports.{Auth, ReqOptions}

/** The concrete HTTP/FTP/mongo transport surface, exercised against an
  * in-process JDK HttpServer (offline-safe — no egress).
  */
class TransportsSpec extends SparkSpec {

  private def withServer(routes: (String, HttpExchange => (Int, String))*)(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, handler) =>
      server.createContext(path, (ex: HttpExchange) => {
        val (status, payload) = handler(ex)
        val bytes = payload.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        ex.close()
      })
    }
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def requestBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  test("httpFetch sends method/headers/basic-auth like the reference reqOptions") {
    val seen = new java.util.concurrent.atomic.AtomicReference[(String, String, String)]
    withServer("/data" -> { ex =>
      seen.set((ex.getRequestMethod,
        Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""),
        Option(ex.getRequestHeaders.getFirst("X-Extra")).getOrElse("")))
      (200, """{"ok":true}""")
    }) { base =>
      val out = Transports.httpFetch(s"$base/data", ReqOptions(
        headers = Map("X-Extra" -> "1"), auth = Some(Auth("u", "p"))))
      assert(out == """{"ok":true}""")
      val (method, authz, extra) = seen.get
      assert(method == "GET" && extra == "1")
      // the exact header the reference builds: Basic base64(user:password)
      assert(authz == "Basic " + java.util.Base64.getEncoder
        .encodeToString("u:p".getBytes(StandardCharsets.UTF_8)))
    }
  }

  test("httpFetch raises on HTTP >= 400 so the paged settle-retry loop engages") {
    withServer("/boom" -> { _ => (503, "down") }) { base =>
      val e = intercept[java.io.IOException](Transports.httpFetch(s"$base/boom"))
      assert(e.getMessage.contains("503"))
    }
  }

  test("paged HTTP read: template substitution + empty-page×2 termination") {
    withServer("/page" -> { ex =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val p = q.split("&").collect { case s if s.startsWith("p=") => s.drop(2).toInt }.head
      val payload =
        if (p < 3) (0 until 10).map(i => s"""{"id":${p * 10 + i}}""").mkString("\n")
        else "" // pages 3,4 empty → empty×2 rule ends pagination
      (200, payload)
    }) { base =>
      val df = PagedSource.read(spark,
        Transports.httpPagedFetch(s"$base/page?p={%page%}&limit={%limit%}"))
      assert(df.count() == 30)
      assert(df.agg(org.apache.spark.sql.functions.max("id")).head.getLong(0) == 29L)
    }
  }

  test("Readers.url parses a rootNode JSON payload over HTTP") {
    withServer("/api" -> { _ =>
      (200, """{"meta":{"v":1},"results":{"vacancies":[{"id":1,"name":"a"},{"id":2,"name":"b"}]}}""")
    }) { base =>
      val df = Readers.url(spark, s"$base/api", rootNode = "results.vacancies")
      assert(df.columns.sorted.toSeq == Seq("id", "name"))
      assert(df.count() == 2)
    }
  }

  test("push sink POSTs NDJSON batches through the HTTP poster") {
    import spark.implicits._
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[String]
    withServer("/ingest" -> { ex =>
      assert(ex.getRequestMethod == "POST")
      batches.add(requestBody(ex))
      (200, "")
    }) { base =>
      val df = (1 to 10).toDF("n").coalesce(1)
      graft.sinks.Writers.push(df, batchSize = 4,
        Transports.httpPoster(s"$base/ingest"))
      val records = batches.toArray(Array.empty[String])
        .flatMap(_.split("\n")).filter(_.nonEmpty)
      assert(records.length == 10)              // every record delivered
      assert(batches.size() == 3)               // 4+4+2 batching held
    }
  }

  test("pipeline spec can declare an http source with auth options") {
    import graft.plans._
    withServer("/feed" -> { ex =>
      if (Option(ex.getRequestHeaders.getFirst("Authorization")).isEmpty) (401, "no auth")
      else (200, """{"data":[{"k":1,"v":"x"},{"k":2,"v":"y"},{"k":3,"v":"x"}]}""")
    }) { base =>
      val spec = PipelineSpec(nodes = Seq(
        "src" -> SourceSpec("http", "{%api%}/feed",
          options = Map("auth.user" -> "u", "auth.password" -> "p"),
          rootNode = "data"),
        "agg" -> AggSpec(RefSpec("src"), keys = Seq("v"), aggs = Seq("n" -> "count(1)")),
        "out" -> SortSpec(RefSpec("agg"), Seq("v"))), out = "out")
      val rows = PipelineCompiler.compile(spec, spark, Map("api" -> base))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq(("x", 2L), ("y", 1L)))
    }
  }

  test("pipeline spec paged-http source paginates to termination") {
    import graft.plans._
    withServer("/items" -> { ex =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val p = q.split("&").collect { case s if s.startsWith("page=") => s.drop(5).toInt }.head
      (200, if (p < 2) (0 until 5).map(i => s"""{"n":${p * 5 + i}}""").mkString("\n") else "")
    }) { base =>
      val spec = PipelineSpec(nodes = Seq(
        "src" -> SourceSpec("http-paged", s"$base/items?page={%page%}"),
        "agg" -> AggSpec(RefSpec("src"), keys = Nil, aggs = Seq(
          "rows" -> "count(1)", "total" -> "cast(sum(n) as bigint)"))), out = "agg")
      val row = PipelineCompiler.compile(spec, spark).head()
      assert(row.getLong(0) == 10L && row.getLong(1) == 45L)
    }
  }

  test("runToSinks http sink posts the node's records") {
    import graft.plans._
    val received = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer("/sink" -> { ex =>
      received.addAndGet(requestBody(ex).split("\n").count(_.nonEmpty))
      (200, "")
    }) { base =>
      val spec = PipelineSpec(nodes = Seq(
        "li"  -> SourceSpec("parquet", s"$sf/region.parquet"),
        "out" -> MapSpec(RefSpec("li"), Seq("k" -> "r_regionkey"))), out = "out")
      PipelineCompiler.runToSinks(spec, spark, sinks = Seq(("out", "http", s"$base/sink")))
      assert(received.get == 5)
    }
  }

  test("joinDetail spec projects detailCols and roundtrips through JSON") {
    import graft.plans._
    val spec = PipelineSpec(nodes = Seq(
      "m" -> SourceSpec("parquet", s"$sf/orders.parquet"),
      "d" -> SourceSpec("parquet", s"$sf/lineitem.parquet"),
      "j" -> JoinDetailSpec(RefSpec("m"), RefSpec("d"), "o_orderkey", "l_orderkey",
        detailCols = Seq("l_quantity"))), out = "j")
    val roundtripped = SpecJson.fromJson(SpecJson.toJson(spec))
    assert(roundtripped == spec)
    val df = PipelineCompiler.compile(roundtripped, spark)
    val fields = df.schema("details").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(fields == Seq("l_quantity"), s"struct carries $fields")
  }

  test("$VAR config roots resolve; unknown names fail loudly (utils.js:22-28)") {
    assert(Transports.resolveUrl("$api/v1/items", Map("api" -> "http://h:1")) ==
      "http://h:1/v1/items")
    assert(Transports.resolveUrl("http://h:1/x", Map.empty) == "http://h:1/x")
    val e = intercept[IllegalArgumentException](
      Transports.resolveUrl("$nope/x", Map.empty))
    assert(e.getMessage.contains("Unknown URL parameter: nope"))
  }

  test("reqOptions accepts the DSv2-lowercased timeoutms key") {
    assert(ReqOptions.fromOptions(Map("timeoutMs" -> "5000")).timeoutMs == 5000L)
    assert(ReqOptions.fromOptions(Map("timeoutms" -> "7000")).timeoutMs == 7000L)
  }

  test("DSv2 read rejects a divergent user schema loudly") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-http")
        .schema("a STRING, b INT")
        .option("url", "http://localhost:1/x?page={%page%}").option("pages", "1")
        .load().collect()
    }
    assert(e.getMessage.contains("graft-http read always produces"))
  }

  test("mongodb URL splits into db address + collection (utils.js:52-57)") {
    assert(Transports.mongoCollection("mongodb://h:27017/mydb/stuff") ==
      ("mongodb://h:27017/mydb", "stuff"))
    assert(Transports.mongoCollection("mongodb://u:p@h/db2/coll2") ==
      ("mongodb://u:p@h/db2", "coll2"))
    intercept[IllegalArgumentException](Transports.mongoCollection("mongodb://h:27017"))
  }

  test("store sink upserts executor-side batches into the addressed collection") {
    import graft.sinks.Writers
    Writers.InMemoryStore.clear()
    val df = spark.read.parquet(s"$sf/nation.parquet").repartition(3)
    // $VAR root resolves like every URL surface (utils.js:22-28)
    Writers.store(df, "$MONGO/etl/nations", batchSize = 4,
      config = Map("MONGO" -> "mongodb://h:27017"))
    val got = Writers.InMemoryStore.collection("mongodb://h:27017/etl", "nations")
    assert(got.size == 25)
    assert(got.forall(_.contains("n_nationkey")))
    // a second write APPENDS (store semantics are upsert/insert, not truncate)
    Writers.store(df.limit(1), "mongodb://h:27017/etl/nations")
    assert(Writers.InMemoryStore.collection("mongodb://h:27017/etl", "nations").size == 26)
    intercept[IllegalArgumentException](
      Writers.store(df, "mongodb://h:27017")) // no collection path
  }

  test("ReflectiveMongoStore drives the sync-driver surface via reflection (stubbed jar)") {
    // the stand-in driver lives on the TEST classpath only
    // (src/test/scala/com/mongodb/MongoDriverStubs.scala) — same FQCNs and
    // signatures Writers.ReflectiveMongoStore resolves, recording writes
    // into a JVM-global sink; this proves the zero-code production wiring
    // (add the real jar → mongodb: URLs work) without the jar
    import graft.sinks.Writers
    com.mongodb.client.MongoStubSink.clear()
    val df = spark.read.parquet(s"$sf/nation.parquet").repartition(3)
    Writers.store(df, "mongodb://h:27017/etl/nations", batchSize = 4,
      clients = Writers.ReflectiveMongoStore)
    val got = com.mongodb.client.MongoStubSink
      .collection("mongodb://h:27017/etl", "etl", "nations")
    assert(got.size == 25, s"expected 25 inserted docs, got ${got.size}")
    assert(got.forall(_.contains("n_nationkey")))
    // one client per partition, each closed when its partition drained
    assert(com.mongodb.client.MongoStubSink.closed.get() == 3)
    // a database-less URL fails loudly at open() (the ConnectionString path)
    val e = intercept[Exception] {
      Writers.store(df.limit(1), "mongodb://h:27017//nations",
        clients = Writers.ReflectiveMongoStore)
    }
    assert(e.getMessage != null)
  }

  test("runToSinks routes mongodb: URLs through the store sink (utils.js:52-57)") {
    import graft.plans._
    import graft.sinks.Writers
    Writers.InMemoryStore.clear()
    val spec = PipelineSpec(nodes = Seq(
      "li"  -> SourceSpec("parquet", s"$sf/region.parquet"),
      "out" -> MapSpec(RefSpec("li"), Seq("k" -> "r_regionkey"))), out = "out")
    // scheme-sniffed (format left as ndjson) AND {%var%}-templated
    PipelineCompiler.runToSinks(spec, spark,
      sinks = Seq(("out", "ndjson", "mongodb://db-host/app/{%coll%}")),
      params = Map("coll" -> "regions"))
    assert(Writers.InMemoryStore.collection("mongodb://db-host/app", "regions").size == 5)
    // explicit format "store" dispatches too
    PipelineCompiler.runToSinks(spec, spark,
      sinks = Seq(("out", "store", "mongodb://db-host/app/regions2")))
    assert(Writers.InMemoryStore.collection("mongodb://db-host/app", "regions2").size == 5)
  }

  test("urlFetch reads non-http protocol-handler URLs (file: stands in for ftp:)") {
    val f = java.io.File.createTempFile("graft_url", ".txt")
    java.nio.file.Files.writeString(f.toPath, "payload-bytes")
    try assert(Transports.urlFetch(f.toURI.toString) == "payload-bytes")
    finally f.delete()
  }

  test("DSv2 graft-http source fetches pages in executor partitions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val hits = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    withServer("/items" -> { ex =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      hits.add(q)
      val page = q.split("&").find(_.startsWith("page=")).get.stripPrefix("page=").toInt
      val rows = (0 until 3).map(i => s"""{"id":${page * 10 + i}}""").mkString("\n")
      (200, rows)
    }) { base =>
      val df = spark.read.format("graft-http")
        .option("url", s"$base/items?page={%page%}&offset={%offset%}&limit={%limit%}")
        .option("pages", "4").option("limit", "3")
        .load()
      // one partition per page — the parallel-fetch contract
      assert(df.rdd.getNumPartitions == 4)
      val out = df.select(col("page"), get_json_object(col("value"), "$.id").cast("int").as("id"))
        .as[(Int, Int)].collect().toSet
      assert(out == (for (p <- 0 until 4; i <- 0 until 3) yield (p, p * 10 + i)).toSet)
      // offset/limit templating filled from the page index
      assert(hits.contains("page=2&offset=6&limit=3"), s"queries seen: $hits")
    }
    // $name config roots resolve from config.* options
    withServer("/rooted" -> { _ => (200, """{"ok":1}""") }) { base =>
      val n = spark.read.format("graft-http")
        .option("url", "$api/rooted?page={%page%}")
        .option("config.api", base)
        .option("pages", "1")
        .load().count()
      assert(n == 1L)
    }
  }

  test("DSv2 graft-http sink POSTs NDJSON batches from executor partitions") {
    import scala.jdk.CollectionConverters._
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withServer("/ingest" -> { ex =>
      received.add(requestBody(ex)); (200, "ok")
    }) { base =>
      spark.range(10).select(org.apache.spark.sql.functions.col("id"))
        .repartition(2)
        .write.format("graft-http")
        .option("url", s"$base/ingest")
        .option("batchSize", "3")
        .mode("append").save()
      val lines = received.asScala.flatMap(_.split("\n")).toSeq
      assert(lines.size == 10, s"got ${lines.size}: $lines")
      assert(lines.map(l => l.stripPrefix("""{"id":""").stripSuffix("}").toLong)
        .toSet == (0L until 10L).toSet)
      // batchSize=3 over 2 partitions of 5 rows → requests of ≤3 lines
      assert(received.asScala.forall(_.split("\n").length <= 3))
      assert(received.size >= 4)
    }
  }
}

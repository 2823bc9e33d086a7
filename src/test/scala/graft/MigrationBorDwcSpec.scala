package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Joins, TreeOps}
import graft.sources.{PagedSource, Readers, Transports}
import graft.sinks.Writers

/** End-to-end migration replay of the reference's HARDEST production
  * example, `/root/reference/examples/bor-dwc.js` (the "BOR/DWC cultural
  * statistics" flows), against in-process HTTP servers — the gnarly-case
  * proof that a reference user can port the whole file onto this engine:
  *
  *  - `_sources` (bor-dwc.js:21-85): authenticated ReaderPaged (rootNode
  *    `data.*`) → Mapper `a.general` → Joiner whose vocab maps `kopuk` →
  *    DWC mapping entries → Thru SYNTHETIC PARENT INJECTION (a root node
  *    plus one generated node per category, data rewired under them;
  *    bor-dwc.js:45-63) → WriterJSONTree.
  *  - `_BORFacts` mapper (bor-dwc.js:353-404 / :461-498): the PER-RECORD
  *    MEASURE UNPIVOT of the `management-report` object (dynamic
  *    `mng_NNN` keys; scalar vs `{plan, fact}` values; `otr-indexes`
  *    array) into `y_YYYY__t_T__...` measures, joined against a vocab
  *    built by a SUB-PIPELINE (Reader → ParserJSONTree → Mapper,
  *    bor-dwc.js:101-128).
  *  - `_reduceFacts` reducer (bor-dwc.js:622-631): LAST-WRITE-WINS field
  *    merge keyed by `date.substr(0,7) + '-' + subordinate` across a
  *    folder of fact files.
  *  - `readEIPSKevents` detail reader (bor-dwc.js:693-703): CUSTOM
  *    PAGINATION STATE — a per-master paged fetch (`organizations` filled
  *    from the master, `state.rows == 0` termination) feeding JoinDetail →
  *    Thru quarter bucketing → Reducer counts.
  */
class MigrationBorDwcSpec extends SparkSpec {
  import spark.implicits._

  private val M = new ObjectMapper()

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

  private def query(ex: HttpExchange, key: String): Int =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
      .collectFirst { case kv if kv.startsWith(s"$key=") => kv.drop(key.length + 1).toInt }
      .getOrElse(0)

  private def queryStr(ex: HttpExchange, key: String): String =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
      .collectFirst { case kv if kv.startsWith(s"$key=") => kv.drop(key.length + 1) }
      .getOrElse("")

  private def dataPage(records: Seq[String], offset: Int, limit: Int): String =
    s"""{"meta":{},"data":[${records.slice(offset, offset + limit).mkString(",")}]}"""

  /** Paged `data.*` read shared by the ports (ReaderPaged + ParserJSON). */
  private def readPaged(base: String, path: String,
                        opts: Transports.ReqOptions = Transports.ReqOptions()) =
    PagedSource.read(spark,
      fetch = Transports.httpPagedFetch(s"$base$path?offset={%offset%}&limit={%limit%}", opts),
      parse = (sp, payloads) => {
        import sp.implicits._
        sp.read.json(sp.createDataset(payloads))
          .select(explode(col("data")).as("rec")).select("rec.general.*")
      },
      limit = 2,
      pageRows = p => M.readTree(p).path("data").size().toLong)

  // --- 1. _sources -----------------------------------------------------------

  private val subordinates = Seq(
    """{"general":{"inn":"111","kopuk":"K1","category_institutions":"Museums","name":"M1"}}""",
    """{"general":{"inn":"222","kopuk":"K9","category_institutions":"Museums","name":"M2"}}""",
    """{"general":{"inn":"333","kopuk":"K2","category_institutions":"Theatres","name":"T1"}}""",
    """{"general":{"inn":"444","category_institutions":"Theatres","name":"T2"}}""")

  test("_sources ports: authed paged read -> mapping join -> synthetic parents -> tree") {
    val expectAuth = "Basic " + java.util.Base64.getEncoder.encodeToString(
      "reporter:fixturepw".getBytes(StandardCharsets.UTF_8))
    withServer("/subs" -> { ex =>
      // the reference sends reqOptions basic auth (bor-dwc.js:26); reject
      // its absence so the port provably carries it
      if (ex.getRequestHeaders.getFirst("Authorization") != expectAuth) (401, "")
      else (200, dataPage(subordinates, query(ex, "offset"), query(ex, "limit")))
    }) { base =>
      val dir = java.nio.file.Files.createTempDirectory("bor_sources").toString
      // vocab: ReaderJSON over $LOCALFS/DWC/sources.json (bor-dwc.js:23)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/sources.json"),
        """{"data":[{"aname":"K1","vernum":101,"adesc":"Desc One"},
                    {"aname":"K2","vernum":102},
                    {"aname":"KX","vernum":999,"adesc":"X"}]}""")
      val vocab = Readers.json(spark, s"$dir/sources.json", rootNode = "data")

      val subs = readPaged(base, "/subs",
        Transports.ReqOptions(auth = Some(Transports.Auth("reporter", "fixturepw"))))

      // Joiner (bor-dwc.js:31-44): kopuk -> vocab row; push a DWC mapping
      // entry when matched; `a.mapping = a.mapping || []` runs only for
      // truthy kopuk, so null-kopuk rows carry NO mapping field at all
      val mapT = "array<struct<src:string,id:bigint,text:string>>"
      val joined = subs.join(Joins.maybeBroadcast(vocab), subs("kopuk") === vocab("aname"), "left")
        .select(col("inn").as("id"), col("name"), col("category_institutions"),
          when(col("kopuk").isNull, lit(null).cast(mapT))
            .when(col("vernum").isNotNull,
              array(struct(lit("DWC").as("src"), col("vernum").as("id"),
                coalesce(col("adesc"), col("aname")).as("text"))).cast(mapT))
            .otherwise(array().cast(mapT)).as("mapping"))

      // Thru synthetic parent injection (bor-dwc.js:45-63): one root, one
      // generated node per distinct category, data rewired underneath.
      // The reference numbers categories in arrival order (sequential
      // stream state); the distributed port numbers them by sorted name —
      // same tree, deterministic ids. The dimension is bounded, so the
      // single-partition window is fine at any corpus scale.
      val cats = joined.select(col("category_institutions").as("ciName")).distinct()
        .withColumn("ci", concat(lit("ci"),
          (row_number().over(Window.orderBy("ciName")) - 1).cast("string")))
      val root = Seq(("0", "", 0, """{"id":"0","name":"Subordinate institutions"}"""))
        .toDF("id", "parent", "level", "payload")
      val catRows = cats.select(col("ci").as("id"), lit("0").as("parent"), lit(1).as("level"),
        to_json(struct(col("ci").as("id"), col("ciName").as("name"),
          lit("0").as("parent"))).as("payload"))
      val dataRows = joined.join(cats, joined("category_institutions") === cats("ciName"))
        .select(col("id"), col("ci").as("parent"), lit(2).as("level"),
          to_json(struct(col("id"), col("name"), col("ci").as("parent"),
            col("ciName"), col("ci").as("category_institutions"),
            col("mapping"))).as("payload"))

      // WriterJSONTree (bor-dwc.js:66)
      val roots = TreeOps.rebuildJson(root.unionByName(catRows).unionByName(dataRows))
        .collect()
      assert(roots.map(_.getString(0)).toSeq == Seq("0"))
      val tree = M.readTree(roots.head.getString(1))
      val kids = tree.path("children")
      assert(kids.size == 2)
      assert((0 until kids.size).map(kids.get(_).path("name").asText).sorted
        == Seq("Museums", "Theatres"))
      val byId = {
        val all = scala.collection.mutable.Map.empty[String, com.fasterxml.jackson.databind.JsonNode]
        def walk(n: com.fasterxml.jackson.databind.JsonNode): Unit = {
          if (n.has("id")) all(n.path("id").asText) = n
          val c = n.path("children")
          (0 until c.size).foreach(i => walk(c.get(i)))
        }
        walk(tree); all
      }
      // matched kopuk: mapping entry with vernum id + adesc-or-aname text
      assert(byId("111").path("mapping").get(0).path("id").asLong == 101L)
      assert(byId("111").path("mapping").get(0).path("text").asText == "Desc One")
      assert(byId("333").path("mapping").get(0).path("text").asText == "K2") // no adesc
      // unmatched kopuk: mapping exists but is empty; null kopuk: absent
      assert(byId("222").path("mapping").size == 0 && byId("222").has("mapping"))
      assert(!byId("444").has("mapping"))
      assert(byId("444").path("parent").asText == byId("333").path("parent").asText)
    }
  }

  // --- 2. _BORFacts ----------------------------------------------------------

  private val borRecords = Seq(
    """{"general":{"inn":"111","bor-statistic":{"management-report":{
         "type":"2","mng_511":5.5,"mng_512":{"plan":10.0,"fact":8.0},
         "otr-indexes":[{"id":7,"value":3.25},{"id":9,"plan":1.0,"fact":2.0},
                        {"id":8,"value":0.0,"plan":4.0,"fact":5.0}],
         "note_x":"zz"}}}}""".replaceAll("\n\\s*", ""),
    """{"general":{"inn":"999"}}""",
    """{"general":{"inn":"222","bor-statistic":{"management-report":{
         "type":"1","mng_600":7.0}}}}""".replaceAll("\n\\s*", ""))

  private val dimTree =
    """{"id":"0","name":"root","children":[
         {"id":"ci0","name":"Museums","children":[
           {"id":"111","inn":"111","ciName":"Museums"},
           {"id":"222","inn":"222","ciName":"Museums"}]},
         {"id":"ci1","name":"Theatres","children":[
           {"id":"333","inn":"333","ciName":"Theatres"}]}]}"""

  test("_BORFacts ports: dynamic measure unpivot + vocab-from-sub-pipeline join") {
    withServer("/bor" -> { ex =>
      (200, dataPage(borRecords, query(ex, "offset"), query(ex, "limit")))
    }) { base =>
      val out = java.nio.file.Files.createTempDirectory("bor_facts").toString + "/facts"
      // vocab sub-pipeline (bor-dwc.js:101-128 / :188-192): Reader ->
      // ParserJSONTree -> Mapper {inn, ci}
      val vocab = TreeOps.flattenJson(spark, dimTree).filter(col("level") === 2)
        .select(get_json_object(col("payload"), "$.inn").as("v_inn"),
                get_json_object(col("payload"), "$.ciName").as("ci"))

      val parsed = readPaged(base, "/bor")
      // the Bor-data mapper (bor-dwc.js:353-404): the management-report is
      // an object with DYNAMIC keys — re-read it as map<string,string>
      // (to_json drops null fields, so each record carries only ITS keys)
      // and unpivot: `a_b`-shaped keys only; scalar values become one
      // measure, {plan, fact} objects two; non-numeric values vanish
      val year = "2016"
      val mngMap = parsed.select(col("inn").as("subordinate"),
          from_json(to_json(col("`bor-statistic`.`management-report`")),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.StringType)).as("mng"),
          col("`bor-statistic`.`management-report`.`otr-indexes`").as("otr"))
        .filter(col("mng").isNotNull) // Filter «has type» (bor-dwc.js:405)
        .withColumn("rtype", coalesce(col("mng")("type"), lit("0")))
      // the `t_<type>__` segment is inserted ONLY for `mng` codes strictly
      // between 510 and 520 (bor-dwc.js:372); every other `a_b` key gets the
      // plain `y_YYYY__` prefix (:377-382). otr-indexes keys always carry it
      // (:391).
      def typedPrefix = concat(lit(s"y_${year}__t_"), col("rtype"), lit("__"))
      def mngPrefix = {
        val code = expr("try_cast(element_at(split(k, '_'), 2) AS double)")
        when(element_at(split(col("k"), "_"), 1) === "mng"
            && code > 510 && code < 520, typedPrefix)
          .otherwise(lit(s"y_${year}__"))
      }
      val mngRows = mngMap
        .select(col("subordinate"), col("rtype"), explode(col("mng")).as(Seq("k", "v")))
        .filter(size(split(col("k"), "_")) === 2) // parts.length == 2 (:369)
        .select(col("subordinate"), col("rtype"), explode(
          when(col("v").startsWith("{"), array(
            struct(concat(mngPrefix, col("k"), lit("__plan")).as("measure"),
                   get_json_object(col("v"), "$.plan").cast("double").as("value")),
            struct(concat(mngPrefix, col("k"), lit("__fact")).as("measure"),
                   get_json_object(col("v"), "$.fact").cast("double").as("value"))))
          .otherwise(array(
            struct(concat(mngPrefix, col("k")).as("measure"),
                   // non-numeric scalars (the reference's typeof-number
                   // check) become null and are filtered — try_cast, since
                   // ANSI mode makes a plain cast throw on them
                   expr("try_cast(v AS double)").as("value"))))).as("m"))
        .select(col("subordinate"), col("m.measure"), col("m.value"))
      // `if (otr[i].value)` is a TRUTHINESS test (bor-dwc.js:393): a zero
      // value falls through to the plan/fact branch, exactly like a missing
      // one — isNotNull alone would diverge on value=0
      val otrRows = mngMap.filter(col("otr").isNotNull)
        .select(col("subordinate"), col("rtype"), explode(col("otr")).as("o"))
        .select(col("subordinate"), explode(
          when(col("o.value").isNotNull && col("o.value") =!= 0, array(
            struct(concat(typedPrefix, lit("otr_"), col("o.id")).as("measure"),
                   col("o.value").as("value"))))
          .otherwise(array(
            struct(concat(typedPrefix, lit("otr_"), col("o.id"), lit("__plan")).as("measure"),
                   col("o.plan").as("value")),
            struct(concat(typedPrefix, lit("otr_"), col("o.id"), lit("__fact")).as("measure"),
                   col("o.fact").as("value"))))).as("m"))
        .select(col("subordinate"), col("m.measure"), col("m.value"))

      val facts = mngRows.unionByName(otrRows).filter(col("value").isNotNull)
        .join(Joins.maybeBroadcast(vocab), col("subordinate") === col("v_inn"), "left")
        .select(col("subordinate"), col("measure"), col("value"), col("ci"))
      Writers.ndjson(facts, out) // WriterJSONS (bor-dwc.js:406)

      val back = Readers.jsons(spark, out)
        .select("subordinate", "measure", "value", "ci")
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getString(3)))
        .toSet
      assert(back == Set(
        ("111", "y_2016__t_2__mng_511", 5.5, "Museums"),
        ("111", "y_2016__t_2__mng_512__plan", 10.0, "Museums"),
        ("111", "y_2016__t_2__mng_512__fact", 8.0, "Museums"),
        ("111", "y_2016__t_2__otr_7", 3.25, "Museums"),
        ("111", "y_2016__t_2__otr_9__plan", 1.0, "Museums"),
        ("111", "y_2016__t_2__otr_9__fact", 2.0, "Museums"),
        ("111", "y_2016__t_2__otr_8__plan", 4.0, "Museums"), // value=0 is FALSY
        ("111", "y_2016__t_2__otr_8__fact", 5.0, "Museums"), // -> plan/fact branch
        ("222", "y_2016__mng_600", 7.0, "Museums"))) // mng code ∉ (510,520): no t_ segment
      // inn 999 (no management-report) filtered; note_x (string value) vanished
    }
  }

  // --- 3. _reduceFacts -------------------------------------------------------

  test("_reduceFacts ports: last-write-wins field merge keyed by month+subordinate") {
    val dir = java.nio.file.Files.createTempDirectory("bor_reduce").toString
    // folder read order is file-name order (ReaderFolder); the reducer's
    // `map[key][f] = a[f]` (bor-dwc.js:622-631) means the LAST occurrence
    // of a field wins within each month+subordinate key
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a-stat.jsons"),
      """{"date":"2016-03-30T20:59:00Z","subordinate":"111","m1":1.0,"m2":2.0}
        |{"date":"2016-03-30T20:59:00Z","subordinate":"222","m1":5.0}
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b-bor.jsons"),
      """{"date":"2016-03-15T00:00:00Z","subordinate":"111","m2":20.0,"m3":30.0}
        |""".stripMargin)

    val wide = Readers.folder(spark, dir, "*.jsons", "json")
      .withColumn("__file", input_file_name())
    // long-form the wide records (column set is dynamic across files), then
    // keep-LAST per (key, field) ordered by file (`max_by` — one hash agg,
    // map-side combinable) — the distributed last-write-wins. In-file
    // collisions would additionally need a row sequence column; the
    // reference's folder flow only collides across files (one record per
    // key per file), which file order resolves.
    val long = wide.select(col("__file"),
        concat(substring(col("date"), 1, 7), lit("-"), col("subordinate")).as("key"),
        explode(from_json(to_json(struct(wide.columns.filterNot(_ == "__file")
          .map(col): _*)), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType))).as(Seq("f", "v")))
    val merged = long.groupBy("key", "f").agg(max_by(col("v"), col("__file")).as("v"))

    // Mapper `a.value.key = a.id` (bor-dwc.js:633) + Joiner to the sources
    // tree by id (:640-652) -> the reassembled fact document
    val vocab = TreeOps.flattenJson(spark, dimTree).filter(col("level") === 2)
      .select(get_json_object(col("payload"), "$.inn").as("v_inn"),
              get_json_object(col("payload"), "$.ciName").as("ci"))
    val docs = merged.groupBy("key")
      .agg(map_from_entries(sort_array(collect_list(struct(col("f"), col("v"))))).as("doc"))
      .withColumn("subordinate", col("doc")("subordinate"))
      .join(Joins.maybeBroadcast(vocab), col("subordinate") === col("v_inn"), "left")

    val by: Map[String, (Map[String, String], String)] =
      docs.collect().map(r => r.getAs[String]("key") ->
        ((r.getAs[Map[String, String]]("doc"), r.getAs[String]("ci")))).toMap
    val (d111, ci111) = by("2016-03-111")
    assert(d111("m1") == "1.0")            // only file a carries m1
    assert(d111("m2") == "20.0")           // file b read later -> wins
    assert(d111("m3") == "30.0")
    assert(d111("date") == "2016-03-15T00:00:00Z") // date field merges too
    assert(ci111 == "Museums")
    val (d222, _) = by("2016-03-222")
    assert(d222("m1") == "5.0" && !d222.contains("m2"))
  }

  // --- 4. readEIPSKevents ----------------------------------------------------

  private val eipskSubs = Seq(
    """{"general":{"inn":"111","extension":{"externalIds":{"eipskId":"E1"}}}}""",
    """{"general":{"inn":"222"}}""",
    """{"general":{"inn":"333","extension":{"externalIds":{"eipskId":"E3"}}}}""")

  private val eipskEvents = Map(
    "E1" -> Seq("2016-05-01T10:00:00Z", "2016-07-02T10:00:00Z", "2016-07-20T10:00:00Z"),
    "E3" -> Seq("2017-01-05T10:00:00Z"))

  test("readEIPSKevents ports: per-master paged detail fetch -> quarter counts") {
    withServer(
      "/subs" -> { ex => (200, dataPage(eipskSubs, query(ex, "offset"), query(ex, "limit"))) },
      "/events" -> { ex =>
        val org = queryStr(ex, "organizations")
        val offset = query(ex, "offset")
        val evts = eipskEvents.getOrElse(org, Seq.empty).slice(offset, offset + 2)
          .map(s => s"""{"start":"$s"}""")
        (200, s"""{"events":[${evts.mkString(",")}]}""")
      }) { base =>
      import MigrationBorDwcSpec.Sub
      val masters = readPaged(base, "/subs")
        .select(col("inn"), col("extension.externalIds.eipskId").as("eipskId"))
        .as[Sub]
      // the custom pagination processor (bor-dwc.js:693-703): no eipskId on
      // the master -> no fetch at all; otherwise page until a page returns
      // zero rows (`if (state.rows==0) return null`)
      val joined = Joins.joinDetailExternal[String, Sub, String](
        masters, m => m.eipskId.getOrElse(""),
        eid =>
          if (eid.isEmpty) Seq.empty
          else {
            val out = scala.collection.mutable.Buffer.empty[String]
            var page = 0
            var rows = -1
            while (rows != 0) {
              val doc = new ObjectMapper().readTree(Transports.httpFetch(
                s"$base/events?organizations=$eid&offset=${page * 2}&limit=2"))
              val evts = doc.path("events")
              rows = evts.size
              (0 until rows).foreach(i => out += evts.get(i).path("start").asText)
              page += 1
            }
            out.toSeq
          })
      // Thru quarter bucketing (bor-dwc.js:712-727): YQ = year + '-' +
      // quarter-end month (trunc(month0/3 + 1) * 3 == quarter * 3), then
      // Reducer counts per key and the Mapper re-suffixes the date
      val events = joined.flatMap { case (m, starts) => starts.map((m.inn, _)) }
        .toDF("inn", "start")
      val counts = events
        .select(col("inn"), to_timestamp(col("start")).as("ts"))
        .select(col("inn"), concat(year(col("ts")), lit("-"), quarter(col("ts")) * 3).as("yq"))
        .groupBy("inn", "yq").agg(count(lit(1)).as("events"))
        .withColumn("date", concat(col("yq"), lit("-30T20:59:00Z")))
      val got = counts.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
      assert(got == Set(
        ("111", "2016-6", 1L, "2016-6-30T20:59:00Z"),
        ("111", "2016-9", 2L, "2016-9-30T20:59:00Z"),
        ("333", "2017-3", 1L, "2017-3-30T20:59:00Z")))
    }
  }
}

object MigrationBorDwcSpec {
  /** EIPSK master record (top-level definition for its Encoder). */
  case class Sub(inn: String, eipskId: Option[String])
}

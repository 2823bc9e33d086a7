package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._

import graft.operators.Joins
import graft.sources.{PagedSource, Readers, Transports}
import graft.sinks.Writers

/** End-to-end migration replay of the reference's production example
  * `/root/reference/examples/trud.js` (the "RosTrud vacancies" flow) against
  * an in-process HTTP server — the proof that a reference user can port a
  * whole example 1:1 onto this engine:
  *
  * Phase 1 (`readEIPSKinn`, trud.js:18-48): ReaderPaged over
  * `...organizations?offset={%offset%}&limit={%limit%}` + ParserJSON
  * rootNode `organizations.*` → Mapper `{name, inn}` → Filter `!!a.inn`
  * → WriterJSONS to a staging NDJSON file.
  *
  * Phase 2 (`readRosTrud`, trud.js:52-77): ReaderJSONS of the stage →
  * JoinDetail whose detail source is a PER-MASTER HTTP fetch of
  * `.../vacancies/company/inn/<inn>` parsed at rootNode
  * `results.vacancies.*` → Filter `vacancies.length > 0` → WriterJSONS.
  */
class MigrationTrudSpec extends SparkSpec {

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

  // the paged orgs endpoint: 3 organizations over limit-2 pages, one org
  // with a null inn and one with an empty inn (the reference's `!!a.inn`
  // falsy cases), then empty pages (the ×2 termination rule)
  private val orgs = Seq(
    """{"name":"Org A","inn":"111","region":"x"}""",
    """{"name":"Org B","inn":null,"region":"y"}""",
    """{"name":"Org C","inn":"222","region":"z"}""",
    """{"name":"Org D","inn":"","region":"w"}""",
    """{"name":"Org E","inn":"333","region":"v"}""")

  private def orgsPage(offset: Int, limit: Int): String =
    s"""{"meta":{"total":${orgs.size}},"organizations":[${
      orgs.slice(offset, offset + limit).mkString(",")}]}"""

  private val vacancies = Map(
    "111" -> Seq("""{"vac_id":"v1","title":"Welder"}""",
                 """{"vac_id":"v2","title":"Fitter"}"""),
    "222" -> Seq.empty[String], // JoinDetail masters with no details are filtered
    "333" -> Seq("""{"vac_id":"v3","title":"Clerk"}"""))

  private def vacanciesDoc(inn: String): String =
    s"""{"status":"200","results":{"vacancies":[${
      vacancies.getOrElse(inn, Seq.empty).mkString(",")}]}}"""

  test("trud.js ports 1:1: paged read -> map/filter -> stage; stage -> per-master detail fetch -> filter -> sink") {
    withServer(
      "/orgs" -> { ex => (200, orgsPage(query(ex, "offset"), query(ex, "limit"))) },
      "/vacancies/company/inn" -> { ex =>
        val inn = ex.getRequestURI.getPath.split("/").last
        (200, vacanciesDoc(inn))
      }) { base =>
      val stage = java.nio.file.Files.createTempDirectory("trud_stage").toString + "/eipsk-inn"
      val out = java.nio.file.Files.createTempDirectory("trud_out").toString + "/eipsk-rt"

      // --- Phase 1: ReaderPaged(+ParserJSON rootNode) -> Mapper -> Filter -> WriterJSONS
      val mapper = new ObjectMapper() // page emptiness = organizations array size
      val paged = PagedSource.read(spark,
        fetch = Transports.httpPagedFetch(s"$base/orgs?offset={%offset%}&limit={%limit%}"),
        parse = (sp, payloads) => {
          import sp.implicits._
          // ParserJSON rootNode "organizations.*" (trud.js:18): one read over
          // all fetched pages, then explode the record array
          sp.read.json(sp.createDataset(payloads))
            .select(explode(col("organizations")).as("rec")).select("rec.*")
        },
        limit = 2,
        pageRows = p => mapper.readTree(p).path("organizations").size().toLong)
      val staged = paged
        .select(col("name"), col("inn"))                        // Mapper {name, inn}
        .filter(col("inn").isNotNull && col("inn") =!= "")      // Filter !!a.inn
      Writers.ndjson(staged, stage)                             // WriterJSONS

      // --- Phase 2: ReaderJSONS -> JoinDetail(external detail reader) -> Filter -> WriterJSONS
      import MigrationTrudSpec.Org
      import spark.implicits._
      val masters = Readers.jsons(spark, stage).as[Org]
      // detail ReaderJSON at rootNode "results.vacancies.*" with the
      // master-keyed source URL (trud.js:55-57): fetch runs inside
      // partitions; Jackson parses the wrapped document to detail records
      val joined = Joins.joinDetailExternal[String, Org, (String, String)](
        masters, _.inn,
        inn => {
          val doc = new ObjectMapper()
            .readTree(Transports.httpFetch(s"$base/vacancies/company/inn/$inn"))
          val vs = doc.path("results").path("vacancies")
          (0 until vs.size).map(i =>
            (vs.get(i).path("vac_id").asText, vs.get(i).path("title").asText))
        })
      val result = joined
        .map { case (m, ds) => (m.name, m.inn, ds.map(_._1).toArray, ds.size) }
        .toDF("name", "inn", "vac_ids", "n_vacancies")
        .filter(col("n_vacancies") > 0)                         // Filter vacancies.length
      Writers.ndjson(result, out)

      // the reference run would stage A,C,E (B/D fail !!inn) and keep A,E
      // (C's company has no vacancies)
      val stagedBack = Readers.jsons(spark, stage)
      assert(stagedBack.count() == 3)
      assert(stagedBack.columns.sorted.toSeq == Seq("inn", "name"))
      val back = Readers.jsons(spark, out)
        .select("name", "inn", "vac_ids", "n_vacancies")
        .orderBy("inn").collect()
      assert(back.map(_.getString(0)).toSeq == Seq("Org A", "Org E"))
      assert(back.map(_.getSeq[String](2)).toSeq == Seq(Seq("v1", "v2"), Seq("v3")))
    }
  }
}

object MigrationTrudSpec {
  /** Phase-2 master record (needs a top-level definition for its Encoder). */
  case class Org(inn: String, name: String)
}

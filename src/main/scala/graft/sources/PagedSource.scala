package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** R4 `ReaderPaged` (`/root/reference/jobs/readers/job-reader-paged.js:80-217`):
  * a paginated source with mutable pagination state and engine-level
  * termination rules:
  *   - the URL/processor may end pagination by returning None (`:128-134`);
  *   - a page yielding 0 rows twice in a row ends pagination (`:156-170`);
  *   - state tracks page/offset/rows/totalRowsProcessed (`:92`).
  *
  * Spark shape: pagination is inherently sequential *control flow* but the
  * *data* need not be — each fetched page parses into a DataFrame partition
  * and pages union together, so downstream processing is fully distributed.
  * For transports that support it (`fetchBatch`), N pages are pulled
  * concurrently via a parallelized page index, which is the 1000-executor
  * shape: the driver only issues page *numbers*, executors fetch bytes.
  *
  * The transport is injected (`fetch: PageState => Option[String]`), so unit
  * tests and offline runs use local functions; an HTTP transport plugs in
  * without touching the pagination semantics.
  */
object PagedSource {

  /** Mutable pagination state, mirroring `job-reader-paged.js:92`. */
  case class PageState(page: Int, offset: Long, limit: Int,
                       lastPageRows: Long, totalRowsProcessed: Long)

  /** Sequential paged read (faithful semantics).
    *
    * Pagination control flow stays on the driver (it is inherently
    * sequential), but the driver only ACCUMULATES raw payloads — record
    * counting per page is a driver-local `pageRows` function on the payload
    * string, and parsing happens ONCE over all pages at the end. The round-1
    * formulation ran one Spark action (`count`) per page and chained
    * `unionByName` per page: O(pages) driver round trips and a plan whose
    * depth grew with page count — fine at 7 pages, pathological at 10k.
    *
    * @param fetch    returns the raw payload for the state's page, or None to
    *                 terminate (the "processor returned falsy URL" rule)
    * @param parse    all page payloads → one DataFrame (the attached parser
    *                 sub-job); constant plan depth regardless of page count
    * @param maxPages hard safety bound
    * @param pageRows driver-local record count of one payload (drives the
    *                 empty-page×2 rule and the offset state); default counts
    *                 non-blank NDJSON lines — inject the matching counter for
    *                 other payload shapes (e.g. JSON-array length). NOTE:
    *                 offset reflects FETCHED records, not parsed ones — the
    *                 default `parse` drops malformed lines (DROPMALFORMED),
    *                 so a page of malformed rows still advances `{%offset%}`
    *                 past them (matching how a server-side cursor moves);
    *                 inject a stricter counter if offset must track parsed
    *                 rows exactly
    */
  def read(spark: SparkSession,
           fetch: PageState => Option[String],
           parse: (SparkSession, Seq[String]) => DataFrame = parseNdjson,
           limit: Int = 1000, maxPages: Int = 10000,
           maxRetries: Int = 2, settleMs: Long = 0L,
           pageRows: String => Long = ndjsonRows): DataFrame = {
    var state = PageState(0, 0L, limit, -1L, 0L)
    var emptyStreak = 0
    val payloads = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = false
    // transient-failure retry with settle delay — the reference settles 1 s
    // and retries before trusting an empty page (job-reader-paged.js:156-170)
    def fetchWithRetry(st: PageState): Option[String] = {
      var attempt = 0
      while (true) {
        try return fetch(st)
        catch {
          case e: Exception if attempt < maxRetries =>
            attempt += 1
            if (settleMs > 0) Thread.sleep(settleMs)
          case e: Exception => throw e
        }
      }
      None // unreachable
    }
    while (!done && state.page < maxPages) {
      fetchWithRetry(state) match {
        case None => done = true
        case Some(payload) =>
          val rows = pageRows(payload)
          if (rows == 0) {
            emptyStreak += 1
            if (emptyStreak >= 2) done = true // empty-page ×2 rule
          } else {
            emptyStreak = 0
            payloads += payload
          }
          state = state.copy(page = state.page + 1, offset = state.offset + rows,
                             lastPageRows = rows, totalRowsProcessed = state.totalRowsProcessed + rows)
      }
    }
    if (payloads.isEmpty) spark.emptyDataFrame else parse(spark, payloads.toSeq)
  }

  /** Non-blank line count — the NDJSON page record counter. */
  def ndjsonRows(payload: String): Long =
    payload.split("\n").count(_.trim.nonEmpty).toLong

  /** Distributed paged read for random-access transports (page number →
    * payload, total page count known or over-estimated): executors fetch
    * pages in parallel with `spark.range`, empty/missing pages drop out.
    * This is the scale path — the driver never touches payload bytes.
    */
  def readParallel(spark: SparkSession, numPages: Int,
                   fetchPage: Int => Seq[String]): DataFrame = {
    import spark.implicits._
    val lines = spark.range(numPages.toLong)
      .repartition(math.min(numPages, spark.sparkContext.defaultParallelism))
      .as[Long]
      .flatMap(p => fetchPage(p.toInt))
    spark.read.option("mode", "DROPMALFORMED").json(lines)
  }

  /** NDJSON page parser: all page payloads → one json read (one plan node,
    * however many pages were fetched).
    */
  def parseNdjson(spark: SparkSession, payloads: Seq[String]): DataFrame = {
    import spark.implicits._
    val ds = spark.createDataset(
      payloads.flatMap(_.split("\n").toIndexedSeq.filter(_.nonEmpty)))
    spark.read.option("mode", "DROPMALFORMED").json(ds)
  }
}

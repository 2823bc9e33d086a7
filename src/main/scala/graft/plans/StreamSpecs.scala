package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Persisted STREAMING-ingest specs — the streaming half of the
  * reference's persisted-job model (`/root/reference/jobs/job.js:21-39`:
  * a Job document is operator config saved once and instantiated later;
  * `jobs/hi-order/job-pipeline.js:86-106` is the run-it-later UX). The
  * batch half is [[PipelineSpec]]; these nodes describe the engine's
  * stateful `foreachBatch` ingests ([[graft.streaming.Streams]]) so a
  * long-running ingest is a JSON artifact too: source + pinned models +
  * store locations, no Scala required.
  *
  * Each spec mirrors one `Streams.ingest*` entry point parameter for
  * parameter; pinned model assets (quality weights, semantic centroids)
  * are INLINE — the spec file carries the model exactly as the reference
  * persisted `processor` config inside the job document — while large
  * trained models (the DSIR gram table) stay parquet paths.
  *
  * Execution model ([[IngestCompiler]]): the source is a file-drop
  * directory read with `readStream` (schema inferred from a static read
  * of the same path), the query runs with `Trigger.AvailableNow` and
  * terminates when the directory is drained. Re-running the same spec
  * later resumes from its checkpoint and processes only newly-arrived
  * files — each CLI invocation is one incremental ingest round, and a
  * crash mid-round heals exactly like any other restart of the
  * underlying ingest (the per-tier crash-window contracts in
  * [[graft.streaming.Streams]] scaladoc).
  */
case class StreamSourceSpec(format: String, path: String,
                            options: Map[String, String] = Map.empty)

sealed trait IngestSpec {
  def source: StreamSourceSpec
  def checkpointDir: String
}

/** [[graft.streaming.Streams.ingestQualityFiltered]] as a spec. */
case class QualityIngestSpec(source: StreamSourceSpec, textCol: String,
                             weights: Seq[Double], corpusDir: String,
                             checkpointDir: String) extends IngestSpec

/** [[graft.streaming.Streams.ingestImportanceFiltered]] as a spec. */
case class ImportanceIngestSpec(source: StreamSourceSpec, idCol: String,
                                textCol: String, weightsDir: String,
                                minLogw: Double, corpusDir: String,
                                checkpointDir: String,
                                hexLen: Int = 4) extends IngestSpec

/** [[graft.streaming.Streams.ingestDedup]] (cross-batch MinHash/LSH) as a spec. */
case class MinhashIngestSpec(source: StreamSourceSpec, idCol: String,
                             textCol: String, threshold: Double,
                             corpusDir: String, storeDir: String,
                             checkpointDir: String,
                             compactEvery: Int = 0) extends IngestSpec

/** [[graft.streaming.Streams.ingestSpanDedup]] as a spec. */
case class SpanIngestSpec(source: StreamSourceSpec, idCol: String,
                          textCol: String, k: Int,
                          corpusDir: String, storeDir: String,
                          checkpointDir: String,
                          compactEvery: Int = 0) extends IngestSpec

/** [[graft.streaming.Streams.ingestSemanticDedup]] as a spec; `centroids`
  * is the pinned model, inline.
  */
case class SemanticIngestSpec(source: StreamSourceSpec, idCol: String,
                              vecCol: String,
                              centroids: Seq[(Int, Seq[Float])],
                              threshold: Double,
                              corpusDir: String, storeDir: String,
                              checkpointDir: String,
                              compactEvery: Int = 0) extends IngestSpec

/** [[graft.streaming.Streams.ingestVectorIndex]] as a spec (the index's
  * own centroids are already persisted inside `indexDir`).
  */
case class VectorIndexIngestSpec(source: StreamSourceSpec, idCol: String,
                                 vecCol: String, indexDir: String,
                                 checkpointDir: String,
                                 compactEvery: Int = 0) extends IngestSpec

/** [[graft.streaming.Streams.ingestPretrainCorpus]] — the composed
  * flagship ingest — as a spec. `minLogw = -Infinity` (the no-DSIR-gate
  * default) is encoded by OMITTING the field in JSON.
  */
case class PretrainIngestSpec(source: StreamSourceSpec, idCol: String,
                              textCol: String, vecCol: String,
                              qualityWeights: Seq[Double],
                              centroids: Seq[(Int, Seq[Float])],
                              semThreshold: Double, spanK: Int,
                              corpusDir: String, semStoreDir: String,
                              spanStoreDir: String, checkpointDir: String,
                              dsirWeightsDir: Option[String] = None,
                              minLogw: Double = Double.NegativeInfinity,
                              compactEvery: Int = 0,
                              maxDocChars: Int = 0) extends IngestSpec

/** Compiles an [[IngestSpec]] to a running [[StreamingQuery]] over the
  * matching [[graft.streaming.Streams]] entry point, and runs the
  * drain-and-exit form the CLI uses. `{%var%}` placeholders resolve with
  * the SAME substitution as the batch compiler
  * ([[PipelineCompiler.substitute]]), so one parameterized spec serves
  * every environment.
  */
object IngestCompiler {

  private def sub(s: String, params: Map[String, String]): String =
    PipelineCompiler.substitute(s, params)

  /** The spec with `{%var%}`/`$VAR` placeholders resolved in every string
    * field (paths, column names, source options).
    */
  def substituted(spec: IngestSpec, params: Map[String, String]): IngestSpec = {
    def src(s: StreamSourceSpec) = StreamSourceSpec(sub(s.format, params),
      sub(s.path, params), s.options.map { case (k, v) => k -> sub(v, params) })
    spec match {
      case s: QualityIngestSpec => s.copy(source = src(s.source),
        textCol = sub(s.textCol, params), corpusDir = sub(s.corpusDir, params),
        checkpointDir = sub(s.checkpointDir, params))
      case s: ImportanceIngestSpec => s.copy(source = src(s.source),
        idCol = sub(s.idCol, params), textCol = sub(s.textCol, params),
        weightsDir = sub(s.weightsDir, params), corpusDir = sub(s.corpusDir, params),
        checkpointDir = sub(s.checkpointDir, params))
      case s: MinhashIngestSpec => s.copy(source = src(s.source),
        idCol = sub(s.idCol, params), textCol = sub(s.textCol, params),
        corpusDir = sub(s.corpusDir, params), storeDir = sub(s.storeDir, params),
        checkpointDir = sub(s.checkpointDir, params))
      case s: SpanIngestSpec => s.copy(source = src(s.source),
        idCol = sub(s.idCol, params), textCol = sub(s.textCol, params),
        corpusDir = sub(s.corpusDir, params), storeDir = sub(s.storeDir, params),
        checkpointDir = sub(s.checkpointDir, params))
      case s: SemanticIngestSpec => s.copy(source = src(s.source),
        idCol = sub(s.idCol, params), vecCol = sub(s.vecCol, params),
        corpusDir = sub(s.corpusDir, params), storeDir = sub(s.storeDir, params),
        checkpointDir = sub(s.checkpointDir, params))
      case s: VectorIndexIngestSpec => s.copy(source = src(s.source),
        idCol = sub(s.idCol, params), vecCol = sub(s.vecCol, params),
        indexDir = sub(s.indexDir, params), checkpointDir = sub(s.checkpointDir, params))
      case s: PretrainIngestSpec => s.copy(source = src(s.source),
        idCol = sub(s.idCol, params), textCol = sub(s.textCol, params),
        vecCol = sub(s.vecCol, params), corpusDir = sub(s.corpusDir, params),
        semStoreDir = sub(s.semStoreDir, params),
        spanStoreDir = sub(s.spanStoreDir, params),
        checkpointDir = sub(s.checkpointDir, params),
        dsirWeightsDir = s.dsirWeightsDir.map(sub(_, params)))
    }
  }

  /** The spec's primary output location — what a caller reads after the
    * ingest drains (stores are secondary state).
    */
  def primarySink(spec: IngestSpec): String = spec match {
    case s: QualityIngestSpec     => s.corpusDir
    case s: ImportanceIngestSpec  => s.corpusDir
    case s: MinhashIngestSpec     => s.corpusDir
    case s: SpanIngestSpec        => s.corpusDir
    case s: SemanticIngestSpec    => s.corpusDir
    case s: VectorIndexIngestSpec => s"${s.indexDir}/cells"
    case s: PretrainIngestSpec    => s.corpusDir
  }

  /** `readStream` over the spec's source directory. File sources need an
    * explicit schema; on the FIRST round it is inferred from a static
    * read of the path (so at least one file must be present — drop the
    * first batch, then start) and persisted next to the checkpoint
    * (`<checkpointDir>/graft_source_schema.json`). Every later round
    * reads the pinned schema instead of re-inferring: rounds stay cheap
    * when the drop directory holds millions of historical files (no
    * footer reads), and keep working after drained files are archived or
    * deleted — an empty drop directory with a pinned schema is just a
    * zero-batch round, not an inference failure. Pinning also freezes
    * the contract: a producer changing the file schema mid-stream fails
    * loudly at read instead of silently re-inferring a new one.
    */
  private[graft] def sourceStream(spark: SparkSession, src: StreamSourceSpec,
                                  checkpointDir: String): DataFrame = {
    val schemaPath = new org.apache.hadoop.fs.Path(checkpointDir, "graft_source_schema.json")
    val fs = schemaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema: org.apache.spark.sql.types.StructType =
      if (fs.exists(schemaPath)) {
        val in = fs.open(schemaPath)
        val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
      } else {
        val inferred = spark.read.format(src.format).options(src.options)
          .load(src.path).schema
        // atomic tmp+rename publish (the store-maintenance convention): a
        // crash mid-write must not leave a truncated schema pin
        val tmp = new org.apache.hadoop.fs.Path(checkpointDir,
          "graft_source_schema.json.tmp")
        val out = fs.create(tmp, true)
        try out.write(inferred.json.getBytes("UTF-8")) finally out.close()
        if (!fs.rename(tmp, schemaPath)) {
          // rename can refuse when the destination appeared concurrently
          // (two rounds racing on one checkpoint) — the winner's pin is
          // as good as ours; anything else must fail LOUDLY, or the pin
          // silently never exists and a later archived-drop round dies
          // re-inferring against an empty directory
          fs.delete(tmp, false)
          if (!fs.exists(schemaPath)) throw new java.io.IOException(
            s"could not publish source-schema pin $schemaPath")
        }
        inferred
      }
    spark.readStream.format(src.format).options(src.options)
      .schema(schema).load(src.path)
  }

  /** Start the ingest described by `spec` (placeholders must already be
    * resolved — see [[substituted]]).
    */
  def start(spark: SparkSession, spec: IngestSpec,
            trigger: Option[Trigger] = None): StreamingQuery = {
    import graft.streaming.Streams
    val in = sourceStream(spark, spec.source, spec.checkpointDir)
    spec match {
      case s: QualityIngestSpec =>
        Streams.ingestQualityFiltered(in, s.textCol, s.weights, s.corpusDir,
          s.checkpointDir, trigger)
      case s: ImportanceIngestSpec =>
        Streams.ingestImportanceFiltered(in, s.idCol, s.textCol, s.weightsDir,
          s.minLogw, s.corpusDir, s.checkpointDir, s.hexLen, trigger)
      case s: MinhashIngestSpec =>
        Streams.ingestDedup(in, s.idCol, s.textCol, s.threshold, s.corpusDir,
          s.storeDir, s.checkpointDir, s.compactEvery, trigger)
      case s: SpanIngestSpec =>
        Streams.ingestSpanDedup(in, s.idCol, s.textCol, s.k, s.corpusDir,
          s.storeDir, s.checkpointDir, s.compactEvery, trigger = trigger)
      case s: SemanticIngestSpec =>
        Streams.ingestSemanticDedup(in, s.idCol, s.vecCol, s.centroids,
          s.threshold, s.corpusDir, s.storeDir, s.checkpointDir, s.compactEvery,
          trigger = trigger)
      case s: VectorIndexIngestSpec =>
        Streams.ingestVectorIndex(in, s.indexDir, s.checkpointDir, s.idCol,
          s.vecCol, s.compactEvery, trigger = trigger)
      case s: PretrainIngestSpec =>
        Streams.ingestPretrainCorpus(in, s.idCol, s.textCol, s.vecCol,
          s.qualityWeights, s.centroids, s.semThreshold, s.spanK, s.corpusDir,
          s.semStoreDir, s.spanStoreDir, s.checkpointDir, s.dsirWeightsDir,
          s.minLogw, s.compactEvery, s.maxDocChars, trigger = trigger)
    }
  }

  /** One incremental ingest round: resolve placeholders, start with
    * `Trigger.AvailableNow`, block until the source is drained. The
    * checkpoint makes successive calls process only newly-arrived files —
    * the restartable-CLI form of the ingest.
    *
    * Concurrency guard: the round runs under an advisory single-writer
    * lock on the checkpoint ([[withIngestLock]]) — two invocations
    * sharing one checkpoint (a cron round overlapping a slow manual run)
    * are undefined behavior in Structured Streaming, so the second
    * invoker fails fast naming the holder instead of corrupting offsets.
    * `lockStaleMs` bounds how long a CRASHED holder's lock survives: the
    * live holder heartbeats the lock's mtime every `lockStaleMs / 4`, so
    * only a process that stopped heartbeating that long ago is reclaimed.
    */
  def runAvailable(spark: SparkSession, spec: IngestSpec,
                   params: Map[String, String] = Map.empty,
                   lockStaleMs: Long = 600000L): Unit = {
    val resolved = substituted(spec, params)
    withIngestLock(spark, resolved.checkpointDir, lockStaleMs) {
      val q = start(spark, resolved, Some(Trigger.AvailableNow()))
      try q.awaitTermination() finally if (q.isActive) q.stop()
    }
  }

  /** Advisory single-writer lock on an ingest checkpoint directory.
    *
    * Mechanics: `<checkpointDir>/graft_ingest.lock` is created
    * CREATE-EXCLUSIVE (the filesystem arbitrates a same-instant race)
    * holding `pid/host/started` for the error message; a daemon thread
    * refreshes the file's mtime every `staleMs / 4` while `body` runs.
    * A second invoker seeing a FRESH lock (mtime younger than `staleMs`)
    * fails fast with the holder's identity. A STALE lock is a crashed
    * holder (kill -9 skips the finally-delete): reclaim goes through an
    * atomic rename to a caller-unique tombstone — of N racing reclaimers
    * exactly one rename succeeds, and everyone then re-enters the
    * create-exclusive gate, so a reclaim can never delete a lock another
    * invoker just created. The streaming checkpoint itself stays the
    * source of truth for data correctness (a reclaimed-but-alive zombie
    * holder is still fenced by checkpoint file atomicity); the lock
    * exists to fail fast and NAME the conflict instead of letting two
    * rounds interleave offsets.
    */
  private[graft] def withIngestLock[T](spark: SparkSession, checkpointDir: String,
                                       staleMs: Long)(body: => T): T = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(checkpointDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val lock = new Path(dir, "graft_ingest.lock")
    val me = s"pid=${ProcessHandle.current().pid()} " +
      s"host=${java.net.InetAddress.getLocalHost.getHostName} " +
      s"started=${java.time.Instant.now()}"
    def holderOf: String =
      try {
        val in = fs.open(lock)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      } catch { case _: Exception => "<unreadable holder>" }
    def tryReclaimStale(): Unit = {
      val st = try Some(fs.getFileStatus(lock))
        catch { case _: java.io.FileNotFoundException => None }
      st.foreach { s =>
        val age = System.currentTimeMillis() - s.getModificationTime
        if (age < staleMs) throw new IllegalStateException(
          s"ingest checkpoint $checkpointDir is locked by [$holderOf] " +
            s"(heartbeat ${age / 1000}s ago, stale after ${staleMs / 1000}s): " +
            "one RunSpec invocation per checkpoint — wait for it, or delete " +
            s"$lock if the holder is known dead")
        // stale: atomic-rename tombstone, unique per reclaimer — the one
        // winner deletes it; losers find the lock gone (or recreated by a
        // faster winner) and are arbitrated by create-exclusive below
        val tomb = new Path(dir,
          s"graft_ingest.lock.reclaimed.${ProcessHandle.current().pid()}")
        if (fs.rename(lock, tomb)) fs.delete(tomb, false)
        ()
      }
    }
    tryReclaimStale()
    val out =
      try fs.create(lock, false)
      catch { case _: java.io.IOException =>
        throw new IllegalStateException(
          s"ingest checkpoint $checkpointDir is locked by [$holderOf]: " +
            "one RunSpec invocation per checkpoint — a concurrent round just " +
            "acquired it")
      }
    try out.write(me.getBytes("UTF-8")) finally out.close()
    val hb = new Thread(() => {
      val interval = math.max(200L, staleMs / 4)
      try while (!Thread.interrupted()) {
        Thread.sleep(interval)
        // refresh mtime only; a transient FS error just skips one beat
        try fs.setTimes(lock, System.currentTimeMillis(), -1)
        catch { case _: Exception => () }
      } catch { case _: InterruptedException => () }
    }, s"graft-ingest-lock-heartbeat-${lock.hashCode()}")
    hb.setDaemon(true)
    hb.start()
    try body
    finally {
      hb.interrupt()
      try { fs.delete(lock, false); () } catch { case _: Exception => () }
    }
  }
}

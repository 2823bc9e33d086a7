package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's convertor jobs (SURVEY §2.3, C1–C9) re-expressed as
  * declarative DataFrame transformations.
  *
  * Design stance: each operator is a *plan fragment*, not a stream stage.
  * The reference pipes record-at-a-time JS through a single thread
  * (`/root/reference/jobs/convertors/`); here each op contributes to one
  * Catalyst plan, so filters commute with projections, predicates push to
  * the scan, and blocking ops (sort/agg/distinct) run distributed with
  * spill — behaviors the reference's in-heap buffers can't provide
  * (`/root/reference/jobs/convertors/job-sorter.js:47-49`).
  */
object CoreOps {

  /** C1 `Filter` (`job-filter.js:10-16`): predicate expressed as a Column
    * (or SQL string) so Catalyst can push it into the scan.
    */
  def filterOp(df: DataFrame, predicate: Column): DataFrame = df.filter(predicate)
  def filterOp(df: DataFrame, predicate: String): DataFrame = df.filter(expr(predicate))

  /** C2 `Mapper` (`job-mapper.js:15-17`): 1:1 projection/transform. */
  def mapper(df: DataFrame, projections: (String, Column)*): DataFrame =
    df.select(projections.map { case (n, c) => c.as(n) }: _*)

  /** C3 `Thru` — stateless 1:N case (`job-thru.js:17-53` used as a flatMap,
    * e.g. unnesting `data.mapping[]`, `examples/bor-dwc.js:91-100`):
    * explode an array-valued expression into rows.
    */
  def flatMapExplode(df: DataFrame, arrayExpr: Column, as: String): DataFrame =
    df.withColumn(as, explode(arrayExpr))

  /** C3 `Thru` — inject-synthetic-rows case (`examples/bor-dwc.js:45-63`
    * pushes hand-built parent/category records ahead of the stream):
    * a union of a derived/literal DataFrame. Order is irrelevant in a
    * relational plan; consumers that need the synthetic rows "first"
    * declare an order column.
    */
  def injectRows(df: DataFrame, synthetic: DataFrame): DataFrame = df.unionByName(synthetic)

  /** C3 `Thru` — stateful sequential fidelity mode. The reference's Thru may
    * keep cross-record mutable state and is order-dependent because it runs
    * on one thread (`job-thru.js:17-53`; SURVEY §7.4.1). This variant
    * reproduces those semantics exactly by folding a single partition —
    * deliberately NOT distributed; callers at scale should reformulate as
    * groupBy/window/union (see the other C3 mappings). The explicit
    * `coalesce(1)` makes the sequential cost visible in the plan.
    */
  def thruStateful[T, S, U](ds: org.apache.spark.sql.Dataset[T], zero: S)(
      step: (S, T) => (S, Seq[U]))(
      implicit enc: org.apache.spark.sql.Encoder[U]): org.apache.spark.sql.Dataset[U] =
    ds.coalesce(1).mapPartitions { it =>
      var state = zero
      it.flatMap { t => val (s2, out) = step(state, t); state = s2; out }
    }

  /** C4 `Reducer` (`job-reducer.js:17-59`): keyed fold → one output row per
    * key. The reference mutates one in-heap dictionary on a single thread;
    * here it is hash aggregation with map-side partials and spill.
    */
  def reducer(df: DataFrame, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)

  /** C5 `Sorter` (`job-sorter.js:17-58`): total order by sort keys.
    * The reference buffers the entire stream in heap; this is a distributed
    * range-partitioned sort. Arbitrary comparator functions are deliberately
    * unsupported (SURVEY §2.3 C5) — callers declare sort-key expressions.
    */
  def sorter(df: DataFrame, keys: Column*): DataFrame = df.orderBy(keys: _*)

  /** C6 `Uniquer` (`job-uniquer.js:15-26`): distinct by derived key.
    * The reference's keep-FIRST is defined by single-threaded arrival order
    * (and is O(n²)); distributed keep-first requires an explicit order
    * (SURVEY §7.4.2), so this variant takes order columns and keeps, per
    * key, the row minimal under that order — via `min_by` on a packed
    * struct, one hash aggregation, no window shuffle.
    */
  def uniquerKeepFirst(df: DataFrame, key: Seq[String], order: Seq[String]): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    val ord = struct(order.map(col): _*)
    df.groupBy(key.map(col): _*)
      .agg(min_by(payload, ord).as("__first"))
      .select(col("__first.*"))
  }

  /** C6 `Uniquer`, order-insensitive variant: plain distinct on the key. */
  def uniquer(df: DataFrame, key: String*): DataFrame = df.dropDuplicates(key)

  /** C7 `Array2Map` (`job-array2map.js:22-52`): array<struct> field → map
    * keyed by `idKey`, with the reference's value-collapse rule
    * (`:34-43`): zero non-id fields → null, one → that scalar, else the
    * remaining struct. The collapse arity is static in the schema, so it is
    * resolved at plan time, not per row.
    */
  def array2map(df: DataFrame, field: String, as: String, idKey: String = "id"): DataFrame = {
    val elemType = df.schema(field).dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    val others = elemType.fieldNames.filterNot(_ == idKey)
    val valueOf: Column => Column = others.toSeq match {
      case Seq()  => _ => lit(null)
      case Seq(f) => x => x.getField(f)
      case fs     => x => struct(fs.map(f => x.getField(f).as(f)): _*)
    }
    df.withColumn(as, map_from_entries(
      transform(col(field), x => struct(x.getField(idKey), valueOf(x)))))
  }

  /** C7 over several fields at once — the reference takes a comma-separated
    * field list (`job-array2map.js:12-16`); each is converted in place.
    */
  def array2mapFields(df: DataFrame, fields: Seq[String], idKey: String = "id"): DataFrame =
    fields.foldLeft(df)((acc, f) => array2map(acc, f, f, idKey))

  /** C8 `Map2Array` (`job-map2array.js:23-44`): map field → array of
    * `{idKey, valueKey}` structs.
    */
  def map2array(df: DataFrame, field: String, as: String,
                idKey: String = "id", valueKey: String = "value"): DataFrame =
    df.withColumn(as, transform(map_entries(col(field)),
      e => struct(e.getField("key").as(idKey), e.getField("value").as(valueKey))))

  /** C8 over several fields in place (comma-list in the reference,
    * `job-map2array.js`).
    */
  def map2arrayFields(df: DataFrame, fields: Seq[String],
                      idKey: String = "id", valueKey: String = "value"): DataFrame =
    fields.foldLeft(df)((acc, f) => map2array(acc, f, f, idKey, valueKey))

  /** C9 `Nothing` (`job-nothing.js:10-12`): black-hole terminal — the plan
    * is fully executed (useful for benchmarks/side-effect observation)
    * but nothing is materialized.
    */
  def nothing(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  /** Spy (`jobs/job.js:202-210`): observe row count + named metrics without
    * a second pass, via `Dataset.observe` — the metric is collected by a
    * QueryExecutionListener or `Observation` on the driver.
    */
  def spy(df: DataFrame, name: String, metrics: Seq[Column] = Nil): DataFrame =
    df.observe(name, count(lit(1)).as("rows"), metrics: _*)

  /** Per-RECORD spy tap — the reference's spy callback fires on EVERY
    * record (`jobs/job.js:202-210`); [[spy]] maps it to aggregate metrics,
    * which covers the two observed production uses (counts, early-stop)
    * but not record-level debugging. This tap restores that parity as a
    * pass-through transform: `tap` runs executor-side on each row that
    * passes the deterministic sample gate, and the stream is returned
    * unchanged (the callback result is discarded — a spy observes, a
    * [[mapper]] transforms). `sampleRate` bounds the cost on a 100 TB run:
    * the gate is `xxhash64(whole row, salt) / 2⁶³ < rate` — deterministic
    * per row content, no RNG state, evaluated as one codegen'd expression
    * — so a debugging session sees a stable sample across retries and the
    * tap costs one hash per row when sampled out. `sampleRate = 1.0`
    * (default) is the reference's every-record behavior. The callback must
    * be serializable; it sees rows as `Row` AFTER upstream transforms,
    * like the reference's mid-chain spy.
    *
    * Re-fire semantics: the tap rides the PLAN, so it fires once per Spark
    * EXECUTION — a DataFrame consumed by multiple actions re-invokes the
    * tap for the same rows, and a retried task replays its partition's
    * taps. The determinism claim covers WHICH rows are sampled (stable
    * across retries), not how many times each fires: side-effect tallies
    * are per-execution observations, not record-lifetime counts — use
    * [[spy]]'s observed metrics when an exact per-action count is the ask.
    */
  def spyTap(df: DataFrame, tap: org.apache.spark.sql.Row => Unit,
             sampleRate: Double = 1.0, salt: String = "spy"): DataFrame = {
    require(sampleRate >= 0.0 && sampleRate <= 1.0,
      s"spyTap sampleRate must be in [0,1], got $sampleRate")
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    if (sampleRate == 0.0) df
    else if (sampleRate >= 1.0)
      // a map (not foreach) so the tap rides the existing plan lazily —
      // same pass-through position as the reference's mid-chain spy
      df.map { row => tap(row); row }(enc)
    else {
      // deterministic sample gate, codegen'd BEFORE the typed boundary:
      // xxhash64(hashable columns, salt) mapped to [0,1) — stable across
      // task retries. MapType is unhashable in Spark SQL, so map-bearing
      // columns are excluded from the gate input (they still pass through
      // untouched); a pathological all-map schema degrades to a constant
      // gate — all rows tap or none, by rate. The gate column name dodges
      // any user column literally named __spy.
      val schema = df.schema
      val n = df.columns.length
      def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
        case _: org.apache.spark.sql.types.MapType => false
        case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
        case _ => true
      }
      val gateInput = schema.fields.filter(f => hashable(f.dataType))
        .map(f => col(f.name)).toIndexedSeq
      // case-INSENSITIVE freshness check: withColumn resolves names
      // case-insensitively by default, so a user column differing only in
      // case (e.g. __SPY0) would otherwise be silently replaced and dropped
      val gate = Iterator.from(0).map(i => s"__spy$i")
        .find(g => !df.columns.exists(_.equalsIgnoreCase(g))).get
      val gated = df.withColumn(gate,
        (xxhash64((if (gateInput.nonEmpty) gateInput else Seq(lit(1))) :+ lit(salt): _*)
          .cast("double") / lit(Long.MaxValue.toDouble) + lit(1.0)) / lit(2.0)
          < lit(sampleRate))
      val tapped = gated.map { row =>
        // re-wrap WITHOUT the gate column, only for sampled rows — the
        // callback sees exactly the user-visible schema
        if (row.getBoolean(n)) tap(
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            Array.tabulate[Any](n)(row.get), schema))
        row
      }(org.apache.spark.sql.Encoders.row(gated.schema))
      tapped.drop(gate)
    }
  }
}

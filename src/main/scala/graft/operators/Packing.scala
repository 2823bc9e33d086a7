package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for pretraining batches: assign every document a
  * `(shard, bin)` so that, within a shard, consecutive documents in a
  * deterministic hash order fill bins of ≈ `budgetTokens` tokens. Two
  * variants, same ordering, different bin rule:
  *
  *  - [[packBins]] — *offset-range* binning: bin k holds the documents whose
  *    starting token offset falls in `[k·budget, (k+1)·budget)`. One window
  *    expression, no sequential state. A document that crosses a boundary
  *    eats into the next range (that bin may underfill), and a document
  *    larger than the budget spans several ranges (the skipped bin indices
  *    are empty) — bins average to the budget, individual bins vary.
  *  - [[packBinsGreedy]] — true greedy first-fit with per-bin reset: a bin
  *    closes only once it has reached the budget, so bins are contiguous
  *    from 0, never underfill, and overflow by at most one document.
  *
  * Scale shape: documents are first split into `shards` deterministic
  * md5-prefix groups, and the fill order is a per-shard sort — each shard
  * sorts in one task, so pick `shards` ≈ corpus/10M docs at scale (256
  * default suits up to low-billions). Assignment is deterministic and
  * engine-portable, reproducible across runs — the property a random
  * packing can't give a resumable pipeline.
  */
object Packing {

  /** Sliding-window chunking: split each document into token windows of
    * `chunkTokens`, starting every `stride` tokens (stride < chunkTokens ⇒
    * overlapping chunks, the context-window prep for long-document
    * pretraining). Output: one row per (doc, chunk) with `chunk_id`
    * (0-based), the chunk's token array, and its token count. Trailing
    * windows may be short; empty documents produce no chunks.
    *
    * Scale shape: a pure per-row `posexplode` projection — narrow, no
    * shuffle, stays in whole-stage codegen. Fan-out is bounded by
    * ⌈tokens/stride⌉ rows per document.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    df.select(col(idCol), graft.functions.TextOps.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), size(col("__toks")) - 1, lit(stride)),
          st => slice(col("__toks"), st + 1, lit(chunkTokens))))
          .as(Seq("chunk_id", "chunk_toks")))
      .withColumn("n_toks", size(col("chunk_toks")).cast("long"))
  }

  /** Fail loudly on a null packing input. The packers consume token counts /
    * token arrays row-by-row; an unguarded null would NPE mid-fold in the
    * imperative variants but silently yield a null bin in the window variant
    * — divergent behavior on the same dirty corpus. `coalesce` only
    * evaluates the error branch when the value IS null, so the guard is free
    * on clean data. Corpora with expected nulls should filter them first.
    */
  private def notNull(c: Column, op: String, what: String, idCol: String): Column =
    coalesce(c, raise_error(concat(
      lit(s"$op: null $what for $idCol="),
      coalesce(col(idCol).cast("string"), lit("null")))))

  private def shardHexChars(shards: Int): Int = {
    val hexChars = Seq(16, 256, 4096, 65536).indexOf(shards) + 1
    require(hexChars > 0, "shards must be a power of 16 (16/256/4096/65536)")
    hexChars
  }

  /** Offset-range binning (see object doc): `bin = floor(startOffset /
    * budget)` where `startOffset` is the document's cumulative token offset
    * within its shard's deterministic fill order. Pure window expression —
    * stays fully declarative, one shuffle.
    */
  def packBins(df: DataFrame, idCol: String, tokenCol: String,
               budgetTokens: Long, shards: Int = 256): DataFrame = {
    val shard = substring(md5(col(idCol).cast("string")), 1, shardHexChars(shards))
    val w = Window.partitionBy(shard)
      .orderBy(Sampling.hashBucket(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tok = notNull(col(tokenCol), "packBins", tokenCol, idCol)
    val cum = sum(tok).over(w)
    // floor of a double division, not a long cast: engines disagree on
    // double→int conversion (truncate vs round); floor() they agree on
    df.withColumn("shard", shard)
      .withColumn("bin", floor((cum - tok) / budgetTokens).cast("long"))
  }

  /** Materialize packed training sequences: every `(shard, bin)` from
    * [[packBins]]'s offset-range rule becomes ONE token sequence — the
    * bin's documents concatenated in the deterministic fill order, each
    * followed by `eosToken`. Output: `(shard, bin, n_docs, seq, n_toks)`;
    * this is the final batch-prep step, ready to tokenize-map into
    * input_ids.
    *
    * Scale shape: the token arrays ride EXACTLY ONE shuffle (the
    * repartition by shard) — a `groupBy(shard, bin)` formulation would
    * shuffle them twice (window exchange + aggregation exchange). The
    * per-shard fold streams the sorted iterator and buffers only the
    * CURRENT bin (≤ budget + one overflow document), so task memory is
    * budget-bound regardless of corpus size. Bin assignment replays the
    * offset-range rule, so the output is bit-identical to binning with
    * [[packBins]] and aggregating.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budgetTokens: Long, shards: Int = 256,
                    eosToken: String = "<eos>"): DataFrame =
    packSeqCore(df, idCol,
      notNull(graft.functions.TextOps.tokens(col(textCol)),
        "packSequences", s"$textCol tokens", idCol),
      budgetTokens, shards, eosToken)

  /** [[packSequences]] with the packed units taken from an EXISTING
    * token-array column instead of whitespace tokenization — the
    * tokenizer-true packing stage: feed it [[graft.functions.Bpe.encode]]'s
    * `subwords` column and both the budget and the emitted sequences are
    * measured in real BPE tokens, not whitespace words.
    */
  def packSequencesBy(df: DataFrame, idCol: String, seqCol: String,
                      budgetTokens: Long, shards: Int = 256,
                      eosToken: String = "<eos>"): DataFrame =
    packSeqCore(df, idCol,
      notNull(col(seqCol), "packSequencesBy", seqCol, idCol),
      budgetTokens, shards, eosToken)

  /** Fused BPE-encode + pack: bit-identical output to
    * `packSequencesBy(Bpe.encode(df, ...), "id", "subwords", ...)` with
    * HALF the token shuffle volume. The composed form moves token payloads
    * through TWO exchanges — encode's id-keyed per-doc assembly (serialized
    * collect_list buffers) and the pack's shard repartition. But the shard
    * is a FUNCTION of the id (md5 prefix), so hash-partitioning the
    * word-level stream by shard already co-locates every row of a document:
    * the per-doc assembly aggregation runs on that same partitioning with
    * NO further exchange, and the pack fold consumes the aggregated
    * partitions in place. Token payloads cross exactly ONE exchange, at any
    * corpus size — the plan shape PlanQualitySpec locks.
    *
    * Zero-token documents are preserved (they pack as a bare `eosToken`,
    * exactly as [[graft.functions.Bpe.encode]]'s empty rows do) via a
    * sentinel word row, not a corpus-wide join.
    */
  def packSequencesEncoded(df: DataFrame, idCol: String, textCol: String,
                           segmentation: DataFrame, budgetTokens: Long,
                           shards: Int = 256,
                           eosToken: String = "<eos>",
                           maxWordChars: Int = 0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val toks = graft.functions.TextOps.tokens(col(textCol))
    val words = df.select(
        substring(md5(col(idCol).cast("string")), 1, shardHexChars(shards)).as("shard"),
        Sampling.hashBucket(col(idCol)).as("__b"),
        col(idCol),
        explode(when(size(toks) > 0,
            transform(toks, (w, i) => struct(i.as("pos"), w.as("word"))))
          .otherwise(array(struct(lit(-1).as("pos"),
            lit(null).cast("string").as("word"))))).as("pw"))
      .select(col("shard"), col("__b"), col(idCol),
        col("pw.pos").as("__pos"), col("pw.word").as("word"))
      .join(Joins.maybeBroadcast(segmentation), Seq("word"), "left")
      .withColumn("__sub",
        when(col("word").isNull, array().cast("array<string>"))          // sentinel
          .otherwise(coalesce(col("subwords"),                           // OOV fallback
            graft.functions.Bpe.cappedSymbols(col("word"), maxWordChars))))
    val docs = words.repartition(col("shard"))
      .groupBy(col("shard"), col("__b"), col(idCol))
      .agg(flatten(array_sort(collect_list(struct(col("__pos").as("pos"),
        col("__sub").as("subwords")))).getField("subwords")).as("__toks"))
    packFold(docs.sortWithinPartitions(col("shard"), col("__b"), col(idCol)),
      budgetTokens, eosToken)
  }

  private def packSeqCore(df: DataFrame, idCol: String, toksCol: Column,
                          budgetTokens: Long, shards: Int,
                          eosToken: String): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val sorted = df.select(
        substring(md5(col(idCol).cast("string")), 1, shardHexChars(shards)).as("shard"),
        Sampling.hashBucket(col(idCol)).as("__b"),
        col(idCol),
        toksCol.as("__toks"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__b"), col(idCol))
    packFold(sorted, budgetTokens, eosToken)
  }

  /** The per-shard sequential bin fold shared by [[packSeqCore]] and
    * [[packSequencesEncoded]]. `sorted` must be laid out `(shard, bucket,
    * id, tokens)`, partitioned so each partition holds COMPLETE shards, and
    * sorted within partitions by `(shard, bucket, id)` — the fold replays
    * the offset-range rule over that order.
    */
  private def packFold(sorted: DataFrame, budgetTokens: Long,
                       eosToken: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
    val outSchema = StructType(Seq(
      StructField("shard", StringType, nullable = false),
      StructField("bin", LongType, nullable = false),
      StructField("n_docs", LongType, nullable = false),
      StructField("seq", ArrayType(StringType), nullable = false),
      StructField("n_toks", LongType, nullable = false)))
    sorted.mapPartitions { rows =>
      var curShard: String = null
      var cum = 0L              // token offset within the current shard
      var openBin = -1L
      var nDocs = 0L
      val seq = scala.collection.mutable.ArrayBuffer.empty[String]
      def flush(shard: String, bin: Long): Row = {
        val r = Row(shard, bin, nDocs, seq.toSeq, seq.size.toLong)
        seq.clear(); nDocs = 0L; r
      }
      val out = rows.flatMap { r =>
        val sh = r.getString(0)
        val toks = r.getSeq[String](3)
        val emitted = scala.collection.mutable.ListBuffer.empty[Row]
        if (sh != curShard) {
          if (openBin >= 0) emitted += flush(curShard, openBin)
          curShard = sh; cum = 0L; openBin = -1L
        }
        val myBin = Math.floorDiv(cum, budgetTokens) // offset-range rule
        if (openBin >= 0 && myBin != openBin) emitted += flush(curShard, openBin)
        openBin = myBin
        cum += toks.size
        nDocs += 1; seq ++= toks; seq += eosToken
        emitted
      }
      // close the final open bin AFTER the row iterator is exhausted
      out ++ new Iterator[Row] {
        private var done = false
        override def hasNext: Boolean = !done && openBin >= 0
        override def next(): Row = { done = true; flush(curShard, openBin) }
      }
    }(Encoders.row(outSchema))
  }

  /** True greedy first-fit packing (see object doc): within each shard, in
    * the same deterministic `(md5 bucket, id)` order as [[packBins]], a bin
    * accumulates documents until its fill reaches `budgetTokens`, then the
    * next document opens a fresh bin (per-bin running reset). Guarantees:
    * bins are contiguous from 0 per shard; every non-final bin's fill is
    * ≥ the budget; a bin overflows past the budget by at most its last
    * document.
    *
    * The bin recurrence is prefix-dependent (the reset makes it inexpressible
    * as a window sum), so this is the one operator that runs imperatively:
    * a `mapPartitions` fold over rows pre-sorted per shard. Parallelism is
    * across shards (the same unit the window variant sorts in one task);
    * only `(shard, id, tokens)` ride the sort shuffle, so the returned frame
    * is that projection plus `bin` — join it back to the corpus on `idCol`.
    */
  def packBinsGreedy(df: DataFrame, idCol: String, tokenCol: String,
                     budgetTokens: Long, shards: Int = 256): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val sorted = df.select(
        substring(md5(col(idCol).cast("string")), 1, shardHexChars(shards)).as("shard"),
        Sampling.hashBucket(col(idCol)).as("__b"),
        col(idCol),
        notNull(col(tokenCol), "packBinsGreedy", tokenCol, idCol)
          .cast("long").as("__tok"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__b"), col(idCol))
    val outSchema = StructType(Seq(
      StructField("shard", StringType, nullable = false),
      sorted.schema(idCol),
      StructField(tokenCol, LongType),
      StructField("bin", LongType, nullable = false)))
    // several shards share a partition after the repartition; the sort keeps
    // each contiguous, so a shard change resets the fold state
    sorted.mapPartitions { rows =>
      var curShard: String = null
      var fill = 0L
      var bin = 0L
      rows.map { r =>
        val sh = r.getString(0)
        if (sh != curShard) { curShard = sh; fill = 0L; bin = 0L }
        else if (fill >= budgetTokens) { bin += 1; fill = 0L }
        fill += r.getLong(3)
        Row(sh, r.get(2), r.getLong(3), bin)
      }
    }(Encoders.row(outSchema))
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s for the reference Reducer folds that built-in
  * aggregate functions don't express directly (SURVEY §4 custom list).
  *
  * The motivating case is the reference's last-write-wins field merge:
  * the Reducer processor overwrites fields of an accumulator object per
  * record, so later records win per-field
  * (`/root/reference/examples/bor-dwc.js:622-631`). Distributed, "later"
  * must be declared (SURVEY §7.4.2), so the input carries an explicit
  * sequence number and merge keeps, per field key, the value with the
  * highest sequence.
  */
object FoldAggregator {

  /** input: (seq, fields) — merge all field maps, per-key keeping the value
    * from the largest seq. Output: the merged field map.
    */
  class LastWriteWins extends Aggregator[(Long, Map[String, String]),
                                         Map[String, (Long, String)],
                                         Map[String, String]] {
    def zero: Map[String, (Long, String)] = Map.empty
    def reduce(acc: Map[String, (Long, String)],
               in: (Long, Map[String, String])): Map[String, (Long, String)] = {
      val (seq, fields) = in
      fields.foldLeft(acc) { case (m, (k, v)) =>
        m.get(k) match {
          case Some((s, _)) if s >= seq => m
          case _ => m.updated(k, (seq, v))
        }
      }
    }
    def merge(a: Map[String, (Long, String)],
              b: Map[String, (Long, String)]): Map[String, (Long, String)] =
      b.foldLeft(a) { case (m, (k, sv)) =>
        m.get(k) match {
          case Some((s, _)) if s >= sv._1 => m
          case _ => m.updated(k, sv)
        }
      }
    def finish(acc: Map[String, (Long, String)]): Map[String, String] =
      acc.map { case (k, (_, v)) => k -> v }
    def bufferEncoder: Encoder[Map[String, (Long, String)]] =
      Encoders.kryo[Map[String, (Long, String)]]
    def outputEncoder: Encoder[Map[String, String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def lastWriteWins: LastWriteWins = new LastWriteWins
}

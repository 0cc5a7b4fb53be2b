package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-sequence analysis over event streams: the first-order
  * Markov transition structure of per-user event sequences —
  * transition counts, conditional probabilities, and pointwise mutual
  * information per (previous, next) event-type pair. The "what do
  * users actually do next" audit that sessionization and funnels
  * presuppose: PMI > 0 marks event pairs that co-follow more than
  * their frequencies predict (a real flow edge); PMI < 0 marks pairs
  * that repel (a funnel break).
  *
  * Scale shape: ONE hash exchange of the events on the user key feeds
  * the per-user lag window (the same shuffle sessionization pays);
  * everything after works on the |event types|² transition table —
  * bounded by the type dimension, never by event volume. Marginals
  * are |types| rows and broadcast back onto the pair table.
  *
  * Determinism: the sequence order is (ts, eventId) — a total order,
  * so ties at equal timestamps are engine-portable; PMI is computed
  * from exact long counts in one rounded expression.
  */
object EventFlow {

  /** Transition matrix with PMI:
    * `(prev_type, next_type, n_trans, p_cond, pmi)`.
    *
    * `p_cond = P(next | prev)` from the transition table's own
    * marginals; `pmi = ln( n·T / (out(prev)·in(next)) )` where T is
    * the total transition count, `out`/`in` the row/column marginals.
    *
    * @param tieCol total-order tie-break among equal-`tsCol` events
    *               of one user (an event id)
    */
  def transitions(
      events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val pairs = pairCounts(events, userCol, tsCol, typeCol, tieCol)
      .localCheckpoint() // marginals and the result both read it
    matrixFromCounts(pairs)
  }

  /** The (prev_type, next_type, n_trans) transition counts — the
    * MERGEABLE representation ([[matrixFromCounts]] turns any sum of
    * such tables into the full matrix; the streaming twin
    * [[graft.streaming.TransitionStream]] stores exactly these).
    */
  def pairCounts(
      events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
  }

  /** Marginals, conditional probability, and PMI from a
    * (prev_type, next_type, n_trans) count table — |types|²-bounded
    * work regardless of event volume.
    */
  def matrixFromCounts(pairs: DataFrame): DataFrame = {
    val outM = pairs.groupBy("prev_type").agg(sum("n_trans").as("n_out"))
    val inM = pairs.groupBy("next_type").agg(sum("n_trans").as("n_in"))
    val total = pairs.agg(sum("n_trans").as("n_total")) // one row
    pairs
      .join(broadcast(outM), Seq("prev_type"))
      .join(broadcast(inM), Seq("next_type"))
      .crossJoin(broadcast(total))
      .select(col("prev_type"), col("next_type"), col("n_trans"),
        round(col("n_trans").cast("double") / col("n_out").cast("double"), 6)
          .as("p_cond"),
        round(log(
          col("n_trans").cast("double") * col("n_total").cast("double") /
            (col("n_out").cast("double") * col("n_in").cast("double"))), 6)
          .as("pmi"))
  }
}

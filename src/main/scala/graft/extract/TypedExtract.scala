package graft.extract

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Dataset[T]` twin of the flagship extractor for the subset of
  * features that are algebraic over one pass — the `Aggregator[IN,BUF,OUT]`
  * extension point (SURVEY.md §2.10 U4): compile-time-checked row types,
  * mergeable buffer (partial aggregation still happens map-side), usable
  * both per-key via `groupByKey.agg` and as an untyped UDAF.
  *
  * The DataFrame extractor remains the production path (DECIMAL-exact money,
  * `countDistinct`); this demonstrates — and tests — that the engine's typed
  * API carries the same semantics for the algebraic core.
  */
object TypedExtract {

  /** Minimal typed event row. */
  case class Event(userId: Long, eventType: String, amount: Double)

  /** Mergeable aggregation buffer — every field combines associatively. */
  case class Buf(n: Long, purchases: Long, total: Double, positiveSum: Double,
    positiveN: Long)

  /** Typed output features (algebraic subset of the flagship query). */
  case class UserFeatures(userId: Long, totalEvents: Long, totalPurchases: Long,
    totalAmount: Double, avgAmount: Double, purchaseRate: Double)

  val aggregator: Aggregator[Event, Buf, UserFeatures] =
    new Aggregator[Event, Buf, UserFeatures] {
      override def zero: Buf = Buf(0L, 0L, 0.0, 0.0, 0L)

      override def reduce(b: Buf, e: Event): Buf = Buf(
        b.n + 1,
        b.purchases + (if (e.amount > 0) 1L else 0L),
        b.total + e.amount,
        b.positiveSum + (if (e.amount > 0) e.amount else 0.0),
        b.positiveN + (if (e.amount > 0) 1L else 0L))

      override def merge(a: Buf, b: Buf): Buf = Buf(
        a.n + b.n, a.purchases + b.purchases, a.total + b.total,
        a.positiveSum + b.positiveSum, a.positiveN + b.positiveN)

      override def finish(b: Buf): UserFeatures = UserFeatures(
        userId = -1L, // patched by the caller, which holds the key
        totalEvents = b.n,
        totalPurchases = b.purchases,
        totalAmount = b.total,
        avgAmount = if (b.positiveN > 0) b.positiveSum / b.positiveN else 0.0,
        purchaseRate = if (b.n > 0) b.purchases.toDouble / b.n else 0.0)

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[UserFeatures] =
        Encoders.product[UserFeatures]
    }

  /** Per-user features over a typed event Dataset — one shuffle on the key,
    * partials merged map-side exactly like the untyped hash aggregate.
    */
  def userFeatures(events: Dataset[Event]): Dataset[UserFeatures] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .agg(aggregator.toColumn)
      .map { case (userId, f) => f.copy(userId = userId) }
  }
}

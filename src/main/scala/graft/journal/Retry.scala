package graft.journal

import org.slf4j.LoggerFactory

/** App-level retry for journal/sink writes (O17) — the reference's
  * `RetryStrategy` family (common/.../RetryStrategy.java:28-79;
  * `ExponentialRetryStrategyProvider.java:42-121`): pause i is
  * `baseDelayMs << i`, truncated so the CUMULATIVE sleep never exceeds
  * `totalDelayMs`; an exhausted budget rethrows. Spark's own
  * `spark.task.maxFailures` re-runs task-side work, but the journal
  * writes happen on the driver against a possibly-flaky store — the same
  * reason the reference retries its metadata CQL at the application
  * level.
  *
  * A policy with `baseDelayMs == 0` never retries (the reference's
  * `RetryStrategy.NoRetry`, also its default when no implementation is
  * configured).
  */
final case class RetryPolicy(baseDelayMs: Long, totalDelayMs: Long) {
  require(baseDelayMs >= 0 && baseDelayMs <= totalDelayMs,
    s"baseDelayMs must be in [0, totalDelayMs]; got $baseDelayMs/$totalDelayMs")

  /** The full pause schedule, in milliseconds — pure, so specs can assert
    * it without sleeping (mirrors `Exponential.get` attempt-by-attempt).
    */
  def schedule: List[Long] = {
    if (baseDelayMs == 0) return Nil
    val out = List.newBuilder[Long]
    var paused = 0L
    var next = baseDelayMs
    var first = true
    while (first || paused < totalDelayMs) {
      val p = if (first) next else math.min(totalDelayMs - paused, next)
      out += p
      paused += p
      // stop doubling once past the budget: min() truncates anyway and
      // the early plateau keeps the shift from overflowing Long
      if (next <= totalDelayMs) next = next << 1
      first = false
    }
    out.result()
  }

  /** Run `f`, retrying per the schedule on any non-fatal failure;
    * rethrows once the budget is exhausted (RetryStrategy.retry loop).
    * `excluding` lists exception classes that must NOT be retried —
    * thrown through immediately, the reference's
    * `retryIfNot(retryable, excludedExceptions)`
    * (RetryStrategy.java:45-65).
    */
  def retry[T](what: String, excluding: Seq[Class[_]] = Nil)(f: => T): T = {
    var remaining = schedule
    while (true) {
      try return f
      catch {
        case scala.util.control.NonFatal(e)
            if !excluding.exists(_.isInstance(e)) =>
          remaining match {
            case pause :: rest =>
              RetryPolicy.log.warn(
                s"$what failed (${e.getMessage}); retrying in ${pause}ms " +
                  s"(${rest.size} retries left)")
              Thread.sleep(pause)
              remaining = rest
            case Nil => throw e
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object RetryPolicy {
  private val log = LoggerFactory.getLogger(classOf[RetryPolicy])

  /** The reference's defaults: 1 s base, 30 min total budget
    * (ExponentialRetryStrategyProvider.java:46-48).
    */
  val Exponential: RetryPolicy = RetryPolicy(1000L, 30L * 60 * 1000)

  /** No retries — the reference's fallback provider. */
  val NoRetry: RetryPolicy = RetryPolicy(0L, 0L)
}

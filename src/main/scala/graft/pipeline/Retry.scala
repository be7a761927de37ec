package graft.pipeline

import scala.util.{Failure, Success, Try}

/** Retry-with-backoff — the Step Functions retry contract
  * (`/root/reference/RealEstatePipeline.asl.json:62-72`: 2 attempts,
  * 60 s interval, 2.0 backoff on TaskFailed; Catch → fail state
  * `:73-81`). Driver-side control flow per SURVEY §2.10 C3/C4.
  */
object Retry {

  /** Run `body` with up to `maxAttempts` tries, sleeping
    * `intervalMs * backoff^(attempt-1)` between failures. Returns the
    * last failure if all attempts exhaust — the typed analog of the
    * Catch → ProcessingFailed state. */
  def withBackoff[T](maxAttempts: Int = 3, intervalMs: Long = 60000L,
                     backoff: Double = 2.0,
                     sleep: Long => Unit = Thread.sleep)(body: => T): Try[T] = {
    def attempt(n: Int, delayMs: Long): Try[T] =
      Try(body) match {
        case s @ Success(_) => s
        case f @ Failure(_) if n >= maxAttempts => f
        case Failure(_) =>
          sleep(delayMs)
          attempt(n + 1, (delayMs * backoff).toLong)
      }
    attempt(1, intervalMs)
  }
}

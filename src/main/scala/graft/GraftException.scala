package graft

/** Analysis-time error: bad spec, unknown operator/type, invalid config.
  * Raised during validation/compilation, before any job runs — an
  * improvement over the reference, which only fails at run time
  * (reference: main.py:178,116,343 raise ValueError mid-run).
  */
final class GraftAnalysisException(msg: String) extends RuntimeException(msg)

/** Execution-time error wrapper carrying the failing stage name. */
final class GraftExecutionException(stage: String, cause: Throwable)
    extends RuntimeException(s"stage '$stage' failed: ${cause.getMessage}", cause)

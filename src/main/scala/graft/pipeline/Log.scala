package graft.pipeline

/** Status logger with the reference's exact prefix vocabulary
  * (`utils/logging_utils.py:8-36` — its docs/tests grep for these
  * prefixes, `doc/architecture.md:537-547`).
  */
object Log {
  private def emit(prefix: String, msg: String): Unit =
    println(s"[$prefix] $msg")

  def info(msg: String): Unit    = emit("INFO", msg)
  def ok(msg: String): Unit      = emit("OK", msg)
  def success(msg: String): Unit = emit("SUCCESS", msg)
  def fail(msg: String): Unit    = emit("FAIL", msg)
  def warning(msg: String): Unit = emit("WARNING", msg)
  def start(msg: String): Unit   = emit("START", msg)
}

package graft.tools

/** Structured logging with caller info (`core/configs/logs.py:30-107`):
  * the reference decorates every message with level prefix + the calling
  * class.method and line, then fans out to a managed sink and stdout.
  * Here the sink is log4j2 (Spark's own backend — messages land wherever
  * the cluster's log pipeline ships executor/driver logs), and caller
  * info comes from the JVM stack instead of `inspect.stack()`. The
  * five-level surface (inf/war/err/cri/deb) matches the reference; CRI
  * maps to FATAL. */
object Log {
  private val logger =
    org.apache.logging.log4j.LogManager.getLogger("graft")

  /** "Class.method - Line: N" for the first frame outside Log itself. */
  private def callerInfo(): String = {
    val stack = Thread.currentThread().getStackTrace
    stack
      .find(f => !f.getClassName.startsWith("graft.tools.Log") &&
        !f.getClassName.startsWith("java.lang.Thread"))
      .map { f =>
        val cls = f.getClassName.split('.').last.stripSuffix("$")
        s"$cls.${f.getMethodName} - Line: ${f.getLineNumber}"
      }
      .getOrElse("N/A")
  }

  private[graft] def format(prefix: String, message: String): String =
    s"$prefix $message -> (${callerInfo()})"

  // Level checks guard the stack walk: callerInfo() materializes the
  // thread stack, and a suppressed deb() in a hot loop must cost nothing.
  def inf(message: String): Unit =
    if (logger.isInfoEnabled) logger.info(format("[ oo INFO ]", message))
  def war(message: String): Unit =
    if (logger.isWarnEnabled) logger.warn(format("[ <> WARNING ]", message))
  def err(message: String): Unit =
    if (logger.isErrorEnabled) logger.error(format("[ ^^ ERROR ]", message))
  def cri(message: String): Unit =
    if (logger.isFatalEnabled) logger.fatal(format("[ xx CRITICAL ]", message))
  def deb(message: String): Unit =
    if (logger.isDebugEnabled) logger.debug(format("[ ++ DEBUG ]", message))
}

package graft.tools

import java.util.concurrent.atomic.AtomicInteger

/** Counts ERROR events from Spark's codegen compiler (janino compile
  * failures → silent interpreted-eval fallback). Codegen failure is
  * invisible in results and only shows up as a multi-x slowdown, so both
  * Bench and the test suite watch for it explicitly. Attached to the
  * log4j2 root logger config programmatically (no config file needed);
  * filters by logger name in `append`. Idempotent. */
object CodegenWatch {
  val count = new AtomicInteger(0)
  @volatile private var installed = false

  def install(): Unit = synchronized {
    if (installed) return
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val appender = new AbstractAppender(
      "graft-codegen-counter", null, null, false, Property.EMPTY_ARRAY) {
      override def append(event: org.apache.logging.log4j.core.LogEvent)
          : Unit = {
        val name = event.getLoggerName
        if (event.getLevel.isMoreSpecificThan(Level.ERROR) &&
            name != null && name.contains("CodeGenerator"))
          count.incrementAndGet()
      }
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    cfg.addAppender(appender)
    cfg.getRootLogger.addAppender(appender, Level.ERROR, null)
    ctx.updateLoggers()
    installed = true
  }
}

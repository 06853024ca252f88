package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import graft.transform.Sanitize

/** K13 — alerting sink, the data-plane half of the reference's email
  * notifier (`core/configs/logs.py:268-316`): turn a (small, final)
  * result frame into a CSV attachment plus a subject/body, and deliver to
  * an outbox. SMTP transport is deployment configuration (and needs
  * egress); the reference's attachment construction
  * (`logs.py:153-202` — list-of-dicts → header + stringified rows) is
  * what the engine reproduces, via the same W6 stringification the export
  * path uses.
  *
  * Driver-side by design: alert payloads are human-sized. The row cap
  * guards against accidentally collecting a large frame.
  */
object Alert {

  val MaxRows = 10000

  /** Attachment content: header line + stringified rows (timestamps ISO,
    * nulls → "" — `logs.py:185-194` CSV shape). */
  def csvAttachment(df: DataFrame, maxRows: Int = MaxRows): String = {
    val s = Sanitize.stringifyForExport(df.limit(maxRows))
    val header = s.columns.mkString(",")
    val rows = s.collect().map(_.toSeq.map { v =>
      val cell = v.asInstanceOf[String]
      if (cell.exists(c => c == ',' || c == '"' || c == '\n'))
        "\"" + cell.replace("\"", "\"\"") + "\""
      else cell
    }.mkString(","))
    (header +: rows).mkString("\n")
  }

  /** Deliver an alert (subject + body + attachment) to a local outbox
    * directory — the zero-egress stand-in for the SMTP call
    * (`logs.py:222-243`). Returns the written file path. */
  def deliver(outboxDir: String, subject: String, body: String,
              attachment: Option[(String, String)] = None): String = {
    Files.createDirectories(Paths.get(outboxDir))
    val safe = Sanitize.sanitizeName(subject).take(60)
    val path = Paths.get(outboxDir, s"alert_$safe.txt")
    val content = new StringBuilder()
      .append(s"Subject: $subject\n\n").append(body).append("\n")
    attachment.foreach { case (name, data) =>
      content.append(s"\n--- attachment: $name ---\n").append(data)
        .append("\n")
    }
    Files.write(path, content.toString.getBytes(StandardCharsets.UTF_8))
    path.toString
  }

  /** The composed reference flow: result frame → CSV attachment → alert
    * (`logs.py:268-316`, incl. the `appended_rows` special payload which
    * is just a frame here). */
  def alertWithResult(outboxDir: String, subject: String, body: String,
                      result: DataFrame,
                      attachmentName: String = "result.csv"): String =
    deliver(outboxDir, subject, body,
      Some((attachmentName, csvAttachment(result))))
}

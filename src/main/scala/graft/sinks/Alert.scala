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

  // ------------------------- SMTP transport -------------------------
  // The transport half of the reference notifier
  // (`core/configs/logs.py:222-243` — send_message_via_smtp with
  // host/port/user/password/starttls config): a minimal RFC 5321 client
  // over a plain socket. Implemented rather than stubbed because the
  // protocol needs no cloud SDK and is fully testable against an
  // in-process server; errors PROPAGATE (the reference raises for the
  // caller to handle), and the outbox sink above stays the zero-config
  // default.

  /** Transport config — the same five keys the reference reads. */
  final case class SmtpConfig(host: String, port: Int = 587,
                              user: Option[String] = None,
                              password: Option[String] = None,
                              starttls: Boolean = true)

  /** Header/command sanitation: a subject or address built from data
    * rows must not be able to inject CRLF into the header block or the
    * SMTP dialogue (classic mail-header injection). Control characters
    * collapse to a space in header VALUES; addresses are validated
    * strictly because they are interpolated into MAIL/RCPT commands. */
  private def headerSafe(s: String): String =
    s.replaceAll("[\\r\\n\\p{Cntrl}]+", " ")

  private[graft] def requireAddress(a: String): String = {
    require(a.matches("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"),
      s"invalid email address: $a")
    a
  }

  /** RFC 822 message: headers + text body + optional base64 CSV
    * attachment as multipart/mixed (the EmailMessage.add_attachment
    * shape, `logs.py:204-220`). */
  def buildMessage(from: String, to: Seq[String], subject: String,
                   body: String,
                   attachment: Option[(String, String)] = None): String = {
    val b = new StringBuilder()
    b.append(s"From: ${requireAddress(from)}\r\n")
      .append(s"To: ${to.map(requireAddress).mkString(", ")}\r\n")
      .append(s"Subject: ${headerSafe(subject)}\r\n")
      .append("MIME-Version: 1.0\r\n")
    attachment match {
      case None =>
        b.append("Content-Type: text/plain; charset=utf-8\r\n\r\n")
          .append(body).append("\r\n")
      case Some((name, data)) =>
        val encoded = java.util.Base64.getMimeEncoder(76, "\r\n".getBytes)
          .encodeToString(data.getBytes(StandardCharsets.UTF_8))
        // The boundary must not occur in any enclosed part (a body that
        // quotes a previously generated message would otherwise corrupt
        // the multipart structure): re-derive with a counter until it is
        // absent from both body and attachment. The base64 alphabet has
        // no '-', so the encoded part can collide only across wrap
        // boundaries — checked anyway, it's one contains() call.
        val base = "graft-" + Integer.toHexString(
          (from + subject + name).hashCode)
        val boundary = (Iterator.single(base) ++
          Iterator.from(1).map(i => s"$base-$i"))
          .find(c => !body.contains(c) && !encoded.contains(c)).get
        b.append(s"""Content-Type: multipart/mixed; boundary="$boundary"""")
          .append("\r\n\r\n")
          .append(s"--$boundary\r\n")
          .append("Content-Type: text/plain; charset=utf-8\r\n\r\n")
          .append(body).append("\r\n")
          .append(s"--$boundary\r\n")
          .append(s"""Content-Type: text/csv; name="$name"""").append("\r\n")
          .append("Content-Transfer-Encoding: base64\r\n")
          .append(s"""Content-Disposition: attachment; filename="$name"""")
          .append("\r\n\r\n")
        encoded.split("\r\n").foreach(l => b.append(l).append("\r\n"))
        b.append(s"--$boundary--\r\n")
    }
    b.toString
  }

  /** Raised on a 4xx/5xx SMTP reply — carries the failing command. */
  final class SmtpException(cmd: String, reply: String)
    extends RuntimeException(s"SMTP error after $cmd: $reply")

  /** Send via SMTP (`logs.py:222-243` semantics): EHLO → STARTTLS when
    * requested (on ANY port — the reference gates it on 587, but
    * silently skipping TLS the caller asked for would push AUTH PLAIN
    * credentials over cleartext) → AUTH PLAIN when credentials are
    * present → MAIL FROM/RCPT TO/DATA → QUIT. DATA normalizes line
    * endings to CRLF and dot-stuffs leading periods per RFC 5321
    * §4.5.2. Connect and read timeouts mirror the reference's
    * `timeout=30`. Throws [[SmtpException]] on any non-2xx/3xx reply so
    * the caller can handle/log. */
  def sendViaSmtp(cfg: SmtpConfig, from: String, to: Seq[String],
                  message: String, timeoutMs: Int = 30000): Unit = {
    require(to.nonEmpty, "sendViaSmtp: empty recipient list")
    requireAddress(from); to.foreach(requireAddress)
    var socket: java.net.Socket = new java.net.Socket()
    socket.connect(
      new java.net.InetSocketAddress(cfg.host, cfg.port), timeoutMs)
    socket.setSoTimeout(timeoutMs)
    try {
      var in = new java.io.BufferedReader(
        new java.io.InputStreamReader(socket.getInputStream,
          StandardCharsets.US_ASCII))
      var out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(socket.getOutputStream,
          StandardCharsets.US_ASCII))
      // multi-line replies: "250-..." continues, "250 ..." ends
      def readReply(): String = {
        val first = in.readLine()
        if (first == null) throw new SmtpException("<read>", "connection closed")
        var last = first
        while (last != null && last.length >= 4 && last.charAt(3) == '-')
          last = in.readLine()
        if (last == null)
          throw new SmtpException("<read>", "connection closed mid-reply")
        first
      }
      def send(cmd: String, okPrefixes: Seq[Char] = Seq('2', '3')): String = {
        out.write(cmd + "\r\n"); out.flush()
        val r = readReply()
        if (r.isEmpty || !okPrefixes.contains(r.charAt(0)))
          throw new SmtpException(cmd.takeWhile(_ != ' '), r)
        r
      }
      readReply() // greeting
      send("EHLO graft")
      if (cfg.starttls) {
        send("STARTTLS")
        val tls = javax.net.ssl.SSLSocketFactory.getDefault
          .asInstanceOf[javax.net.ssl.SSLSocketFactory]
          .createSocket(socket, cfg.host, cfg.port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        // Without endpoint identification the JSSE default verifies the
        // chain but NOT that the certificate matches cfg.host — any
        // valid cert would let a MITM capture the AUTH PLAIN token,
        // defeating the reason TLS is forced on all ports above.
        val params = tls.getSSLParameters
        params.setEndpointIdentificationAlgorithm("HTTPS")
        tls.setSSLParameters(params)
        tls.startHandshake()
        socket = tls
        socket.setSoTimeout(timeoutMs)
        in = new java.io.BufferedReader(new java.io.InputStreamReader(
          socket.getInputStream, StandardCharsets.US_ASCII))
        out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          socket.getOutputStream, StandardCharsets.US_ASCII))
        send("EHLO graft")
      }
      (cfg.user, cfg.password) match {
        case (Some(u), Some(p)) =>
          // SASL PLAIN: NUL authzid NUL authcid NUL passwd (RFC 4616)
          val token = java.util.Base64.getEncoder.encodeToString(
            s"\u0000$u\u0000$p".getBytes(StandardCharsets.UTF_8))
          send(s"AUTH PLAIN $token")
        case _ => ()
      }
      send(s"MAIL FROM:<$from>")
      to.foreach(r => send(s"RCPT TO:<$r>"))
      send("DATA")
      // normalize CRLF/LF/CR to CRLF first: a '.' line after a bare LF
      // would otherwise escape stuffing and truncate the message on
      // lenient servers
      val stuffed = message.split("\r\n|\n|\r", -1).map { l =>
        if (l.startsWith(".")) "." + l else l
      }.mkString("\r\n")
      out.write(stuffed)
      if (!stuffed.endsWith("\r\n")) out.write("\r\n")
      send(".")
      send("QUIT")
    } finally socket.close()
  }

  /** Composed flow with a real transport: frame → attachment → message →
    * SMTP. The outbox variant ([[alertWithResult]]) remains the
    * zero-egress default. */
  def alertViaSmtp(cfg: SmtpConfig, from: String, to: Seq[String],
                   subject: String, body: String, result: DataFrame,
                   attachmentName: String = "result.csv"): Unit =
    sendViaSmtp(cfg, from, to,
      buildMessage(from, to, subject, body,
        Some((attachmentName, csvAttachment(result)))))
}

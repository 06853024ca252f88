package graft

import java.nio.file.{Files, Paths}

import graft.sinks.Alert

/** K13 alert sink: CSV attachment shape + outbox delivery. */
class AlertSpec extends SparkSpec {

  test("csvAttachment: header + stringified rows, quoting where needed") {
    import spark.implicits._
    val df = Seq((1L, "plain"), (2L, "has,comma"), (3L, "has\"quote"))
      .toDF("id", "v")
    val att = Alert.csvAttachment(df.orderBy("id"))
    val lines = att.split("\n")
    assert(lines(0) == "id,v")
    assert(lines(1) == "1,plain")
    assert(lines(2) == "2,\"has,comma\"")
    assert(lines(3) == "3,\"has\"\"quote\"")
  }

  test("alertWithResult writes subject, body, and attachment to the outbox") {
    import spark.implicits._
    val outbox = Files.createTempDirectory("graft_outbox").toString
    val df = Seq((1L, "r1")).toDF("id", "v")
    val path = Alert.alertWithResult(outbox, "Daily load OK",
      "rows appended: 1", df)
    val content = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    assert(content.contains("Subject: Daily load OK"))
    assert(content.contains("rows appended: 1"))
    assert(content.contains("--- attachment: result.csv ---"))
    assert(content.contains("1,r1"))
  }

  test("csvAttachment caps collected rows") {
    val big = spark.range(20000).toDF("id")
    val att = Alert.csvAttachment(big, maxRows = 100)
    assert(att.split("\n").length == 101)
  }

  test("buildMessage: multipart with base64 CSV attachment round-trips") {
    val msg = Alert.buildMessage("a@x.test", Seq("b@x.test"), "Subj",
      "body text", Some(("r.csv", "id,v\n1,x")))
    assert(msg.contains("From: a@x.test\r\n"))
    assert(msg.contains("Subject: Subj\r\n"))
    assert(msg.contains("multipart/mixed"))
    val b64 = msg.split("\r\n")
      .dropWhile(!_.startsWith("Content-Disposition")).drop(2)
      .takeWhile(l => l.nonEmpty && !l.startsWith("--")).mkString
    assert(new String(java.util.Base64.getMimeDecoder.decode(b64),
      "UTF-8") == "id,v\n1,x")
  }

  test("buildMessage: boundary re-derives when the body contains it") {
    // A body quoting a previously generated message carries the default
    // boundary delimiter line — the chosen boundary must avoid it or the
    // multipart structure is corrupted.
    val base = "graft-" + Integer.toHexString(
      ("a@x.test" + "Subj" + "r.csv").hashCode)
    val body = s"quoted old message:\r\n--$base\r\nold part"
    val msg = Alert.buildMessage("a@x.test", Seq("b@x.test"), "Subj",
      body, Some(("r.csv", "id\n1")))
    val boundary = msg.split("\r\n")
      .find(_.contains("boundary=")).get
      .split("boundary=\"")(1).stripSuffix("\"")
    assert(boundary != base)
    assert(!body.contains(boundary))
    // the closing delimiter exists and is unambiguous
    assert(msg.contains(s"--$boundary--\r\n"))
  }

  /** One-shot in-process SMTP server: records the dialogue, replies per
    * command, optionally rejects RCPT with 550. */
  private class FakeSmtp(rejectRcpt: Boolean = false) {
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val port: Int = server.getLocalPort
    val commands = scala.collection.mutable.ArrayBuffer.empty[String]
    val data = new StringBuilder
    val thread = new Thread(() => {
      val s = server.accept()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, "US-ASCII"))
      val out = new java.io.PrintWriter(s.getOutputStream, true)
      def reply(r: String): Unit = { out.print(r + "\r\n"); out.flush() }
      reply("220 fake ESMTP")
      var inData = false
      var done = false
      var line = in.readLine()
      while (!done && line != null) {
        if (inData) {
          if (line == ".") { inData = false; reply("250 queued") }
          else data.append(line.stripPrefix(".")).append("\n")
        } else {
          commands += line
          val cmd = line.toUpperCase
          if (cmd.startsWith("EHLO")) { out.print("250-fake\r\n"); reply("250 OK") }
          else if (cmd.startsWith("AUTH")) reply("235 ok")
          else if (cmd.startsWith("RCPT") && rejectRcpt) reply("550 no such user")
          else if (cmd.startsWith("DATA")) { inData = true; reply("354 go") }
          else if (cmd.startsWith("QUIT")) {
            reply("221 bye"); s.close(); server.close(); done = true
          } else reply("250 ok")
        }
        if (!done) line = in.readLine()
      }
    })
    thread.setDaemon(true); thread.start()
  }

  test("sendViaSmtp: full dialogue with auth, dot-stuffing, attachment body") {
    val srv = new FakeSmtp()
    val msg = Alert.buildMessage("a@x.test", Seq("b@x.test", "c@x.test"),
      "S", ".leading dot line", None)
    Alert.sendViaSmtp(
      Alert.SmtpConfig("127.0.0.1", srv.port, Some("u"), Some("pw"),
        starttls = false),
      "a@x.test", Seq("b@x.test", "c@x.test"), msg)
    srv.thread.join(5000)
    val cmds = srv.commands.toSeq
    assert(cmds.head.startsWith("EHLO"))
    assert(cmds.exists(_.startsWith("AUTH PLAIN ")))
    assert(cmds.contains("MAIL FROM:<a@x.test>"))
    assert(cmds.contains("RCPT TO:<b@x.test>"))
    assert(cmds.contains("RCPT TO:<c@x.test>"))
    // dot-stuffed on the wire, un-stuffed by the server on receipt
    assert(srv.data.toString.contains(".leading dot line"))
    val authB64 = cmds.find(_.startsWith("AUTH PLAIN "))
      .get.stripPrefix("AUTH PLAIN ")
    assert(new String(java.util.Base64.getDecoder.decode(authB64),
      "UTF-8") == "\u0000u\u0000pw")
  }

  test("header injection is neutralized: CRLF subjects collapse, bad addresses raise") {
    val msg = Alert.buildMessage("a@x.test", Seq("b@x.test"),
      "Report\r\nBcc: attacker@evil.test", "body", None)
    // the CRLF collapsed: the would-be Bcc header is inert subject TEXT
    // on the Subject line, not a header line of its own
    assert(!msg.contains("\r\nBcc:"))
    assert(msg.contains("Subject: Report Bcc: attacker@evil.test\r\n"))
    intercept[IllegalArgumentException] {
      Alert.buildMessage("a@x.test>\r\nDATA", Seq("b@x.test"), "s", "b", None)
    }
    intercept[IllegalArgumentException] {
      Alert.sendViaSmtp(Alert.SmtpConfig("127.0.0.1", 1, starttls = false),
        "a@x.test", Seq("evil>\r\nRCPT TO:<other@x.test"), "m")
    }
  }

  test("bare-LF dot lines are stuffed (line endings normalized to CRLF)") {
    val srv = new FakeSmtp()
    Alert.sendViaSmtp(
      Alert.SmtpConfig("127.0.0.1", srv.port, starttls = false),
      "a@x.test", Seq("b@x.test"),
      "Subject: s\r\n\r\nbefore\n.\nafter\r\n")
    srv.thread.join(5000)
    // the lone '.' line arrived as data (server un-stuffs), not as EOD
    assert(srv.data.toString.contains("before\n.\nafter"))
  }

  test("sendViaSmtp raises on a 5xx reply (reference: caller handles)") {
    val srv = new FakeSmtp(rejectRcpt = true)
    val ex = intercept[Alert.SmtpException] {
      Alert.sendViaSmtp(
        Alert.SmtpConfig("127.0.0.1", srv.port, None, None,
          starttls = false),
        "a@x.test", Seq("nobody@x.test"), "Subject: s\r\n\r\nbody\r\n")
    }
    assert(ex.getMessage.contains("550"))
  }
}

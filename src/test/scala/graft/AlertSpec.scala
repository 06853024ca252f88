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
}

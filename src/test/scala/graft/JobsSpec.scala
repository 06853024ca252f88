package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.jobs.{DedupeJob, IngestJob, LoadJob, ProfileJob}

/** The orchestrated pipeline stages (airflow/dags/graft_pipeline_dag.py)
  * chained exactly as the DAG chains them — parquet-path handoff between
  * stages — plus a python-syntax check of the DAG file itself. */
class JobsSpec extends SparkSpec {

  private val ws = s"/tmp/graft_jobs_${System.nanoTime()}"

  test("ingest → profile → dedupe → load chains via parquet paths") {
    import spark.implicits._
    // Stage 0: a csv landing file (';' delimiter → exercises sniffing).
    val docs = graft.engine.Engine.table(spark, fixtureDir, "documents")
      .select(col("doc_id"), col("text"))
    // ".csv" suffix on the landing DIRECTORY: loadFromFile dispatches on
    // extension, and spark.read.csv accepts a directory of part files.
    val csvIn = s"$ws/incoming.csv"
    docs.coalesce(1).write.option("delimiter", ";").option("header", "true")
      .csv(csvIn)

    IngestJob.run(spark, Array(csvIn, s"$ws/run/documents", "replace"))
    ProfileJob.run(spark, Array(s"$ws/run/documents", s"$ws/run/profile"))
    DedupeJob.run(spark,
      Array(s"$ws/run/documents", s"$ws/run/deduped", "doc_id", "text",
        "0.85"))
    LoadJob.run(spark,
      Array(s"$ws/run/deduped", s"$ws/warehouse/documents", "replace"))

    val n = docs.count()
    val loaded = spark.read.parquet(s"$ws/warehouse/documents")
    assert(loaded.count() > 0 && loaded.count() <= n)
    assert(loaded.columns.toSet == Set("doc_id", "text"))
    val prof = spark.read.parquet(s"$ws/run/profile")
    assert(prof.select("column").collect().map(_.getString(0)).toSet
      .contains("text"))
  }

  test("ingest raises on empty/unreadable input (DAG retry contract)") {
    intercept[RuntimeException] {
      IngestJob.run(spark, Array(s"$ws/nonexistent.csv", s"$ws/x", "replace"))
    }
  }

  test("the DAG file is syntactically valid python") {
    val dag = "airflow/dags/graft_pipeline_dag.py"
    assert(Files.exists(Paths.get(dag)), s"missing $dag")
    val rc = new ProcessBuilder("python3", "-m", "py_compile", dag)
      .inheritIO().start().waitFor()
    assert(rc == 0, s"py_compile failed for $dag")
  }
}

"""Orchestration skeleton for the graft Spark engine.

Mirrors the reference's DAG conventions (daily schedule, 1 retry with a
5-minute delay, catchup off — core/airflow/dags/data_capture/
wikipedia_dag.py:16-29) but each task is a spark-submit of one graft job
main, and tasks hand off through parquet paths (W8): a stage's output
path is the next stage's input argument. No XCom payloads — paths are
deterministic per run via the logical date, so any stage can be re-run
in isolation and a 100 TB intermediate never touches the scheduler.

Deploy notes:
  - GRAFT_JAR: the assembled graft jar (sbt package output).
  - spark-submit master/executor sizing comes from the Spark connection
    configured in Airflow (`conn_id="spark_default"`), not from code.
  - The pipeline is the reference's extract -> profile -> load shape
    (SURVEY §3.2) plus the corpus-dedupe stage a training-data pipeline
    needs between extract and load.
"""

from datetime import datetime, timedelta
import os

from airflow import DAG
from airflow.operators.bash import BashOperator
from airflow.providers.apache.spark.operators.spark_submit import (
    SparkSubmitOperator,
)

GRAFT_JAR = os.environ.get(
    "GRAFT_JAR", "/opt/graft/neulix_datahubspark_2.13-0.1.0.jar")
DATA_ROOT = os.environ.get("GRAFT_DATA_ROOT", "/data/graft")

# Per-run workspace keyed by the logical date: stage N writes here, stage
# N+1 reads — the parquet-path handoff (W8).
RUN_DIR = DATA_ROOT + "/runs/{{ ds }}"

default_args = {
    "owner": "graft",
    "retries": 1,
    "retry_delay": timedelta(minutes=5),
}


def spark_task(task_id: str, klass: str, args: list) -> SparkSubmitOperator:
    return SparkSubmitOperator(
        task_id=task_id,
        application=GRAFT_JAR,
        java_class=klass,
        application_args=args,
        conn_id="spark_default",
        conf={
            # AQE owns runtime re-planning at cluster scale; shuffle
            # partition count adapts per-stage from these starting points.
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
        },
    )


with DAG(
    "graft_pipeline",
    default_args=default_args,
    description="graft extract -> profile -> dedupe -> load pipeline",
    schedule=timedelta(days=1),
    start_date=datetime(2023, 1, 1),
    catchup=False,
    # incremental_dedupe mutates SHARED durable state (state/neardup
    # index + labels): overlapping runs would race the append/replace —
    # last writer wins and the loser's label merge is silently lost.
    # Cross-run state requires serialized runs.
    max_active_runs=1,
) as dag:
    # For continuously-landing directories, swap IngestJob for
    # graft.jobs.IncrementalIngestJob (streaming file source +
    # AvailableNow + checkpoint): each daily run then appends only the
    # files that arrived since the previous run.
    ingest = spark_task(
        "ingest",
        "graft.jobs.IngestJob",
        [DATA_ROOT + "/incoming/documents.csv", RUN_DIR + "/documents",
         "replace"],
    )
    # S9 web-ingest pair: `crawl` runs the Selenium spiders driver-side
    # (the reference's base_spider.py shape) and records a JSON-lines
    # manifest {url, path, fetched_at} as pages land under
    # incoming/scraped/; `scrape_ingest` then turns manifest + landed
    # files into a parquet table through the graft-scrape DSv2 source
    # (executors read the page files, the driver only the manifest).
    crawl = BashOperator(
        task_id="crawl",
        bash_command=(
            "python -m spiders.run_crawl "
            + DATA_ROOT + "/incoming/scraped "
            + DATA_ROOT + "/incoming/scraped/manifest.jsonl"
        ),
    )
    scrape_ingest = spark_task(
        "scrape_ingest",
        "graft.jobs.ScrapeIngestJob",
        [DATA_ROOT + "/incoming/scraped/manifest.jsonl",
         RUN_DIR + "/scraped_pages", "replace"],
    )
    profile = spark_task(
        "profile",
        "graft.jobs.ProfileJob",
        [RUN_DIR + "/documents", RUN_DIR + "/profile"],
    )
    # Hard gate: the task FAILS (non-zero exit -> retry/alert) when any
    # rule is violated; the report parquet survives either way.
    quality_gate = spark_task(
        "quality_gate",
        "graft.jobs.QualityGateJob",
        [RUN_DIR + "/documents", RUN_DIR + "/quality_report",
         "not_null:doc_id;not_null:text;non_negative:n_chars",
         "doc_id"],
    )
    dedupe = spark_task(
        "dedupe",
        "graft.jobs.DedupeJob",
        [RUN_DIR + "/documents", RUN_DIR + "/deduped", "doc_id", "text",
         "0.85"],
    )
    # Deterministic md5-bucket split: same doc lands in the same split
    # on every run, so the warehouse's test set never drifts.
    split = spark_task(
        "split",
        "graft.jobs.SplitJob",
        [RUN_DIR + "/novel", RUN_DIR + "/split", "doc_id",
         "0.05", "0.05"],
    )
    load = spark_task(
        "load",
        "graft.jobs.LoadJob",
        [RUN_DIR + "/split", DATA_ROOT + "/warehouse/documents",
         "replace"],
    )
    # The r12 composed alternative to the dedupe -> split chain: ONE
    # CurationJob task runs quarantine -> langid -> repetition -> exact
    # + near-dup dedup -> decontamination -> NB/LM quality gates ->
    # split and emits BOTH the per-document disposition table (audit
    # trail: every input row, first failing stage or split) and the
    # curated corpus. Informational here next to the step-by-step
    # chain; a deployment picks one or the other.
    curate = spark_task(
        "curate",
        "graft.jobs.CurationJob",
        [RUN_DIR + "/documents", RUN_DIR + "/curation_disposition",
         RUN_DIR + "/curated", "doc_id", "text",
         "not_null:text;non_negative:n_chars", "en",
         DATA_ROOT + "/benchmarks/eval_set",
         "0.65", "0.06", "0.8"],
    )

    # The r13 daily-cadence state closer: gate the day's batch against
    # the PERSISTED near-dup archive (index + component labels live
    # OUTSIDE the per-run dir — they accumulate across days), append
    # the batch's index rows, persist merged labels, land the kept rows.
    # Day 1 bootstraps from the missing state paths. This is the
    # cross-run near-dup sibling of the in-run `dedupe` stage: `dedupe`
    # collapses duplicates WITHIN a day, `incremental_dedupe` drops
    # re-crawls of anything EVER seen and keeps the archive clustering
    # current without re-clustering history.
    incremental_dedupe = spark_task(
        "incremental_dedupe",
        "graft.jobs.IncrementalDedupJob",
        [RUN_DIR + "/deduped", DATA_ROOT + "/state/neardup",
         RUN_DIR + "/novel", "doc_id", "text",
         "2", "64", "16", "0.85"],
    )

    # Physical layout rewrite of the loaded warehouse table: Z-order
    # cluster on the two hottest filter keys so every parquet file's
    # footer carries tight min/max on BOTH — the lakehouse
    # `OPTIMIZE ZORDER BY` step as a stage. Runs after load; readers
    # see the same rows, only the file boundaries change.
    layout = spark_task(
        "layout",
        "graft.jobs.LayoutJob",
        [DATA_ROOT + "/warehouse/documents",
         DATA_ROOT + "/warehouse/documents_clustered",
         "doc_id", "n_chars", "8", "64", "zorder"],
    )

    # Persisted ANN index over the loaded embedding table
    # (AnnIndexJob, mode=append): day 1 trains the sampled quantizer
    # and encodes the corpus; every later day append-encodes only
    # UNSEEN rows against the frozen quantizer (anti-join — retries
    # never double-append) — downstream similarity queries search off
    # the loaded tables instead of re-paying the encode pass per
    # session, and retraining happens only through an explicit param
    # change. Same durable-state discipline as incremental_dedupe.
    ann_index = spark_task(
        "ann_index",
        "graft.jobs.AnnIndexJob",
        [DATA_ROOT + "/warehouse/embeddings",
         DATA_ROOT + "/state/ann_index",
         "vec_id", "embedding", "64", "16", "4", "16", "{{ ds }}",
         "append"],
    )

    # Profile runs informationally in parallel; the data path is gated:
    # nothing downstream starts until the quality rules pass.
    ingest >> [profile, quality_gate]
    crawl >> scrape_ingest >> quality_gate
    quality_gate >> dedupe >> incremental_dedupe >> split >> load
    load >> ann_index >> layout
    quality_gate >> curate


with DAG(
    "graft_stream_ingest",
    default_args=default_args,
    description="streaming LLM-ingest: quarantine -> decontaminate -> "
                "blocklist -> split -> keyed upsert",
    schedule=timedelta(hours=1),
    start_date=datetime(2023, 1, 1),
    catchup=False,
    max_active_runs=1,  # one AvailableNow drain at a time per checkpoint
) as stream_dag:
    # The single-task streaming twin of the batch pipeline above
    # (graft.jobs.StreamIngestJob): each hourly run drains the landing
    # directory through the stream-safe stages with AvailableNow, then
    # exits — the checkpointed offset log makes re-runs incremental and
    # the per-key upsert makes replays idempotent. Quarantined rows land
    # in an append-only parquet side channel with their violation lists.
    spark_task(
        "stream_ingest",
        "graft.jobs.StreamIngestJob",
        [DATA_ROOT + "/landing/documents",
         "doc_id LONG, text STRING",
         "doc_id", "text",
         "not_null:text;non_negative:doc_id",
         DATA_ROOT + "/benchmarks/eval_set",
         DATA_ROOT + "/config/blocked_phrases.txt",
         DATA_ROOT + "/warehouse/documents_store",
         DATA_ROOT + "/quarantine/documents",
         DATA_ROOT + "/checkpoints/stream_ingest"],
    )

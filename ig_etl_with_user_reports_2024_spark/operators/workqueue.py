"""Incremental work-queue operators (SURVEY.md §2.10, S1/S7/J1).

The reference's scraper maintains a restartable queue: urls in
``input.csv`` minus ``inputdone.csv`` (anti-join J1), and a per-item
commit that appends to the done-file and rewrites the input file
(insta_scraper_enhanced.py:363-393). The Spark re-expression is an
idempotent BATCH commit: recompute pending = input ∖ done and atomically
overwrite both files — re-running after a crash converges to the same
state (the property the reference gets from its per-item file writes).

For a true streaming queue, Structured Streaming's file source +
checkpoint gives the same semantics (streaming/events.py shows the
surface); at the reference's scale the batch anti-join is the right
plan and at 100 TB the anti-join broadcast-hashes the done side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def normalize_url(url) -> F.Column:
    """strip() + rstrip('/') (insta_scraper_enhanced.py:139-142) plus the
    query-suffix trim the loader applies (:492-497)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_replace(F.regexp_replace(F.trim(c), r"\?.*$", ""), r"/+$", "")


def pending_urls(inputs: DataFrame, done: DataFrame) -> DataFrame:
    """J1 — urls not yet processed (left anti on the normalized url)."""
    i = inputs.select(normalize_url("url").alias("norm_url"), "url")
    d = done.select(normalize_url("url").alias("norm_url")).distinct()
    return i.join(d, "norm_url", "left_anti").select("url").distinct()


def commit_batch(
    spark: SparkSession,
    input_path: str,
    done_path: str,
    processed: DataFrame,
) -> None:
    """S7 — idempotent queue commit: done ← done ∪ processed,
    input ← input ∖ done. Overwrite-with-staging so a crash mid-commit
    leaves a consistent pair (the reference's append+rewrite, made
    atomic per file)."""
    from .windows import top_k_per_group  # noqa: F401  (doc cross-ref)

    inputs = spark.read.option("header", True).schema("url string").csv(input_path)
    try:
        done = spark.read.option("header", True).schema("url string").csv(done_path)
    except Exception:  # noqa: BLE001 — first run: no done-file yet
        done = spark.createDataFrame([], "url string")
    new_done = (
        done.select(normalize_url("url").alias("norm_url"))
        .unionByName(processed.select(normalize_url("url").alias("norm_url")))
        .distinct()
        .select(F.col("norm_url").alias("url"))
    )
    remaining = pending_urls(inputs, new_done)
    # collect-and-rewrite is fine at queue scale (a url list, not data);
    # the atomicity comes from writing complete files
    # sorted output → byte-identical files on re-commit (idempotence you
    # can diff). Guard the assumption: the queue is metadata-sized BY
    # CONSTRUCTION (reference work queues are 10^2-10^5 urls); if a
    # caller ever points this at a data-sized table, fail loudly instead
    # of OOMing the driver.
    _QUEUE_ROW_CAP = 10_000_000
    # BOTH collected sides need the cap: early in a backlog `remaining`
    # (input ∖ done) is the larger set, so guarding only new_done would
    # still OOM the driver through the second collect below.
    for side_name, side in (("done", new_done), ("remaining", remaining)):
        if side.limit(_QUEUE_ROW_CAP + 1).count() > _QUEUE_ROW_CAP:
            raise ValueError(
                f"work queue `{side_name}` side exceeds {_QUEUE_ROW_CAP} "
                "urls — commit_batch collects the queue to the driver and "
                "is only meant for metadata-sized queues; shard the queue "
                "or use a table sink"
            )
    new_done_rows = new_done.orderBy("url").collect()
    remaining_rows = remaining.orderBy("url").collect()
    import csv
    import os

    # the staging that makes the docstring's atomicity claim true: write
    # the complete file NEXT TO the target, fsync, then os.replace (an
    # atomic rename on POSIX) — a crash mid-write leaves the old file
    # intact, never a truncated queue. done commits BEFORE input shrinks,
    # so the worst crash window only re-processes (idempotent), never
    # loses pending urls.
    for path, rows in ((done_path, new_done_rows), (input_path, remaining_rows)):
        tmp = path + ".staging"
        with open(tmp, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["url"])
            for r in rows:
                w.writerow([r.url])
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)
        # fsync the parent directory too: the replace() rename is only
        # durable once the directory entry itself is on disk — without
        # this a power loss right after commit could resurface the old
        # queue file (old-or-new still holds; this pins it to "new").
        dfd = os.open(os.path.dirname(os.path.abspath(path)) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

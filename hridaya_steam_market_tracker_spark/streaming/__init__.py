"""Structured-Streaming plane (SURVEY.md §J).

The reference's ingestion/push machinery re-expressed Spark-first:

* ratelimiter  — J1 sliding-window token log (source-adapter throttle)
* scheduler    — J2/J4/J5 urgency polling + per-key exponential backoff
* ingest       — J6 watermark + dropDuplicates exactly-once append
* push         — J9/J10 subscription-routed foreachBatch fan-out
* reconcile    — J7/J8 debounced desired-state reconciliation

The fetcher-side pieces (rate limiter, scheduler) are driver-side by
design — they throttle an external HTTP source, which is inherently a
source-adapter concern (Spark's own sources expose the same knob as
maxOffsetsPerTrigger). Everything after the source is a distributed
streaming DataFrame program.
"""

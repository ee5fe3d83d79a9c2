"""Process supervision — the reference's launcher re-expressed for one
Spark driver.

The reference launcher (launcher.py:16-44) starts the API server, waits
for it to listen, starts the worker daemon, then monitors both: if
either exits unexpectedly the whole system is torn down, and SIGINT
triggers terminate-then-wait cleanup of every child.

A Spark deployment has ONE driver JVM owning the SparkSession, so the
faithful analog is threads sharing that session rather than subprocesses
each paying a full Spark startup: the API front door (pipeline/api.py)
serves from its own thread pool, and the worker poll loop
(jobs.run_pending_jobs) runs in a supervised thread.  The launcher
semantics carry over one-to-one:

* ordered startup with a REAL readiness check (poll ``GET /health``
  instead of the reference's fixed ``time.sleep(2)``),
* a monitor loop that tears everything down when a component dies,
* idempotent terminate-and-join shutdown on stop()/SIGINT.
"""

from __future__ import annotations

import threading
import time
import urllib.error
import urllib.request
from typing import Any

from pyspark.sql import SparkSession

from data_integration_system_spark.pipeline.api import JobApiServer
from data_integration_system_spark.pipeline.fetch import (
    FetchFn,
    default_http_fetch,
)
from data_integration_system_spark.pipeline.jobs import run_pending_jobs


class Supervisor:
    """Run the job system — HTTP front door + worker poll loop — under
    one monitor, sharing one SparkSession.

    ``start()`` brings the API up, confirms readiness, then starts the
    worker; ``stop()`` (or a dead component noticed by ``monitor()``)
    tears both down in reverse order.  Worker-loop crashes are captured
    in ``worker_error`` — job failures themselves never crash the loop
    (run_job returns FAILED reports; errors are data)."""

    def __init__(
        self,
        spark: SparkSession,
        jobs_path: str,
        output_root: str,
        fetch_fn: FetchFn = default_http_fetch,
        poll_interval: float = 1.0,
        host: str = "127.0.0.1",
        port: int = 0,
        claim_batch: int = 10,
        worker: str = "poll",
    ) -> None:
        if worker not in ("poll", "stream"):
            raise ValueError(f"worker must be 'poll' or 'stream', got {worker!r}")
        self._spark = spark
        self._jobs_path = jobs_path
        self._output_root = output_root
        self._fetch_fn = fetch_fn
        self._poll_interval = poll_interval
        self._claim_batch = claim_batch
        #: "poll" = thread loop over run_pending_jobs (reports collected
        #: in-process); "stream" = streaming.jobs.job_worker_stream (the
        #: reference daemon as a Structured Streaming query — job
        #: outcomes live on the jobs log, self.reports stays empty)
        self._worker_mode = worker
        self.api = JobApiServer(spark, jobs_path, host=host, port=port)
        self._stop = threading.Event()
        self._worker: threading.Thread | None = None
        self._stream_q = None
        self.worker_error: BaseException | None = None
        self.reports: list[dict[str, Any]] = []

    # -- components ------------------------------------------------------

    def _worker_loop(self) -> None:
        from pyspark.errors import AnalysisException

        while not self._stop.is_set():
            try:
                self.reports.extend(
                    run_pending_jobs(
                        self._spark,
                        self._jobs_path,
                        self._output_root,
                        fetch_fn=self._fetch_fn,
                        limit=self._claim_batch,
                    )
                )
            except AnalysisException:
                pass  # no jobs log yet — an empty queue, not a failure
            except BaseException as e:  # noqa: BLE001 — surfaced to monitor
                self.worker_error = e
                return
            self._stop.wait(self._poll_interval)

    def _wait_ready(self, timeout: float = 10.0) -> None:
        deadline = time.monotonic() + timeout
        url = f"{self.api.address}/health"
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(url, timeout=1) as resp:
                    if resp.status == 200:
                        return
            except (urllib.error.URLError, OSError):
                pass
            time.sleep(0.05)
        raise TimeoutError(f"API did not become ready at {url}")

    # -- lifecycle -------------------------------------------------------

    def start(self) -> str:
        """Ordered startup: API -> readiness -> worker.  Returns the API
        base address."""
        self.api.start()
        try:
            self._wait_ready()
        except TimeoutError:
            self.api.stop()
            raise
        if self._worker_mode == "stream":
            from data_integration_system_spark.streaming.jobs import (
                job_worker_stream,
            )

            try:
                self._stream_q = job_worker_stream(
                    self._spark,
                    self._jobs_path,
                    self._output_root,
                    fetch_fn=self._fetch_fn,
                    trigger={"processingTime": f"{self._poll_interval} seconds"},
                )
            except BaseException:
                # same contract as the readiness-timeout path: a failed
                # component startup must not leak a listening API that
                # accepts submits no worker will ever claim
                self.api.stop()
                raise
        else:
            self._worker = threading.Thread(
                target=self._worker_loop, name="job-worker", daemon=True
            )
            self._worker.start()
        return self.api.address

    def healthy(self) -> bool:
        if not self.api.is_alive():
            return False
        if self._worker_mode == "stream":
            return self._stream_q is not None and self._stream_q.isActive
        return self._worker is not None and self._worker.is_alive()

    def monitor(self, check_interval: float = 0.5) -> None:
        """The launcher's watch loop: block until stop() is called from
        another thread (the SIGINT path) or a component dies, then tear
        the system down.  A worker crash re-raises its exception after
        cleanup, mirroring the reference's nonzero-exit propagation."""
        try:
            while not self._stop.is_set() and self.healthy():
                self._stop.wait(check_interval)
        finally:
            self.stop()
        if self.worker_error is not None:
            raise self.worker_error

    def stop(self) -> None:
        """Reverse-order, idempotent teardown: stop claiming new work,
        join the worker (lets an in-flight job finish its status write),
        then close the listener."""
        self._stop.set()
        if self._worker is not None:
            self._worker.join(timeout=60)
            self._worker = None
        if self._stream_q is not None:
            try:
                if self.worker_error is None and self._stream_q.exception():
                    self.worker_error = self._stream_q.exception()
            except Exception:  # noqa: BLE001 — a dead gateway must not block teardown
                pass
            self._stream_q.stop()
            self._stream_q = None
        self.api.stop()


def run_system(
    spark: SparkSession,
    jobs_path: str,
    output_root: str,
    **kwargs: Any,
) -> None:
    """The ``python -m``-style entrypoint (reference launcher.py:66-69):
    start the system, install a SIGINT-to-stop handler, and watch until
    shutdown."""
    import signal

    sup = Supervisor(spark, jobs_path, output_root, **kwargs)
    sup.start()
    prev = signal.signal(signal.SIGINT, lambda *_: sup.stop())
    try:
        sup.monitor()
    finally:
        signal.signal(signal.SIGINT, prev)

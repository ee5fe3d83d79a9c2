"""HTTP front door — the reference's job-submission service re-expressed
over the parquet jobs log.

The reference exposes ``POST /jobs`` as a FastAPI app (api/main.py:44-78)
that validates a CreateJobRequest, derives root_domain, packs the
non-None options into a ``config`` JSON, INSERTs a PENDING row, and
returns ``{"job_id", "status"}``.  Here the same contract is served by a
stdlib ``ThreadingHTTPServer`` whose handlers delegate to the library
front door (jobs.submit_job / jobs.current_jobs) — validation, option
packing, and root-domain semantics live in ONE place, and the network
layer adds only transport:

* ``POST /jobs``      -> submit_job, 200 ``{"job_id": ..., "status": "PENDING"}``
* ``GET /jobs``       -> newest-first job states, capped at ``?limit=N``
  (default 100, max 1000) so the listing stays bounded as the log grows
* ``GET /jobs/{id}``  -> one job's present state, 404 when unknown
* ``GET /health``     -> liveness probe (the launcher's readiness check)

Errors use FastAPI's response shape (``{"detail": ...}``, 400/404/405)
so a reference client's error handling ports unchanged.

Scale note: the service is a control plane — requests/sec is bounded by
human and agent job submission, not data volume, so driver-side handling
is correct (the DATA plane stays distributed; a submit appends one row).
Log-append serialization (concurrent Spark writes to one parquet path
race on the _temporary staging dir) lives in jobs._LOG_LOCK, shared
with the worker's status writes — not here, where it would cover only
submit-vs-submit.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import SparkSession

from data_integration_system_spark.pipeline.jobs import current_jobs, submit_job

#: request bodies above this are rejected with 413 — a job request is a
#: small option dict; anything bigger is a client error, not a job
_MAX_BODY_BYTES = 1 << 20

#: GET /jobs caps its listing server-side (override per-request with
#: ?limit=N, itself capped) so a dashboard polling a long-lived queue
#: can't drag the whole log through the driver
_DEFAULT_LIST_LIMIT = 100
_MAX_LIST_LIMIT = 1000


def _job_row_dict(row) -> dict[str, Any]:
    return {
        "job_id": row["job_id"],
        "start_url": row["start_url"],
        "root_domain": row["root_domain"],
        "config": json.loads(row["config"]) if row["config"] else {},
        "status": row["status"],
        "error": row["error"],
        "created_at": row["created_at"].isoformat(sep=" "),
    }


class JobApiServer:
    """Threaded HTTP front door over a jobs log.

    ``port=0`` binds an ephemeral port (the bound port is returned by
    ``start()`` and exposed as ``.port``) so tests and co-located
    services never collide.  ``stop()`` is idempotent and joins the
    serving thread — the launcher's clean-shutdown contract.
    """

    def __init__(
        self,
        spark: SparkSession,
        jobs_path: str,
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        self._spark = spark
        self._jobs_path = jobs_path
        self._host = host
        self._requested_port = port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- request handling ------------------------------------------------

    def _handle_post_jobs(self, body: bytes) -> tuple[int, dict[str, Any]]:
        try:
            request = json.loads(body.decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError):
            return 400, {"detail": "request body must be a JSON object"}
        if not isinstance(request, dict):
            return 400, {"detail": "request body must be a JSON object"}
        try:
            job_id = submit_job(self._spark, self._jobs_path, request)
        except ValueError as e:
            return 400, {"detail": str(e)}
        return 200, {"job_id": job_id, "status": "PENDING"}

    def _handle_get_jobs(
        self, job_id: str | None, limit: int = _DEFAULT_LIST_LIMIT
    ) -> tuple[int, Any]:
        from pyspark.errors import AnalysisException

        try:
            jobs = current_jobs(self._spark, self._jobs_path)
        except AnalysisException:  # no log yet: an empty queue, not an error
            return (404, {"detail": "job not found"}) if job_id else (200, [])
        if job_id is None:
            # newest-first with a server-side cap: the jobs log grows
            # without bound, so an unlimited collect() would eventually
            # stall the control plane; limit applies BEFORE collect
            rows = (
                jobs.orderBy(jobs.created_at.desc(), "job_id")
                .limit(limit)
                .collect()
            )
            return 200, [_job_row_dict(r) for r in rows]
        rows = jobs.filter(jobs.job_id == job_id).collect()
        if not rows:
            return 404, {"detail": "job not found"}
        return 200, _job_row_dict(rows[0])

    # -- lifecycle -------------------------------------------------------

    def start(self) -> int:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet: liveness is /health
                pass

            def _send(self, status: int, payload: Any) -> None:
                data = json.dumps(payload).encode("utf-8")
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_POST(self):
                if self.path.rstrip("/") != "/jobs":
                    self._send(404, {"detail": "not found"})
                    return
                # body length comes ONLY from Content-Length: absent
                # (e.g. chunked transfer) is 411, non-numeric/negative is
                # 400 — never passed unchecked into rfile.read()
                raw_len = self.headers.get("Content-Length")
                if raw_len is None:
                    self._send(411, {"detail": "Content-Length required"})
                    return
                try:
                    length = int(raw_len)
                except ValueError:
                    length = -1
                if length < 0:
                    self._send(400, {"detail": "invalid Content-Length"})
                    return
                if length > _MAX_BODY_BYTES:
                    self._send(413, {"detail": "request body too large"})
                    return
                self._send(*server._handle_post_jobs(self.rfile.read(length)))

            def do_GET(self):
                from urllib.parse import parse_qs, urlsplit

                parts = urlsplit(self.path)
                path = parts.path.rstrip("/")
                if path == "/health":
                    self._send(200, {"status": "ok"})
                elif path == "/jobs":
                    raw = parse_qs(parts.query).get("limit", [None])[0]
                    limit = _DEFAULT_LIST_LIMIT
                    if raw is not None:
                        try:
                            limit = int(raw)
                        except ValueError:
                            limit = 0
                        if limit <= 0:
                            self._send(
                                400,
                                {"detail": "limit must be a positive integer"},
                            )
                            return
                        limit = min(limit, _MAX_LIST_LIMIT)
                    self._send(*server._handle_get_jobs(None, limit))
                elif path.startswith("/jobs/"):
                    self._send(*server._handle_get_jobs(path[len("/jobs/"):]))
                else:
                    self._send(404, {"detail": "not found"})

            def do_PUT(self):
                self._send(405, {"detail": "method not allowed"})

            do_DELETE = do_PATCH = do_PUT

        self._httpd = ThreadingHTTPServer(
            (self._host, self._requested_port), Handler
        )
        self._httpd.daemon_threads = True
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="job-api", daemon=True
        )
        self._thread.start()
        return self.port

    @property
    def port(self) -> int:
        assert self._httpd is not None, "server not started"
        return self._httpd.server_address[1]

    @property
    def address(self) -> str:
        return f"http://{self._host}:{self.port}"

    def is_alive(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

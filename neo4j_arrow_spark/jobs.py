"""Control plane: async job lifecycle + registry.

Reference: every dataset is produced by an async ``Job`` with the state
machine INITIALIZING→PENDING→PRODUCING→COMPLETE/ERROR (``src/main/java/
org/neo4j/arrow/job/Job.java:21-44``; lifecycle doc DEVELOPING.md:55-73),
addressed by a UUID ticket (``Producer.java:373-379``). Control actions:
``job.status`` (StatusHandler.java:20-50), ``info.jobs`` / ``info.version``
(ServerInfoHandler.java:20-88).

Spark translation: a Python-thread job wrapping a DataFrame-producing
callable. PENDING = submitted, PRODUCING = running on the cluster,
COMPLETE = result DataFrame available. The reference's backpressure
row-dropping (Producer.java:202-226) is intentionally NOT replicated —
Spark tasks block instead of dropping data.
"""

from __future__ import annotations

import threading
import traceback
import uuid
from collections.abc import Callable
from enum import Enum

from pyspark.sql import DataFrame

from neo4j_arrow_spark import __version__


class JobStatus(str, Enum):
    INITIALIZING = "INITIALIZING"
    PENDING = "PENDING"
    PRODUCING = "PRODUCING"
    COMPLETE = "COMPLETE"
    ERROR = "ERROR"


class Job:
    """One async unit of work producing a DataFrame."""

    def __init__(self, job_type: str, fn: Callable[[], DataFrame]):
        self.ticket = str(uuid.uuid4())
        self.job_type = job_type
        self.status = JobStatus.INITIALIZING
        self.error: str | None = None
        self._result: DataFrame | None = None
        self._done = threading.Event()
        self._fn = fn

    def _run(self) -> None:
        self.status = JobStatus.PRODUCING
        try:
            self._result = self._fn()
            self.status = JobStatus.COMPLETE
        except Exception:
            self.error = traceback.format_exc()
            self.status = JobStatus.ERROR
        finally:
            self._done.set()

    def start(self) -> None:
        self.status = JobStatus.PENDING
        threading.Thread(target=self._run, name=f"job-{self.ticket[:8]}", daemon=True).start()

    def wait(self, timeout: float | None = None) -> bool:
        """Client wait_for_job parity (neo4j_arrow.py:294-311) — but
        event-driven instead of 1 s polling."""
        return self._done.wait(timeout)

    def result(self, timeout: float | None = None) -> DataFrame:
        if not self.wait(timeout):
            raise TimeoutError(f"job {self.ticket} still {self.status}")
        if self.status is JobStatus.ERROR:
            raise RuntimeError(f"job {self.ticket} failed:\n{self.error}")
        assert self._result is not None
        return self._result


class JobRegistry:
    """Ticketed job book-keeping (Producer.java:373-379)."""

    def __init__(self):
        self._jobs: dict[str, Job] = {}
        self._lock = threading.Lock()

    def submit(self, job_type: str, fn: Callable[[], DataFrame]) -> Job:
        job = Job(job_type, fn)
        with self._lock:
            self._jobs[job.ticket] = job
        job.start()
        return job

    def status(self, ticket: str) -> str:
        """action job.status (StatusHandler.java:20-50)."""
        job = self._jobs.get(ticket)
        if job is None:
            raise KeyError(f"no job for ticket {ticket}")
        return job.status.value

    def jobs(self) -> dict[str, str]:
        """action info.jobs (ServerInfoHandler.java:48-55)."""
        return {t: j.status.value for t, j in self._jobs.items()}

    def version(self) -> dict[str, str]:
        """action info.version (ServerInfoHandler.java:57-88)."""
        import pyspark

        return {
            "name": "neo4j_arrow_spark",
            "version": __version__,
            "spark": pyspark.__version__,
        }

    def get(self, ticket: str) -> Job:
        return self._jobs[ticket]

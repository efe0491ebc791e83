"""Self-healing supervision of commit-log CDF streams.

The commit-log source (:mod:`.cdf_source`) intentionally FAILS a running
query when a DDL barrier lands after its schema pin — Structured
Streaming fixes the plan schema at query start, so the honest contract
is "raise :class:`~.cdf_source.SchemaEvolvedError`, restart with the
SAME checkpoint" (offsets are commit seqs; they survive; nothing
re-seeds).  The reference's consumer never needs a human for this: its
poll loop rides DDL in-stream (increment.go:283-329) and a table's
failure never takes down the fleet (cmd/core.go:258-291 collects
per-table errors).  This module closes that gap for the streaming
surface:

- :class:`StreamSupervisor` wraps
  :func:`~.stream.stream_derived_refresh` and, when a run dies with the
  evolution signal, RE-PLANS against the evolved manifest and resumes
  from the same checkpoint — unattended, with a bounded restart budget.
  Two modes: ``drain()`` (availableNow loops until the feed is quiescent
  — the batch-parity surface the driver rows exercise) and
  ``start()``/``stop()`` (a continuous processing-time trigger
  supervised on a daemon thread — the long-running deployment shape,
  where barriers land mid-run and the next microbatch surfaces them).
- :func:`supervise_all` fans ``drain()`` over many supervisors with
  per-table isolation: one table's terminal failure is collected as a
  string, every other table keeps draining (the ``replicate_all``
  contract, applied to streams).

Why restarting is sufficient (and safe): each restarted run re-pins the
CURRENT manifest, so every barrier that landed while the previous run
was dying becomes a pre-start barrier — the source conforms across it by
field id with the checkpointed seq intact.  foreachBatch is
at-least-once; the derived objects' ``refresh()`` folds exactly
``(applied_seq, cdf_seq]`` by their own checkpoints, so the replayed
wake-up after a crash-restart is a no-op, never a double-count.
"""

from __future__ import annotations

import threading
from pathlib import Path

from .cdf_source import SchemaEvolvedError
from .stream import stream_derived_refresh


def is_schema_evolved_error(exc: BaseException) -> bool:
    """Classify an exception as the evolution restart signal.

    In-process callers see :class:`SchemaEvolvedError` directly; a
    running query surfaces it as a ``StreamingQueryException`` whose
    description embeds the Python data source's traceback (the class
    name survives the JVM round-trip), so the cross-boundary check is
    by name over the message/cause chain."""
    seen: set[int] = set()
    e: BaseException | None = exc
    while e is not None and id(e) not in seen:
        if isinstance(e, SchemaEvolvedError):
            return True
        seen.add(id(e))
        if "SchemaEvolvedError" in str(e):
            return True
        e = e.__cause__ or e.__context__
    return False


class StreamSupervisor:
    """Self-healing wrapper around one table's derived-refresh stream.

    *derived* is anything :func:`~.stream.stream_derived_refresh`
    accepts (a maintained aggregate, a secondary/ANN index, a bound join
    view, or a list of them).  The supervisor owns the checkpoint
    directory's lifecycle ACROSS restarts — the same directory is handed
    to every run, which is precisely what makes the heal re-seed-free.

    ``max_restarts`` bounds the heal budget over the supervisor's
    lifetime: schema evolution during steady operation is rare, so a
    storm of evolution errors (e.g. a checkpoint pointing at the wrong
    table) must eventually surface instead of looping forever.  Non-DDL
    errors are never retried — they are real failures, recorded in
    ``self.error`` (continuous mode) or raised (drain mode)."""

    def __init__(
        self,
        spark,
        table,
        derived,
        checkpoint_dir,
        max_restarts: int = 8,
        processing_interval: str = "1 second",
        name: str | None = None,
    ):
        self.spark = spark
        self.table = table
        self.derived = derived
        self.checkpoint_dir = str(checkpoint_dir)
        self.max_restarts = max_restarts
        self.processing_interval = processing_interval
        self.name = name or Path(table.root).name
        self.restarts = 0
        self.error: BaseException | None = None
        self._stop_evt = threading.Event()
        self._thread: threading.Thread | None = None
        self._query = None

    # -- drain mode -------------------------------------------------------
    def drain(self, timeout: float = 300) -> dict:
        """availableNow drains in a loop until the feed is QUIESCENT —
        a drain completes cleanly and no commit landed during it — with
        evolution errors healed by restarting from the same checkpoint.
        A barrier landing mid-drain is absorbed either as the restart
        path (it broke the run) or by the next loop turn (it landed
        after the run's pinned end offset, so the clean drain simply
        wasn't the last one).  Returns ``{"restarts": n, "drains": m}``.
        """
        start_restarts = self.restarts
        drains = 0
        while True:
            target = self.table.manifest().get("cdf_seq", 0)
            try:
                # query creation sits inside the try: a DDL landing
                # between planning and start raises the evolution signal
                # synchronously from start(), and it heals the same way
                q = stream_derived_refresh(
                    self.spark, self.table, self.derived,
                    self.checkpoint_dir, available_now=True,
                )
                finished = q.awaitTermination(timeout)
                if not finished:
                    q.stop()
                    raise RuntimeError(
                        f"{self.name}: drain did not finish within {timeout}s"
                    )
            except Exception as e:  # StreamingQueryException is not a
                # RuntimeError; classify everything and re-raise non-DDL
                if not is_schema_evolved_error(e):
                    raise
                self.restarts += 1
                if self.restarts - start_restarts > self.max_restarts:
                    raise
                continue
            drains += 1
            if self.table.manifest().get("cdf_seq", 0) <= target:
                return {
                    "restarts": self.restarts - start_restarts,
                    "drains": drains,
                }

    # -- continuous mode --------------------------------------------------
    def start(self) -> "StreamSupervisor":
        """Run the stream on a processing-time trigger under a daemon
        supervisor thread; evolution errors restart in place.  Call
        :meth:`stop` to shut down (it re-raises a terminal error)."""
        if self._thread is not None:
            raise RuntimeError("supervisor already started")
        self._stop_evt.clear()
        self._thread = threading.Thread(
            target=self._run, name=f"stream-supervisor-{self.name}",
            daemon=True,
        )
        self._thread.start()
        return self

    def _run(self) -> None:
        while not self._stop_evt.is_set():
            try:
                q = stream_derived_refresh(
                    self.spark, self.table, self.derived,
                    self.checkpoint_dir, available_now=False,
                    processing_interval=self.processing_interval,
                )
                self._query = q
                if self._stop_evt.is_set():
                    # a stop() that ran between the loop check and the
                    # assignment above stopped the PREVIOUS (or no)
                    # query — this run would otherwise be orphaned,
                    # still writing and holding the checkpoint dir
                    q.stop()
                    return
                q.awaitTermination()
                # a continuous trigger only terminates cleanly when
                # something called stop() on it
                return
            except BaseException as e:  # noqa: BLE001 — classified below
                if self._stop_evt.is_set():
                    return  # racing stop() can surface as an exception
                if (
                    is_schema_evolved_error(e)
                    and self.restarts < self.max_restarts
                ):
                    self.restarts += 1
                    continue
                self.error = e
                return

    def healthy(self) -> bool:
        return self.error is None

    def stop(self, timeout: float = 120) -> dict:
        """Stop the continuous supervisor and join its thread; re-raises
        a terminal (non-healed) error.  Returns the heal stats."""
        self._stop_evt.set()
        q = self._query
        if q is not None:
            try:
                q.stop()
            except Exception:
                pass  # already dead — the thread loop classified it
        if self._thread is not None:
            self._thread.join(timeout)
            if self._thread.is_alive():
                # never discard a live handle as if shut down — the
                # caller must know the stream may still be writing
                raise RuntimeError(
                    f"{self.name}: supervisor thread did not stop "
                    f"within {timeout}s"
                )
            self._thread = None
        if self.error is not None:
            raise self.error
        return {"restarts": self.restarts}


def supervise_all(
    supervisors: list[StreamSupervisor], timeout: float = 300
) -> dict[str, str | None]:
    """Drain every supervisor concurrently with PER-TABLE isolation: a
    terminal failure is collected as ``name → "Type: message"`` while
    every other table's drain proceeds to quiescence (the reference's
    per-table error collection, cmd/core.go:258-291).  Healthy tables
    map to ``None``; per-table heal stats stay on each supervisor
    (``.restarts``)."""
    results: dict[str, str | None] = {}
    lock = threading.Lock()

    def work(sup: StreamSupervisor) -> None:
        try:
            sup.drain(timeout=timeout)
            with lock:
                results[sup.name] = None
        except BaseException as e:  # noqa: BLE001 — isolation boundary
            with lock:
                results[sup.name] = f"{type(e).__name__}: {e}"

    threads = [
        threading.Thread(target=work, args=(s,), daemon=True)
        for s in supervisors
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return results

"""KafkaStream lifecycle analog — the reference's top-level entry class
(core/KafkaStream.cs:69-519): a state machine over the running topology with
transition validation (KafkaStream.cs:113-236), a StateChanged listener
(KafkaStream.cs:27,261), Start/Close/Dispose lifecycle (:375-459), and the
interactive-query ``Store`` accessor (:474-479).

The reference's instance manages StreamThreads + a GlobalStreamThread over
consumer rebalances; the Spark analog manages a set of StreamingQuery
handles (one per started sink), where query startup — state-store restore,
source offset discovery — plays the REBALANCING role.  Threads, task
assignment, and partition ownership belong to the Spark scheduler, so the
surface that remains is exactly the lifecycle + listener + store contract.
"""

from __future__ import annotations

import threading
from collections.abc import Callable, Sequence

from pyspark.sql import SparkSession

from .runtime import StoreRegistry


class State:
    """KafkaStream.State (core/KafkaStream.cs:113-236): named states with an
    explicit valid-transition set, compared by ordinal."""

    _REGISTRY: dict[int, "State"] = {}

    def __init__(self, name: str, ordinal: int, transitions: tuple[int, ...]):
        self.name = name
        self.ordinal = ordinal
        self.transitions = frozenset(transitions)
        State._REGISTRY[ordinal] = self

    def is_running(self) -> bool:
        """State.IsRunning (KafkaStream.cs:176-179): RUNNING or REBALANCING."""
        return self in (State.RUNNING, State.REBALANCING)

    def is_valid_transition(self, new: "State") -> bool:
        return new.ordinal in self.transitions

    def __repr__(self) -> str:
        return self.name

    def __eq__(self, other) -> bool:
        return isinstance(other, State) and other.ordinal == self.ordinal

    def __hash__(self) -> int:
        return hash(self.ordinal)


# ordinals + transition sets copied semantically from KafkaStream.cs:118-138
State.CREATED = State("CREATED", 0, (1, 3))
State.REBALANCING = State("REBALANCING", 1, (2, 3, 5))
State.RUNNING = State("RUNNING", 2, (1, 2, 3, 5))
State.PENDING_SHUTDOWN = State("PENDING_SHUTDOWN", 3, (4,))
State.NOT_RUNNING = State("NOT_RUNNING", 4, ())
State.ERROR = State("ERROR", 5, (3,))


class StreamApp:
    """The KafkaStream analog: owns the started streaming queries and walks
    the reference's state machine.

    ``starters`` is a list of zero-arg callables each returning a started
    ``StreamingQuery`` (the analog of topology sink nodes — e.g. closures
    over streaming.start_to_files / start_foreach_batch / memory sinks).
    They run on ``start()``, inside the REBALANCING phase; any raise flips
    the app to ERROR (the reference's stream-thread startup failure path,
    KafkaStream.cs:398-417).
    """

    def __init__(
        self,
        spark: SparkSession,
        starters: Sequence[Callable[[], object]],
        inner_exception_handler: Callable[[Exception], str] | None = None,
        max_restarts: int = 3,
    ):
        self.spark = spark
        self._starters = list(starters)
        self.queries: list = []
        self._state = State.CREATED
        self._lock = threading.Lock()
        self._listeners: list[Callable[[State, State], None]] = []
        self._registry = StoreRegistry(spark)
        # InnerExceptionHandler analog (core/StreamConfig.cs:130,2140):
        # called with the query's exception, returns "CONTINUE" or "FAIL".
        # Default None == FAIL, the reference's default (StreamConfig.cs:1907).
        self.inner_exception_handler = inner_exception_handler
        self.max_restarts = int(max_restarts)
        self._restarts: dict[int, int] = {}
        self._done: set[int] = set()

    # ---------------- state machine ----------------

    @property
    def state(self) -> State:
        return self._state

    def on_state_change(self, listener: Callable[[State, State], None]) -> None:
        """StateChanged event (KafkaStream.cs:261); called as
        ``listener(old_state, new_state)``."""
        self._listeners.append(listener)

    def _set_state(self, new: State) -> bool:
        """SetState (KafkaStream.cs:488-519): reject invalid transitions,
        notify listeners under the same contract."""
        with self._lock:
            old = self._state
            if not old.is_valid_transition(new):
                return False
            self._state = new
        for cb in self._listeners:
            cb(old, new)
        return True

    # ---------------- lifecycle ----------------

    def start(self) -> None:
        """Start (KafkaStream.cs:375-417): CREATED → REBALANCING while the
        queries spin up (offset discovery / state restore), then RUNNING."""
        if not self._set_state(State.REBALANCING):
            raise RuntimeError(f"cannot start from state {self._state}")
        try:
            for fn in self._starters:
                self.queries.append(fn())
        except Exception:
            self._set_state(State.ERROR)
            raise
        self._set_state(State.RUNNING)

    def close(self) -> None:
        """Close/Dispose (KafkaStream.cs:421-459): PENDING_SHUTDOWN, stop all
        queries, NOT_RUNNING.  Idempotent like the reference (a second Close
        finds PENDING_SHUTDOWN/NOT_RUNNING and returns)."""
        if not self._set_state(State.PENDING_SHUTDOWN):
            return
        try:
            for q in self.queries:
                try:
                    q.stop()  # already-terminated handles no-op
                except Exception:
                    pass
            for q in self.queries:
                if hasattr(q, "awaitTermination"):
                    try:
                        q.awaitTermination(30)
                    except Exception:
                        pass
        finally:
            self._set_state(State.NOT_RUNNING)

    def supervise(self, poll_s: float = 0.2, max_wait_s: float | None = None) -> None:
        """Stream-thread supervision loop — the runtime half of the
        reference's ``InnerExceptionHandler`` (core/StreamConfig.cs:130:
        uncaught processing exceptions map to CONTINUE/FAIL at the stream
        thread; KafkaStream tears down or replaces the thread accordingly).

        Polls the started queries until every one terminates cleanly (an
        availableNow drain) or ``max_wait_s`` elapses (continuous queries).
        A query that terminated WITH an exception is routed through the
        handler:

          * FAIL (or no handler — the reference's default): transition to
            ERROR and re-raise the query's exception;
          * CONTINUE: transition RUNNING → REBALANCING, restart the query
            from its starter — same checkpointLocation, so Spark resumes
            from the last committed batch and REPLAYS the failed one (the
            thread-replacement semantics) — then back to RUNNING.  Each
            starter has a ``max_restarts`` budget; exhausting it is ERROR
            regardless of policy (a permanently poisoned batch must not
            hot-loop).
        """
        import time

        deadline = None if max_wait_s is None else time.monotonic() + max_wait_s
        while True:
            active = False
            for i, q in enumerate(list(self.queries)):
                if i in self._done:
                    continue
                if getattr(q, "isActive", False):
                    active = True
                    continue
                exc = q.exception() if hasattr(q, "exception") else None
                if exc is None:
                    self._done.add(i)
                    continue
                self._handle_query_failure(i, exc)
                active = True  # restarted; poll again
            if not active:
                return
            if deadline is not None and time.monotonic() > deadline:
                return
            time.sleep(poll_s)

    def _handle_query_failure(self, i: int, exc: Exception) -> None:
        handler = self.inner_exception_handler
        resp = handler(exc) if handler is not None else "FAIL"
        used = self._restarts.get(i, 0)
        if resp != "CONTINUE" or used >= self.max_restarts:
            self._set_state(State.ERROR)
            raise exc
        self._restarts[i] = used + 1
        # restart plays the rebalance role: offset re-discovery + state
        # restore from the checkpoint before the topology runs again
        self._set_state(State.REBALANCING)
        try:
            self.queries[i] = self._starters[i]()
        except Exception:
            self._set_state(State.ERROR)
            raise
        self._set_state(State.RUNNING)

    def raise_error(self) -> None:
        """Transition to ERROR (stream-thread uncaught-exception path;
        recoverable only via close())."""
        self._set_state(State.ERROR)

    # ---------------- interactive queries ----------------

    def store(self, name: str):
        """KafkaStream.Store (KafkaStream.cs:474-479): only valid while
        running (the reference throws IllegalStateException otherwise)."""
        if not self._state.is_running():
            raise RuntimeError(f"cannot query store in state {self._state}")
        return self._registry.store(name)

    def __enter__(self) -> "StreamApp":
        self.start()
        return self

    def __exit__(self, exc_type, *rest) -> None:
        if exc_type is not None:
            self._set_state(State.ERROR)
        self.close()

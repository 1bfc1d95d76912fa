"""transformWithState (arbitrary-state-v2) engines for the continuous
table operators — the Spark-4-native successors of the pandas keyed engines
in ``streaming.py`` (VERDICT r11 task 1).

Same architectures as ``_join_tables_keyed`` / ``_join_fk_keyed`` /
``_suppress_keyed`` (tagged-union changelogs, per-key state, emissions
appended to ``out/sink_batch=<id>`` partitions, latest-per-key snapshot
fold), with the Arrow/pandas boundary replaced by the Row-based
``transformWithState`` API:

* **No string tunnel.**  ``transformWithState`` hands the processor
  ``pyspark.sql.Row`` objects, where a nullable int64 column stays a Python
  ``int`` (the pandas engines receive float64-coerced slices as soon as a
  union null-pad or a real null appears in the group, losing bigints past
  2^53 — hence their decimal-string tunnel).  Typed value state likewise
  round-trips int64/decimal/timestamp exactly (pinned by
  ``tests/test_tws.py``).
* **NaN is preserved.**  Rows and value state keep float NaN as NaN, so
  these engines agree with the ``exact`` loops where the pandas engines
  coerce NaN→null (see ``_clean_state_value``).
* **Timers instead of GroupState timeouts** (suppress): per-key event-time
  timers survive across invocations and are deleted/re-registered
  explicitly.

Known constraint (upstream): PySpark's value-state client cannot round
-trip NESTED CONTAINER fields (an ``array<struct<...>>`` value state
either comes back with field values scrambled or — under the shim runtime
on 4.1.2 — kills the worker with a cloudpickle "cannot pickle 'generator'
object" during the update).  Container-typed user VALUE columns therefore
ride the state as pickled ``binary`` (``_enc_c``/``_dec_c`` — bytes round
-trip exactly), decoded back to native Python form before every emission,
so input rows, the emission-log parquet, and the returned snapshots all
keep NATIVE container types; only the opaque state cell is encoded.
Container KEY / ORDER / FK columns stay refused (``
_refuse_hard_containers`` — grouping and order comparisons need scalars;
engine='exact' covers those).  The minimal upstream repro is pinned as a
STRICT xfail in ``tests/test_tws.py::
test_upstream_nested_container_value_state_roundtrip`` — when a Spark
upgrade makes it XPASS, the tunnel can be retired for native state.  The
fk-join subscriber list — the one engine-internal container — lives in
LIST state (struct elements round-trip exactly there).

Requires ``google.protobuf``: either the real wheel or the vendored
clean-room shim (``pyspark_engine.protoshim.ensure_protobuf`` wires the
shim into driver and workers; every public entry here calls it first).
Reference semantics: KTableKTableJoinProcessor.cs:20-48 (tt join),
KIP-213 subscription/response architecture (fk join),
KTableSuppressProcessor.cs / suppress-buffer due rule (suppress).
"""

from __future__ import annotations

import os
import tempfile
from contextlib import contextmanager
from typing import Sequence

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .dsl import KStream, KTable
from .protoshim import ensure_protobuf
from .streaming import (
    _bind_state_checkpoint,
    _check_no_pending_compaction,
    _checkpoint,
    _check_reserved_columns,
    _container_cols,
    _empty_emissions,
    _has_emissions,
    _last_committed,
    _maybe_autocompact,
    _read_bind,
)

_TWS_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

# version stamps, same contract as streaming.py's _KEYED_STATE_VERSION: a
# populated dir written by a different engine/version is refused
# descriptively instead of failing Spark's state-schema check mid-drain
_TWS_TTJOIN_VERSION = "1"
_TWS_FKJOIN_VERSION = "1"
_TWS_SUPPRESS_VERSION = "1"


def require_tws(spark) -> None:
    """Raise descriptively when transformWithState cannot run here."""
    if not ensure_protobuf(spark):
        raise RuntimeError(
            "engine='tws' needs google.protobuf (transformWithState state "
            "client); neither the protobuf wheel nor the vendored shim "
            "(vendor/google/protobuf) is importable — use engine='keyed'"
        )


@contextmanager
def _rocksdb_provider(spark):
    """transformWithState requires the RocksDB state-store provider (it is
    the only one with multi-column-family support).  Scope the conf to the
    drain so concurrent/later queries in the same session — e.g. a resumed
    pandas-keyed checkpoint on the default HDFS provider — keep their own
    provider.

    Also pins ``spark.sql.session.timeZone=UTC`` for the drain: ``_norm``'s
    contract is that tz-aware input rows normalize to UTC-naive and the
    value-state round-trip reinterprets naive datetimes in the SESSION tz —
    on an externally created non-UTC session (round-12 advice) order
    comparisons and emitted timestamps would otherwise skew by the zone
    offset.  Scoping (rather than raising) keeps foreign sessions working;
    restored on exit."""
    tz_key = "spark.sql.session.timeZone"
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev_tz = spark.conf.get(tz_key)
    except Exception:
        prev_tz = None
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    # both sets INSIDE the protected region: an exception between them must
    # still restore whatever was already flipped (round-13 review)
    try:
        spark.conf.set(tz_key, "UTC")
        spark.conf.set(key, _TWS_PROVIDER)
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
        if prev_tz is None:
            spark.conf.unset(tz_key)
        else:
            spark.conf.set(tz_key, prev_tz)


def _refuse_hard_containers(what: str, *pairs) -> None:
    """Key / order / fk positions need scalar types (grouping keys and
    order comparisons) — the binary value tunnel cannot cover them."""
    bad = sorted(set().union(set(), *[_container_cols(s, c) for s, c in pairs]))
    if bad:
        raise ValueError(
            f"{what}: container-typed columns {bad} sit in a key/order/fk "
            "position; grouping and order comparisons need scalar types (the "
            "binary value tunnel only covers VALUE columns) — use engine='exact'"
        )


def _enc_c(v):
    """Encode one container VALUE for the state round-trip.  Upstream
    PySpark 4.1.2 cannot round-trip nested containers through VALUE state
    (tests/test_tws.py::test_upstream_nested_container_value_state_roundtrip,
    strict xfail), so container-typed user value columns ride the state as
    pickled ``binary`` — bytes round-trip exactly — and are decoded back to
    their native Python form before every emission (r12 verdict task 2).
    Input rows and emitted rows stay NATIVE containers end to end; only the
    state cell is opaque."""
    import pickle  # noqa: PLC0415

    return None if v is None else pickle.dumps(v)


def _dec_c(v):
    import pickle  # noqa: PLC0415

    return None if v is None else pickle.loads(bytes(v))


def _stamp_version(root: str, marker: str, version: str, populated: bool, what: str) -> None:
    """Engine/version gate for a tws state dir (mirrors streaming.py)."""
    for other, owner in (
        ("_GEN", "the exact ping-pong engine"),
        ("_PSE_TTJOIN_V", "the pandas keyed tt-join engine"),
        ("_PSE_FKJOIN_V", "the pandas keyed fk-join engine"),
        ("_PSE_STATE_V", "the pandas keyed suppress engine"),
    ):
        if other != marker and os.path.exists(os.path.join(root, other)):
            raise ValueError(
                f"state dir {root!r} was written by {owner}; resume it with the "
                "engine that wrote it, or start a fresh state_dir for engine='tws'"
            )
    ver_path = os.path.join(root, marker)
    ver = _read_bind(ver_path)
    if populated and ver != version:
        raise ValueError(
            f"state dir {root!r} holds {what} state with version "
            f"{ver or 'unknown'}, but this engine writes version {version} — "
            "drain the old run with the code that wrote it, or start a fresh state_dir"
        )
    if ver is None:
        with open(ver_path + ".tmp", "w") as f:
            f.write(version)
        os.replace(ver_path + ".tmp", ver_path)


def _norm(v):
    """Normalize a Row/state value to a timezone-naive, plain-Python form
    for ORDER comparisons and state tuples: tz-aware datetimes → UTC-naive
    (input rows arrive session-tz-aware, value state returns naive — the
    engines pin the session tz to UTC).  Unlike the pandas engines'
    _clean_state_value, NaN is NOT coerced (Rows keep it, matching the
    exact loops)."""
    import datetime as dt

    if isinstance(v, dt.datetime) and v.tzinfo is not None:
        return v.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return v


# ------------------------------------------------------------------ tt join


def _import_stateful_processor():
    from pyspark.sql.streaming import StatefulProcessor

    return StatefulProcessor


def _make_tt_processor(
    state_schema,
    l_val,
    r_val,
    lord,
    rord,
    l_key_pos,
    r_key_pos,
    how,
    out_cols,
    merge_ts,
    l_ts_name,
    r_ts_name,
    ts_alias,
    tun=frozenset(),
):
    """Build the tt-join StatefulProcessor (factory so the class body closes
    over plain params — the instance cloudpickles to the workers).  ``tun``
    = container value columns riding the state as pickled binary (_enc_c):
    in-memory and emitted values stay native; only the state cell is
    encoded."""
    StatefulProcessor = _import_stateful_processor()
    n_l, n_r = len(l_val), len(r_val)
    l_idx = {c: i for i, c in enumerate(l_val)}
    r_idx = {c: i for i, c in enumerate(r_val)}
    out_row = Row(*out_cols)

    def _load(cols, vals):
        return [_dec_c(x) if c in tun else _norm(x) for c, x in zip(cols, vals)]

    def _store(cols, vals):
        return [_enc_c(v) if c in tun else v for c, v in zip(cols, vals)]

    class TTJoin(StatefulProcessor):
        def init(self, handle):
            self.st = handle.getValueState("join", state_schema)

        def close(self):
            pass

        def handleInputRows(self, key, rows, timerValues):
            def make_ord(order, key_pos, lookup):
                vals = []
                for c in order:
                    v = _norm(key[key_pos[c]]) if c in key_pos else _norm(lookup(c))
                    if v is None:
                        raise ValueError(
                            "null order value in the tws tt-join engine — the fold "
                            "needs a total order per key; use engine='exact'"
                        )
                    vals.append(v)
                return tuple(vals)

            st = self.st.get()
            if st is not None:
                l_set, r_set = bool(st[0]), bool(st[1])
                l_vals = _load(l_val, st[2 : 2 + n_l])
                r_vals = _load(r_val, st[2 + n_l :])
            else:
                l_set = r_set = False
                l_vals, r_vals = [None] * n_l, [None] * n_r
            l_ord = make_ord(lord, l_key_pos, lambda c: l_vals[l_idx[c]]) if l_set else None
            r_ord = make_ord(rord, r_key_pos, lambda c: r_vals[r_idx[c]]) if r_set else None

            changed = False
            for row in rows:
                if row["__side"] == 1:
                    ov = make_ord(lord, l_key_pos, lambda c: _norm(row[c]))
                    if (not l_set) or ov >= l_ord:
                        l_vals = [_norm(row[c]) for c in l_val]
                        l_ord, l_set, changed = ov, True, True
                else:
                    ov = make_ord(rord, r_key_pos, lambda c: _norm(row[c]))
                    if (not r_set) or ov >= r_ord:
                        r_vals = [_norm(row[c]) for c in r_val]
                        r_ord, r_set, changed = ov, True, True
            if not changed:
                return
            self.st.update((l_set, r_set, *_store(l_val, l_vals), *_store(r_val, r_vals)))
            emit = (l_set and r_set) if how == "inner" else (l_set if how == "left" else True)
            if not emit:
                return
            vals = [_norm(k) for k in key]
            vals += [l_vals[l_idx[c]] if l_set else None for c in out_cols if c in l_idx]
            vals += [r_vals[r_idx[c]] if r_set else None for c in out_cols if c in r_idx]
            if merge_ts:
                # output ts = max of the sides (KTableKTableJoinProcessor.cs:35)
                def ts_of(is_set, key_pos, idx, side_vals, name):
                    if not is_set:
                        return None
                    return _norm(key[key_pos[name]]) if name in key_pos else side_vals[idx[name]]

                cands = [
                    t
                    for t in (
                        ts_of(l_set, l_key_pos, l_idx, l_vals, l_ts_name),
                        ts_of(r_set, r_key_pos, r_idx, r_vals, r_ts_name),
                    )
                    if t is not None
                ]
                vals.append(max(cands) if cands else None)
            yield out_row(*vals)

    return TTJoin()


def join_tables_tws(
    left: KStream,
    right: KStream,
    how: str,
    l_order: Sequence[str] | None,
    r_order: Sequence[str] | None,
    ts_alias: str | None,
    store_name: str | None,
    state_dir: str | None,
    checkpoint: str | None,
) -> DataFrame:
    """transformWithState engine of ``join_tables_streaming`` — the same
    union/fold/emission-log architecture as ``_join_tables_keyed`` (see its
    docstring for the contract and the reference citation), minus the
    string tunnel: value columns ride the union and the typed value state
    in their NATIVE types.  Parity with both older engines is pinned by the
    engine-differential fuzz and the tws test family."""
    spark0 = left.df.sparkSession
    require_tws(spark0)
    overlap = set(left.df.columns) & set(right.df.columns)
    if overlap:
        raise ValueError(f"sides must have disjoint column names; overlap: {sorted(overlap)}")
    l_key, r_key = list(left.key), list(right.key)
    _check_reserved_columns(
        list(left.df.columns) + list(right.df.columns) + ([ts_alias] if ts_alias else []),
        {
            "sink_batch": "emission-log partition column",
            "__side": "changelog union tag",
            **{f"__jk{i}": "join-key grouping column" for i in range(len(l_key))},
        },
        "tws tt-join engine",
    )
    l_ddl = {f.name: f.dataType.simpleString() for f in left.df.schema.fields}
    r_ddl = {f.name: f.dataType.simpleString() for f in right.df.schema.fields}
    for lk, rk_ in zip(l_key, r_key):
        if l_ddl[lk] != r_ddl[rk_]:
            raise ValueError(
                f"the tws tt-join engine requires equal key dtypes across sides; "
                f"{lk}:{l_ddl[lk]} vs {rk_}:{r_ddl[rk_]} — cast one side or use engine='exact'"
            )
    lord = tuple(l_order) if l_order else ((left.ts,) if left.ts else ())
    rord = tuple(r_order) if r_order else ((right.ts,) if right.ts else ())
    if not lord or not rord:
        raise ValueError("changelog order required per side (ts or explicit l_order/r_order)")
    for oc, cols in ((lord, left.df.columns), (rord, right.df.columns)):
        missing = [c for c in oc if c not in cols]
        if missing:
            raise ValueError(f"order columns {missing} not in the side's columns")
    l_val = [c for c in left.df.columns if c not in l_key]
    r_val = [c for c in right.df.columns if c not in r_key]
    _refuse_hard_containers(
        "tws tt-join engine",
        (left.df.schema, list(l_key) + list(lord)),
        (right.df.schema, list(r_key) + list(rord)),
    )
    # container VALUE columns ride the state as pickled binary (see _enc_c)
    tun = _container_cols(left.df.schema, l_val) | _container_cols(right.df.schema, r_val)
    merge_ts = bool(ts_alias is not None and left.ts and right.ts)
    if merge_ts and l_ddl[left.ts] != r_ddl[right.ts]:
        raise ValueError(
            "the tws tt-join engine requires equal ts dtypes for ts_alias merging; "
            f"{left.ts}:{l_ddl[left.ts]} vs {right.ts}:{r_ddl[right.ts]} — use engine='exact'"
        )
    out_l_val = [c for c in l_val if not (merge_ts and c == left.ts)]
    out_r_val = [c for c in r_val if not (merge_ts and c == right.ts)]
    empty_out = KTable(spark0.createDataFrame([], left.df.schema), left.key, left.ts).join(
        KTable(spark0.createDataFrame([], right.df.schema), right.key, right.ts),
        how=how,
        ts_alias=ts_alias,
    ).df

    jk = [f"__jk{i}" for i in range(len(l_key))]
    l_src, r_src = left.df, right.df
    for k in l_key:
        l_src = l_src.filter(F.col(k).isNotNull())  # to_table drops null keys
    for k in r_key:
        r_src = r_src.filter(F.col(k).isNotNull())

    def _ddl(c):
        return l_ddl.get(c) or r_ddl[c]

    def _ncol(c):
        return F.lit(None).cast(_ddl(c)).alias(c)

    tagged = l_src.select(
        F.lit(1).alias("__side"),
        *[F.col(k).alias(j) for k, j in zip(l_key, jk)],
        *[F.col(c) for c in l_val],
        *[_ncol(c) for c in r_val],
    ).unionByName(
        r_src.select(
            F.lit(0).alias("__side"),
            *[F.col(k).alias(j) for k, j in zip(r_key, jk)],
            *[_ncol(c) for c in l_val],
            *[F.col(c) for c in r_val],
        )
    )

    state_schema = "__l_set boolean, __r_set boolean" + "".join(
        f", `{c}` {'binary' if c in tun else _ddl(c)}" for c in l_val + r_val
    )
    out_cols = list(l_key) + out_l_val + out_r_val + ([ts_alias] if merge_ts else [])

    def _out_ddl(c):
        if merge_ts and c == ts_alias:
            return l_ddl[left.ts]
        if c in l_key:
            return l_ddl[c]
        return _ddl(c)

    out_schema = ", ".join(f"`{c}` {_out_ddl(c)}" for c in out_cols)
    l_key_pos = {c: i for i, c in enumerate(l_key)}
    r_key_pos = {c: i for i, c in enumerate(r_key)}

    root = state_dir or tempfile.mkdtemp(prefix="pse-ttjoin-tws-")
    os.makedirs(root, exist_ok=True)
    _check_no_pending_compaction(root)
    out_dir = os.path.join(root, "out")
    ckpt = _bind_state_checkpoint(
        root, _checkpoint(checkpoint), _has_emissions(out_dir), "prior tt-join emissions"
    )
    _stamp_version(
        root,
        "_PSE_TWS_TTJOIN_V",
        _TWS_TTJOIN_VERSION,
        _has_emissions(out_dir) or _last_committed(ckpt) >= 0,
        "tws tt-join",
    )
    _maybe_autocompact(spark0, root, ckpt, key=l_key)

    proc = _make_tt_processor(
        state_schema,
        l_val,
        r_val,
        lord,
        rord,
        l_key_pos,
        r_key_pos,
        how,
        out_cols,
        merge_ts,
        left.ts if merge_ts else None,
        right.ts if merge_ts else None,
        ts_alias,
        tun=frozenset(tun),
    )

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("overwrite").parquet(os.path.join(out_dir, f"sink_batch={batch_id}"))

    with _rocksdb_provider(spark0):
        res = tagged.groupBy(*jk).transformWithState(proc, out_schema, "Update", "None")
        q = (
            res.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if not _has_emissions(out_dir):
        return empty_out
    emitted = spark0.read.parquet(out_dir)
    snap = KStream(emitted, tuple(l_key), None).to_table(order=("sink_batch",)).df
    snap = snap.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in empty_out.schema.fields]
    )
    if store_name is not None:
        snap.createOrReplaceTempView(store_name)
    return snap


# ----------------------------------------------------------------- suppress


def _make_suppress_processor(state_schema, cols, key, tcol, limit_ms, out_cols, tun=frozenset()):
    StatefulProcessor = _import_stateful_processor()
    out_row = Row(*out_cols)
    NEG = -(1 << 62)

    def _load(vals):
        return [_dec_c(x) if c in tun else _norm(x) for c, x in zip(cols, vals)]

    def _store(vals):
        return [_enc_c(v) if c in tun else v for c, v in zip(cols, vals)]

    class SuppressBuffer(StatefulProcessor):
        def init(self, handle):
            self.h = handle
            self.st = handle.getValueState("buf", state_schema)

        def close(self):
            pass

        def _rearm(self, entry):
            # TWS timers PERSIST across invocations (unlike GroupState
            # timeouts) — delete-all-then-register keeps exactly one.
            for ts in list(self.h.listTimers()):
                self.h.deleteTimer(ts)
            if entry is not None:
                # entry+limit-1 fires at the first wm >= entry+limit (TWS
                # fires timers with expiry STRICTLY below the watermark) —
                # the KS due rule.  Unlike applyInPandasWithState, a
                # below-watermark registration is legal (it would fire this
                # very batch), so no wm+1 floor is needed; the inline
                # already-due branches emit before this point and pass
                # entry=None instead.
                self.h.registerTimer(entry + limit_ms - 1)

        def handleInputRows(self, key, rows, timerValues):
            wm = timerValues.getCurrentWatermarkInMs()
            # Spark initializes the watermark at 0 and only ratchets UP, so 0
            # means "no watermark yet"; pre-epoch event times can never
            # advance it (engine='exact' territory — the loud raise below)
            wm_eff = wm if wm > 0 else NEG
            st = self.st.get()
            if st is not None:
                entry, hist_ms = st[0], st[1]
                hist_vals = _load(st[2:])
            else:
                entry, hist_ms, hist_vals = None, None, None
            if entry is not None and entry + limit_ms <= wm_eff:
                # due BEFORE this batch's data (KS emitted it last batch; the
                # arrival pre-empts the timer): emit the pre-merge value,
                # renumbered like a timer firing; cancel the pending timer so
                # it cannot double-fire in this batch's timer phase
                yield out_row(*hist_vals, True)
                entry = None
            had_data = False
            for row in rows:
                if row["__clk"] != 0:  # clock copies only drive the watermark
                    continue
                ev = row["__ev_ms"]
                if ev is None:
                    continue
                if ev <= 0:
                    raise ValueError(
                        "pre-epoch (<= 1970-01-01T00:00:00) event time in the "
                        "tws suppress engine: Spark watermarks cannot advance "
                        "past it, so such entries would never emit — use "
                        "engine='exact'"
                    )
                had_data = True
                if hist_ms is None or ev >= hist_ms:
                    # later-wins on ties, in arrival order — the max_by(ts)
                    # fold of to_table
                    hist_ms = ev
                    hist_vals = [_norm(row[c]) for c in cols]
            if had_data and entry is None:
                # (re-)enter the buffer: clock = the state row's event time
                # (which a late record does NOT move backwards)
                entry = hist_ms
                if entry + limit_ms <= wm_eff:
                    # already due vs the previous batch's stream time: KS
                    # emits it in THIS batch — no renumbering
                    yield out_row(*hist_vals, False)
                    entry = None
            if hist_ms is not None:
                self.st.update((entry, hist_ms, *_store(hist_vals)))
                self._rearm(entry)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            st = self.st.get()
            if st is None or st[0] is None:
                return  # buffer entry already emitted inline and timer raced
            hist_vals = _load(st[2:])
            yield out_row(*hist_vals, True)
            # the buffer entry leaves; the latest-row memory stays (a late
            # record must still lose to it, like the update-mode aggregate)
            self.st.update((None, st[1], *_store(hist_vals)))

    return SuppressBuffer()


def suppress_tws(
    table: KTable,
    src: KStream,
    tcol: str,
    limit_ms: int,
    state_dir: str | None,
    checkpoint: str | None,
    store_name: str | None,
) -> DataFrame:
    """transformWithState engine of ``suppress_buffered`` — the same design
    as ``_suppress_keyed`` (decoupled clock-copy watermark, per-key buffer
    state, emission renumbering; see its docstring for the KS contract),
    with native-typed state (no string tunnel) and explicit per-key
    event-time timers.  The buffered view for ``store_name`` reads the
    transformWithState column family through the state source
    (``stateVarName``)."""
    from .runtime import epoch_ms

    spark0 = src.df.sparkSession
    require_tws(spark0)
    key = list(table.key)
    cols = list(table.df.columns)
    _check_reserved_columns(
        cols,
        {
            "__ev_ms": "event-time projection",
            "__clk": "clock-copy tag",
            "__wm_ts": "watermark carrier",
            "__entry_ms": "buffer-entry state field",
            "__hist_ms": "latest-event state field",
            "__fired": "timer-emission flag",
            "__emit_reason": "emission metadata column",
            "__emit_batch": "emission metadata column",
            "sink_batch": "emission-log partition column",
        },
        "tws suppress engine",
    )
    value_cols = [c for c in cols if c not in key]
    _refuse_hard_containers("tws suppress engine", (table.df.schema, key))
    # container VALUE columns ride the state as pickled binary (see _enc_c)
    tun = _container_cols(table.df.schema, value_cols)
    ddl = {f.name: f.dataType.simpleString() for f in table.df.schema.fields}

    root = state_dir or tempfile.mkdtemp(prefix="pse-suppress-tws-")
    os.makedirs(root, exist_ok=True)
    out_dir = os.path.join(root, "out")
    ckpt = _bind_state_checkpoint(
        root, _checkpoint(checkpoint), _has_emissions(out_dir), "prior suppress emissions"
    )
    prior_batch = _last_committed(ckpt)
    _stamp_version(
        root,
        "_PSE_TWS_SUPPRESS_V",
        _TWS_SUPPRESS_VERSION,
        _has_emissions(out_dir) or prior_batch >= 0,
        "tws suppress",
    )
    _maybe_autocompact(spark0, root, ckpt)

    sdf = src.df
    for k in key:
        sdf = sdf.filter(F.col(k).isNotNull())  # to_table drops null keys
    # Decoupled watermark: every row ships twice — a DATA copy with NULL
    # event time (never late-filtered, does not move the watermark) and a
    # CLOCK copy carrying ts with all value columns nulled (shuffle weight)
    # that exists only to advance the watermark.  See _suppress_keyed.
    sdf = sdf.select(*cols, epoch_ms(tcol).alias("__ev_ms")).select(
        "*", F.explode(F.array(F.lit(0), F.lit(1))).alias("__clk")
    )

    def _clock_fill(c):
        return F.when(F.col("__clk") == 0, F.col(c)).otherwise(F.lit(None)).alias(c)

    sdf = sdf.select(
        *key,
        *[_clock_fill(c) for c in value_cols],
        F.when(F.col("__clk") == 0, F.col("__ev_ms")).otherwise(F.lit(0)).alias("__ev_ms"),
        "__clk",
        F.when(F.col("__clk") == 1, F.col(tcol)).alias("__wm_ts"),
    ).withWatermark("__wm_ts", "0 milliseconds")

    state_schema = "__entry_ms long, __hist_ms long, " + ", ".join(
        f"`{c}` {'binary' if c in tun else ddl[c]}" for c in cols
    )
    out_schema = ", ".join(f"`{c}` {ddl[c]}" for c in cols) + ", __fired boolean"
    proc = _make_suppress_processor(
        state_schema, cols, key, tcol, limit_ms, cols + ["__fired"], tun=frozenset(tun)
    )

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        (
            batch.select(
                *cols,
                F.lit("time").alias("__emit_reason"),
                # timer-fired rows belong to the batch whose stream time
                # passed the deadline — one earlier than the firing batch
                (F.lit(int(batch_id)) - F.col("__fired").cast("long")).alias("__emit_batch"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"sink_batch={batch_id}"))
        )

    with _rocksdb_provider(spark0):
        res = sdf.groupBy(*key).transformWithState(proc, out_schema, "Update", "EventTime")
        q = (
            res.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if store_name is not None:
        if _last_committed(ckpt) < 0:
            # no batch ever committed ⇒ no state to read; anything else that
            # makes the statestore source fail (bad option, provider
            # mismatch, corrupted checkpoint) must surface, not be swallowed
            # into a silently-empty view (round-12 advice)
            buf = spark0.createDataFrame([], table.df.schema)
        else:
            state_df = (
                spark0.read.format("statestore")
                .option("path", ckpt)
                .option("stateVarName", "buf")
                .load()
            )
            def _view_col(c):
                col = F.col(f"value.`{c}`")
                if c in tun:
                    # tunneled container cells surface as binary in the state
                    # source — decode back to the native type (bounded
                    # interactive-query view, not a data-scale path)
                    col = F.udf(_dec_c, ddl[c])(col)
                return col.alias(c)

            buf = state_df.filter(F.col("value.__entry_ms").isNotNull()).select(
                *[_view_col(c) for c in cols]
            )
        buf.createOrReplaceTempView(store_name)
    if not _has_emissions(out_dir):
        return _empty_emissions(spark0, table.df.schema, cols)
    return (
        spark0.read.parquet(out_dir)
        .filter(F.col("sink_batch") > F.lit(int(prior_batch)))
        .select(*cols, "__emit_reason", "__emit_batch")
    )


# ------------------------------------------------------------------ fk join


def _make_fk_stage_a(state_schema, l_val, lord, l_key_pos, sub_cols, tun_l=frozenset()):
    StatefulProcessor = _import_stateful_processor()
    n_lv = len(l_val)
    l_idx = {c: i for i, c in enumerate(l_val)}
    out_row = Row(*sub_cols)

    def _load(vals):
        return [_dec_c(x) if c in tun_l else _norm(x) for c, x in zip(l_val, vals)]

    def _store(vals):
        return [_enc_c(v) if c in tun_l else v for c, v in zip(l_val, vals)]

    class FKResolver(StatefulProcessor):
        def init(self, handle):
            self.st = handle.getValueState("sub", state_schema)

        def close(self):
            pass

        def handleInputRows(self, key, rows, timerValues):
            def make_ord(lookup):
                vals = []
                for c in lord:
                    v = _norm(key[l_key_pos[c]]) if c in l_key_pos else _norm(lookup(c))
                    if v is None:
                        raise ValueError(
                            "null order value in the tws fk-join engine — use engine='exact'"
                        )
                    vals.append(v)
                return tuple(vals)

            st = self.st.get()
            if st is not None:
                was_set, jfk = True, st[0]
                vals = _load(st[1:])
            else:
                was_set, jfk, vals = False, None, [None] * n_lv
            old_jfk = jfk
            cur_ord = make_ord(lambda c: vals[l_idx[c]]) if was_set else None
            changed = False
            for row in rows:
                ov = make_ord(lambda c: _norm(row[c]))
                if (cur_ord is None) or ov >= cur_ord:
                    vals = [_norm(row[c]) for c in l_val]
                    jfk = row["__jfk_in"]
                    cur_ord, changed = ov, True
            if not changed:
                return
            self.st.update((jfk, *_store(vals)))
            key_vals = [_norm(k) for k in key]
            if was_set and old_jfk != jfk:
                # the unsubscribe half of the KIP-213 re-key round-trip
                yield out_row("D", old_jfk, *key_vals, *([None] * n_lv))
            yield out_row("U", jfk, *key_vals, *vals)

    return FKResolver()


def _make_fk_stage_b(
    r_state_schema,
    subs_schema,
    l_key,
    l_val,
    r_val,
    rord,
    rk,
    how,
    out_cols,
    tun_l=frozenset(),
    tun_r=frozenset(),
):
    StatefulProcessor = _import_stateful_processor()
    n_lk, n_lv, n_rv = len(l_key), len(l_val), len(r_val)
    r_idx = {c: i for i, c in enumerate(r_val)}
    out_row = Row(*out_cols)
    lkv = list(l_key) + list(l_val)

    def _load_r(vals):
        return [_dec_c(x) if c in tun_r else _norm(x) for c, x in zip(r_val, vals)]

    def _store_r(vals):
        return [_enc_c(v) if c in tun_r else v for c, v in zip(r_val, vals)]

    def _load_sub(vals):
        return [_dec_c(x) if c in tun_l else _norm(x) for c, x in zip(lkv, vals)]

    def _store_sub(vals):
        return [_enc_c(v) if c in tun_l else v for c, v in zip(lkv, vals)]

    class FKJoin(StatefulProcessor):
        def init(self, handle):
            self.rstate = handle.getValueState("right", r_state_schema)
            self.subs = handle.getListState("subs", subs_schema)

        def close(self):
            pass

        def handleInputRows(self, key, rows, timerValues):
            def r_ord_of(lookup):
                vals = []
                for c in rord:
                    v = key[0] if c == rk else _norm(lookup(c))
                    if v is None:
                        raise ValueError(
                            "null order value in the tws fk-join engine — use engine='exact'"
                        )
                    vals.append(v)
                return tuple(vals)

            st = self.rstate.get()
            if st is not None:
                r_set = bool(st[0])
                r_vals = _load_r(st[1:])
            else:
                r_set, r_vals = False, [None] * n_rv
            subs = {}
            if self.subs.exists():
                for s in self.subs.get():
                    vals = _load_sub(s[1:])
                    subs[tuple(vals[:n_lk])] = {"sub": s[0], "vals": vals}
            cur_rord = r_ord_of(lambda c: r_vals[r_idx[c]]) if r_set else None
            right_changed = False
            lops = []
            for row in rows:
                op = row["op"]
                if op == "R":
                    ov = r_ord_of(lambda c: _norm(row[c]))
                    if (cur_rord is None) or ov >= cur_rord:
                        r_vals = [_norm(row[c]) for c in r_val]
                        cur_rord, r_set, right_changed = ov, True, True
                else:
                    lops.append(
                        (
                            row["__sub"],
                            op,
                            tuple(_norm(row[c]) for c in l_key),
                            [_norm(row[c]) for c in l_key + l_val],
                        )
                    )
            changed, removed = {}, {}
            for sub, op, pkt, vals in sorted(lops, key=lambda t: t[0]):
                cur = subs.get(pkt)
                if op == "U":
                    if cur is None or cur["sub"] <= sub:
                        subs[pkt] = {"sub": sub, "vals": vals}
                        changed[pkt] = True
                        removed.pop(pkt, None)
                elif cur is None or cur["sub"] <= sub:
                    subs.pop(pkt, None)
                    removed[pkt] = True
                    changed.pop(pkt, None)
            if not (right_changed or changed or removed):
                return
            self.rstate.update((r_set, *_store_r(r_vals)))
            if subs:
                self.subs.put([(e["sub"], *_store_sub(e["vals"])) for e in subs.values()])
            else:
                self.subs.clear()
            if how == "left" or r_set:
                ups = subs.keys() if right_changed else [p for p in changed if p in subs]
                pad = r_vals if r_set else [None] * n_rv
                for pkt in ups:
                    yield out_row("U", *subs[pkt]["vals"], *pad)
            for pkt in removed:
                yield out_row("D", *pkt, *([None] * (n_lv + n_rv)))

    return FKJoin()


def join_fk_tws(
    left: KStream,
    right: KStream,
    fk: str,
    how: str,
    l_order: Sequence[str] | None,
    r_order: Sequence[str] | None,
    store_name: str | None,
    state_dir: str | None,
    checkpoint: str | None,
) -> DataFrame:
    """transformWithState engine of ``join_fk_streaming`` — the same KIP-213
    two-stage architecture as ``_join_fk_keyed`` (see its docstring for the
    full design): a PK-keyed subscription resolver feeding a durable parquet
    sub-log, then an FK-keyed join state fanning out U/D emissions.  Native
    types end to end (no string tunnel); the subscriber list lives in LIST
    state, and container-typed user VALUE columns ride both states as
    pickled binary (_enc_c — the upstream value-state client cannot round
    -trip nested containers)."""
    spark0 = left.df.sparkSession
    require_tws(spark0)
    l_key = list(left.key)
    rk = right.key[0]
    l_cols = list(left.df.columns)
    r_val = [c for c in right.df.columns if c != rk]
    overlap = set(l_cols) & set(r_val)
    if overlap:
        raise ValueError(
            f"left columns and right value columns must be disjoint; overlap: {sorted(overlap)}"
        )
    _check_reserved_columns(
        l_cols + list(right.df.columns),
        {
            "op": "subscription/emission op tag",
            "__jfk": "fk grouping column",
            "__jfk_in": "SQL-canonical fk string",
            "__sub": "stage-A batch cursor",
            "__op_rank": "final-fold tie-breaker",
            "sink_batch": "emission-log partition column",
        },
        "tws fk-join engine",
    )
    l_ddl = {f.name: f.dataType.simpleString() for f in left.df.schema.fields}
    r_ddl = {f.name: f.dataType.simpleString() for f in right.df.schema.fields}
    if fk not in l_ddl:
        raise ValueError(f"fk column {fk!r} not in left columns")
    if l_ddl[fk] != r_ddl[rk]:
        raise ValueError(
            f"the tws fk-join engine requires equal fk/right-key dtypes; "
            f"{fk}:{l_ddl[fk]} vs {rk}:{r_ddl[rk]} — cast one side or use engine='exact'"
        )
    lord = tuple(l_order) if l_order else ((left.ts,) if left.ts else ())
    rord = tuple(r_order) if r_order else ((right.ts,) if right.ts else ())
    if not lord or not rord:
        raise ValueError("changelog order required per side (ts or explicit l_order/r_order)")
    for oc, cols in ((lord, l_cols), (rord, right.df.columns)):
        missing = [c for c in oc if c not in cols]
        if missing:
            raise ValueError(f"order columns {missing} not in the side's columns")
    l_val = [c for c in l_cols if c not in l_key]
    _refuse_hard_containers(
        "tws fk-join engine",
        (left.df.schema, list(l_key) + [fk] + list(lord)),
        (right.df.schema, list(rord)),
    )
    # container VALUE columns ride the state as pickled binary (see _enc_c);
    # the sub-log parquet keeps them NATIVE (stage A emits decoded values)
    tun_l = _container_cols(left.df.schema, l_val)
    tun_r = _container_cols(right.df.schema, r_val)
    empty_out = KTable(spark0.createDataFrame([], left.df.schema), left.key, left.ts).join_fk(
        KTable(spark0.createDataFrame([], right.df.schema), right.key, right.ts), fk, how=how
    ).df

    # ---------------- state dirs, binding, versioning ----------------
    root = state_dir or tempfile.mkdtemp(prefix="pse-fkjoin-tws-")
    os.makedirs(root, exist_ok=True)
    _check_no_pending_compaction(root)
    subdir = os.path.join(root, "sub")
    outdir = os.path.join(root, "out")
    os.makedirs(subdir, exist_ok=True)
    ckpt_base = _checkpoint(checkpoint)
    ckpt_a = _bind_state_checkpoint(
        subdir,
        os.path.join(ckpt_base, "sub"),
        _has_emissions(subdir),
        "prior fk-join subscription log",
    )
    ckpt_b = _bind_state_checkpoint(
        outdir,
        os.path.join(ckpt_base, "join"),
        _has_emissions(outdir),
        "prior fk-join emissions",
    )
    _stamp_version(
        root,
        "_PSE_TWS_FKJOIN_V",
        _TWS_FKJOIN_VERSION,
        (
            _has_emissions(subdir)
            or _has_emissions(outdir)
            or _last_committed(ckpt_a) >= 0
            or _last_committed(ckpt_b) >= 0
        ),
        "tws fk-join",
    )
    _maybe_autocompact(spark0, root, ckpt_base, key=l_key)

    # ---------------- stage A: subscription resolver (keyed by left PK) ----------------
    a_src = left.df
    for k in l_key:
        a_src = a_src.filter(F.col(k).isNotNull())  # to_table drops null keys
    a_in = a_src.select(
        *l_cols,
        F.col(fk).cast("string").alias("__jfk_in"),  # SQL-canonical join string
    )
    l_key_pos = {c: i for i, c in enumerate(l_key)}
    state_a = "__jfk string" + "".join(
        f", `{c}` {'binary' if c in tun_l else l_ddl[c]}" for c in l_val
    )
    sub_cols = ["op", "__jfk", *l_key, *l_val]
    sub_schema = "op string, __jfk string" + "".join(
        f", `{c}` {l_ddl[c]}" for c in l_key + l_val
    )

    proc_a = _make_fk_stage_a(state_a, l_val, lord, l_key_pos, sub_cols, tun_l=frozenset(tun_l))

    def _sink_a(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("overwrite").parquet(os.path.join(subdir, f"sink_batch={batch_id}"))

    with _rocksdb_provider(spark0):
        res_a = a_in.groupBy(*l_key).transformWithState(proc_a, sub_schema, "Update", "None")
        qa = (
            res_a.writeStream.foreachBatch(_sink_a)
            .option("checkpointLocation", ckpt_a)
            .trigger(availableNow=True)
            .start()
        )
        qa.awaitTermination()

        # ---------------- stage B: per-fk join state over sub-log ∪ right ----------------
        sub_stream = spark0.readStream.schema(sub_schema + ", sink_batch int").parquet(subdir)
        b_l = sub_stream.select(
            "op",
            "__jfk",
            F.col("sink_batch").alias("__sub"),
            *l_key,
            *l_val,
            *[F.lit(None).cast(r_ddl[c]).alias(c) for c in r_val],
        )
        r_src = right.df.filter(F.col(rk).isNotNull())
        b_r = r_src.select(
            F.lit("R").alias("op"),
            F.col(rk).cast("string").alias("__jfk"),
            F.lit(None).cast("int").alias("__sub"),
            *[F.lit(None).cast(l_ddl[c]).alias(c) for c in l_key + l_val],
            *[F.col(c) for c in r_val],
        )
        b_in = b_l.unionByName(b_r)
        state_b = "__r_set boolean" + "".join(
            f", `{c}` {'binary' if c in tun_r else r_ddl[c]}" for c in r_val
        )
        subs_schema = "__sub int" + "".join(
            f", `{c}` {'binary' if c in tun_l else l_ddl[c]}" for c in l_key + l_val
        )
        out_cols = ["op", *l_key, *l_val, *r_val]
        out_schema = (
            "op string"
            + "".join(f", `{c}` {l_ddl[c]}" for c in l_key + l_val)
            + "".join(f", `{c}` {r_ddl[c]}" for c in r_val)
        )
        proc_b = _make_fk_stage_b(
            state_b,
            subs_schema,
            l_key,
            l_val,
            r_val,
            rord,
            rk,
            how,
            out_cols,
            tun_l=frozenset(tun_l),
            tun_r=frozenset(tun_r),
        )

        def _sink_b(batch: DataFrame, batch_id: int) -> None:
            if batch.isEmpty():
                return
            batch.write.mode("overwrite").parquet(os.path.join(outdir, f"sink_batch={batch_id}"))

        res_b = b_in.groupBy("__jfk").transformWithState(proc_b, out_schema, "Update", "None")
        qb = (
            res_b.writeStream.foreachBatch(_sink_b)
            .option("checkpointLocation", ckpt_b)
            .trigger(availableNow=True)
            .start()
        )
        qb.awaitTermination()

    if not _has_emissions(outdir):
        return empty_out
    ranked = spark0.read.parquet(outdir).withColumn(
        "__op_rank", (F.col("op") == "U").cast("int")
    )
    snap = KStream(ranked, tuple(l_key), None).to_table(order=("sink_batch", "__op_rank")).df
    snap = snap.filter(F.col("op") == "U").select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in empty_out.schema.fields]
    )
    if store_name is not None:
        snap.createOrReplaceTempView(store_name)
    return snap


# ------------------------------------------------------------------ as-of join

_TWS_ASOF_VERSION = "1"


def _make_asof_processor(hist_schema, r_vals, l_vals, n_key, how, tol_ms, out_cols, tun_r):
    """Per-key as-of lookup (r12 verdict task 4): the key's version history
    lives in LIST state (append-only — history rows arrive once, in the
    first batch that reads the staged history file); each stream record
    binary-searches the sorted versions for the latest ``hts <= sts`` —
    the reference's per-record ValueGetter read
    (KStreamKTableJoinProcessor.cs:38-43) with KIP-889/KIP-914 versioned
    rather than latest-only semantics.  Null-ts versions sort BEFORE every
    real version (the batch window's NULLS FIRST), emitting with a null
    ``matched_ts``; tolerance turns an out-of-window match into the no-match
    row, and ``inner`` drops rows whose matched_ts is null — all matching
    ``dsl.join_asof`` exactly (the differential fuzz is the gate)."""
    import bisect  # noqa: PLC0415
    import datetime as _dt  # noqa: PLC0415

    StatefulProcessor = _import_stateful_processor()
    out_row = Row(*out_cols)
    n_rv = len(r_vals)
    tol = _dt.timedelta(milliseconds=tol_ms) if tol_ms is not None else None

    def _load_r(vals):
        return [_dec_c(x) if c in tun_r else _norm(x) for c, x in zip(r_vals, vals)]

    def _store_r(vals):
        return [_enc_c(v) if c in tun_r else v for c, v in zip(r_vals, vals)]

    class AsofLookup(StatefulProcessor):
        def init(self, handle):
            self.hist = handle.getListState("hist", hist_schema)

        def close(self):
            pass

        def handleInputRows(self, key, rows, timerValues):
            new_h, pending = [], []
            for row in rows:
                if row["__side"] == 0:
                    new_h.append((_norm(row["__hts"]), *_store_r([row[c] for c in r_vals])))
                else:
                    pending.append(
                        (_norm(row["__sts"]), [_norm(row[c]) for c in l_vals])
                    )
            if new_h:
                # history is bounded by the versioned store's retention; it
                # arrives ONCE (first batch) — append, never rewrite
                self.hist.appendList(new_h)
            if not pending:
                return
            hist = []
            if self.hist.exists():
                for s in self.hist.get():
                    hist.append((_norm(s[0]), _load_r(s[1 : 1 + n_rv])))
            # null-ts versions first (batch NULLS FIRST), then ts; stable on
            # ties so the last-arrived equal-ts version wins like last()
            hist.sort(key=lambda e: (e[0] is not None, e[0] or 0))
            hts_keys = [(e[0] is not None, e[0] or 0) for e in hist]
            key_vals = [_norm(k) for k in key[:n_key]]
            for sts, lvs in pending:
                matched = None
                if hist:
                    # a null-ts stream row sorts after ONLY the null-ts
                    # versions in the batch window (NULLS FIRST), so it
                    # matches the last null-ts version — same as dsl.join_asof
                    # (round-13 review finding 3)
                    probe = (False, 0) if sts is None else (True, sts)
                    i = bisect.bisect_right(hts_keys, probe)
                    if i > 0:
                        matched = hist[i - 1]
                if matched is not None and tol is not None:
                    mts = matched[0]
                    if sts is None or mts is None or mts < sts - tol:
                        matched = None
                if matched is None:
                    if how == "inner":
                        continue
                    yield out_row(*key_vals, sts, *lvs, *([None] * n_rv), None)
                else:
                    if how == "inner" and matched[0] is None:
                        continue  # matched_ts null (null-ts version) — batch drops it
                    yield out_row(*key_vals, sts, *lvs, *matched[1], matched[0])

    return AsofLookup()


def join_table_asof_tws(
    stream: KStream,
    table,
    how: str,
    tolerance_ms: int | None,
    matched_ts: str,
    out_dir: str | None,
    checkpoint: str | None,
) -> DataFrame:
    """transformWithState engine of ``join_table_asof_streaming`` (r12
    verdict task 4 — the last continuous stateful loop without a per-key
    realization).  The exact engine re-joins each microbatch against the
    FULL history (per-batch shuffle bounded by history size); here the
    history shuffles ONCE into per-key LIST state — staged as a parquet
    file-source unioned with the stream, fully delivered in the first batch
    — and every later batch shuffles only its own records, with per-record
    lookups against RocksDB state.  The 100 TB shape: per-batch I/O is
    O(batch + touched keys' histories), never O(history).

    The history is BOUND at first drain (staged under ``<out_dir>/hist``);
    resumed drains reuse the staged version history — pass a fresh out_dir
    for a changed table (the exact engine re-reads the live table each
    drain instead).  Emissions append to ``<out_dir>/out/sink_batch=<id>``
    partitions (overwritten on crash-replay — exactly-once) and the return
    is the accumulated result across all drains, like the exact engine."""
    spark0 = stream.df.sparkSession
    require_tws(spark0)
    if not stream.df.isStreaming:
        raise ValueError("join_table_asof_streaming requires a streaming stream side")
    if stream.ts is None or table.ts is None:
        raise ValueError("as-of join requires ts on both sides")
    if len(stream.key) != len(table.key):
        raise ValueError("join key arity mismatch")
    if how not in ("inner", "left"):
        raise ValueError("as-of join supports inner|left")
    s_ddl = {f.name: f.dataType.simpleString() for f in stream.df.schema.fields}
    t_ddl = {f.name: f.dataType.simpleString() for f in table.df.schema.fields}
    if s_ddl[stream.ts] != "timestamp" or t_ddl[table.ts] != "timestamp":
        raise ValueError(
            "the tws as-of engine requires timestamp ts columns on both sides "
            f"({stream.ts}:{s_ddl[stream.ts]}, {table.ts}:{t_ddl[table.ts]}) — "
            "use engine='exact'"
        )
    l_key = list(stream.key)
    l_vals = [c for c in stream.df.columns if c not in l_key and c != stream.ts]
    r_vals = [c for c in table.df.columns if c not in table.key and c != table.ts]
    overlap = (set(l_vals) | {stream.ts}) & set(r_vals)
    if overlap:
        raise ValueError(f"sides must have disjoint value column names; overlap: {sorted(overlap)}")
    _check_reserved_columns(
        list(stream.df.columns) + list(table.df.columns) + [matched_ts],
        {
            "sink_batch": "emission-log partition column",
            "__side": "history/stream union tag",
            "__sts": "stream event-time projection",
            "__hts": "version event-time projection",
            **{f"__jk{i}": "join-key grouping column" for i in range(len(l_key))},
        },
        "tws as-of engine",
    )
    _refuse_hard_containers(
        "tws as-of engine",
        (stream.df.schema, list(l_key) + [stream.ts]),
        (table.df.schema, list(table.key) + [table.ts]),
    )
    tun_r = _container_cols(table.df.schema, r_vals)

    for lk, rk_ in zip(l_key, table.key):
        if s_ddl[lk] != t_ddl[rk_]:
            raise ValueError(
                f"the tws as-of engine requires equal key dtypes across sides; "
                f"{lk}:{s_ddl[lk]} vs {rk_}:{t_ddl[rk_]} — cast one side or use engine='exact'"
            )

    root = out_dir or tempfile.mkdtemp(prefix="pse-asof-tws-")
    os.makedirs(root, exist_ok=True)
    if any(e.startswith("sink_batch=") or e.startswith("part-") for e in os.listdir(root)):
        raise ValueError(
            f"out dir {root!r} holds the exact as-of engine's output layout; "
            "pass engine='exact' to resume it, or a fresh out_dir"
        )
    emit_dir = os.path.join(root, "out")
    hist_dir = os.path.join(root, "hist")
    ckpt = _bind_state_checkpoint(
        root, _checkpoint(checkpoint), _has_emissions(emit_dir), "prior as-of join output"
    )
    _stamp_version(
        root,
        "_PSE_TWS_ASOF_V",
        _TWS_ASOF_VERSION,
        _has_emissions(emit_dir) or _last_committed(ckpt) >= 0,
        "tws as-of join",
    )
    import shutil  # noqa: PLC0415

    if os.path.isdir(hist_dir) and not os.path.exists(os.path.join(hist_dir, "_SUCCESS")):
        # torn staging (crash mid-write before this code staged atomically):
        # the drain never started, so nothing consumed it — restage
        shutil.rmtree(hist_dir)
    if not os.path.isdir(hist_dir):
        # stage the version history ONCE (single delivery, first batch);
        # null keys dropped on both sides (KStreamKTableJoinProcessor.cs:31-35).
        # Written to a tmp dir + os.rename so a crash mid-write can never
        # leave a partial hist_dir that a resumed drain would silently join
        # against (round-13 review finding 1)
        tmp_hist = hist_dir + "-tmp"
        shutil.rmtree(tmp_hist, ignore_errors=True)
        h = table.df
        for k in table.key:
            h = h.filter(F.col(k).isNotNull())
        h.write.parquet(tmp_hist)
        os.rename(tmp_hist, hist_dir)

    jk = [f"__jk{i}" for i in range(len(l_key))]
    hist_schema_src = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in table.df.schema.fields)
    h_src = spark0.readStream.schema(hist_schema_src).parquet(hist_dir)
    h_tagged = h_src.select(
        F.lit(0).alias("__side"),
        *[F.col(k).alias(j) for k, j in zip(table.key, jk)],
        F.lit(None).cast("timestamp").alias("__sts"),
        F.col(table.ts).alias("__hts"),
        *[F.lit(None).cast(s_ddl[c]).alias(c) for c in l_vals],
        *[F.col(c) for c in r_vals],
    )
    s_src = stream.df
    for k in l_key:
        s_src = s_src.filter(F.col(k).isNotNull())
    s_tagged = s_src.select(
        F.lit(1).alias("__side"),
        *[F.col(k).alias(j) for k, j in zip(l_key, jk)],
        F.col(stream.ts).alias("__sts"),
        F.lit(None).cast("timestamp").alias("__hts"),
        *[F.col(c) for c in l_vals],
        *[F.lit(None).cast(t_ddl[c]).alias(c) for c in r_vals],
    )
    tagged = h_tagged.unionByName(s_tagged)

    hist_state = "__hts timestamp" + "".join(
        f", `{c}` {'binary' if c in tun_r else t_ddl[c]}" for c in r_vals
    )
    out_cols = [*l_key, stream.ts, *l_vals, *r_vals, matched_ts]
    out_schema = (
        "".join(f"`{c}` {s_ddl[c]}, " for c in l_key)
        + f"`{stream.ts}` timestamp"
        + "".join(f", `{c}` {s_ddl[c]}" for c in l_vals)
        + "".join(f", `{c}` {t_ddl[c]}" for c in r_vals)
        + f", `{matched_ts}` timestamp"
    )
    proc = _make_asof_processor(
        hist_state, r_vals, l_vals, len(l_key), how, tolerance_ms, out_cols, frozenset(tun_r)
    )

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("overwrite").parquet(os.path.join(emit_dir, f"sink_batch={batch_id}"))

    with _rocksdb_provider(spark0):
        res = tagged.groupBy(*jk).transformWithState(proc, out_schema, "Update", "None")
        q = (
            res.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if not _has_emissions(emit_dir):
        empty = KStream(
            spark0.createDataFrame([], stream.df.schema), stream.key, stream.ts
        )
        return empty.join_table_asof(
            table, how=how, tolerance_ms=tolerance_ms, matched_ts=matched_ts
        ).df
    return spark0.read.parquet(emit_dir).drop("sink_batch")

"""Structured Streaming wiring: the runtime surface of the reference
(core/KafkaStream.cs Start/Dispose lifecycle, core/Kafka/* consumer/producer
plumbing, core/Processors/StreamThread.cs) re-expressed as
``readStream``/``writeStream`` around the SAME logical DSL.

Design (SURVEY §3.2, §4.2): every operator in dsl.py is a logical DataFrame
transformation, so the identical topology runs in batch (parquet in, result
out) and streaming (Kafka/file in, sink out) — the analog of the reference's
topology being driven either by unit-test drivers (TopologyTestDriver) or the
live consumer loop.  Batch is the correctness oracle; the parity tests in
tests/test_streaming.py replay the same data through both paths and require
identical final state.

Mappings:
  * consume loop + rebalance   → Spark microbatch scheduler (nothing to write)
  * changelog/state restore    → checkpointLocation (RocksDB/HDFS state store)
  * grace period               → withWatermark (KStream.with_watermark)
  * KTable upsert              → groupBy(key).agg(max_by(values, order)) in
                                 update/complete mode (dsl.KStream.to_table
                                 branches on df.isStreaming)
  * custom stateful processor  → applyInPandasWithState (stateful_map)
  * Kafka serdes               → serdes.decode_kafka / encode_kafka

Kafka connectivity needs the external spark-sql-kafka package (same situation
as the reference needing librdkafka at runtime); the builders construct the
real plan and raise a clear error when the connector is absent.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dsl import KStream, KTable, _as_tuple
from .runtime import configure
from .serdes import decode_kafka, encode_kafka

__all__ = [
    "StreamingBuilder",
    "run_available_now",
    "materialize_stream",
    "start_to_files",
    "start_to_kafka",
    "start_foreach_batch",
    "stateful_map",
    "suppress_buffered",
    "sessionize_streaming",
    "join_tables_streaming",
    "join_fk_streaming",
    "join_windowed_eager",
    "join_table_asof_streaming",
    "cogroup_streaming",
    "observed_metrics",
    "compact_emission_log",
]


def observed_metrics(query) -> dict:
    """Read the named ``observe`` metrics from a StreamingQuery's last
    progress event — the streaming read side of KStream.observe/peek (the
    KafkaStream metrics surface analog).  Returns {name: {metric: value}};
    empty before the first completed microbatch."""
    progress = query.lastProgress
    if not progress:
        return {}
    return dict(progress.get("observedMetrics") or {})


def _checkpoint(path: str | None) -> str:
    """Checkpoint dir (the changelog-topic analog: exactly-once state).  A
    real deployment MUST pass a durable path; tests get a throwaway one."""
    return path or os.path.join(tempfile.gettempdir(), f"pse-ckpt-{uuid.uuid4().hex}")


def _has_watermark(df: DataFrame) -> bool:
    """Whether the streaming plan carries an event-time watermark — used
    only to raise a DESCRIPTIVE error before Spark's opaque analysis
    exception; on any introspection failure err toward True (never block a
    legal plan)."""
    try:
        return "EventTimeWatermark" in df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return True


def _read_gen(root: str) -> int:
    """Recover the ping-pong generation counter persisted by _write_gen.

    The foreachBatch upsert loops keep state in parquet generation dirs; the
    Structured Streaming checkpoint is durable, so on a restart with the same
    checkpoint already-committed microbatches are SKIPPED — the generation
    counter must therefore survive alongside the state dirs, or the loop
    would overwrite the newest generation / read a stale one.  A state dir
    that already holds generation data WITHOUT a readable marker is refused
    outright: guessing generation 0 would merge the continuation into a
    stale ping-pong slot and produce silently wrong aggregates."""
    try:
        with open(os.path.join(root, "_GEN")) as f:
            return int(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        existing = (
            [
                e
                for e in os.listdir(root)
                if e not in ("_GEN", "_GEN.tmp", "_PSE_BIND", "_PSE_BIND.tmp")
            ]
            if os.path.isdir(root)
            else []
        )
        if existing:
            raise ValueError(
                f"state dir {root!r} holds existing state {sorted(existing)[:4]} but no "
                "readable _GEN marker; refusing to guess the generation — pass a fresh "
                "state_dir or restore the marker"
            ) from None
        return 0


def _write_gen(root: str, n: int, applied_batch: int | None = None) -> None:
    """Atomically persist the generation counter next to the state dirs
    (write-then-rename, so a crash mid-write leaves the previous value).

    ``applied_batch`` records, IN THE SAME atomic write, the last microbatch
    id folded into this generation: a crash between the state write and the
    streaming checkpoint commit makes Spark REPLAY that batch on restart,
    and without the marker the replay would read the post-batch generation
    as its input snapshot and fold the batch a second time (for the
    suppress buffer: re-buffer and later re-emit already-emitted keys)."""
    tmp = os.path.join(root, "_GEN.tmp")
    with open(tmp, "w") as f:
        f.write(str(int(n)) if applied_batch is None else f"{int(n)} {int(applied_batch)}")
    os.replace(tmp, os.path.join(root, "_GEN"))


def _read_applied(root: str) -> int:
    """Last microbatch id recorded by _write_gen (or -1): foreachBatch state
    loops skip a replayed batch whose fold already committed to the state
    dirs — the idempotent-replay half of the _GEN contract."""
    try:
        with open(os.path.join(root, "_GEN")) as f:
            parts = f.read().split()
            return int(parts[1]) if len(parts) > 1 else -1
    except (OSError, ValueError):
        return -1


def _last_committed(checkpoint: str) -> int:
    """Highest microbatch id COMMITTED in a streaming checkpoint (or -1) —
    read from the commits log, the source of truth for which batches were
    durably delivered (a batch that wrote output but crashed pre-commit is
    replayed by Spark and must count as undelivered)."""
    commits = os.path.join(checkpoint, "commits")
    try:
        ids = [int(e) for e in os.listdir(commits) if e.isdigit()]
    except OSError:
        return -1
    return max(ids, default=-1)


def _read_bind(path: str) -> str | None:
    try:
        with open(path) as f:
            return f.read().strip() or None
    except OSError:
        return None


# keyed-suppress state/sink schema version: bumped to "2" when integral
# columns started riding the string tunnel (exact bigint round-trip); a
# populated dir whose version differs is refused instead of letting Spark's
# state-schema check fail opaquely mid-drain
_KEYED_STATE_VERSION = "2"


def _max_sink_batch(root: str) -> int:
    """Highest ``sink_batch=<id>`` partition under root or root/out (or -1)
    — the delivered-batch cursor of the sink-partitioned loops (keyed
    suppress, as-of join), which keep no _GEN.  Used to cross-check legacy
    adoption: an emission cannot postdate its own checkpoint's commits by
    more than the one crash-replayed batch."""
    best = -1
    for d in (root, os.path.join(root, "out")):
        try:
            entries = os.listdir(d)
        except OSError:
            continue
        for e in entries:
            if e.startswith("sink_batch="):
                try:
                    best = max(best, int(e.split("=", 1)[1]))
                except ValueError:
                    pass
    return best


def _bind_state_checkpoint(root: str, ckpt: str, populated: bool, what: str) -> str:
    """Pair a parquet state dir with the ONE streaming checkpoint allowed to
    drive it, and refuse every other combination (r9 verdict item 3).

    The foreachBatch state loops derive their replay-skip / delivery cursors
    from the checkpoint's batch ids, so a populated state dir paired with a
    WRONG-but-existing checkpoint (from a different query or topology) would
    silently skip foreign batch ids or re-deliver old emissions — the
    reference cannot make this mistake because its changelog topics are keyed
    by appId+store (core/State/Logging/
    ChangeLoggingTimestampedKeyValueBytesStore.cs:8).  At first use (both
    sides fresh) a random token is written to ``<root>/_PSE_BIND`` and
    ``<ckpt>/_PSE_BIND``; thereafter the pair must match:

      * tokens match — resume OK;
      * state dir populated + bound, checkpoint missing/mismatched — refused
        (covers both the old checkpoint=None hole and the wrong-checkpoint
        hole);
      * state dir populated but UNBOUND (created before the marker protocol)
        — adopted iff the offered checkpoint is also unbound and its commit
        cursor is consistent with the state dir's delivery cursor: committed
        ∈ {applied, applied−1} for _GEN loops, committed ∈ {max(sink_batch),
        max(sink_batch)−1} for the sink-partitioned loops (keyed suppress /
        as-of keep no _GEN but their emissions name the batches that
        produced them); a fresh or inconsistent checkpoint is refused.  Two
        UNAUTHENTICATABLE legacy shapes — a dir with NEITHER cursor nor
        emissions (nothing to cross-check), and a checkpoint whose commits
        run AHEAD of the emissions by more than the clean-stop window
        (legal when trailing batches emitted nothing, indistinguishable
        from a foreign run) — are REFUSED by default and adopt only under
        the documented opt-in ``PSE_ADOPT_LEGACY=1`` (r10 review finding:
        silent adoption of an arbitrarily-ahead checkpoint skips replays).
        Adoption is one-time: the pair is bound on success, so only legacy
        dirs ever take this path;
      * checkpoint bound elsewhere, or unbound but already holding committed
        batches, offered against a fresh/unpopulated state dir — refused
        (its committed batches would be skipped against empty state);
      * state dir bound but never populated (crash before the first fold) —
        re-bound to the offered checkpoint (unless that checkpoint already
        has foreign commits, refused above).

    Returns ``ckpt`` so call sites can bind and resolve in one expression."""
    s_path = os.path.join(root, "_PSE_BIND")
    c_path = os.path.join(ckpt, "_PSE_BIND")
    sbind, cbind = _read_bind(s_path), _read_bind(c_path)
    if sbind is not None and sbind == cbind:
        return ckpt
    committed = _last_committed(ckpt)
    if populated:
        if sbind is None:
            # legacy (pre-marker) state dir: adopt its original checkpoint —
            # recognizable as unbound-with-commits whose commit cursor lines
            # up with the state dir's applied cursor (equal after a clean
            # stop; committed = applied-1 when the last fold committed its
            # state but crashed before the checkpoint commit)
            applied = _read_applied(root)
            if applied != -1:
                consistent = committed in (applied, applied - 1)
            else:
                # cursor-free loops (keyed suppress / as-of) still leave a
                # delivered-batch trail in their sink_batch partitions: the
                # original checkpoint's commits must line up with the
                # highest emitted batch (equal after a clean stop, one less
                # when the last fold committed state but crashed before the
                # checkpoint commit).  A checkpoint further AHEAD is legal
                # (trailing batches may emit nothing) but unverifiable, and
                # a dir with neither cursor nor emissions has nothing to
                # check at all — both adopt only under the explicit
                # PSE_ADOPT_LEGACY=1 opt-in.
                sink = _max_sink_batch(root)
                adopt_legacy = os.environ.get("PSE_ADOPT_LEGACY") == "1"
                consistent = (sink != -1 and committed in (sink, sink - 1)) or (
                    adopt_legacy and (sink == -1 or committed >= sink - 1)
                )
            if cbind is None and committed >= 0 and consistent:
                pass  # fall through to bind the adopted pair
            else:
                raise ValueError(
                    f"state dir {root!r} holds {what} but no _PSE_BIND marker, and "
                    f"the offered checkpoint (committed batch {committed}, "
                    f"{'un' if cbind is None else ''}bound) is not recognizably its "
                    "original — refusing to pair; pass the original checkpoint or a "
                    "fresh state_dir (a legacy pair that cannot be cross-checked "
                    "adopts only under PSE_ADOPT_LEGACY=1)"
                )
        else:
            raise ValueError(
                f"state dir {root!r} holds {what} bound to a different checkpoint "
                f"(state bind {sbind[:8]}, offered checkpoint bind "
                f"{cbind[:8] if cbind else 'none'}): its batch ids would renumber or "
                "skip and silently drop or re-deliver data; resuming requires the "
                "query's original checkpointLocation (or a fresh state_dir)"
            )
    elif cbind is not None or committed >= 0:
        raise ValueError(
            f"checkpoint {ckpt!r} already belongs to a different {what} run "
            f"({'bind ' + cbind[:8] if cbind else f'committed batch {committed}, unbound'}); "
            "resuming it against this fresh state dir would skip its committed "
            "batches' folds — pass the original state_dir or a fresh checkpoint"
        )
    token = uuid.uuid4().hex
    os.makedirs(root, exist_ok=True)
    os.makedirs(ckpt, exist_ok=True)
    # state marker first: a crash between the writes leaves an UNPOPULATED
    # bound state dir, which re-binds on the next attempt (the reverse order
    # would leave a bound checkpoint that refuses its own retry)
    for p in (s_path, c_path):
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            f.write(token)
        os.replace(tmp, p)
    return ckpt


_COMPACT_TMP = "compact-tmp"
_COMPACT_TRASH_PREFIX = "compact-trash-"


def _check_no_pending_compaction(root: str) -> None:
    """A crashed compact_emission_log leaves recovery markers; draining over
    a half-swapped log would read a wrong snapshot.  Since compaction can now
    run AUTOMATICALLY at drain entry (_maybe_autocompact), a crashed pass must
    not wedge a previously fully-automatic pipeline behind a manual recovery
    call (round-13 review finding 4) — the recovery is idempotent and provably
    safe (it finishes forward only in unambiguous states, else rolls back), so
    HEAL here and raise only if markers somehow survive recovery."""

    def _pending(entries) -> bool:
        return _COMPACT_TMP in entries or any(
            e.startswith(_COMPACT_TRASH_PREFIX) for e in entries
        )

    try:
        entries = os.listdir(root)
    except OSError:
        return
    if _pending(entries):
        _recover_compaction(os.path.join(root, "out"), root)
        if _pending(os.listdir(root)):
            raise ValueError(
                f"state dir {root!r} holds an interrupted emission-log compaction "
                "(compact-tmp/compact-trash present) that recovery could not "
                "clear; re-run compact_emission_log on it before draining"
            )


def _sink_partitions(out_dir: str) -> dict[int, str]:
    parts = {}
    try:
        for e in os.listdir(out_dir):
            if e.startswith("sink_batch="):
                try:
                    parts[int(e.split("=", 1)[1])] = os.path.join(out_dir, e)
                except ValueError:
                    pass
    except OSError:
        pass
    return parts


# every engine stamps exactly one of these at the state-dir root before its
# first batch, so the marker — not the output columns — identifies the log
# kind (round-12 advice: a tt-join whose USER schema carries a column named
# '__emit_reason' would be misclassified as a suppress log by a column sniff
# and have its committed emission history pruned outright)
_LOG_KIND_MARKERS = (
    ("_PSE_STATE_V", "suppress"),
    ("_PSE_TWS_SUPPRESS_V", "suppress"),
    ("_PSE_TTJOIN_V", "tt"),
    ("_PSE_TWS_TTJOIN_V", "tt"),
    ("_PSE_FKJOIN_V", "fk"),
    ("_PSE_TWS_FKJOIN_V", "fk"),
)


def _detect_log_kind(root: str, is_fk: bool) -> str:
    hits = {kind for marker, kind in _LOG_KIND_MARKERS if os.path.exists(os.path.join(root, marker))}
    if is_fk:
        hits.add("fk")  # the sub/ dir is written only by the fk engines
    if len(hits) == 1:
        return next(iter(hits))
    raise ValueError(
        f"compact_emission_log: cannot identify the engine that wrote {root!r} "
        f"({'no engine version marker found' if not hits else f'conflicting markers for {sorted(hits)}'}) "
        "— compaction folds differently per engine kind and guessing from the "
        "output columns can destroy committed emission history, so refusing; "
        "run at least one drain with the owning engine (which stamps the "
        "marker) before compacting"
    )


def _recover_compaction(out_dir: str, root: str) -> None:
    """Finish or roll back an interrupted compaction (idempotent).

    Crash-state table (install sequence: write tmp → write tmp/_TARGET →
    rename dest→trash → remove _TARGET → rename tmp→dest → delete trash →
    prune).  The ONLY states where finishing forward is provably safe are
    the ones where the complete fold or the displaced base unambiguously
    exists; every ambiguous state rolls BACK (restore the old base, drop
    the fold) — a rolled-back compaction costs a re-run, a wrong
    forward-finish costs committed emission history (round-12 review
    findings 1-2: the first cut misread two pre-swap states as
    post-install and pruned live partitions)."""
    import shutil  # noqa: PLC0415

    tmp = os.path.join(root, _COMPACT_TMP)
    target_path = os.path.join(tmp, "_TARGET")
    trash_ids = {}
    for e in list(os.listdir(root)):
        if e.startswith(_COMPACT_TRASH_PREFIX):
            trash_ids[int(e[len(_COMPACT_TRASH_PREFIX) :])] = os.path.join(root, e)

    def dest_of(n: int) -> str:
        return os.path.join(out_dir, f"sink_batch={n}")

    def prune_below(n: int) -> None:
        for k, p in _sink_partitions(out_dir).items():
            if k < n:
                shutil.rmtree(p, ignore_errors=True)

    if os.path.isdir(tmp):
        if os.path.exists(target_path):
            try:
                n = int(open(target_path).read().strip())
            except ValueError:
                n = None
            if n is None:
                # torn/empty _TARGET: only a non-atomic writer (pre-round-13
                # code) crashing MID-WRITE can produce it, and that crash
                # point provably precedes the dest→trash swap — roll back
                # (drop the fold, out/ is intact, prune nothing)
                shutil.rmtree(tmp)
            elif not os.path.isdir(dest_of(n)):
                # crashed between dest→trash and the install: the fold is
                # complete and the old base is in trash — finish forward
                os.remove(target_path)
                os.rename(tmp, dest_of(n))
                if n in trash_ids:
                    shutil.rmtree(trash_ids.pop(n), ignore_errors=True)
                prune_below(n)
            else:
                # dest still present ⇒ the swap never started (crash right
                # after _TARGET was written): roll back — drop the fold
                # only, out/ is intact, prune NOTHING
                shutil.rmtree(tmp)
        else:
            # no _TARGET: either the fold write crashed midway (dest and
            # all partitions intact) or the crash hit between _TARGET
            # removal and the install (dest missing, old base in trash) —
            # both roll back; restore the old base first if it was
            # displaced
            for n, p in list(trash_ids.items()):
                if not os.path.isdir(dest_of(n)):
                    os.rename(p, dest_of(n))
                    trash_ids.pop(n)
            shutil.rmtree(tmp)
    for n, p in trash_ids.items():
        if os.path.isdir(dest_of(n)):
            # dest present with trash left over ⇒ install completed and the
            # crash hit during cleanup — finish forward
            shutil.rmtree(p, ignore_errors=True)
            prune_below(n)
        else:
            # trash without dest and without a fold: restore the old base
            os.rename(p, dest_of(n))


def compact_emission_log(
    spark: SparkSession,
    state_dir: str,
    checkpoint: str,
    key: Sequence[str] = (),
) -> dict:
    """Compact a per-key engine's unbounded emission log between drains
    (r11 advice): per-microbatch I/O is O(changed keys), but the returned
    snapshot is a latest-per-key fold over the ENTIRE ``out/sink_batch=*``
    history, so snapshot reconstruction degrades as O(total emissions
    ever) on long-lived state dirs.  This folds every partition up to the
    checkpoint's last COMMITTED batch into ONE base partition carrying
    that batch id and prunes the replaced partitions; batches beyond the
    commit cursor are untouched (crash-replay rewrites them).

    Works on the tt-join and fk-join logs of BOTH engine families (pandas
    keyed and tws — same log layout) and on suppress logs:

      * tt join: base = latest-per-key rows (updates only — exact fold);
        pass the JOIN KEY columns via ``key``.
      * fk join: base = latest-per-(left PK) rows by (sink_batch,
        op-rank), RETAINING last-op-D rows (a dropped D could resurrect a
        key if a crash leaves older U partitions behind); also prunes
        subscription-log files stage B's file-source checkpoint has
        provably consumed.  ``key`` = the left PK columns.
      * suppress: emissions are history, never re-read past the delivery
        cursor — partitions strictly below the newest committed partition
        are pruned outright (the newest is kept as the cursor trail).

    Crash-safe and idempotent: the fold is written to ``compact-tmp``
    (completed by a ``_TARGET`` marker) before any partition is touched,
    the displaced base goes to ``compact-trash-<id>`` until the swap
    completes, and a re-run (or this function at next call) finishes or
    rolls back an interrupted pass; the engines refuse to drain over a
    half-swapped log until then.  Run it from the SAME single-writer
    context as the drains — it must not race a live query on the dir.

    Returns a summary dict (kind, folded/pruned partition counts, rows)."""
    import shutil  # noqa: PLC0415

    root = state_dir
    is_fk = os.path.isdir(os.path.join(root, "sub"))
    out_dir = os.path.join(root, "out")
    _recover_compaction(out_dir, root)
    ck = os.path.join(checkpoint, "join") if is_fk else checkpoint
    bind_root = out_dir if is_fk else root
    sbind, cbind = _read_bind(os.path.join(bind_root, "_PSE_BIND")), _read_bind(
        os.path.join(ck, "_PSE_BIND")
    )
    if sbind is None or sbind != cbind:
        raise ValueError(
            f"compact_emission_log: {state_dir!r} is not bound to checkpoint "
            f"{checkpoint!r} — pass the pair the drains use"
        )
    committed = _last_committed(ck)
    parts = _sink_partitions(out_dir)
    foldable = sorted(k for k in parts if k <= committed)

    def _prune_consumed_sub() -> int:
        # prune sub-log files stage B's file-source log has consumed;
        # normalize URI forms (file:/abs, file:///abs, symlinks) so a
        # rendering difference cannot silently dead-end the prune
        def _canon(p: str) -> str:
            if p.startswith("file:"):
                p = p[len("file:") :]
                while p.startswith("//"):
                    p = p[1:]
            return os.path.realpath(p)

        consumed = set()
        src_log = os.path.join(ck, "sources", "0")
        try:
            for entry in os.listdir(src_log):
                if entry.startswith("."):
                    continue  # .N.crc sidecars are binary
                with open(os.path.join(src_log, entry), errors="replace") as f:
                    for line in f:
                        line = line.strip()
                        if line.startswith("{"):
                            try:
                                rec = json.loads(line)
                            except ValueError:
                                continue
                            if rec.get("path"):
                                consumed.add(_canon(rec["path"]))
        except OSError:
            pass
        sub_dir = os.path.join(root, "sub")
        sub_parts = _sink_partitions(sub_dir)
        removed = 0
        for k in sorted(sub_parts)[:-1]:  # keep the newest dir as cursor trail
            p = sub_parts[k]
            files = [
                _canon(os.path.join(p, x))
                for x in os.listdir(p)
                if not x.startswith(("_", "."))
            ]
            if files and all(x in consumed for x in files):
                shutil.rmtree(p, ignore_errors=True)
                removed += 1
        return removed

    if len(foldable) <= 1:
        out = {"kind": "fk" if is_fk else "log", "folded": 0, "pruned": 0}
        if is_fk:
            out["sub_pruned"] = _prune_consumed_sub()  # still worth doing
        return out

    kind = _detect_log_kind(root, is_fk)
    result: dict = {"kind": kind, "folded": len(foldable), "committed": committed}

    if kind == "suppress":
        keep = max(foldable)
        for k in foldable:
            if k != keep:
                shutil.rmtree(parts[k], ignore_errors=True)
        result["pruned"] = len(foldable) - 1
        return result

    if not key:
        raise ValueError("compact_emission_log needs the fold key columns for join logs")
    base_id = max(foldable)
    kept = spark.read.parquet(out_dir).filter(F.col("sink_batch") <= F.lit(int(committed)))
    if kind == "fk":
        ranked = kept.withColumn("__op_rank", (F.col("op") == "U").cast("int"))
        base = (
            KStream(ranked, tuple(key), None)
            .to_table(order=("sink_batch", "__op_rank"))
            .df.drop("__op_rank", "sink_batch")
        )
    else:
        base = KStream(kept, tuple(key), None).to_table(order=("sink_batch",)).df.drop(
            "sink_batch"
        )
    tmp = os.path.join(root, _COMPACT_TMP)
    shutil.rmtree(tmp, ignore_errors=True)
    base.write.mode("overwrite").parquet(tmp)
    result["base_rows"] = spark.read.parquet(tmp).count()
    # tmp+replace so a crash can never leave a torn marker (a torn _TARGET
    # used to wedge _recover_compaction's int() parse on every attempt)
    target = os.path.join(tmp, "_TARGET")
    with open(target + ".tmp", "w") as f:
        f.write(str(base_id))
    os.replace(target + ".tmp", target)  # tmp is now complete: recovery installs it
    dest = os.path.join(out_dir, f"sink_batch={base_id}")
    trash = os.path.join(root, f"{_COMPACT_TRASH_PREFIX}{base_id}")
    os.rename(dest, trash)
    os.remove(os.path.join(tmp, "_TARGET"))
    os.rename(tmp, dest)
    shutil.rmtree(trash, ignore_errors=True)
    pruned = 0
    for k in foldable:
        if k != base_id:
            shutil.rmtree(parts[k], ignore_errors=True)
            pruned += 1
    result["pruned"] = pruned

    if kind == "fk":
        result["sub_pruned"] = _prune_consumed_sub()
    return result


def _container_cols(schema, cols) -> set[str]:
    """The container-typed (array/map/struct) members of ``cols`` — THE one
    membership predicate shared by the keyed refusals, tws tunnel selection,
    and engine auto-selection (round-13 review: three drifting copies)."""
    from pyspark.sql.types import ArrayType, MapType
    from pyspark.sql.types import StructType as _St

    cs = {c for c in cols if c}
    return {
        f.name
        for f in schema.fields
        if f.name in cs and isinstance(f.dataType, (ArrayType, MapType, _St))
    }


_AUTOCOMPACT_DEFAULT = 32


def _maybe_autocompact(spark: SparkSession, state_dir: str, checkpoint: str, key=()) -> None:
    """Compact-every-N policy (r12 verdict task 5): called by every keyed/
    tws drain at ENTRY — after binding and version stamping, before the
    query starts.  Entry-time (never post-drain) because the returned
    snapshot/emissions are LAZY reads over ``out/sink_batch=*``; a
    post-drain compaction would prune partitions the caller is about to
    scan.  When the committed partition count reaches ``PSE_COMPACT_EVERY``
    (default 32; <= 0 disables), the log folds into one base partition,
    bounding snapshot reconstruction at O(tail) instead of O(total
    emissions ever) across long-lived resumed drains (r11 advice).  A crash
    mid-compaction is covered by the existing recovery:
    _check_no_pending_compaction refuses the drain and the next
    compact_emission_log call finishes or rolls back the pass."""
    try:
        every = int(os.environ.get("PSE_COMPACT_EVERY", str(_AUTOCOMPACT_DEFAULT)))
    except ValueError:
        every = _AUTOCOMPACT_DEFAULT
    if every <= 0:
        return
    is_fk = os.path.isdir(os.path.join(state_dir, "sub"))
    out_dir = os.path.join(state_dir, "out")
    ck = os.path.join(checkpoint, "join") if is_fk else checkpoint
    committed = _last_committed(ck)
    if sum(1 for k in _sink_partitions(out_dir) if k <= committed) >= every:
        compact_emission_log(spark, state_dir, checkpoint, key=tuple(key))


def _check_container_columns(schema, cols, what: str) -> None:
    """Container-typed (array/map/struct) VALUE columns are unsupported by
    the PANDAS keyed engines: their Arrow slices deliver containers as
    numpy arrays that fail the state normalization mid-drain (round-12
    review follow-up — loud construction-time refusal beats that failure).
    The tws engines tunnel container VALUE columns through pickled-binary
    value state (tws._enc_c, r12 verdict task 2) and the exact snapshot
    loops handle them as plain DataFrame data — point there."""
    from pyspark.sql.types import ArrayType, MapType
    from pyspark.sql.types import StructType as _St

    bad = [
        f.name
        for f in schema.fields
        if f.name in set(cols) and isinstance(f.dataType, (ArrayType, MapType, _St))
    ]
    if bad:
        raise ValueError(
            f"{what}: container-typed value columns {bad} are not supported by "
            "the pandas keyed engine (its state fold rejects numpy array cells) "
            "— use engine='tws' (binary-tunneled value state) or engine='exact'"
        )


def _select_keyed_engine(state_dir: str | None, keyed_marker: str, schemas, hard=()) -> str:
    """engine=None auto-selection between the per-key families (round-12
    review finding: a bare default flip to tws would break previously
    working calls).  Order of precedence:

      * no ``google.protobuf``: ``keyed`` (tws cannot run) — unless
        container-typed VALUE columns are present (``schemas`` =
        [(StructType, cols)]; the pandas engines refuse them, see
        _check_container_columns) → ``exact``;
      * ``state_dir`` stamped by the exact loop (``_GEN``) → ``exact``,
        stamped by the pandas keyed engine → ``keyed`` (resume with the
        family that wrote the dir instead of raising);
      * container-typed columns in a position the tws binary tunnel cannot
        cover — keys, order columns, the fk column (``hard`` =
        [(StructType, cols)]) → ``exact``;
      * otherwise → ``tws`` (container VALUE columns ride tws's pickled
        -binary value-state tunnel — r12 verdict task 2)."""
    from .protoshim import ensure_protobuf  # noqa: PLC0415

    def _has_containers(pairs):
        return any(_container_cols(schema, cols) for schema, cols in pairs)

    if not ensure_protobuf():
        return "exact" if _has_containers(schemas) else "keyed"
    if state_dir is not None:
        if os.path.exists(os.path.join(state_dir, "_GEN")):
            return "exact"
        if os.path.exists(os.path.join(state_dir, keyed_marker)):
            return "keyed"
    if _has_containers(hard):
        return "exact"
    return "tws"


def _check_emit_final(obj, df: DataFrame, output_mode: str) -> None:
    """Enforce the suppress() contract at EVERY sink: an emit-final table
    must drain in append mode (that IS the suppression), and append on a
    windowed aggregation needs a watermark — so a suppressed aggregation
    built without grace gets a descriptive error here instead of Spark's
    opaque 'append not supported without watermark' analysis exception."""
    if df.isStreaming and getattr(obj, "suppress_config", None) is not None:
        raise ValueError(
            "this table is suppressed untilTimeLimit (KTable.suppress("
            "until_time_limit_ms=...)); its streaming realization is the "
            "time-ordered buffer — drain it with streaming.suppress_buffered "
            "instead of a plain sink (batch drains are identity and need no "
            "buffer)"
        )
    if not getattr(obj, "emit_final", False):
        return
    if output_mode != "append":
        raise ValueError(
            "suppress() marks the table emit-final; drain with output_mode='append' "
            "(append on a watermarked windowed aggregation IS emit-on-window-close)"
        )
    if df.isStreaming and not _has_watermark(df):
        raise ValueError(
            "suppress() on a streaming aggregation requires an event-time watermark "
            "to define window closure — give the window a grace period "
            "(e.g. TumblingWindowOptions.of(size, grace_ms=...)) or call "
            "with_watermark() upstream"
        )


class StreamingBuilder:
    """Streaming twin of ``StreamBuilder`` (core/StreamBuilder.cs:49-134):
    sources produce *streaming* DataFrames wrapped in the same KStream, so
    the whole DSL composes unchanged downstream."""

    def __init__(self, spark: SparkSession):
        self.spark = configure(spark)

    # ---------------- sources ----------------

    def kafka_stream(
        self,
        bootstrap: str,
        topics: str,
        value_schema: str,
        key: str = "key",
        key_type: str = "string",
        value_format: str = "json",
        ts_alias: str = "ts",
        starting_offsets: str = "earliest",
        **options,
    ) -> KStream:
        """Kafka-topic KStream source (core/StreamBuilder.cs:49-134 +
        SourceProcessor deserialize step).  ``value_schema`` is a DDL string;
        wire decode is pure Catalyst expressions (serdes.decode_kafka).

        A ``stub://<dir>`` bootstrap selects the in-process file-backed
        transport (kafka_stub.KafkaStubBroker) with the SAME source schema
        and decode path — the connectorless end-to-end test mode."""
        from .kafka_stub import KafkaStubBroker, is_stub

        if is_stub(bootstrap):
            if starting_offsets != "earliest":
                raise ValueError(
                    "the stub Kafka transport replays topics from the beginning "
                    "(file stream); startingOffsets='earliest' only — a real "
                    "bootstrap honors the full option"
                )
            broker = KafkaStubBroker(bootstrap)
            parts = [t.strip() for t in topics.split(",") if t.strip()]
            raw = broker.read_stream(self.spark, parts[0], **options)
            for t in parts[1:]:  # comma list = multi-topic subscribe
                raw = raw.unionByName(broker.read_stream(self.spark, t, **options))
        else:
            try:
                raw = (
                    self.spark.readStream.format("kafka")
                    .option("kafka.bootstrap.servers", bootstrap)
                    .option("subscribe", topics)
                    .option("startingOffsets", starting_offsets)
                    .options(**options)
                    .load()
                )
            except Exception as e:  # pragma: no cover - connector not bundled locally
                raise NotImplementedError(
                    "Kafka source requires the spark-sql-kafka connector on the "
                    "classpath (org.apache.spark:spark-sql-kafka-0-10)"
                ) from e
        df = decode_kafka(raw, value_schema, key_type=key_type, value_format=value_format, ts_alias=ts_alias)
        return KStream(df, ("key",) if key == "key" else _as_tuple(key), ts_alias)

    def file_stream(
        self,
        path: str,
        key=(),
        ts: str | None = None,
        fmt: str = "parquet",
        schema=None,
        max_files_per_trigger: int | None = None,
    ) -> KStream:
        """File-directory streaming source (new files = new records) — the
        local-testable source; also the pattern for object-store landing zones
        at scale.  Schema is inferred from a batch read when not given (driver
        metadata only, no data scan).

        The file source wants a directory; a single-file path is exposed
        through a symlink in a temp dir (read-only testdata friendly)."""
        if schema is None:
            schema = self.spark.read.format(fmt).load(path).schema
        if os.path.isfile(path):
            d = tempfile.mkdtemp(prefix="pse-src-")
            os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
            path = d
        reader = self.spark.readStream.format(fmt).schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        df = reader.load(path)
        return KStream(df, _as_tuple(key), ts)

    def table_stream(self, path: str, key, ts: str, order=None, **kw) -> KTable:
        """Streaming KTable source: changelog → latest-per-key, maintained
        incrementally (update mode).  See dsl.KStream.to_table streaming
        branch (max_by aggregate, one shuffle, state = one row per key)."""
        return self.file_stream(path, key=key, ts=ts, **kw).to_table(order=order)

    def rate_stream(self, rows_per_second: int = 10) -> KStream:
        """Synthetic load source (testing/backpressure experiments)."""
        df = (
            self.spark.readStream.format("rate")
            .option("rowsPerSecond", str(rows_per_second))
            .load()
        )
        return KStream(df, ("value",), "timestamp")


# ---------------- sinks (SinkProcessor / To analogs) ----------------


# sizing target for the bounded-drain state shuffle (r14, verdict item 4):
# one state/shuffle partition per ~64 MB of source data, capped at the
# session's configured partition count.  Stateful-streaming cost is per
# partition per micro-batch (state store open/commit/snapshot), NOT per row,
# so a KB-scale local drain on cpus-many partitions pays cpus × that fixed
# overhead for nothing — measured 7.3 s at 32 partitions vs 0.7 s at 8 for
# the same 100 k-row replay (BENCH_r13 vs BENCH_r13_c8).  At cluster scale
# bytes/64 MB exceeds any sane partition count, so the session derivation
# (cores-based, AQE-coalesced) is untouched — this only right-sizes drains
# whose input is provably small (guide §2.3 "fewer, larger partitions").
_DRAIN_TARGET_BYTES = 64 * 1024 * 1024


def _file_source_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of the file sources feeding a streaming frame
    (driver-side metadata only).  None when any leaf is not a file source —
    unbounded sources (Kafka, rate) must keep the session's sizing."""
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        total = 0
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() != "StreamingRelation":
                return None
            opts = leaf.dataSource().options()
            popt = opts.get("path")
            if not popt.isDefined():
                return None
            path = popt.get()
            if os.path.isfile(path):
                total += os.path.getsize(path)
                continue
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.startswith(("_", ".")):
                        continue
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        return total
    except Exception:
        return None


def run_available_now(obj, name: str | None = None, output_mode: str = "append") -> DataFrame:
    """Drain everything currently available through the streaming plan into an
    in-memory table and return it — the TopologyTestDriver analog
    (reference test harness: test/Streamiz.Kafka.Net.Tests/Helpers).

    ``output_mode``: append for stateless/watermark-expired output, complete
    for full aggregate state (how the parity tests read final KTable state).
    A table marked emit-final by ``KTable.suppress`` must drain in append
    mode (that IS the suppression); other modes are rejected.

    State/shuffle partitions for the drain are sized from the source bytes
    (see _DRAIN_TARGET_BYTES) — safe here because every drain starts a FRESH
    checkpoint (a restarted checkpoint pins its original partition count);
    the session value is restored afterwards.
    """
    df = obj.df if hasattr(obj, "df") else obj
    _check_emit_final(obj, df, output_mode)
    name = name or f"mem_{uuid.uuid4().hex[:12]}"
    spark = df.sparkSession
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    src_bytes = _file_source_bytes(df)
    if src_bytes is not None:
        want = max(1, min(int(saved), -(-src_bytes // _DRAIN_TARGET_BYTES)))
        if want < int(saved):
            spark.conf.set("spark.sql.shuffle.partitions", str(want))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", _checkpoint(None))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    return df.sparkSession.table(name)


def start_to_files(
    obj,
    path: str,
    fmt: str = "parquet",
    checkpoint: str | None = None,
    output_mode: str = "append",
    available_now: bool = False,
):
    """File sink (``To`` with a path destination).  Returns the
    StreamingQuery handle (the KafkaStream.Start analog — caller owns
    lifecycle, q.stop() ≈ Dispose)."""
    df = obj.df if hasattr(obj, "df") else obj
    _check_emit_final(obj, df, output_mode)
    w = (
        df.writeStream.format(fmt)
        .outputMode(output_mode)
        .option("path", path)
        .option("checkpointLocation", _checkpoint(checkpoint))
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def start_to_kafka(
    obj,
    bootstrap: str,
    topic: str | None = None,
    key_col: str = "key",
    value_cols: Sequence[str] | None = None,
    topic_expr=None,
    checkpoint: str | None = None,
    output_mode: str = "append",
    available_now: bool = False,
):
    """Kafka sink (core/Processors/SinkProcessor.cs:34-53).  ``topic_expr``
    (a Column) is the dynamic topic-name-extractor analog
    (IKStream.cs:90-137): Spark's Kafka sink routes on a ``topic`` column.
    ``available_now=True`` drains what's currently on the source and stops —
    the bounded mode scripts/kafka_smoke.py uses for its roundtrip check."""
    from .kafka_stub import KafkaStubBroker, is_stub

    df = obj.df if hasattr(obj, "df") else obj
    _check_emit_final(obj, df, output_mode)
    wire = encode_kafka(df, key_col, list(value_cols) if value_cols else None, topic=topic_expr)
    if is_stub(bootstrap):
        # in-process transport: the encode above and the streaming query are
        # the REAL produce path; only the broker append is file-backed
        broker = KafkaStubBroker(bootstrap)

        def _produce(batch: DataFrame, _batch_id: int) -> None:
            if not batch.isEmpty():
                broker.append(batch, topic)

        w = (
            wire.writeStream.foreachBatch(_produce)
            .outputMode(output_mode)
            .option("checkpointLocation", _checkpoint(checkpoint))
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()
    w = (
        wire.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .outputMode(output_mode)
        .option("checkpointLocation", _checkpoint(checkpoint))
    )
    if topic is not None:
        w = w.option("topic", topic)
    if available_now:
        w = w.trigger(availableNow=True)
    try:
        return w.start()
    except Exception as e:  # pragma: no cover - connector not bundled locally
        raise NotImplementedError(
            "Kafka sink requires the spark-sql-kafka connector on the classpath"
        ) from e



_LAKEHOUSE_SOURCES = {
    "delta": ("io.delta.sql.DeltaSparkSessionExtension", "delta-spark"),
    "iceberg": ("org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions", "iceberg-spark-runtime"),
}


def lakehouse_available(spark: SparkSession, fmt: str) -> bool:
    """True when the Delta/Iceberg runtime is on the JVM classpath.  The
    reference sinks only to Kafka topics; a 100 TB training-data pipeline
    lands in a transactional table format instead, so these sinks are
    first-class here — gated lazily, like the Avro/Protobuf serdes, because
    the satellite jars aren't bundled with plain pyspark."""
    cls, _ = _LAKEHOUSE_SOURCES[fmt]
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def _require_lakehouse(spark: SparkSession, fmt: str) -> None:
    if fmt not in _LAKEHOUSE_SOURCES:
        raise ValueError(f"unsupported table format: {fmt!r} (delta|iceberg)")
    if not lakehouse_available(spark, fmt):
        _, pkg = _LAKEHOUSE_SOURCES[fmt]
        raise NotImplementedError(
            f"{fmt} sink requires the {pkg} package on the classpath "
            f"(spark.jars.packages) plus its SQL extension/catalog conf"
        )


def start_to_lakehouse(
    obj,
    path: str,
    fmt: str = "delta",
    checkpoint: str | None = None,
    output_mode: str = "append",
    available_now: bool = False,
):
    """Streaming sink into a transactional table format (exactly-once via
    checkpoint + the format's transaction log — the closest Spark analog of
    the reference's EOS Kafka transactions, SURVEY §7.2).  Same contract as
    start_to_files otherwise."""
    df = obj.df if hasattr(obj, "df") else obj
    _require_lakehouse(df.sparkSession, fmt)
    return start_to_files(
        obj, path, fmt=fmt, checkpoint=checkpoint,
        output_mode=output_mode, available_now=available_now,
    )


def write_lakehouse(obj, path: str, fmt: str = "delta", mode: str = "overwrite") -> None:
    """Batch twin of start_to_lakehouse (KStream.to with a table-format
    destination)."""
    df = obj.df if hasattr(obj, "df") else obj
    _require_lakehouse(df.sparkSession, fmt)
    df.write.format(fmt).mode(mode).save(path)


def start_foreach_batch(obj, fn: Callable[[DataFrame, int], None], checkpoint: str | None = None, available_now: bool = False):
    """Foreach terminal (IKStream.cs Foreach / KStreamPeekProcessor with
    forwardDownStream=false): arbitrary per-microbatch side effects with the
    batch id for idempotence."""
    df = obj.df if hasattr(obj, "df") else obj
    w = df.writeStream.foreachBatch(fn).option("checkpointLocation", _checkpoint(checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def materialize_stream(obj, store_name: str, output_mode: str = "complete") -> DataFrame:
    """Streaming interactive-query surface (SURVEY §2.7; KafkaStream.Store
    analog, core/KafkaStream.cs:474-479): drain the current stream state into
    a named in-memory table queryable via ``spark.table(store_name)`` /
    ``StoreRegistry``.  Batch KTables use KTable.materialize (temp view)
    instead; this is the streaming twin — state lands in the table as of the
    drain point, re-invoke to refresh."""
    return run_available_now(obj, name=store_name, output_mode=output_mode)


def read_state_store(
    spark,
    checkpoint: str,
    operator_id: int = 0,
    batch_id: int | None = None,
    store_name: str | None = None,
    join_side: str | None = None,
) -> DataFrame:
    """Read a streaming query's STATE STORE from its checkpoint as a
    DataFrame — Spark's State Data Source.  This is the closest analog of the
    reference's interactive queries over the real stores
    (KafkaStream.Store(StoreQueryParameters) →
    QueryableStoreTypes.KeyValueStore/WindowStore,
    core/State/QueryableStoreTypes.cs:24-41): unlike materialize_stream
    (which drains OUTPUT into a table), this reads the operator's internal
    keyed state — aggregation buffers, join buffers, dedup sets — exactly
    what the reference exposes via store queries, including time-travel to an
    earlier ``batch_id`` (the closest thing to replaying a changelog topic).

    Returns rows of (key struct, value struct, partition_id); flatten with
    ``select("key.*", "value.*")``.  Works on either provider (heap or
    RocksDB).  Distributed scan — no driver collect."""
    r = spark.read.format("statestore")
    if batch_id is not None:
        r = r.option("batchId", int(batch_id))
    if operator_id:
        r = r.option("operatorId", int(operator_id))
    if store_name:
        r = r.option("storeName", store_name)
    if join_side:
        r = r.option("joinSide", join_side)
    return r.load(checkpoint)


def read_state_metadata(spark, checkpoint: str) -> DataFrame:
    """Enumerate the stateful operators / state stores recorded in a
    checkpoint (Spark's state-metadata source) — the discovery half of the
    interactive-query surface (the reference's KafkaStream exposes the store
    registry by name; here the checkpoint is the registry)."""
    return spark.read.format("state-metadata").load(checkpoint)


def join_tables_streaming(
    left: KStream,
    right: KStream,
    how: str = "inner",
    l_order: Sequence[str] | None = None,
    r_order: Sequence[str] | None = None,
    ts_alias: str | None = None,
    store_name: str | None = None,
    state_dir: str | None = None,
    checkpoint: str | None = None,
    engine: str | None = None,
) -> DataFrame:
    """Continuous KTable⋈KTable changelog join — the streaming realization of
    KTable.join (reference: KTableKTableJoinProcessor.cs:20-48 joins the two
    changelogs record-at-a-time against each other's state stores; output
    timestamp = max of the sides, :35).

    Spark has no built-in update-stream⋈update-stream join; three engines,
    selected by ``engine`` (None = ``"tws"`` when transformWithState's
    protobuf dependency is importable, else ``"keyed"`` — both are the
    per-key scale architecture):

      * ``"tws"`` — the Spark-4-native transformWithState port of the
        keyed engine (tws.join_tables_tws): same union/fold/emission-log
        design, native types end to end (no bigint string tunnel, NaN
        preserved like the exact loop), RocksDB state store.  The default
        wherever ``google.protobuf`` (wheel or the vendored shim) exists.
      * ``"keyed"`` — ``applyInPandasWithState`` over the union of both
        tagged changelogs, grouped by the JOIN KEY, per-key state = (latest
        left row, latest right row) — exactly the reference's
        record-at-a-time shape (KTableKTableJoinProcessor.cs:20-48 reads
        the other side's store for each changelog record).  Each key whose
        state changed emits its current joined row to an
        ``out/sink_batch=<id>`` partition (overwritten on crash-replay —
        exactly-once), so per-microbatch I/O is O(changed keys), never
        O(table): the state lives in Spark's RocksDB/HDFS store, which
        checkpoints per-batch DELTAS.  The returned snapshot is the
        latest-per-key fold of the emission log.  Requires non-null order
        values and equal key dtypes across sides (raises descriptively).
      * ``"exact"`` — the SURVEY §7.3.2 parquet ping-pong loop: each
        microbatch (a) upserts each side's latest-per-key snapshot —
        ``max_by`` over the declared order merged with the previous
        snapshot, associative, so snapshot ∪ batch ≡ full-changelog replay
        — and (b) recomputes the equi-join over the two materialized
        states.  Per-batch I/O is O(table) (bounded by key cardinality,
        never stream length); kept for null-order changelogs and as the
        differential oracle for the keyed engine.

    Emission cadence is per-microbatch instead of per-record (§7.3.3:
    coarser cadence, same final state — which is what the parity tests
    compare).  Both engines drain with an availableNow trigger and return
    the final joined snapshot (also registered under ``store_name`` for the
    interactive-query surface).
    """
    if not (left.df.isStreaming and right.df.isStreaming):
        raise ValueError("join_tables_streaming requires streaming inputs; use KTable.join in batch")
    if how not in ("inner", "left", "full"):
        raise ValueError("table-table join supports inner|left|full")
    if len(left.key) != len(right.key):
        raise ValueError("join key arity mismatch")
    if engine is None:
        # default = tws when it can run AND nothing ties the call to the
        # pandas family (existing keyed/exact state dir, container-typed
        # value columns, absent protobuf) — see _select_keyed_engine
        engine = _select_keyed_engine(
            state_dir,
            "_PSE_TTJOIN_V",
            [
                (left.df.schema, [c for c in left.df.columns if c not in left.key]),
                (right.df.schema, [c for c in right.df.columns if c not in right.key]),
            ],
            hard=[
                (left.df.schema, list(left.key) + list(l_order or ())),
                (right.df.schema, list(right.key) + list(r_order or ())),
            ],
        )
    if engine == "tws":
        from .tws import join_tables_tws  # noqa: PLC0415 - optional protobuf dep

        return join_tables_tws(
            left, right, how, l_order, r_order, ts_alias, store_name, state_dir, checkpoint
        )
    if engine == "keyed":
        return _join_tables_keyed(
            left, right, how, l_order, r_order, ts_alias, store_name, state_dir, checkpoint
        )
    if engine != "exact":
        raise ValueError(
            f"unknown tt-join engine {engine!r}; expected 'keyed', 'tws' or 'exact'"
        )

    def combine(l_t: KTable, r_t: KTable) -> KTable:
        return l_t.join(r_t, how=how, ts_alias=ts_alias)

    return _changelog_join_loop(
        left, right, combine, l_order, r_order, store_name, state_dir, checkpoint,
        state_prefix="pse-ttjoin-",
    )


def join_fk_streaming(
    left: KStream,
    right: KStream,
    fk,
    how: str = "inner",
    l_order: Sequence[str] | None = None,
    r_order: Sequence[str] | None = None,
    store_name: str | None = None,
    state_dir: str | None = None,
    checkpoint: str | None = None,
    engine: str | None = None,
) -> DataFrame:
    """Continuous foreign-key table join — the streaming realization of
    ``KTable.join_fk`` (Kafka Streams 2.4 KIP-213; absent in the reference —
    SURVEY §2.5 note.  KS wires a subscription topic keyed by FK and a
    response topic keyed back by the left PK so FK *changes* re-subscribe).

    Three engines, selected by ``engine`` (None = ``"tws"`` for a string fk
    column when protobuf is importable, else ``"keyed"``; Column fks =
    ``"exact"``):

      * ``"tws"`` — transformWithState port of the keyed engine
        (tws.join_fk_tws): same two-stage subscription/response design,
        native types (subscriber list in LIST state), RocksDB store.
      * ``"keyed"`` — the literal KIP-213 two-stage architecture on per-key
        Spark state: a PK-keyed subscription resolver emitting
        unsubscribe/subscribe records into a durable subscription log, then
        an FK-keyed join state holding (latest right row, subscriber list)
        that fans out U/D emissions; per-microbatch I/O is
        O(changed keys + affected subscribers) (see _join_fk_keyed).
      * ``"exact"`` — the shared changelog-state loop: each microbatch
        upserts both tables' latest-per-key snapshots, then recomputes the
        FK equi-join over the snapshots (O(table) per batch, bounded by key
        cardinality).  Re-subscription is structural: the recompute always
        reads each left row's CURRENT fk value, so an FK flip atomically
        retracts the old join row and emits the new one.

    Both give the exact KIP-213 guarantee at per-microbatch cadence
    (§7.3.3); the parity test replays an FK flip across microbatches and
    compares against batch KTable.join_fk on both engines."""
    if not (left.df.isStreaming and right.df.isStreaming):
        raise ValueError("join_fk_streaming requires streaming inputs; use KTable.join_fk in batch")
    if how not in ("inner", "left"):
        raise ValueError("fk join supports inner|left")
    if len(right.key) != 1:
        raise ValueError("fk join requires single-column right key")
    if engine is None:
        if isinstance(fk, str):
            engine = _select_keyed_engine(
                state_dir,
                "_PSE_FKJOIN_V",
                [
                    (left.df.schema, list(left.df.columns)),
                    (right.df.schema, [c for c in right.df.columns if c != right.key[0]]),
                ],
                hard=[
                    (left.df.schema, list(left.key) + [fk] + list(l_order or ())),
                    (right.df.schema, list(r_order or ())),
                ],
            )
        else:
            engine = "exact"
    if engine in ("keyed", "tws"):
        if not isinstance(fk, str):
            raise ValueError(
                f"the {engine} fk-join engine requires a string fk column name (the fk "
                "VALUE rides the subscription log); use engine='exact' for Column fks"
            )
        if engine == "tws":
            from .tws import join_fk_tws  # noqa: PLC0415 - optional protobuf dep

            return join_fk_tws(
                left, right, fk, how, l_order, r_order, store_name, state_dir, checkpoint
            )
        return _join_fk_keyed(
            left, right, fk, how, l_order, r_order, store_name, state_dir, checkpoint
        )
    if engine != "exact":
        raise ValueError(
            f"unknown fk-join engine {engine!r}; expected 'keyed', 'tws' or 'exact'"
        )
    # the canonical FK naming has the LEFT fk column named like the RIGHT
    # key (departments keyed dept_id, employees carrying dept_id) — batch
    # join_fk accepts it because the right key never reaches the output.
    # The tagged-union state loop needs globally distinct names, so rename
    # the right key to a reserved one for the loop's lifetime; the combine
    # step joins fk == __fk_rk and the output is unchanged.
    rk = right.key[0]
    if rk in left.df.columns:
        if "__fk_rk" in left.df.columns or "__fk_rk" in right.df.columns:
            raise ValueError(
                "'__fk_rk' is reserved by join_fk_streaming for the right-key "
                "rename; rename that column on the input"
            )
        # the rename must follow EVERY reference to the old name: the
        # KStream's ts (a right ts column named like the key) and the
        # declared changelog order, or downstream resolution fails opaquely
        r_ts = "__fk_rk" if right.ts == rk else right.ts
        right = KStream(right.df.withColumnRenamed(rk, "__fk_rk"), ("__fk_rk",), r_ts)
        if r_order:
            r_order = tuple("__fk_rk" if c == rk else c for c in r_order)

    def combine(l_t: KTable, r_t: KTable) -> KTable:
        return l_t.join_fk(r_t, fk, how=how)

    return _changelog_join_loop(
        left, right, combine, l_order, r_order, store_name, state_dir, checkpoint,
        state_prefix="pse-fkjoin-",
    )


def _clean_state_value(v):
    """Normalize a value crossing the Arrow boundary of a keyed state fn
    (incoming row cell, state tuple element, or grouping-key element) to a
    plain Python value: pandas NaT/NaN → None, pd.Timestamp → datetime,
    numpy scalars → .item().  ONE shared implementation for every keyed
    engine (suppress / tt-join / fk-join) — workers unpickle it by module
    reference, and a normalization fix here reaches all of them (r11 review:
    four hand-rolled copies had already drifted one keyword apart).

    KNOWN COERCION (r11 advice, pinned by the differential fuzz's NaN
    column): a genuine float NaN in a double value column becomes null in
    keyed-engine output, while the exact engines preserve NaN.  Largely
    inherent to the Arrow/pandas boundary — union null-padding already makes
    null and NaN indistinguishable inside a group's float64 slice, so the
    keyed engines CANNOT tell them apart; null is the canonical spelling."""
    import pandas as pd  # noqa: PLC0415 - worker-side import

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, float) and v != v:
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if type(v).__module__ == "numpy":
        return v.item()
    return v


def _check_reserved_columns(cols, reserved: dict[str, str], what: str) -> None:
    """Fail fast when user columns collide with a keyed engine's internal
    schema fields or its sink partition column — the collision otherwise
    surfaces as an opaque Arrow/parquet error MID-DRAIN, after state and
    checkpoint are already written (r11 review finding).  ``reserved`` maps
    name → why it is reserved."""
    hit = {c: reserved[c] for c in cols if c in reserved}
    if hit:
        msgs = "; ".join(f"{c!r} ({why})" for c, why in hit.items())
        raise ValueError(
            f"{what}: column names collide with engine-internal fields — {msgs}; "
            "rename them on the input"
        )


# keyed tt-join state/sink schema version (same contract as
# _KEYED_STATE_VERSION for suppress): bumped whenever the
# applyInPandasWithState state schema or the out/sink_batch layout changes,
# so a populated dir from an older engine is refused descriptively instead
# of failing Spark's state-schema check mid-drain
_TTJOIN_STATE_VERSION = "1"


def _join_tables_keyed(
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
    """Keyed-state engine of ``join_tables_streaming`` (see its docstring
    for the contract): the two tagged changelogs union into ONE
    ``applyInPandasWithState`` grouped by the JOIN KEY, whose per-key state
    is (latest left row, latest right row) under the declared per-side
    orders — the record-at-a-time state-store shape of the reference's
    KTableKTableJoinProcessor.cs:20-48, at per-microbatch emission cadence
    (SURVEY §7.3.3).  A key whose state changed emits its CURRENT joined
    row to an ``out/sink_batch=<id>`` partition (overwritten on
    crash-replay — exactly-once), so per-microbatch I/O is O(changed keys),
    never O(table): the fold state lives in Spark's RocksDB/HDFS store,
    which checkpoints per-batch deltas.  The returned snapshot is the
    latest-per-key fold of the emission log (a joined row only ever
    UPDATES — this path has no tombstones — so the fold is exact).

    Integral VALUE columns tunnel through the stateful operator as decimal
    strings exactly like the keyed suppress engine (_suppress_keyed): the
    other side's columns are null on every union row, and a null in a
    group's Arrow slice coerces int64 to float64, which cannot represent
    bigints past 2^53.  Join-key columns never ride the union null-padded —
    both sides' keys map onto the shared non-null ``__jk*`` grouping
    columns — so keys stay exactly typed.  NoTimeout and no watermark:
    there is no time semantics here, just fold-and-emit-on-change, so late
    data is admitted unconditionally (KTable upsert semantics).  Requires
    non-null order values (raises in the state fn — loud beats a silently
    wrong fold) and equal key/ts dtypes across sides; use engine='exact'
    otherwise."""
    spark0 = left.df.sparkSession
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
        "keyed tt-join engine",
    )
    l_ddl = {f.name: f.dataType.simpleString() for f in left.df.schema.fields}
    r_ddl = {f.name: f.dataType.simpleString() for f in right.df.schema.fields}
    for lk, rk in zip(l_key, r_key):
        if l_ddl[lk] != r_ddl[rk]:
            raise ValueError(
                f"the keyed tt-join engine requires equal key dtypes across sides; "
                f"{lk}:{l_ddl[lk]} vs {rk}:{r_ddl[rk]} — cast one side or use engine='exact'"
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
    _check_container_columns(left.df.schema, l_val, "keyed tt-join engine")
    _check_container_columns(right.df.schema, r_val, "keyed tt-join engine")
    merge_ts = bool(ts_alias is not None and left.ts and right.ts)
    if merge_ts and l_ddl[left.ts] != r_ddl[right.ts]:
        raise ValueError(
            "the keyed tt-join engine requires equal ts dtypes for ts_alias merging; "
            f"{left.ts}:{l_ddl[left.ts]} vs {right.ts}:{r_ddl[right.ts]} — use engine='exact'"
        )
    out_l_val = [c for c in l_val if not (merge_ts and c == left.ts)]
    out_r_val = [c for c in r_val if not (merge_ts and c == right.ts)]
    # canonical output layout (names, order, dtypes) = the batch combine
    empty_out = KTable(spark0.createDataFrame([], left.df.schema), left.key, left.ts).join(
        KTable(spark0.createDataFrame([], right.df.schema), right.key, right.ts),
        how=how,
        ts_alias=ts_alias,
    ).df

    integral = {"tinyint", "smallint", "int", "bigint"}
    tunnel = {c for c in l_val if l_ddl[c] in integral} | {
        c for c in r_val if r_ddl[c] in integral
    }
    ts_integral = merge_ts and l_ddl[left.ts] in integral

    def _ddl(c):
        base = l_ddl.get(c) or r_ddl[c]
        return "string" if c in tunnel else base

    jk = [f"__jk{i}" for i in range(len(l_key))]
    l_src, r_src = left.df, right.df
    for k in l_key:
        l_src = l_src.filter(F.col(k).isNotNull())  # to_table drops null keys
    for k in r_key:
        r_src = r_src.filter(F.col(k).isNotNull())

    def _tcol(c):
        return (F.col(c).cast("string") if c in tunnel else F.col(c)).alias(c)

    def _ncol(c):
        return F.lit(None).cast(_ddl(c)).alias(c)

    tagged = l_src.select(
        F.lit(1).alias("__side"),
        *[F.col(k).alias(j) for k, j in zip(l_key, jk)],
        *[_tcol(c) for c in l_val],
        *[_ncol(c) for c in r_val],
    ).unionByName(
        r_src.select(
            F.lit(0).alias("__side"),
            *[F.col(k).alias(j) for k, j in zip(r_key, jk)],
            *[_ncol(c) for c in l_val],
            *[_tcol(c) for c in r_val],
        )
    )

    state_schema = "__l_set boolean, __r_set boolean" + "".join(
        f", `{c}` {_ddl(c)}" for c in l_val + r_val
    )
    out_cols = list(l_key) + out_l_val + out_r_val + ([ts_alias] if merge_ts else [])

    def _out_ddl(c):
        if merge_ts and c == ts_alias:
            return "string" if ts_integral else l_ddl[left.ts]
        if c in l_key:
            return l_ddl[c]
        return _ddl(c)

    out_schema = ", ".join(f"`{c}` {_out_ddl(c)}" for c in out_cols)

    n_l, n_r = len(l_val), len(r_val)
    l_idx = {c: i for i, c in enumerate(l_val)}
    r_idx = {c: i for i, c in enumerate(r_val)}
    l_key_pos = {c: i for i, c in enumerate(l_key)}
    r_key_pos = {c: i for i, c in enumerate(r_key)}
    l_ts_name, r_ts_name = (left.ts, right.ts) if merge_ts else (None, None)

    def fn(gkey, pdfs, state):
        import pandas as pd  # noqa: PLC0415 - worker-side import

        clean = _clean_state_value

        def make_ord(order, key_pos, lookup):
            vals = []
            for c in order:
                v = clean(gkey[key_pos[c]]) if c in key_pos else clean(lookup(c))
                if v is None:
                    raise ValueError(
                        "null order value in the keyed tt-join engine — the fold "
                        "needs a total order per key; use engine='exact'"
                    )
                if c in tunnel:
                    v = int(v)
                vals.append(v)
            return tuple(vals)

        if state.exists:
            st = list(state.get)
            l_set, r_set = bool(st[0]), bool(st[1])
            l_vals, r_vals = list(st[2 : 2 + n_l]), list(st[2 + n_l :])
        else:
            l_set = r_set = False
            l_vals, r_vals = [None] * n_l, [None] * n_r
        l_ord = make_ord(lord, l_key_pos, lambda c: l_vals[l_idx[c]]) if l_set else None
        r_ord = make_ord(rord, r_key_pos, lambda c: r_vals[r_idx[c]]) if r_set else None

        changed = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            for _, row in pdf.iterrows():
                if int(row["__side"]) == 1:
                    ov = make_ord(lord, l_key_pos, lambda c: row[c])
                    if (not l_set) or ov >= l_ord:
                        l_vals = [clean(row[c]) for c in l_val]
                        l_ord, l_set, changed = ov, True, True
                else:
                    ov = make_ord(rord, r_key_pos, lambda c: row[c])
                    if (not r_set) or ov >= r_ord:
                        r_vals = [clean(row[c]) for c in r_val]
                        r_ord, r_set, changed = ov, True, True
        if not changed:
            return
        state.update((l_set, r_set, *l_vals, *r_vals))
        emit = (l_set and r_set) if how == "inner" else (l_set if how == "left" else True)
        if not emit:
            return
        out_row = [clean(k) for k in gkey]
        out_row += [clean(l_vals[l_idx[c]]) if l_set else None for c in out_l_val]
        out_row += [clean(r_vals[r_idx[c]]) if r_set else None for c in out_r_val]
        if merge_ts:
            # output ts = max of the sides (KTableKTableJoinProcessor.cs:35),
            # skipping absent/null sides like F.greatest
            def ts_of(is_set, key_pos, idx, vals, name):
                if not is_set:
                    return None
                v = clean(gkey[key_pos[name]]) if name in key_pos else clean(vals[idx[name]])
                if v is None:
                    return None
                return int(v) if ts_integral else v

            cands = [
                t
                for t in (
                    ts_of(l_set, l_key_pos, l_idx, l_vals, l_ts_name),
                    ts_of(r_set, r_key_pos, r_idx, r_vals, r_ts_name),
                )
                if t is not None
            ]
            best = max(cands) if cands else None
            out_row.append(str(best) if ts_integral and best is not None else best)
        yield pd.DataFrame([tuple(out_row)], columns=out_cols)

    root = state_dir or tempfile.mkdtemp(prefix="pse-ttjoin-")
    os.makedirs(root, exist_ok=True)
    _check_no_pending_compaction(root)
    if os.path.exists(os.path.join(root, "_GEN")):
        raise ValueError(
            f"state dir {root!r} was written by the exact tt-join engine (ping-pong "
            "generations); pass engine='exact' to resume it, or a fresh state_dir"
        )
    out_dir = os.path.join(root, "out")
    ckpt = _bind_state_checkpoint(
        root, _checkpoint(checkpoint), _has_emissions(out_dir), "prior tt-join emissions"
    )
    ver_path = os.path.join(root, "_PSE_TTJOIN_V")
    ver = _read_bind(ver_path)
    if (_has_emissions(out_dir) or _last_committed(ckpt) >= 0) and ver != _TTJOIN_STATE_VERSION:
        raise ValueError(
            f"state dir {root!r} holds keyed tt-join state with state-schema version "
            f"{ver or 'unknown'}, but this engine writes version "
            f"{_TTJOIN_STATE_VERSION} — resuming would fail Spark's state-schema "
            "check or mix sink schemas; drain the old run with the code that wrote "
            "it, or start a fresh state_dir"
        )
    if ver is None:
        # only verifiably FRESH dirs (no emissions, no commits) reach here
        with open(ver_path + ".tmp", "w") as f:
            f.write(_TTJOIN_STATE_VERSION)
        os.replace(ver_path + ".tmp", ver_path)
    _maybe_autocompact(spark0, root, ckpt, key=l_key)

    res = tagged.groupBy(*jk).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("overwrite").parquet(os.path.join(out_dir, f"sink_batch={batch_id}"))

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


# keyed fk-join state/sink schema version: same contract as _TTJOIN_STATE_VERSION
_FKJOIN_STATE_VERSION = "1"


def _join_fk_keyed(
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
    """Keyed-state engine of ``join_fk_streaming`` — the ACTUAL KIP-213
    architecture, not a snapshot recompute: Kafka Streams realizes the FK
    join as a subscription topic keyed by FK plus a response path keyed
    back by the left PK, so an FK *change* unsubscribes from the old key
    and subscribes to the new one.  Here the same two stages run as two
    chained availableNow queries over per-key Spark state (Spark refuses
    two flatMapGroups operators in ONE query, so the subscription changelog
    is a durable parquet log between them — the subscription-topic analog):

      stage A (keyed by LEFT PK): folds the left changelog latest-per-key;
        a changed row emits ``U(new_fk, row)`` plus ``D(old_fk, pk)`` when
        its fk moved — the unsubscribe/subscribe pair — into
        ``sub/sink_batch=<id>`` partitions (overwritten on crash-replay);
      stage B (keyed by FK VALUE): one query over the union of the
        subscription log (a file stream, so resume skips consumed files)
        and the right changelog; per-fk state = (latest right row, the
        SUBSCRIBER LIST as an array<struct> of left rows).  A right-side
        change re-emits every subscriber (the response-topic fan-out); a
        left U/D re-emits/retracts just that pk.  Emissions land in
        ``out/sink_batch=<id>`` with op U/D; the final snapshot is the
        per-PK fold of the emission log, keeping keys whose LAST op is U.

    Per-microbatch I/O is O(changed keys + affected subscribers), never
    O(table) — the shape the exact loop's full-snapshot recompute
    (engine='exact') cannot give.  Caveat, documented: a single fk value
    with a huge subscriber list serializes its whole array per update
    (Kafka Streams stores subscriptions as individual store entries, so it
    pays O(1) there) — mega-fan-in dims belong on the exact loop or the
    Delta MERGE path.  Ordering across the two stages is total: stage-A
    batch ids ride the subscription records, ties inside one stage-B batch
    resolve U over D, so a flip's retraction can never outlive its
    re-subscription.  Integral columns string-tunnel exactly like the
    keyed tt-join (artificial union nulls would float64-coerce them), and
    the fk join value is canonicalized SQL-side (``cast(fk as string)``)
    on BOTH stages so pandas repr differences can never split a group.
    Requires a string fk column name, equal fk/right-key dtypes, and
    non-null order values; ``engine='exact'`` otherwise."""
    spark0 = left.df.sparkSession
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
        "keyed fk-join engine",
    )
    l_ddl = {f.name: f.dataType.simpleString() for f in left.df.schema.fields}
    r_ddl = {f.name: f.dataType.simpleString() for f in right.df.schema.fields}
    if fk not in l_ddl:
        raise ValueError(f"fk column {fk!r} not in left columns")
    if l_ddl[fk] != r_ddl[rk]:
        raise ValueError(
            f"the keyed fk-join engine requires equal fk/right-key dtypes; "
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
    _check_container_columns(left.df.schema, l_key + l_val, "keyed fk-join engine")
    _check_container_columns(right.df.schema, r_val, "keyed fk-join engine")
    empty_out = KTable(spark0.createDataFrame([], left.df.schema), left.key, left.ts).join_fk(
        KTable(spark0.createDataFrame([], right.df.schema), right.key, right.ts), fk, how=how
    ).df

    integral = {"tinyint", "smallint", "int", "bigint"}
    tun_l = {c for c in l_cols if l_ddl[c] in integral}
    tun_r = {c for c in r_val if r_ddl[c] in integral}

    def lddl(c):
        return "string" if c in tun_l else l_ddl[c]

    def rddl(c):
        return "string" if c in tun_r else r_ddl[c]

    # ---------------- state dirs, binding, versioning ----------------
    root = state_dir or tempfile.mkdtemp(prefix="pse-fkjoin-")
    os.makedirs(root, exist_ok=True)
    _check_no_pending_compaction(root)
    if os.path.exists(os.path.join(root, "_GEN")):
        raise ValueError(
            f"state dir {root!r} was written by the exact fk-join engine (ping-pong "
            "generations); pass engine='exact' to resume it, or a fresh state_dir"
        )
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
    ver_path = os.path.join(root, "_PSE_FKJOIN_V")
    ver = _read_bind(ver_path)
    populated = (
        _has_emissions(subdir)
        or _has_emissions(outdir)
        or _last_committed(ckpt_a) >= 0
        or _last_committed(ckpt_b) >= 0
    )
    if populated and ver != _FKJOIN_STATE_VERSION:
        raise ValueError(
            f"state dir {root!r} holds keyed fk-join state with state-schema version "
            f"{ver or 'unknown'}, but this engine writes version {_FKJOIN_STATE_VERSION} "
            "— resuming would fail Spark's state-schema check or mix sink schemas; "
            "drain the old run with the code that wrote it, or start a fresh state_dir"
        )
    if ver is None:
        with open(ver_path + ".tmp", "w") as f:
            f.write(_FKJOIN_STATE_VERSION)
        os.replace(ver_path + ".tmp", ver_path)
    _maybe_autocompact(spark0, root, ckpt_base, key=l_key)

    # ---------------- stage A: subscription resolver (keyed by left PK) ----------------
    a_src = left.df
    for k in l_key:
        a_src = a_src.filter(F.col(k).isNotNull())  # to_table drops null keys
    a_in = a_src.select(
        *[(F.col(c).cast("string") if c in tun_l else F.col(c)).alias(c) for c in l_cols],
        F.col(fk).cast("string").alias("__jfk_in"),  # SQL-canonical join string
    )
    n_lv = len(l_val)
    l_idx = {c: i for i, c in enumerate(l_val)}
    l_key_pos = {c: i for i, c in enumerate(l_key)}
    state_a = "__jfk string" + "".join(f", `{c}` {lddl(c)}" for c in l_val)
    sub_cols = ["op", "__jfk", *l_key, *l_val]
    sub_schema = "op string, __jfk string" + "".join(
        f", `{c}` {lddl(c)}" for c in l_key + l_val
    )

    def fn_a(gkey, pdfs, state):
        import pandas as pd  # noqa: PLC0415 - worker-side import

        clean = _clean_state_value

        def make_ord(lookup):
            vals = []
            for c in lord:
                v = clean(gkey[l_key_pos[c]]) if c in l_key_pos else clean(lookup(c))
                if v is None:
                    raise ValueError(
                        "null order value in the keyed fk-join engine — use engine='exact'"
                    )
                if c in tun_l:
                    v = int(v)
                vals.append(v)
            return tuple(vals)

        if state.exists:
            st = list(state.get)
            was_set, jfk, vals = True, st[0], list(st[1:])
        else:
            was_set, jfk, vals = False, None, [None] * n_lv
        old_jfk = jfk
        cur_ord = make_ord(lambda c: vals[l_idx[c]]) if was_set else None
        changed = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            for _, row in pdf.iterrows():
                ov = make_ord(lambda c: row[c])
                if (cur_ord is None) or ov >= cur_ord:
                    vals = [clean(row[c]) for c in l_val]
                    jfk = clean(row["__jfk_in"])
                    cur_ord, changed = ov, True
        if not changed:
            return
        state.update((jfk, *vals))
        key_vals = [clean(k) for k in gkey]
        rows = []
        if was_set and old_jfk != jfk:
            # the unsubscribe half of the KIP-213 re-key round-trip
            rows.append(("D", old_jfk, *key_vals, *([None] * n_lv)))
        rows.append(("U", jfk, *key_vals, *vals))
        yield pd.DataFrame(rows, columns=sub_cols)

    res_a = a_in.groupBy(*l_key).applyInPandasWithState(
        fn_a, sub_schema, state_a, "append", "NoTimeout"
    )

    def _sink_a(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("overwrite").parquet(os.path.join(subdir, f"sink_batch={batch_id}"))

    qa = (
        res_a.writeStream.foreachBatch(_sink_a)
        .option("checkpointLocation", ckpt_a)
        .trigger(availableNow=True)
        .start()
    )
    qa.awaitTermination()

    # ---------------- stage B: per-fk join state over sub-log ∪ right ----------------
    n_rv = len(r_val)
    r_idx = {c: i for i, c in enumerate(r_val)}
    sub_stream = spark0.readStream.schema(sub_schema + ", sink_batch int").parquet(subdir)
    b_l = sub_stream.select(
        "op",
        "__jfk",
        F.col("sink_batch").alias("__sub"),
        *l_key,
        *l_val,
        *[F.lit(None).cast(rddl(c)).alias(c) for c in r_val],
    )
    r_src = right.df.filter(F.col(rk).isNotNull())
    b_r = r_src.select(
        F.lit("R").alias("op"),
        F.col(rk).cast("string").alias("__jfk"),
        F.lit(None).cast("int").alias("__sub"),
        *[F.lit(None).cast(lddl(c)).alias(c) for c in l_key + l_val],
        *[(F.col(c).cast("string") if c in tun_r else F.col(c)).alias(c) for c in r_val],
    )
    b_in = b_l.unionByName(b_r)
    state_b = (
        "__r_set boolean"
        + "".join(f", `{c}` {rddl(c)}" for c in r_val)
        + ", __subs array<struct<__sub: int"
        + "".join(f", `{c}`: {lddl(c)}" for c in l_key + l_val)
        + ">>"
    )
    out_cols = ["op", *l_key, *l_val, *r_val]
    out_schema = "op string" + "".join(f", `{c}` {lddl(c)}" for c in l_key + l_val) + "".join(
        f", `{c}` {rddl(c)}" for c in r_val
    )
    n_lk = len(l_key)

    def fn_b(gkey, pdfs, state):
        import pandas as pd  # noqa: PLC0415 - worker-side import

        clean = _clean_state_value

        def r_ord_of(lookup):
            vals = []
            for c in rord:
                v = clean(gkey[0]) if c == rk else clean(lookup(c))
                if v is None:
                    raise ValueError(
                        "null order value in the keyed fk-join engine — use engine='exact'"
                    )
                if c in tun_r or (c == rk and rk in tun_r):
                    v = int(v)
                vals.append(v)
            return tuple(vals)

        if state.exists:
            st = list(state.get)
            r_set, r_vals = bool(st[0]), list(st[1 : 1 + n_rv])
            subs = {}
            for s in st[1 + n_rv] or []:
                vals = [s[c] for c in ([*l_key, *l_val])]
                subs[tuple(vals[:n_lk])] = {"sub": s["__sub"], "vals": vals}
        else:
            r_set, r_vals, subs = False, [None] * n_rv, {}
        cur_rord = r_ord_of(lambda c: r_vals[r_idx[c]]) if r_set else None
        right_changed = False
        lops = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            for _, row in pdf.iterrows():
                op = row["op"]
                if op == "R":
                    ov = r_ord_of(lambda c: row[c])
                    if (cur_rord is None) or ov >= cur_rord:
                        r_vals = [clean(row[c]) for c in r_val]
                        cur_rord, r_set, right_changed = ov, True, True
                else:
                    lops.append(
                        (
                            int(row["__sub"]),
                            op,
                            tuple(clean(row[c]) for c in l_key),
                            [clean(row[c]) for c in l_key + l_val],
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
        state.update(
            (
                r_set,
                *r_vals,
                [
                    {"__sub": e["sub"], **dict(zip(l_key + l_val, e["vals"]))}
                    for e in subs.values()
                ],
            )
        )
        out_rows = []
        if how == "left" or r_set:
            ups = subs.keys() if right_changed else [p for p in changed if p in subs]
            pad = r_vals if r_set else [None] * n_rv
            for pkt in ups:
                out_rows.append(("U", *subs[pkt]["vals"], *pad))
        for pkt in removed:
            out_rows.append(("D", *pkt, *([None] * (n_lv + n_rv))))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_cols)

    res_b = b_in.groupBy("__jfk").applyInPandasWithState(
        fn_b, out_schema, state_b, "append", "NoTimeout"
    )

    def _sink_b(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.write.mode("overwrite").parquet(os.path.join(outdir, f"sink_batch={batch_id}"))

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


def _changelog_join_loop(
    left: KStream,
    right: KStream,
    combine: Callable[[KTable, KTable], KTable],
    l_order: Sequence[str] | None,
    r_order: Sequence[str] | None,
    store_name: str | None,
    state_dir: str | None,
    checkpoint: str | None,
    state_prefix: str,
) -> DataFrame:
    """Shared state loop of the continuous table⋈table family: one streaming
    query over the union of both tagged changelogs; per microbatch (a)
    upsert each side's latest-per-key parquet snapshot (ping-pong
    generations, restart-safe via the _GEN marker) and (b) re-``combine``
    the two snapshots into the output store.  ``combine`` is the only thing
    the PK join and the FK join disagree on."""
    overlap = set(left.df.columns) & set(right.df.columns)
    if overlap:
        raise ValueError(f"sides must have disjoint column names; overlap: {sorted(overlap)}")
    _check_reserved_columns(
        list(left.df.columns) + list(right.df.columns),
        {"__side": "changelog union tag"},
        "changelog-state join loop",
    )
    l_cols, r_cols = list(left.df.columns), list(right.df.columns)
    lord = tuple(l_order) if l_order else ((left.ts,) if left.ts else ())
    rord = tuple(r_order) if r_order else ((right.ts,) if right.ts else ())
    if not lord or not rord:
        raise ValueError("changelog order required per side (ts or explicit l_order/r_order)")
    root = state_dir or tempfile.mkdtemp(prefix=state_prefix)
    os.makedirs(root, exist_ok=True)
    tagged = left.df.select(
        F.lit(1).alias("__side"),
        *l_cols,
        *[F.lit(None).cast(right.df.schema[c].dataType).alias(c) for c in r_cols],
    ).unionByName(
        right.df.select(
            F.lit(0).alias("__side"),
            *[F.lit(None).cast(left.df.schema[c].dataType).alias(c) for c in l_cols],
            *r_cols,
        )
    )
    gen = {"n": _read_gen(root)}  # survives a restart on the same checkpoint
    # a fresh OR foreign checkpoint renumbers/skips batch ids, so the
    # replay-skip below would silently drop or double-fold data — the state
    # dir is bound to its original checkpoint and every other pair refused
    ckpt = _bind_state_checkpoint(
        root, _checkpoint(checkpoint), gen["n"] > 0, f"join-state generation {gen['n']}"
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _read_applied(root):
            # crash-replay of a batch whose fold already committed: skip the
            # fold, but still run the batch's tasks (noop sink) so the
            # upstream stateful operator's stores commit for this batch
            batch.write.format("noop").mode("overwrite").save()
            return
        spark = batch.sparkSession
        cur, nxt = gen["n"] % 2, (gen["n"] + 1) % 2
        sides = (
            ("l", F.col("__side") == 1, l_cols, left.key, lord),
            ("r", F.col("__side") == 0, r_cols, right.key, rord),
        )
        for tag, pred, cols, key, order in sides:
            rows = batch.filter(pred).select(*cols)
            prev_path = os.path.join(root, f"{tag}-{cur}")
            if os.path.exists(prev_path):
                rows = spark.read.parquet(prev_path).unionByName(rows)
            latest = KStream(rows, key, None).to_table(order=order).df
            latest.write.mode("overwrite").parquet(os.path.join(root, f"{tag}-{nxt}"))
        l_t = KTable(spark.read.parquet(os.path.join(root, f"l-{nxt}")), left.key, left.ts)
        r_t = KTable(spark.read.parquet(os.path.join(root, f"r-{nxt}")), right.key, right.ts)
        out = combine(l_t, r_t)
        out.df.write.mode("overwrite").parquet(os.path.join(root, "out"))
        gen["n"] += 1
        _write_gen(root, gen["n"], batch_id)

    q = (
        tagged.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = left.df.sparkSession
    out_path = os.path.join(root, "out")
    if not os.path.exists(out_path):
        # no microbatch ever fired (both changelogs empty): empty join result
        l_t = KTable(spark.createDataFrame([], left.df.schema), left.key, left.ts)
        r_t = KTable(spark.createDataFrame([], right.df.schema), right.key, right.ts)
        return combine(l_t, r_t).df
    out = spark.read.parquet(out_path)
    if store_name is not None:
        out.createOrReplaceTempView(store_name)
    return out


def suppress_buffered(
    table: KTable,
    time_col: str | None = None,
    state_dir: str | None = None,
    checkpoint: str | None = None,
    store_name: str | None = None,
    engine: str | None = None,
) -> DataFrame:
    """Streaming realization of ``KTable.suppress(until_time_limit_ms=...)``
    — Kafka Streams Suppressed.untilTimeLimit(d, BufferConfig) (KIP-328;
    the reference's roadmap Suppress, README.md:106).

    Semantics (ported from KS's InMemoryTimeOrderedKeyValueBuffer):

      * each key's update enters a time-ordered buffer stamped with its own
        event time; LATER updates replace the value but do NOT reset the
        clock (the entry keeps its first-buffered time);
      * an entry emits when stream time (running max event time) passes
        entry_time + limit;
      * the buffer is bounded by max_records and/or max_bytes (serialized
        JSON size — the analog of KS's measured byte size): on overflow,
        emit_early_when_full=True evicts-and-EMITS the earliest entries
        (BufferConfig.emitEarlyWhenFull), False raises — the
        shutDownWhenFull default, a crash in KS;
      * emission cadence is per-microbatch (§7.3.3): time checks run when a
        batch closes, not per record.

    Three engines, selected by ``engine`` (None = auto: ``"tws"`` when the
    raw changelog is available, bounds are off and protobuf is importable;
    ``"keyed"`` without protobuf; ``"exact"`` otherwise):

      * ``"tws"`` — transformWithState port of the keyed engine
        (tws.suppress_tws): identical decoupled clock-copy watermark and
        due rule, per-key event-time TIMERS instead of GroupState
        timeouts, native-typed state, RocksDB store.
      * ``"keyed"`` — the scale engine: ``applyInPandasWithState`` over the
        RAW changelog (threaded through ``KStream.to_table``), per-key
        RocksDB/HDFS state in the streaming checkpoint, event-time timers
        for emission.  Per-microbatch I/O is O(changed keys + newly due
        keys), never O(buffered keys).  Emission batch ids match the KS
        per-batch rule exactly: a timer set at ``entry+limit-1`` fires in
        the microbatch AFTER the one whose stream time passed the deadline
        (the watermark Spark hands a batch is the PREVIOUS batch's running
        max), so timer emissions are renumbered ``batch_id - 1``; an entry
        already due against the current watermark at creation emits in its
        own batch untagged.  Arbitrarily LATE updates are admitted exactly
        like KS: the watermark rides separate clock-copy rows, so Spark's
        stateful late-row filter can never drop a data row (see
        _suppress_keyed).  Requires an unbounded buffer (capacity bounds
        are buffer-GLOBAL — see below) and a table built by plain
        ``to_table`` (default ts order, no tombstones).
      * ``"exact"`` — the bounded-buffer engine: one parquet ping-pong
        buffer folded per microbatch.  Capacity bounds (max_records /
        max_bytes) need a total time-order across ALL keys per batch, which
        per-key state cannot see; per-batch O(buffer) I/O is within the
        operator's contract there because a KIP-328 bounded buffer is small
        by definition.  Auto-selected whenever bounds are configured or the
        raw changelog is unavailable.

    Both engines write each microbatch's emissions to an
    ``out/sink_batch=<id>`` partition with OVERWRITE, so a crash-replayed
    batch rewrites its own partition instead of appending duplicates
    (exactly-once emission), and both return only emissions newer than the
    checkpoint's last COMMITTED batch at drain start (a resumed drain never
    re-delivers, and a batch that crashed pre-commit is re-delivered —
    it was never returned to any caller).

    Drains availableNow and returns the emitted records — columns = the
    table's columns plus ``__emit_reason`` ('time' | 'early') and
    ``__emit_batch`` — in emission order; entries still inside their time
    limit at drain end stay buffered (readable via ``store_name``), exactly
    like a KS buffer across restarts."""
    cfg = getattr(table, "suppress_config", None)
    if cfg is None:
        raise ValueError(
            "suppress_buffered needs a table from "
            "KTable.suppress(until_time_limit_ms=...) — for untilWindowCloses "
            "suppression drain the table in append mode instead"
        )
    df = table.df
    if not df.isStreaming:
        raise ValueError("suppress_buffered requires a streaming table; batch suppress is identity")
    tcol = time_col or table.ts
    if tcol is None or tcol not in df.columns:
        raise ValueError("suppress_buffered requires an event-time column (time_col or table.ts)")
    from .runtime import epoch_ms

    key = list(table.key)
    if not key:
        raise ValueError("suppress_buffered requires key columns")
    limit_ms = int(cfg["until_time_limit_ms"])
    max_records = cfg.get("max_records")
    max_bytes = cfg.get("max_bytes")
    emit_early = bool(cfg.get("emit_early_when_full"))
    bounded = max_records is not None or max_bytes is not None

    src = getattr(table, "_source_stream", None)
    keyed_ok = (
        not bounded
        and src is not None
        and not getattr(table, "_source_tombstones", False)
        and tuple(getattr(table, "_source_order", ()) or ()) == (tcol,)
        and tcol in src.df.columns
        # the keyed engine brings its OWN decoupled watermark (clock-copy
        # rows); a pre-watermarked source would re-introduce the stateful
        # late-row filter on the data copies
        and not _has_watermark(src.df)
    )
    if engine is None:
        if keyed_ok:
            engine = _select_keyed_engine(
                state_dir,
                "_PSE_STATE_V",
                [(df.schema, [c for c in df.columns if c not in key])],
                hard=[(df.schema, list(key))],
            )
        else:
            engine = "exact"
    if engine in ("keyed", "tws"):
        if bounded:
            raise ValueError(
                f"the {engine} suppress engine cannot enforce max_records/max_bytes: "
                "capacity bounds are buffer-global (a total time-order across all "
                "keys), invisible to per-key state — use engine='exact'"
            )
        if not keyed_ok:
            raise ValueError(
                f"the {engine} suppress engine needs the raw changelog threaded by a "
                "plain KStream.to_table() (default ts order, no tombstones, no "
                "pre-existing watermark) whose ts column is the suppress time column"
            )
        if engine == "tws":
            from .tws import suppress_tws  # noqa: PLC0415 - optional protobuf dep

            return suppress_tws(table, src, tcol, limit_ms, state_dir, checkpoint, store_name)
        return _suppress_keyed(table, src, tcol, limit_ms, state_dir, checkpoint, store_name)
    if engine != "exact":
        raise ValueError(
            f"unknown suppress engine {engine!r}; expected 'keyed', 'tws' or 'exact'"
        )

    cols = list(df.columns)
    root = state_dir or tempfile.mkdtemp(prefix="pse-suppress-")
    os.makedirs(root, exist_ok=True)
    gen = {"n": _read_gen(root)}
    spark0 = df.sparkSession
    out_dir = os.path.join(root, "out")
    # resuming the buffer with a fresh OR foreign checkpoint would replay
    # the whole source and re-merge already-emitted keys (double emission),
    # or skip foreign batch ids — only the bound original pair is accepted
    ckpt = _bind_state_checkpoint(
        root, _checkpoint(checkpoint), gen["n"] > 0, f"suppress-buffer generation {gen['n']}"
    )
    # this CALL returns only ITS OWN emissions: a resumed drain must not
    # re-deliver records from batches the checkpoint already COMMITTED
    # (an emitted-but-uncommitted batch replays and IS delivered — the
    # previous drain crashed before returning it)
    prior_batch = _last_committed(ckpt)

    def _stream_time() -> int:
        try:
            with open(os.path.join(root, "_STREAM_TIME")) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return -(1 << 62)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        if batch_id <= _read_applied(root):
            # crash-replay of a batch whose fold already committed: skip the
            # fold (the emission partition is already on disk), but still
            # run the batch's tasks so the upstream aggregate's stores commit
            batch.write.format("noop").mode("overwrite").save()
            return
        spark = batch.sparkSession
        cur, nxt = gen["n"] % 2, (gen["n"] + 1) % 2
        new = batch.withColumn("__ev_ms", epoch_ms(tcol))
        batch_max = new.agg(F.max("__ev_ms")).collect()[0][0]
        st = max(_stream_time(), batch_max if batch_max is not None else -(1 << 62))
        prev_path = os.path.join(root, f"buf-{cur}")
        if os.path.exists(prev_path):
            prev = spark.read.parquet(prev_path)
            # update-in-place: new value wins, FIRST entry time sticks
            n2 = new.select(
                *[F.col(c).alias(f"__n_{c}") for c in cols], F.col("__ev_ms").alias("__n_ev")
            )
            cond = None
            for k in key:
                c = prev[k].eqNullSafe(n2[f"__n_{k}"])
                cond = c if cond is None else cond & c
            j = prev.join(n2, cond, "full_outer")
            merged = j.select(
                *[F.coalesce(n2[f"__n_{c}"], prev[c]).alias(c) for c in cols],
                F.coalesce(prev["__entry_ms"], n2["__n_ev"]).alias("__entry_ms"),
            )
        else:
            merged = new.select(*cols, F.col("__ev_ms").alias("__entry_ms"))
        merged = merged.localCheckpoint()  # cut lineage; buffer is bounded
        emissions = []  # [(rows_df, reason)] — written ONCE per batch below
        due = merged.filter(F.col("__entry_ms") + F.lit(limit_ms) <= F.lit(st))
        if due.limit(1).count():
            emissions.append((due, "time"))
        remaining = merged.filter(~(F.col("__entry_ms") + F.lit(limit_ms) <= F.lit(st)))
        # capacity bounds (the buffer is <= max_records rows by invariant, so
        # the single-partition rank window below is bounded, not a skew risk)
        if max_records is not None or max_bytes is not None:
            w = Window.orderBy(F.col("__entry_ms"), *[F.col(k) for k in key])
            sized = remaining.withColumn("__rank", F.row_number().over(w))
            n = sized.count()
            keep_rank = None
            if max_records is not None and n > max_records:
                keep_rank = n - int(max_records)
            if max_bytes is not None:
                sized = sized.withColumn(
                    "__bytes", F.length(F.to_json(F.struct(*[F.col(c) for c in cols])))
                )
                # keep the NEWEST suffix that fits: cumulative size from the
                # newest entry backwards
                wb = Window.orderBy(
                    F.col("__entry_ms").desc(), *[F.col(k).desc() for k in key]
                ).rowsBetween(Window.unboundedPreceding, 0)
                sized = sized.withColumn("__cum", F.sum("__bytes").over(wb))
                over_bytes = sized.filter(F.col("__cum") > F.lit(int(max_bytes)))
                nb = over_bytes.count()
                if nb:
                    keep_rank = max(keep_rank or 0, nb)
            if keep_rank:
                if not emit_early:
                    raise ValueError(
                        "suppress buffer full (shutDownWhenFull): "
                        f"{n} records exceed the configured bound; pass "
                        "emit_early_when_full=True for BufferConfig.emitEarlyWhenFull"
                    )
                early = sized.filter(F.col("__rank") <= keep_rank)
                emissions.append((early, "early"))
                remaining = sized.filter(F.col("__rank") > keep_rank).select(*cols, "__entry_ms")
        if emissions:
            out = None
            for rows, reason in emissions:
                part = rows.select(
                    *cols,
                    F.lit(reason).alias("__emit_reason"),
                    F.lit(int(batch_id)).alias("__emit_batch"),
                )
                out = part if out is None else out.unionByName(part)
            # one OVERWRITE per batch partition: a crash-replayed batch
            # rewrites its own emissions instead of appending duplicates
            out.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"sink_batch={batch_id}")
            )
        remaining.write.mode("overwrite").parquet(os.path.join(root, f"buf-{nxt}"))
        tmp = os.path.join(root, "_STREAM_TIME.tmp")
        with open(tmp, "w") as f:
            f.write(str(int(st)))
        os.replace(tmp, os.path.join(root, "_STREAM_TIME"))
        gen["n"] += 1
        _write_gen(root, gen["n"], batch_id)

    q = (
        df.writeStream.outputMode("update")
        .foreachBatch(_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = df.sparkSession
    if store_name is not None:
        buf_path = os.path.join(root, f"buf-{gen['n'] % 2}")
        buf = (
            spark.read.parquet(buf_path)
            if os.path.exists(buf_path)
            else spark.createDataFrame([], df.schema)
        )
        buf.createOrReplaceTempView(store_name)
    if not _has_emissions(out_dir):
        return _empty_emissions(spark, df.schema, cols)
    return (
        spark.read.parquet(out_dir)
        .filter(F.col("sink_batch") > F.lit(int(prior_batch)))
        .select(*cols, "__emit_reason", "__emit_batch")
    )


def _has_emissions(out_dir: str) -> bool:
    """Whether the suppress out/ directory holds any sink_batch=* partition
    (a bare or absent dir means no microbatch ever emitted)."""
    if not os.path.isdir(out_dir):
        return False
    return any(e.startswith("sink_batch=") for e in os.listdir(out_dir))


def _empty_emissions(spark, schema, cols):
    empty = spark.createDataFrame([], schema)
    return empty.select(
        *cols,
        F.lit(None).cast("string").alias("__emit_reason"),
        F.lit(None).cast("long").alias("__emit_batch"),
    )


def _suppress_keyed(
    table: KTable,
    src: KStream,
    tcol: str,
    limit_ms: int,
    state_dir: str | None,
    checkpoint: str | None,
    store_name: str | None,
) -> DataFrame:
    """Keyed-state engine of ``suppress_buffered`` (see its docstring for
    the contract): per-key buffer state in ``applyInPandasWithState``
    (Spark's RocksDB/HDFS state store — the KS changelog-backed
    InMemoryTimeOrderedKeyValueBuffer analog), EventTimeTimeout timers for
    emission, and the latest-per-key fold of ``KStream.to_table`` re-derived
    INSIDE the state function (a stateful operator cannot chain downstream
    of the update-mode aggregate, so the engine consumes the raw changelog).

    State per key = (buffer entry time | null, latest event time, latest
    row); the latest-row half persists after emission so a late record
    cannot resurrect an older value (exactly the update-mode aggregate's
    memory).  Timers fire when the watermark STRICTLY exceeds the set
    timestamp, so ``entry+limit-1`` fires at the first watermark >=
    entry+limit — the KS due rule.  One boundary is documented rather than
    closed: when Spark rejects that timestamp as not beyond the current
    watermark (entry+limit == wm+1), the timer is floored to wm+1 and an
    advance to EXACTLY wm+1 ms would not fire it until the next advance —
    unreachable for ms-granularity event data unless stream time lands on
    that exact millisecond with no later data.  Pre-epoch (< 1970) event
    times cannot advance a Spark watermark at all (Spark floors it at 0),
    so such changelogs must use ``engine="exact"`` — the state fn raises
    loudly on the first pre-epoch data row instead of buffering it forever.
    """
    from .runtime import epoch_ms

    spark0 = src.df.sparkSession
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
        "keyed suppress engine",
    )
    root = state_dir or tempfile.mkdtemp(prefix="pse-suppress-")
    os.makedirs(root, exist_ok=True)
    out_dir = os.path.join(root, "out")
    # the buffer itself lives in the Spark checkpoint here; a fresh or
    # foreign checkpoint would orphan it AND re-deliver old out/ emissions
    # (prior_batch would restart at -1) — only the bound pair is accepted
    ckpt = _bind_state_checkpoint(
        root, _checkpoint(checkpoint), _has_emissions(out_dir), "prior suppress emissions"
    )
    # state-schema version gate: the string tunnel for integral columns
    # changed BOTH the applyInPandasWithState state schema and the
    # out/sink_batch parquet schema (v2).  A populated v1 dir cannot resume
    # under v2 — Spark would fail its state-schema compatibility check with
    # an opaque error, and new string-typed sink partitions next to v1
    # int64 ones would break the final out/ read — so refuse descriptively
    # instead; fresh dirs are stamped before the first batch runs.
    ver_path = os.path.join(root, "_PSE_STATE_V")
    ver = _read_bind(ver_path)
    prior_batch = _last_committed(ckpt)
    # "populated" for the version gate means EITHER emissions OR committed
    # batches: suppress can buffer for many batches before its first
    # emission, and such a run still holds v-old state in the checkpoint
    # (r10 advice — gating on emissions alone would stamp the dir v-new
    # and then hit the opaque Spark state-schema failure mid-drain)
    if (_has_emissions(out_dir) or prior_batch >= 0) and ver != _KEYED_STATE_VERSION:
        raise ValueError(
            f"state dir {root!r} holds keyed-suppress state with state-schema "
            f"version {ver or 'pre-versioning (v1)'}, but this engine writes "
            f"version {_KEYED_STATE_VERSION} (integral columns string-tunneled "
            "for exact bigint round-trip) — resuming would fail Spark's state-"
            "schema check and mix sink schemas; drain the old run with the code "
            "that wrote it, or start a fresh state_dir"
        )
    if ver is None:
        # only verifiably FRESH dirs (no emissions, no commits) reach here
        with open(ver_path + ".tmp", "w") as f:
            f.write(_KEYED_STATE_VERSION)
        os.replace(ver_path + ".tmp", ver_path)
    _maybe_autocompact(spark0, root, ckpt)

    sdf = src.df
    for k in key:
        sdf = sdf.filter(F.col(k).isNotNull())  # to_table drops null keys
    # The watermark is DECOUPLED from the data rows: Spark's stateful
    # operators filter input rows older than the late-events watermark
    # (which lags the eviction watermark by one batch), but KS admits
    # arbitrarily late updates into the suppress buffer.  So every row is
    # shipped twice: a DATA copy whose event-time column (__wm_ts) is NULL
    # — null event times are never late-filtered and don't contribute to
    # the watermark — and a CLOCK copy carrying ts with all other value
    # columns nulled (shuffle weight), which exists only to advance the
    # watermark; a clock copy dropped as late is by definition one that
    # would not have advanced the running max anyway.  The function folds
    # only data copies; timers ride the clock-driven watermark.
    value_cols = [c for c in cols if c not in key]
    _check_container_columns(table.df.schema, value_cols, "keyed suppress engine")
    ddl0 = {f.name: f.dataType.simpleString() for f in table.df.schema.fields}
    integral = {"tinyint", "smallint", "int", "bigint"}
    # Integral VALUE columns tunnel through the stateful operator as strings:
    # any null in a group's Arrow column slice (a clock copy, or a real null
    # in a data row) makes pandas deliver the slice as float64 BEFORE the
    # state fn ever sees it, and float64 cannot represent bigints past 2^53
    # — a decimal string round-trips exactly and null-safely.  Cast back in
    # the returned emissions and the store view.  Key columns stay integral:
    # they are null-filtered above, so their slices never leave int64.
    tunnel = {c for c in value_cols if ddl0[c] in integral}
    sdf = sdf.select(
        *[F.col(c).cast("string").alias(c) if c in tunnel else F.col(c) for c in cols],
        epoch_ms(tcol).alias("__ev_ms"),
    ).select("*", F.explode(F.array(F.lit(0), F.lit(1))).alias("__clk"))

    def _clock_fill(c):
        # clock copies carry no payload — null fill keeps shuffle weight down
        return F.when(F.col("__clk") == 0, F.col(c)).otherwise(F.lit(None)).alias(c)

    sdf = sdf.select(
        *key,
        *[_clock_fill(c) for c in value_cols],
        F.when(F.col("__clk") == 0, F.col("__ev_ms")).otherwise(F.lit(0)).alias("__ev_ms"),
        "__clk",
        F.when(F.col("__clk") == 1, F.col(tcol)).alias("__wm_ts"),
    ).withWatermark("__wm_ts", "0 milliseconds")

    ddl = {c: ("string" if c in tunnel else ddl0[c]) for c in cols}
    state_schema = "__entry_ms long, __hist_ms long, " + ", ".join(
        f"`{c}` {ddl[c]}" for c in cols
    )
    out_schema = ", ".join(f"`{c}` {ddl[c]}" for c in cols) + ", __fired boolean"
    NEG = -(1 << 62)
    # keys are never null, so their slices stay int64 — the coercion below
    # is a guard (a Python float in a typed int state field nulls silently)
    int_cols = {c for c in key if ddl0[c] in integral}

    def _untunnel(c):
        return F.col(c).cast(ddl0[c]).alias(c) if c in tunnel else F.col(c)

    def fn(grp_key, pdfs, state):
        import pandas as pd  # noqa: PLC0415 - worker-side import

        def clean(v, c=None):
            v = _clean_state_value(v)
            if c in int_cols and isinstance(v, float):
                return int(v)
            return v

        wm = state.getCurrentWatermarkMs()
        # Spark initializes the watermark at 0 and only ratchets it UP, so
        # 0 means "no watermark yet"; pre-epoch event times can never
        # advance a Spark watermark at all (timers would never fire), so
        # such data must use engine="exact" — documented limitation.
        wm_eff = wm if wm > 0 else NEG
        out_rows = []
        if state.hasTimedOut:
            st = list(state.get)
            out_rows.append((*st[2:], True))
            # buffer entry leaves; the latest-row memory stays (a late
            # record must still lose to it, like the update-mode aggregate)
            state.update((None, st[1], *st[2:]))
        else:
            if state.exists:
                st = list(state.get)
                entry, hist_ms, hist_vals = st[0], st[1], list(st[2:])
            else:
                entry, hist_ms, hist_vals = None, None, None
            if entry is not None and entry + limit_ms <= wm_eff:
                # due BEFORE this batch's data (KS emitted it last batch;
                # this batch's arrival pre-empted the timer): emit the
                # pre-merge value, renumbered like a timer firing
                out_rows.append((*hist_vals, True))
                entry = None
            had_data = False
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                data = pdf[pdf["__clk"] == 0]  # clock copies only drive wm
                evs = data["__ev_ms"].tolist()
                for i, ev in enumerate(evs):
                    if ev is None or (isinstance(ev, float) and ev != ev):
                        continue
                    had_data = True
                    ev = int(ev)
                    if ev <= 0:
                        # ADVICE r9: engine=None auto-selects this engine,
                        # which would buffer pre-epoch entries FOREVER
                        # (Spark floors the watermark at 0 and this fn reads
                        # wm == 0 as "none yet", so epoch-0 exactly is just
                        # as undeliverable) — loud beats silently empty
                        raise ValueError(
                            "pre-epoch (<= 1970-01-01T00:00:00) event time "
                            "in the keyed suppress engine: Spark watermarks "
                            "cannot advance past it, so such entries would "
                            "never emit — use engine='exact'"
                        )
                    if hist_ms is None or ev >= hist_ms:
                        # later-wins on ties, in arrival order — the
                        # max_by(ts) fold of to_table
                        hist_ms = ev
                        row = data.iloc[i]
                        hist_vals = [clean(row[c], c) for c in cols]
            if had_data and entry is None:
                # (re-)enter the buffer: clock = the state row's event
                # time (which a late record does NOT move backwards)
                entry = hist_ms
                if entry + limit_ms <= wm_eff:
                    # already due vs the previous batch's stream time:
                    # KS emits it in THIS batch — no renumbering
                    out_rows.append((*hist_vals, False))
                    entry = None
            # else: value replaced via hist_vals, clock kept
            if hist_ms is not None:
                state.update((entry, hist_ms, *hist_vals))
                if entry is not None:
                    # invocations clear timers: re-arm whenever buffered
                    state.setTimeoutTimestamp(max(entry + limit_ms - 1, wm + 1))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=cols + ["__fired"])

    res = sdf.groupBy(*key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "EventTimeTimeout"
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

    q = (
        res.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    if store_name is not None:
        try:
            state_df = read_state_store(spark0, ckpt)
            buf = state_df.filter(F.col("value.groupState.__entry_ms").isNotNull()).select(
                *[
                    F.col(f"value.groupState.`{c}`").cast(ddl0[c]).alias(c)
                    if c in tunnel
                    else F.col(f"value.groupState.`{c}`").alias(c)
                    for c in cols
                ]
            )
        except Exception:
            buf = spark0.createDataFrame([], table.df.schema)  # no batch ever ran
        buf.createOrReplaceTempView(store_name)
    if not _has_emissions(out_dir):
        return _empty_emissions(spark0, table.df.schema, cols)
    return (
        spark0.read.parquet(out_dir)
        .filter(F.col("sink_batch") > F.lit(int(prior_batch)))
        .select(*[_untunnel(c) for c in cols], "__emit_reason", "__emit_batch")
    )


# ---------------- custom stateful operator escape hatch ----------------


def stateful_map(
    grouped,
    fn: Callable,
    output_schema: str,
    state_schema: str,
    output_mode: str = "update",
    timeout: str = "NoTimeout",
):
    """Arbitrary per-key stateful processing via ``applyInPandasWithState`` —
    the analog of the reference's low-level Processor API + state store
    (core/Processors/IProcessor.cs + core/State/Stores.cs surface), for
    semantics the declarative operators can't express (session gap logic,
    custom eviction, cross-record state machines).

    ``fn(key, pdf_iter, state)`` per the applyInPandasWithState contract.
    Arrow-batched; state = one row per key in the state store; scale bound =
    state size per key, not stream length.  Only valid on streaming input —
    batch equivalents go through KGroupedStream.aggregate_py.
    """
    stream = grouped.stream
    df = stream.df
    if not df.isStreaming:
        raise ValueError("stateful_map requires a streaming KStream; use aggregate_py in batch")
    out = df.groupBy(*grouped.key).applyInPandasWithState(
        fn, output_schema, state_schema, output_mode, timeout
    )
    return KStream(out, grouped.key, None)


def _sessionize_step(
    buf: list,
    closed: int,
    new_events: list,
    wm: int,
    gap: int,
):
    """PURE per-key transition of the streaming sessionizer (no Spark, no
    state handle — unit/property-testable in isolation): merge the open
    buffer with the batch's new (t_ms, order) events, split on the gap rule
    (strict > : events exactly ``gap`` apart merge, identical to
    analytics.sessionize), emit every LEADING session whose end the
    watermark has passed (closure is monotone in session order), and return

        (emitted_rows [(t, order, session_idx, pos)...],
         remaining_buffer [(t, order)...],
         closed_count',
         next_timeout_ms or None)

    A session is closed when NO admissible event (ts >= watermark) can
    extend it: last + gap < wm STRICTLY, because an event exactly gap after
    the last would still merge."""
    buf = sorted(buf + list(new_events))
    sessions: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    for t, o in buf:
        if cur and t - cur[-1][0] > gap:
            sessions.append(cur)
            cur = []
        cur.append((t, o))
    if cur:
        sessions.append(cur)
    n_emit = 0
    while n_emit < len(sessions) and sessions[n_emit][-1][0] + gap < wm:
        n_emit += 1
    rows = [
        (t, o, closed + i + 1, pos)
        for i in range(n_emit)
        for pos, (t, o) in enumerate(sessions[i], 1)
    ]
    rest = sessions[n_emit:]
    rest_buf = [(t, o) for s in rest for t, o in s]
    # Timer at the earliest open session's close boundary (last + gap):
    # Spark fires EventTimeTimeout when the watermark STRICTLY exceeds the
    # timestamp, i.e. at the first wm with wm > last + gap — exactly the
    # closure rule above.  last+gap+1 here would leave a 1ms boundary where
    # a terminating run's final watermark equals last+gap+1: closed by the
    # rule, never flushed by timer.  wm+1 floor only because Spark rejects
    # timeouts at or below the current watermark (then rest[0] closes at
    # the very next watermark advance — still exact).
    timeout = max(rest[0][-1][0] + gap, wm + 1) if rest else None
    return rows, rest_buf, closed + n_emit, timeout


def sessionize_streaming(
    stream: KStream,
    order_col: str,
    gap_ms: int,
    key_type: str = "bigint",
    order_type: str = "bigint",
    evict_closed: bool = False,
) -> KStream:
    """TRUE streaming event-level sessionization — the stateful-processor
    realization of analytics.sessionize (which Spark cannot express natively:
    session WINDOW aggregation exists, per-event session ids do not).  Built
    on ``applyInPandasWithState`` with EventTimeTimeout, the same
    escape-hatch surface as stateful_map (the reference's low-level
    Processor API + state store analog).

    Per-user state = the OPEN sessions' (t_ms, order) pairs plus a count of
    sessions already closed (so session_idx numbering continues across
    emissions).  Each invocation merges new events, splits the buffer on the
    gap rule (inclusive merge at exactly ``gap_ms``, identical to
    analytics.sessionize), and emits — exactly once, append mode — every
    leading session whose end (last event + gap) the watermark has passed:
    closure is monotone in session order, so the closed prefix is always
    emission-safe.  A timer at the earliest open session's end guarantees
    eviction even for users who go silent.

    Scale: OPEN-session events leave state the moment their session closes,
    so per-user state is bounded by one gap horizon of events plus — for
    users with no open session — a constant-size counter row that preserves
    session_idx continuity (exact batch parity).  For unbounded-user-churn
    deployments pass ``evict_closed=True``: the counter row is removed too
    (state fully bounded by ACTIVE users), at the documented cost that a
    user returning after eviction restarts numbering at 1 — the same
    trade-off as a windowed store's retention expiring old windows.  The
    emitted rows carry (user, order, t_ms, session_idx 1-based, pos 1-based)
    exactly like the batch operator, pinned by
    test_sessionize_streaming_parity (emitted == batch sessionize restricted
    to watermark-closed sessions)."""
    from .runtime import epoch_ms

    if not stream.df.isStreaming:
        raise ValueError("sessionize_streaming requires a streaming KStream; use analytics.sessionize in batch")
    if len(stream.key) != 1 or stream.ts is None:
        raise ValueError("sessionize_streaming requires a single key column and a ts column")
    if not _has_watermark(stream.df):
        raise ValueError(
            "sessionize_streaming requires an event-time watermark (session closure "
            "and the eviction timers are watermark-driven) — call "
            "with_watermark(...) on the stream first"
        )
    user = stream.key[0]
    df = stream.df.select(
        F.col(user),
        F.col(stream.ts),
        F.col(order_col).alias("__o"),
        epoch_ms(F.col(stream.ts)).alias("__t_ms"),
    )
    gap = int(gap_ms)
    out_schema = (
        f"{user} {key_type}, {order_col} {order_type}, t_ms bigint, "
        "session_idx bigint, pos bigint"
    )
    state_schema = "tss array<bigint>, orders array<bigint>, closed bigint"

    def fn(key, pdfs, state):
        import pandas as pd  # noqa: PLC0415 - worker-side import

        if state.exists:
            tss, orders, closed = state.get
            buf = list(zip((int(t) for t in tss), (int(o) for o in orders)))
        else:
            buf, closed = [], 0
        new = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                new.extend(
                    zip((int(t) for t in pdf["__t_ms"]), (int(o) for o in pdf["__o"]))
                )
        rows, rest_buf, closed, timeout = _sessionize_step(
            buf, closed, new, state.getCurrentWatermarkMs(), gap
        )
        if rest_buf:
            state.update(([t for t, _ in rest_buf], [o for _, o in rest_buf], closed))
            state.setTimeoutTimestamp(timeout)
        elif evict_closed:
            # fully evict idle users (numbering restarts if they return)
            if state.exists:
                state.remove()
        else:
            # keep only the constant-size counter row: session_idx stays
            # continuous for returning users (exact batch parity)
            state.update(([], [], closed))
        if rows:
            yield pd.DataFrame(
                [(key[0], o, t, idx, pos) for (t, o, idx, pos) in rows],
                columns=[user, order_col, "t_ms", "session_idx", "pos"],
            )

    out = df.groupBy(user).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "EventTimeTimeout"
    )
    return KStream(out, (user,), None)


def join_windowed_eager(
    left: KStream,
    right: KStream,
    window,
    how: str = "inner",
    ts_alias: str = "ts",
    state_dir: str | None = None,
    checkpoint: str | None = None,
) -> DataFrame:
    """Streaming KStream⋈KStream windowed join with the reference's EAGER
    emission timing (KStreamKStreamJoinProcessor.cs:51-66, pre-KIP-633
    Kafka Streams): an unmatched left/full-outer record emits its
    null-padded row the moment it processes, and a match arriving later
    emits the joined row IN ADDITION (the "spurious outer result" KIP-633
    later made suppressible).  Spark's native stream-stream join emits
    unmatched rows only after the watermark passes the window close — the
    correct modern semantics, used by the production path
    (dsl.KStream.join on watermarked streams); THIS loop exists for
    reference-exact conformance and for callers that want KS 2.x timing.

    Realization: one availableNow query over the tagged union of both
    sides; per microbatch the batch-join DELTA —
    ``join(all_l, all_r) exceptAll join(old_l, old_r)`` over the
    accumulated row buffers, reusing the batch ``KStream.join`` operator
    verbatim (identical schema and null-padding rules) — is exactly the
    eager emission set at microbatch granularity: new matches plus new
    unmatched-side rows, never retractions.  Buffers are ping-pong parquet
    generations (the _GEN applied-batch contract: crash-replays skip, a
    populated state_dir without its checkpoint is refused); emissions are
    idempotent per-batch overwrites.  Per batch this recomputes a join of
    the buffered windows — conformance-harness scale by design; the
    production path is the native interval join."""
    if not (left.df.isStreaming and right.df.isStreaming):
        raise ValueError("join_windowed_eager requires streaming inputs; use KStream.join in batch")
    if how not in ("inner", "left", "full"):
        raise ValueError("eager windowed join supports inner|left|full")
    l_cols, r_cols = list(left.df.columns), list(right.df.columns)
    root = state_dir or tempfile.mkdtemp(prefix="pse-ssjoin-")
    os.makedirs(root, exist_ok=True)
    out_dir = os.path.join(root, "out")
    gen = {"n": _read_gen(root)}
    ckpt = _bind_state_checkpoint(
        root, _checkpoint(checkpoint), gen["n"] > 0, f"eager-join generation {gen['n']}"
    )
    prior_batch = _last_committed(ckpt)
    tagged = left.df.select(
        F.lit(1).alias("__side"),
        *l_cols,
        *[F.lit(None).cast(right.df.schema[c].dataType).alias(f"__r_{c}") for c in r_cols],
    ).unionByName(
        right.df.select(
            F.lit(0).alias("__side"),
            *[F.lit(None).cast(left.df.schema[c].dataType).alias(c) for c in l_cols],
            *[F.col(c).alias(f"__r_{c}") for c in r_cols],
        )
    )

    def _join(ldf: DataFrame, rdf: DataFrame) -> DataFrame:
        return KStream(ldf, left.key, left.ts).join(
            KStream(rdf, right.key, right.ts), window, how=how, ts_alias=ts_alias
        ).df

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= _read_applied(root):
            batch.write.format("noop").mode("overwrite").save()
            return
        spark = batch.sparkSession
        cur, nxt = gen["n"] % 2, (gen["n"] + 1) % 2
        sides = {}
        for tag, pred, cols in (
            ("l", F.col("__side") == 1, l_cols),
            ("r", F.col("__side") == 0, [f"__r_{c}" for c in r_cols]),
        ):
            new = batch.filter(pred).select(
                *[F.col(c).alias(c.removeprefix("__r_")) for c in cols]
            )
            prev_path = os.path.join(root, f"{tag}-{cur}")
            old = (
                spark.read.parquet(prev_path)
                if os.path.exists(prev_path)
                else spark.createDataFrame([], new.schema)
            )
            allrows = old.unionByName(new).localCheckpoint()
            allrows.write.mode("overwrite").parquet(os.path.join(root, f"{tag}-{nxt}"))
            sides[tag] = (old, allrows)
        old_l, all_l = sides["l"]
        old_r, all_r = sides["r"]
        # eager emission set = what the full eager history would have added
        # this batch: new matches + new unmatched-side paddings, no retraction
        delta = _join(all_l, all_r).exceptAll(_join(old_l, old_r))
        delta.write.mode("overwrite").parquet(os.path.join(out_dir, f"sink_batch={batch_id}"))
        gen["n"] += 1
        _write_gen(root, gen["n"], batch_id)

    q = (
        tagged.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = left.df.sparkSession
    if not _has_emissions(out_dir):
        empty_l = spark.createDataFrame([], left.df.schema)
        empty_r = spark.createDataFrame([], right.df.schema)
        return _join(empty_l, empty_r)
    got = spark.read.parquet(out_dir)
    return got.filter(F.col("sink_batch") > F.lit(int(prior_batch))).drop("sink_batch")


def join_table_asof_streaming(
    stream: KStream,
    table,
    how: str = "inner",
    tolerance_ms: int | None = None,
    matched_ts: str = "matched_ts",
    out_dir: str | None = None,
    checkpoint: str | None = None,
    engine: str | None = None,
) -> DataFrame:
    """Streaming realization of ``KStream.join_table_asof``: each microbatch
    of stream records performs the identical event-time as-of lookup into the
    static versioned history — the reference's per-record ValueGetter read
    (KStreamKTableJoinProcessor.cs:38-43) at microbatch granularity, with
    versioned (KIP-914-style) rather than processing-time semantics, so the
    result is INDEPENDENT of how records land in microbatches (append-only
    output; the parity test splits the stream across batches and compares to
    the one-shot batch join).

    Scale: per microbatch the as-of union+window pass shuffles (batch ∪
    history) by key — bounded by history size, not stream length; prune the
    history first with ``VersionedKTable.retain`` (the historyRetention
    analog).  Drains with availableNow and returns the accumulated result.

    Exactly-once: each microbatch OVERWRITES its own ``sink_batch=<id>``
    partition (a crash-replayed batch rewrites itself instead of appending
    duplicates), and the out dir is bound to its checkpoint like every other
    state loop — a fresh or foreign checkpoint would renumber batch ids over
    stale partitions.
    """
    if not stream.df.isStreaming:
        raise ValueError("join_table_asof_streaming requires a streaming stream side")
    if engine is None:
        # same precedence as _select_keyed_engine: resume with the family
        # that wrote the dir; otherwise tws when it can run (container/
        # non-timestamp-ts calls fall back to exact, which has no such
        # constraints)
        from .protoshim import ensure_protobuf  # noqa: PLC0415

        if out_dir is not None and os.path.isdir(out_dir):
            entries = os.listdir(out_dir)
            if any(e.startswith(("sink_batch=", "part-")) for e in entries):
                engine = "exact"
            elif "_PSE_TWS_ASOF_V" in entries:
                engine = "tws"
        if engine is None:
            # every tws-engine construction guard must be mirrored here, or
            # the auto-default breaks previously working exact calls (the
            # round-12 'bare default flip' regression class): timestamp ts,
            # key arity AND dtype equality, no hard containers, no reserved
            # -name collisions
            s_types = dict(stream.df.dtypes)
            t_types = dict(table.df.dtypes)
            reserved = {"sink_batch", "__side", "__sts", "__hts"} | {
                f"__jk{i}" for i in range(len(stream.key))
            }
            tws_ok = (
                ensure_protobuf()
                and stream.ts is not None
                and getattr(table, "ts", None) is not None
                and s_types.get(stream.ts) == "timestamp"
                and t_types.get(table.ts) == "timestamp"
                and len(stream.key) == len(table.key)
                and all(
                    s_types.get(lk) == t_types.get(rk)
                    for lk, rk in zip(stream.key, table.key)
                )
                and not reserved
                & (set(stream.df.columns) | set(table.df.columns) | {matched_ts})
                and not any(
                    _container_cols(sch, cols)
                    for sch, cols in (
                        (stream.df.schema, list(stream.key) + [stream.ts]),
                        (table.df.schema, list(table.key) + [table.ts]),
                    )
                )
            )
            engine = "tws" if tws_ok else "exact"
    if engine == "tws":
        from .tws import join_table_asof_tws  # noqa: PLC0415 - optional protobuf dep

        return join_table_asof_tws(
            stream, table, how, tolerance_ms, matched_ts, out_dir, checkpoint
        )
    if engine != "exact":
        raise ValueError(f"unknown as-of engine {engine!r}; expected 'tws' or 'exact'")
    root = out_dir or tempfile.mkdtemp(prefix="pse-asof-")
    os.makedirs(root, exist_ok=True)
    if "_PSE_TWS_ASOF_V" in os.listdir(root):
        raise ValueError(
            f"out dir {root!r} was written by the tws as-of engine; pass "
            "engine='tws' to resume it, or a fresh out_dir"
        )
    if any(e.startswith("part-") or e == "_SUCCESS" for e in os.listdir(root)):
        # pre-exactly-once layout (flat appended part files): new
        # sink_batch=<id> partitions next to them would make the final read
        # see conflicting directory structures — and the flat rows carry no
        # batch identity to replay-protect
        raise ValueError(
            f"out dir {root!r} holds flat append-mode output from the "
            "pre-exactly-once as-of join; pass a fresh out_dir"
        )
    ckpt = _bind_state_checkpoint(
        root, _checkpoint(checkpoint), _has_emissions(root), "prior as-of join output"
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        ks = KStream(batch, stream.key, stream.ts)
        out = ks.join_table_asof(
            table, how=how, tolerance_ms=tolerance_ms, matched_ts=matched_ts
        )
        out.df.write.mode("overwrite").parquet(os.path.join(root, f"sink_batch={batch_id}"))

    q = (
        stream.df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream.df.sparkSession
    if not _has_emissions(root):
        # no microbatch fired (empty stream): schema-correct empty result
        empty = KStream(
            spark.createDataFrame([], stream.df.schema), stream.key, stream.ts
        )
        return empty.join_table_asof(
            table, how=how, tolerance_ms=tolerance_ms, matched_ts=matched_ts
        ).df
    return spark.read.parquet(root).drop("sink_batch")


def cogroup_streaming(
    cogrouped,
    fill: dict[str, object] | None = None,
    state_dir: str | None = None,
    checkpoint: str | None = None,
) -> DataFrame:
    """Streaming realization of KIP-150 cogroup (the successor API of the
    reference's KGroupedStream surface; batch twin = CogroupedKStream
    .aggregate, dsl.py).  Each participating grouped stream runs as its OWN
    native Structured Streaming aggregation in update mode — Spark maintains
    the running aggregate state, so ANY aggregate expression that streaming
    supports works unchanged (count/sum/avg/collect/max_by...), no hand-
    written merge functions.  Each microbatch emits the changed keys' new
    aggregate rows; a foreachBatch upsert (the join_tables_streaming
    ping-pong-generation pattern) materializes each side's latest-per-key
    table, and after the sides drain the per-stream tables are stitched by
    the SAME dsl.stitch_cogrouped full-outer/coalesce/fill code the batch
    path uses — so streaming replay == batch cogroup by construction
    (pinned by tests/test_streaming.py::test_cogroup_streaming_parity).

    Scale: per side, state = one row per key (Spark's streaming agg store);
    the upsert rewrite is bounded by key cardinality, never stream length;
    stitch joins reuse the aggregation partitioning.  Drains each side with
    an availableNow trigger and returns the stitched snapshot."""
    parts = getattr(cogrouped, "_parts", None)
    if parts is None:
        parts = list(cogrouped)
    if not parts:
        raise ValueError("cogroup requires at least one grouped stream")
    key = tuple(parts[0][0].key)
    # same contract the batch CogroupedKStream builder enforces: without it,
    # duplicate aggregate names or a key-arity mismatch would silently
    # misalign the stitch joins instead of failing fast
    seen: set[str] = set()
    for grouped, aggs in parts:
        if not aggs:
            raise ValueError("cogroup requires at least one named aggregate expression")
        if len(grouped.key) != len(key):
            raise ValueError(
                "all cogrouped streams must share the key arity; re-key with group_by first"
            )
        dup = seen.intersection(aggs)
        if dup:
            raise ValueError(f"duplicate aggregate column name(s): {sorted(dup)}")
        seen.update(aggs)
    root = state_dir or tempfile.mkdtemp(prefix="pse-cogroup-")
    tables = []
    for i, (grouped, aggs) in enumerate(parts):
        df = grouped.stream.df
        if not df.isStreaming:
            raise ValueError(
                "cogroup_streaming requires streaming inputs; use CogroupedKStream.aggregate in batch"
            )
        agg_df = df.groupBy(*grouped.key).agg(*[v.alias(k) for k, v in aggs.items()])
        side_root = os.path.join(root, f"side-{i}")
        os.makedirs(side_root, exist_ok=True)
        gen = {"n": _read_gen(side_root)}  # survives a restart on the same checkpoint
        side_ckpt = _bind_state_checkpoint(
            side_root,
            _checkpoint(None if checkpoint is None else os.path.join(checkpoint, f"side-{i}")),
            gen["n"] > 0,
            f"cogroup-state generation {gen['n']}",
        )

        def _apply(batch: DataFrame, batch_id: int, side_root=side_root, gen=gen, kcols=tuple(grouped.key)):
            if batch_id <= _read_applied(side_root):
                batch.write.format("noop").mode("overwrite").save()
                return  # crash-replay of a batch whose fold already committed
            spark = batch.sparkSession
            cur, nxt = gen["n"] % 2, (gen["n"] + 1) % 2
            rows = batch.withColumn("__gen", F.lit(gen["n"] + 1).cast("long"))
            prev = os.path.join(side_root, f"g-{cur}")
            if os.path.exists(prev):
                rows = spark.read.parquet(prev).unionByName(rows)
            latest = KStream(rows, kcols, None).to_table(order=("__gen",)).df
            latest.write.mode("overwrite").parquet(os.path.join(side_root, f"g-{nxt}"))
            gen["n"] += 1
            _write_gen(side_root, gen["n"], batch_id)

        q = (
            agg_df.writeStream.outputMode("update")
            .foreachBatch(_apply)
            .option("checkpointLocation", side_ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark = df.sparkSession
        final = os.path.join(side_root, f"g-{gen['n'] % 2}")
        if gen["n"] > 0 and os.path.exists(final):
            t = spark.read.parquet(final).drop("__gen")
        else:  # side never fired: schema-correct empty aggregate table
            t = spark.createDataFrame([], agg_df.schema)
        tables.append((t, tuple(grouped.key)))
    from .dsl import stitch_cogrouped

    return stitch_cogrouped(tables, key, fill)

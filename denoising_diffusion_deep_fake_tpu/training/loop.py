"""Shared training-loop machinery: logging cadence, checkpoint cadence, timing.

This is the functional replacement for the parts of ``pl.Trainer`` the
reference leaned on (`/root/reference/d3f/train_deep_fake/start_training.py:43-53`):
epoch iteration, step counting, scalar/image logging cadence, and wall-clock
checkpointing. Device work stays asynchronous — scalar metrics are fetched on
a background thread (the value-fetch barrier costs ~1.5-3 ms/dispatch on this
host's tunnel, so even ``log_every_n_steps=1`` — the reference Trainer's
setting, `/root/reference/d3f/train_deep_fake/start_training.py:43-48` — no
longer stalls the hot loop); only the wall-clock-throttled image panels fetch
synchronously.

Failure detection (absent in the reference — SURVEY.md §5): fetched metrics
are NaN/Inf-guarded on the worker; divergence surfaces on the next
``log_step`` (emergency checkpoint + ``TrainingDivergedError``) or at
``close()``/``drain_metrics()``, instead of silently burning epochs on
garbage.
"""

from __future__ import annotations

import math
import queue
import threading
import time
from typing import Any, Callable

import jax


class TrainingDivergedError(RuntimeError):
    """A train metric went NaN/Inf; an emergency checkpoint was saved."""


class PreemptionGuard:
    """SIGTERM -> checkpoint-and-exit flag (graceful preemption handling).

    Cloud TPU maintenance events and most cluster schedulers deliver SIGTERM
    with a grace window; the reference has no handling at all (SURVEY.md §5
    "Failure detection / elastic recovery: absent" — recovery there is a
    manual ``resume``). Installing is best-effort: signal handlers only work
    on the main thread (embedded runs keep the default behavior).
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._signal = _signal
        self._flag = False
        self._previous = {}
        for sig in (signals or (_signal.SIGTERM,)):
            try:
                self._previous[sig] = _signal.signal(sig, self._on_signal)
            except ValueError:  # not on the main thread
                pass

    def _on_signal(self, signum, frame):
        self._flag = True

    @property
    def triggered(self) -> bool:
        return self._flag

    def restore(self) -> None:
        for sig, previous in self._previous.items():
            try:
                self._signal.signal(sig, previous)
            except ValueError:
                pass
        self._previous = {}

from denoising_diffusion_deep_fake_tpu.checkpoint import (
    CheckpointManager,
    save_np_rng_state,
)


from denoising_diffusion_deep_fake_tpu.parallel.distributed import (
    fetch_local as _host_local,
)
from denoising_diffusion_deep_fake_tpu.utils import (
    LoggingScheduler,
    TensorBoardLogger,
)


class LoopContext:
    """Holds the cross-step services every workload loop needs."""

    def __init__(self, cfg, hparams: dict, *, workload: str,
                 clock: Callable[[], float] = time.time,
                 primary: bool = True):
        self.cfg = cfg
        self.hparams = hparams
        self.workload = workload
        self.clock = clock
        # Multi-process runs: only the primary process writes TB events and
        # checkpoints (states are replicated, so its copy is complete); every
        # process still fetches metrics and runs the NaN guard so they all
        # stop together instead of hanging in a collective.
        self.primary = primary
        self.tb = TensorBoardLogger(f"{cfg.log_dir}/{workload}")
        self.ckpt = CheckpointManager(cfg.checkpoint_dir,
                                      keep=cfg.keep_checkpoints)
        self.image_scheduler = LoggingScheduler(clock)
        self._last_ckpt_time = clock()
        self.global_step = 0
        self.epoch = 0
        self.preemption = (PreemptionGuard()
                           if getattr(cfg, "handle_preemption", True)
                           else None)
        self._preempt_calls = 0
        self._preempt_agreed = False
        # Scalar fetches run on a worker thread so the hot loop never blocks
        # on the ~1.5-3 ms/dispatch value-fetch barrier (BASELINE.md
        # "performance characterization"): the queue holds device arrays
        # (never donated — step outputs), the worker fetches + NaN-guards +
        # writes TB, and divergence surfaces on the NEXT log_step (which has
        # fresh, un-donated states in hand for the emergency save) or at
        # close(). Bounded queue = backpressure if the tunnel falls behind.
        self._metric_q: queue.Queue = queue.Queue(maxsize=64)
        self._diverged: list | None = None
        self._worker_error: BaseException | None = None
        # Multi-process runs guard SYNCHRONOUSLY: the async worker drains on
        # its own schedule per host, so divergence would surface at different
        # steps across processes — the first to raise abandons peers inside a
        # collective (hang). Metrics are replicated, so a synchronous check
        # trips on the SAME step everywhere and all processes raise at the
        # same loop point (see the multi-host lockstep pitfalls in CLAUDE.md).
        self._sync_metrics = jax.process_count() > 1
        self._stop_event = threading.Event()
        self._metric_thread = threading.Thread(
            target=self._metric_worker, name="metric-logger", daemon=True)
        self._metric_thread.start()

    def preempted(self) -> bool:
        """True once SIGTERM arrived — runners save and exit gracefully.

        Multi-process runs must agree on WHERE to stop: SIGTERMs land with
        skew across hosts, and a process stopping one step before its peers
        leaves them blocked in a collective (and the primary's final save
        hanging on it). Every ``sync_every`` calls — runners call this once
        per step at the same loop point, so the cadence is deterministic —
        the local flags are OR-reduced across processes; everyone then stops
        at the same step boundary.
        """
        if self.preemption is None:
            return False
        import jax

        if jax.process_count() == 1:
            return self.preemption.triggered
        if self._preempt_agreed:
            return True
        sync_every = 10
        self._preempt_calls += 1
        if self._preempt_calls % sync_every:
            return False
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([self.preemption.triggered]))
        self._preempt_agreed = bool(np.asarray(flags).any())
        return self._preempt_agreed

    # ------------------------------------------------------------- cadence

    def want_images(self) -> bool:
        """Is an image-panel step due? The answer picks the DISPATCH SHAPE
        (runners.py `_drive_epoch`: image step vs plain step vs k-step
        superstep group), so in multi-process runs it must be identical on
        every host: the scheduler is wall-clock based and hosts' clocks
        disagree, and a host that dispatches a k-step group while a peer
        dispatches a single image step consumes k batches (and k steps of
        collectives) against its peer's one — a permanent stream/collective
        desync. Process 0's decision is broadcast to everyone (same
        lockstep discipline as `_sync_metrics` / `preempted`); non-primary
        panels are dropped at log time anyway."""
        if not getattr(self.cfg, "log_images", True):
            return False  # constant across processes: no broadcast needed
        self.image_scheduler.update_with_step_number(self.global_step)
        want = self.image_scheduler.should_we_log_this_step()
        if jax.process_count() > 1:
            import numpy as np
            from jax.experimental import multihost_utils

            want = bool(np.asarray(multihost_utils.broadcast_one_to_all(
                np.asarray(want))))
        return want

    def log_step(self, metrics: dict[str, Any],
                 images: dict[str, Any] | None = None,
                 states=None, rng=None, *, n_steps: int = 1) -> None:
        """Queue one step's metrics — or a K-step group's (``n_steps=k``,
        the superstep path: metric leaves carry a leading ``(k,)`` axis and
        the worker fans them out to per-step TB rows, steps
        ``global_step..global_step+k-1``, after ONE stacked fetch)."""
        self._raise_if_diverged(states, rng)
        step = self.global_step
        every = self.cfg.log_every_n_steps
        due = any((step + j) % every == 0 for j in range(n_steps))
        if due or images:
            item = (step, float(self.epoch), metrics if due else None,
                    images if self.primary else None, n_steps)
            if self._sync_metrics:
                # Lockstep guarding (multi-process): fetch + NaN-check here,
                # on every host, so a divergence raises at the same step on
                # all of them instead of stranding peers in a collective.
                self._log_metric_items([item])
                self._raise_if_diverged(states, rng)
                return
            # Hand the DEVICE arrays to the worker; the fetch barrier runs
            # off-thread, overlapped with the next steps' device work.
            # Image panels ride the same queue: on this tunnel one panel set
            # is tens of MB (seconds of link time), and the early cadence
            # logs every 10 s — a synchronous fetch would stall the loop.
            self._metric_q.put(item)

    # -------------------------------------------------- async scalar worker

    def _metric_worker(self) -> None:
        while True:
            # Drain the backlog: all queued steps ride ONE stacked fetch, so
            # when the loop outruns the tunnel the cost amortizes to ~2
            # round trips per BATCH of logged steps, not per step.
            try:
                first = self._metric_q.get(timeout=0.25)
            except queue.Empty:
                if self._stop_event.is_set():  # abort(): exit without drain
                    return
                continue
            items = [first]
            while len(items) < 64:
                try:
                    items.append(self._metric_q.get_nowait())
                except queue.Empty:
                    break
            stop = None in items
            items = [it for it in items if it is not None]
            try:
                # Re-check the abort event AFTER draining: with a backlog the
                # Empty branch above is never reached, and abort() must not
                # wait behind device fetches on a possibly-dead link (the
                # join(10s) would time out and the daemon thread would die
                # mid-transfer at interpreter teardown).
                if (items and self._diverged is None
                        and not self._stop_event.is_set()):
                    self._log_metric_items(items)
            except BaseException as e:  # surfaced on the main thread
                self._worker_error = e
            finally:
                for _ in items:
                    self._metric_q.task_done()
            if stop:
                self._metric_q.task_done()  # the None sentinel
                return

    def _log_metric_items(self, items: list) -> None:
        scalar_items = [(s, e, m, n) for s, e, m, _, n in items
                        if m is not None]
        fetched_all = self._fetch_scalar_batch(
            [m for _, _, m, _ in scalar_items])
        every = self.cfg.log_every_n_steps
        for (step, epoch, _, n), fetched in zip(scalar_items, fetched_all):
            # ``fetched`` leaves are 1-d: length n for a superstep group
            # (one row per sub-step), length 1 for a single step. EVERY
            # fetched value is NaN-guarded, including sub-steps that the
            # logging cadence would skip — divergence mid-group surfaces at
            # its true step.
            for j in range(n):
                row = {}
                bad = []
                for key, vec in fetched.items():
                    v = float(vec[j] if vec.shape[0] > 1 else vec[0])
                    if not math.isfinite(v):
                        bad.append(key)
                    row[key] = v
                if bad:
                    self._diverged = [step + j, bad]
                    return  # skip logging this and later queued steps
                if (step + j) % every == 0:
                    row["epoch"] = epoch
                    if self.primary:
                        self.tb.log_scalars(row, step + j)
        for step, _, _, images, _ in items:
            if images:
                for tag, batch in _host_local(images).items():
                    self.tb.log_batch_as_image_grid(tag, batch, step)

    @staticmethod
    def _fetch_scalar_batch(metric_dicts: list[dict[str, Any]]
                            ) -> list[dict[str, Any]]:
        """Fetch many dicts of device scalars (or ``(k,)`` superstep metric
        vectors) with as few transfers as possible; every returned leaf is a
        1-d numpy array.

        Each value fetch is a full tunnel round trip (~1.5-3 ms) that also
        occupies the link the prefetch uploads need, so K steps x M scalars
        cost ~K*M round trips fetched naively. Single-process,
        all-addressable metrics are stacked into ONE device array (a cached
        tiny program) and fetched once for the whole batch of steps —
        including MIXED backlogs of (k,) superstep vectors and single-step
        scalars (every epoch tail when steps_per_epoch % k != 0): shorter
        leaves are edge-padded on device to the longest size, and the
        consumer only reads each leaf's first n rows. Multi-process
        (non-addressable leaves — stacking would raise) falls back to
        per-leaf addressable-shard reads.
        """
        import numpy as np

        import jax.numpy as jnp

        leaves = [x for m in metric_dicts for x in m.values()]
        sizes = {int(np.prod(getattr(x, "shape", ()) or (1,)))
                 for x in leaves}
        packable = (jax.process_count() == 1 and len(leaves) > 1
                    and all(
            getattr(x, "ndim", None) in (0, 1)
            and getattr(x, "is_fully_addressable", True) for x in leaves))
        if packable:
            size = max(sizes)
            # Pad to a power-of-two operand count: XLA caches one stack
            # program per bucket instead of one per distinct backlog length.
            # (Leaf sizes come from the bounded set {1, steps_per_call}, so
            # the pad pattern adds at most a handful of compiled variants.)
            dev = [jnp.ravel(jnp.asarray(x, jnp.float32)) for x in leaves]
            dev = [x if x.size == size else jnp.pad(x, (0, size - x.size),
                                                    mode="edge")
                   for x in dev]
            bucket = 1 << (len(dev) - 1).bit_length()
            dev += [dev[0]] * (bucket - len(dev))
            packed = np.asarray(jnp.stack(dev))  # (bucket, size)
            out, i = [], 0
            for m in metric_dicts:
                out.append({k: packed[i + j][:max(1, np.size(v))]
                            for j, (k, v) in enumerate(m.items())})
                i += len(m)
            return out
        return [{k: np.atleast_1d(np.asarray(v))
                 for k, v in _host_local(m).items()}
                for m in metric_dicts]

    def drain_metrics(self, states=None, rng=None) -> None:
        """Block until queued scalar fetches finish; raise on divergence."""
        self._metric_q.join()
        self._raise_if_diverged(states, rng)

    def _raise_if_diverged(self, states=None, rng=None) -> None:
        if self._worker_error is not None:
            err, self._worker_error = self._worker_error, None
            raise err
        if self._diverged is None:
            return
        (step, bad), self._diverged = self._diverged, None  # report once
        if states is not None and rng is not None:
            self.maybe_checkpoint(states, rng, final=True)  # emergency save
        raise TrainingDivergedError(
            f"non-finite metric(s) {bad} at step {step}"
            + ("; emergency checkpoint saved" if states is not None else ""))

    def maybe_checkpoint(self, states, rng, *, force: bool = False,
                         final: bool = False) -> None:
        """Save when the 2h cadence is due; epoch-end saves (``force``) are
        rate-limited by ``cfg.last_checkpoint_min_interval_s``; ``final``
        (end of training / NaN emergency) always saves."""
        if not self.primary:
            return
        elapsed_s = self.clock() - self._last_ckpt_time
        due = elapsed_s / 3600.0 >= self.cfg.checkpoint_every_hours
        min_forced = getattr(self.cfg, "last_checkpoint_min_interval_s", 600.0)
        forced_ok = force and elapsed_s >= min_forced
        if final or due or forced_ok:
            self._last_ckpt_time = self.clock()
            extra = save_np_rng_state(
                {"epoch": self.epoch, "global_step": self.global_step,
                 "workload": self.workload}, rng)
            # Cadence saves drain to disk asynchronously (Orbax snapshots
            # the arrays to host first, so the donated train state can keep
            # stepping); the final save blocks so callers see it complete.
            self.ckpt.save(self.global_step, states, self.hparams, extra,
                           block=final)

    def abort(self) -> None:
        """Best-effort teardown for error paths: stop the worker and the
        async checkpointer WITHOUT draining pending fetches or raising —
        leaving these threads alive corrupts interpreter teardown (daemon
        threads killed inside device transfers abort the process)."""
        try:
            if self.preemption is not None:
                self.preemption.restore()
            # Event (not a sentinel): a full queue would drop a put_nowait
            # sentinel and leave the worker blocked in get() forever; the
            # worker polls this flag between gets.
            self._stop_event.set()
            self._metric_thread.join(timeout=10.0)
            if self._metric_thread.is_alive():
                # Mid panel/scalar fetch on a slow link (tens of MB): give it
                # one more bounded join at atexit, BEFORE interpreter
                # finalization would pthread_exit it inside PJRT C++ frames
                # ("FATAL: exception not rethrown" abort).
                from denoising_diffusion_deep_fake_tpu.utils import stragglers
                stragglers.adopt(self._metric_thread)
            self.ckpt.wait_until_finished()
            self.tb.flush()
            self.tb.close()
        except BaseException:
            pass  # the original exception is what the caller must see

    def close(self) -> None:
        if self.preemption is not None:
            self.preemption.restore()
        self._metric_q.join()
        self._metric_q.put(None)  # stop worker
        self._metric_thread.join()
        self.ckpt.wait_until_finished()
        self.tb.flush()
        self.tb.close()
        # Divergence discovered only during the final drain: the runner's
        # final checkpoint (saved before close) preserves the state; raise so
        # callers don't mistake the run for a clean finish.
        self._raise_if_diverged()

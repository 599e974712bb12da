"""Checkpoint save/restore (Orbax) with hparams metadata.

The reference delegates checkpointing to Lightning: top-8 checkpoints on a
2-hour wall-clock cadence plus a ``last`` checkpoint per epoch, with hparams
embedded via ``save_hyperparameters()`` enabling ``resume``/``modify``
(`/root/reference/d3f/train_deep_fake/lit_module.py:127-140`, SURVEY.md §5).

TPU-native equivalent (SURVEY.md §5): Orbax persistence of the full train
state — params, EMA shadows, optimizer moments, BN stats, step — plus the
config dict and loop counters as JSON metadata, under ``<dir>/<step>/``.

Restore paths mirror the reference's two entry points (§3.5):
* ``restore`` (== ``d3f train resume``): everything, including optimizer
  state and epoch counters;
* ``restore_for_modify`` (== ``d3f train modify``): weights/EMA only, fresh
  optimizer and counters — Lightning's ``load_from_checkpoint`` +
  ``fit()``-without-ckpt_path semantics.

Structure recovery uses ``jax.eval_shape`` over the trainer's init (tracing
only — no compute, no 90 s init on slow hosts).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization


def _local_replica(x):
    """Global replicated array -> this process's host copy (numpy).

    Multi-process saves are single-writer (process 0); a global jax.Array
    spanning other hosts' devices is not serializable by one process, but a
    REPLICATED one is fully present locally — snapshot that. Sharded state
    would silently truncate, so it is rejected.
    """
    if not hasattr(x, "sharding"):
        return x
    if not x.sharding.is_fully_replicated:
        raise ValueError(
            "multi-process checkpointing requires replicated train state; "
            f"got sharding {x.sharding} — gather it before saving")
    return np.asarray(x.addressable_shards[0].data)


class CheckpointManager:
    """Step-indexed checkpoints with retention, metadata, and a latest pointer."""

    def __init__(self, directory, *, keep: int = 8):
        self.directory = Path(directory).resolve()
        self.keep = keep
        self.directory.mkdir(parents=True, exist_ok=True)
        self._pending = None        # in-flight async save thread
        self._pending_error = None  # its failure, surfaced on next join
        self._ckpt = ocp.StandardCheckpointer(
            **self._island_mode_options())

    @staticmethod
    def _island_mode_options() -> dict:
        """Orbax options making every checkpointer barrier-free.

        In multi-process runs each process's checkpointer sees only itself,
        so no Orbax operation synchronizes across hosts. Saves only ever run
        on the primary (LoopContext gates them) over the locally-replicated
        state snapshot; restores are plain reads any process can do
        independently. Default options would instead make save/restore
        collective and deadlock the primary-only save in
        sync_global_processes (multi-host pitfall #1) — every checkpointer
        built here (incl. ``restore_partial``'s) must share these options.
        """
        if jax.process_count() <= 1:
            return {}
        me = jax.process_index()
        return {"multiprocessing_options": ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me})}

    # ------------------------------------------------------------------ save

    def save(self, step: int, states: Any, hparams: dict,
             extra: dict | None = None, *, block: bool = True) -> Path:
        """Persist states (any pytree of ModelStates) + hparams at ``step``.

        ``block=False`` returns once Orbax has snapshotted the arrays and
        finishes writing on its background thread — the train loop keeps
        stepping while bytes drain to disk (matters when checkpoints cross a
        slow link). ``meta.json`` is written only on completion, so readers
        (``all_steps``/``restore``) never observe a half-written checkpoint;
        call ``wait_until_finished()`` (or the next blocking save) to join.
        """
        self.wait_until_finished()  # at most one save in flight
        path = self.directory / f"step_{step:010d}"
        state_dict = serialization.to_state_dict(states)
        if jax.process_count() > 1:
            state_dict = jax.tree.map(_local_replica, state_dict)
        self._ckpt.save(path / "state", state_dict, force=True)
        meta = {"step": step, "hparams": hparams, "extra": extra or {}}

        def finish():
            self._ckpt.wait_until_finished()
            (path / "meta.json").write_text(json.dumps(meta, indent=2))
            self._apply_retention()

        if block:
            finish()
        else:
            import threading

            def finish_guarded():
                try:
                    finish()
                except BaseException as e:  # surfaced by the next join
                    self._pending_error = e

            self._pending = threading.Thread(target=finish_guarded,
                                             daemon=True)
            self._pending.start()
        return path

    def wait_until_finished(self) -> None:
        """Join any in-flight async save; re-raise its failure if it died.

        A silently dropped cadence checkpoint would make ``resume`` restore
        something much older than the user believes exists — background
        write errors must surface on the training thread.
        """
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._pending_error is not None:
            error, self._pending_error = self._pending_error, None
            raise RuntimeError("async checkpoint save failed") from error

    def _apply_retention(self) -> None:
        steps = self.all_steps()
        for old in steps[:-self.keep] if self.keep else []:
            shutil.rmtree(self.directory / f"step_{old:010d}",
                          ignore_errors=True)

    # --------------------------------------------------------------- restore

    def all_steps(self) -> list[int]:
        # NOTE: no join here — the async finish thread calls this through
        # _apply_retention and must not wait on itself. External callers go
        # through latest_step/read_meta/restore, which do join.
        steps = []
        for p in self.directory.glob("step_*"):
            if (p / "meta.json").exists():
                steps.append(int(p.name.split("_")[1]))
        return sorted(steps)

    def latest_step(self) -> int | None:
        self.wait_until_finished()
        steps = self.all_steps()
        return steps[-1] if steps else None

    def read_meta(self, step: int | None = None) -> dict:
        self.wait_until_finished()
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return json.loads(
            (self.directory / f"step_{step:010d}" / "meta.json").read_text())

    def restore(self, target_fn: Callable[[], Any],
                step: int | None = None) -> tuple[Any, dict]:
        """Full restore: ``target_fn`` builds the states pytree structure
        (called under ``jax.eval_shape`` — tracing only)."""
        self.wait_until_finished()
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        path = self.directory / f"step_{step:010d}"
        target = jax.eval_shape(target_fn)
        target_sd = serialization.to_state_dict(target)
        abstract = jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(x)
            if hasattr(x, "shape") else x, target_sd)
        raw = self._ckpt.restore(path / "state", abstract)
        states = serialization.from_state_dict(target, raw)
        states = jax.tree.map(jnp.asarray, states)
        return states, self.read_meta(step)

    def restore_partial(self, abstract_subtree: dict,
                        step: int | None = None) -> dict:
        """Restore only the requested subtree of the saved state_dict.

        ``abstract_subtree`` mirrors the on-disk nesting but may omit keys
        (e.g. ``{"a": {"params": ..., "batch_stats": ...}}`` to load one
        model's weights without its optimizer moments or EMA shadow — the
        video swap path needs ~1/6th of the checkpoint bytes, which matters
        on transfer-limited links). Leaves are ShapeDtypeStructs or arrays.
        """
        self.wait_until_finished()
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        path = self.directory / f"step_{step:010d}"
        abstract = jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(x)
            if hasattr(x, "shape") else x, abstract_subtree)
        restore_args = ocp.checkpoint_utils.construct_restore_args(abstract)
        # Same island-mode options as self._ckpt (PyTreeCheckpointer itself
        # doesn't accept them, so compose Checkpointer + handler directly):
        # a default-options reader invoked in a multi-process run would
        # introduce global barriers that hang or desync processes.
        reader = ocp.Checkpointer(ocp.PyTreeCheckpointHandler(),
                                  **self._island_mode_options())
        raw = reader.restore(
            path / "state",
            args=ocp.args.PyTreeRestore(item=abstract,
                                        restore_args=restore_args,
                                        partial_restore=True))
        return jax.tree.map(jnp.asarray, raw)


def reset_for_modify(states: Any, tx_init: Callable[[Any], Any]) -> Any:
    """``modify`` semantics: keep weights/BN/EMA, fresh optimizer + counters."""
    def reset_one(s):
        return s.replace(step=jnp.zeros((), jnp.int32),
                         opt_state=tx_init(s.params))

    if isinstance(states, dict):
        return {k: reset_one(v) for k, v in states.items()}
    return reset_one(states)


def save_np_rng_state(extra: dict, rng_key: jax.Array) -> dict:
    extra = dict(extra)
    extra["rng_key"] = np.asarray(jax.random.key_data(rng_key)).tolist()
    return extra


def load_rng_key(extra: dict) -> jax.Array | None:
    data = extra.get("rng_key")
    if data is None:
        return None
    return jax.random.wrap_key_data(jnp.asarray(data, jnp.uint32))

"""Training-image difficulty balancer.

Parity target: `/root/reference/d3f/balance_training_images/lit_module.py:28-213`
(SURVEY.md §2 #7): train a denoiser at a **fixed** noise ratio, then score
every image by reconstruction difficulty (per-image L1), min-max normalize
across the dataset, bin into ``number_of_classes`` difficulty classes, and log
a histogram.

This rebuild also **completes the feature the reference promised but never
implemented** (SURVEY.md §2 #7 NOTE, appendix #3): the difficulty classes are
written to ``output_image_list_path`` as a ``<path>\t<class>`` manifest that
``read_image_manifest`` can consume.

The validation pass streams per-image losses back as one (B,)-vector per batch
— device->host traffic is 4 bytes/image, not images.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from denoising_diffusion_deep_fake_tpu.config import BalanceConfig
from denoising_diffusion_deep_fake_tpu.models import create_unet
from denoising_diffusion_deep_fake_tpu.ops import (
    blend_fixed_amount_of_noise,
    mse_ssim_loss,
)
from denoising_diffusion_deep_fake_tpu.ops.augment import normalise_batch
from denoising_diffusion_deep_fake_tpu.ops.losses import l1_difficulty_loss
from denoising_diffusion_deep_fake_tpu.training.optim import (
    make_adam_with_cosine,
)
from denoising_diffusion_deep_fake_tpu.training.state import (
    ModelState,
    create_model_state,
)


def compute_difficulty_index(losses: np.ndarray, number_of_classes: int) -> np.ndarray:
    """Min-max normalize losses and bin into difficulty classes.

    Exact math of `compute_difficulty_index_for_each_loss`
    (`lit_module.py:181-193`): normalize, clamp to [0, 0.99999], floor-scale
    by ``number_of_classes``.
    """
    lo, hi = losses.min(), losses.max()
    denom = hi - lo if hi > lo else 1.0
    normalised = np.clip((losses - lo) / denom, 0.0, 0.99999)
    return (normalised * number_of_classes).astype(np.int64)


class BalanceTrainer:
    def __init__(self, cfg: BalanceConfig, *, steps_per_epoch: int,
                 image_size: int):
        cfg.validate()
        self.cfg = cfg
        self.image_size = image_size
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.model = create_unet(cfg.encoder_name, dtype=dtype,
                                 patchify=getattr(cfg, "patchify_stem", 1))
        # Reference: plain Adam, no LR schedule (lit_module.py:83-88).
        self.tx = make_adam_with_cosine(cfg.learning_rate, b1=cfg.adam_b1,
                                        b2=cfg.adam_b2, cosine_t_max=None)
        from denoising_diffusion_deep_fake_tpu.parallel.mesh import (
            spatial_activation_constraint)

        # See deep_fake.py: pins activations to the spatial axis (no warp
        # here, but the pin keeps all three workloads' sharding uniform).
        self._pin_spatial = spatial_activation_constraint(
            getattr(cfg, "data_parallel", None),
            getattr(cfg, "spatial_parallel", 1))

    def init_state(self, rng: jax.Array) -> ModelState:
        shape = (1, self.image_size, self.image_size, 3)
        return create_model_state(self.model, rng, shape, self.tx)

    def make_train_step(self, *, with_images: bool = False, donate: bool = True):
        step = functools.partial(self._train_step, with_images=with_images)
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def _train_step(self, state: ModelState, batch_u8, rng, *, with_images):
        cfg = self.cfg
        from denoising_diffusion_deep_fake_tpu.ops.image import unpack_upload

        # Training batches honor upload_format; the once-per-epoch scoring
        # pass (make_validation_step) always uploads rgb.
        batch_u8 = unpack_upload(batch_u8, getattr(cfg, "upload_format", "rgb"))
        # Per-step key derived on device from the step counter (see
        # denoiser.py) — host passes a constant base key.
        rng = jax.random.fold_in(rng, state.step)
        image = self._pin_spatial(normalise_batch(batch_u8, cfg.mean,
                                                  cfg.std))
        noisy = blend_fixed_amount_of_noise(rng, image, cfg.ratio_of_noise)

        def loss_fn(params):
            # The "dropout" collection drives stochastic depth in encoders
            # that use it (efficientnet); inert for the other families.
            pred, mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats}, noisy,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(rng, 1)})
            return mse_ssim_loss(pred, image), (mutated["batch_stats"], pred)

        (loss, (new_bs, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, self.tx, new_bs)

        metrics = {"loss": loss}
        if with_images:
            from denoising_diffusion_deep_fake_tpu.ops.image import (
                panel_grid_u8)

            # Display-ready uint8 grids built on device (see deep_fake.py).
            return new_state, metrics, {
                tag: panel_grid_u8(x) for tag, x in
                {"image": image, "image_noisy": noisy,
                 "image_prediction": pred}.items()}
        return new_state, metrics

    def make_validation_step(self):
        """Jitted per-batch difficulty scoring: returns (B,) L1 losses."""
        def val_step(state: ModelState, batch_u8, rng):
            cfg = self.cfg
            image = normalise_batch(batch_u8, cfg.mean, cfg.std)
            noisy = blend_fixed_amount_of_noise(rng, image, cfg.ratio_of_noise)
            pred = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                noisy, train=False)
            return l1_difficulty_loss(pred, image)

        return jax.jit(val_step)

    def score_dataset_from_cache(self, state: ModelState, cache,
                                 rng: jax.Array, *, mesh=None
                                 ) -> tuple[np.ndarray, np.ndarray]:
        """Score an HBM-resident dataset (``data_cache: device``).

        Batches are gathered from the pinned uint8 dataset INSIDE the jitted
        scorer, so the only per-batch link traffic is the (B,) loss vector.
        Semantics match ``score_dataset`` exactly: stable arange order, and
        the tail batch repeats the LAST image (index clipping == the host
        path's pad-by-repeat), so tail images sit at the same batch
        positions and draw the same per-position noise — identical losses
        for every image across data_cache modes. With a multi-device
        ``mesh`` the gathered batch is sharding-constrained onto the 'data'
        axis like the host scorer. Single-process (the cache is).
        """
        from denoising_diffusion_deep_fake_tpu.training.cached import (
            _data_sharder)

        val_step = self.make_validation_step()
        n = int(cache.dataset.shape[0])
        batch_size = cache.batch_size
        shard = _data_sharder(mesh)

        def score_slice(state, dataset, start, rng):
            idx = jnp.clip(start + jnp.arange(batch_size, dtype=jnp.int32),
                           0, n - 1)
            batch = shard(jnp.take(dataset, idx, axis=0))
            return val_step(state, batch, rng)

        score = jax.jit(score_slice)
        losses = np.empty(n, np.float32)
        for step, pos in enumerate(range(0, n, batch_size)):
            out = np.asarray(score(state, cache.dataset,
                                   jnp.asarray(pos, jnp.int32),
                                   jax.random.fold_in(rng, step)))
            losses[pos:pos + batch_size] = out[:n - pos]
        return np.arange(n), losses

    def score_dataset(self, state: ModelState, loader, rng: jax.Array,
                      *, epoch: int = 0, mesh=None
                      ) -> tuple[np.ndarray, np.ndarray]:
        """Run the validation pass; returns (indices, losses) over the epoch.

        With ``mesh``, each scoring batch is sharded over the ``data`` axis —
        the forward fans out across the mesh and only the (B,) loss vector
        gathers back. Tail batches are padded to the static batch shape
        (keeps one compiled program AND an even shard; pad losses are
        sliced off host-side).

        Multi-process runs (state replicated over the GLOBAL mesh) replicate
        each scoring batch instead: every process feeds the identical
        full batch (the val loader is unsharded and unshuffled), the output
        loss vector is replicated, and each process reads its addressable
        copy — no non-addressable ``np.asarray`` (multi-host pitfall #2).
        """
        from denoising_diffusion_deep_fake_tpu.parallel import batch_sharding
        from denoising_diffusion_deep_fake_tpu.parallel.distributed import (
            fetch_local)
        from denoising_diffusion_deep_fake_tpu.parallel.mesh import (
            replicated_sharding)

        multiprocess = jax.process_count() > 1
        if multiprocess and mesh is None:
            raise ValueError(
                "score_dataset needs the global mesh in multi-process runs "
                "(state is replicated over it)")
        val_step = self.make_validation_step()
        if mesh is None:
            sharding = None
        elif multiprocess:
            sharding = replicated_sharding(mesh)
        else:
            sharding = batch_sharding(mesh)
        batch_size = loader.batch_size
        all_idx, all_loss = [], []
        for step, (batch, idx) in enumerate(loader.epoch(epoch)):
            n_valid = batch.shape[0]
            if n_valid < batch_size:
                pad = np.repeat(batch[-1:], batch_size - n_valid, axis=0)
                batch = np.concatenate([batch, pad], axis=0)
            if multiprocess:
                dev = jax.make_array_from_process_local_data(
                    sharding, np.asarray(batch))
            elif sharding is not None:
                dev = jax.device_put(batch, sharding)
            else:
                dev = jnp.asarray(batch)
            losses = val_step(state, dev, jax.random.fold_in(rng, step))
            all_idx.append(idx)
            all_loss.append(fetch_local(losses)[:n_valid])
        return np.concatenate(all_idx), np.concatenate(all_loss)

"""Two-identity deep-fake trainer (denoise + swap modes), fully fused.

Parity target: the reference's flagship workload
(`/root/reference/d3f/train_deep_fake/lit_module.py:30-233`, SURVEY.md §2 #3,
§3.1). Two U-Nets (``model_a``/``model_b``) train side by side; in ``swap``
mode each also carries an EMA shadow, and training cross-feeds: the fake for
identity a is the EMA of model_b applied to a's real image; model_a learns to
recover the real image from the *noised fake*.

Where Lightning calls ``training_step`` twice per batch (once per optimizer,
with the EMA update of the *other* model interleaved before each), this rebuild
fuses the entire sequence into ONE jitted, state-donating program preserving
the reference's exact ordering:

    1. ema_b.update()            (shadow of b's pre-step params)
    2. fake_a = ema_b(real_a); train model_a  -> params_a'
    3. ema_a.update()            (shadow of a's *post-step* params — Lightning
                                  steps optimizer 0 before calling step 1)
    4. fake_b = ema_a(real_b); train model_b  -> params_b'

so per-step math matches the reference while the device sees a single XLA
program: no host round-trips, both models' convs batched back-to-back on the
MXU, one fused gradient all-reduce per model over the mesh's data axis.

EMA forwards run with ``train=True`` (batch-statistics normalization, matching
torch's train-mode BN when the reference calls ``ema_model(real)`` inside
``training_step``) but their BN running-stat updates are discarded — the
shadow's stats evolve only through the EMA blend, as in ema_pytorch.

Augmentation (albumentations ShiftScaleRotate in the reference's CPU
dataloader workers, `lit_module.py:99-111`) happens on-device here from uint8
input batches — see ``ops/augment.py``.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from denoising_diffusion_deep_fake_tpu.config import DeepFakeConfig
from denoising_diffusion_deep_fake_tpu.models import create_unet
from denoising_diffusion_deep_fake_tpu.ops import (
    blend_random_amount_of_noise,
    mse_loss,
    mse_ssim_loss,
)
from denoising_diffusion_deep_fake_tpu.ops.augment import (
    AffineAugmentConfig,
    augment_batch,
)
from denoising_diffusion_deep_fake_tpu.training.ema import EmaConfig
from denoising_diffusion_deep_fake_tpu.training.optim import (
    make_adam_with_cosine,
)
from denoising_diffusion_deep_fake_tpu.training.state import (
    ModelState,
    create_model_state,
)


class DeepFakeTrainer:
    """Builds states and the fused train step for the two-identity workload."""

    def __init__(self, cfg: DeepFakeConfig, *, steps_per_epoch: int,
                 image_size: int):
        cfg.validate()
        self.cfg = cfg
        self.image_size = image_size
        self.steps_per_epoch = steps_per_epoch
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.model = create_unet(cfg.encoder_name, dtype=dtype,
                                 patchify=getattr(cfg, "patchify_stem", 1))
        self.tx = make_adam_with_cosine(
            cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2,
            cosine_t_max=cfg.cosine_t_max, steps_per_epoch=steps_per_epoch)
        self.aug = AffineAugmentConfig.shift_scale_rotate(
            shift_limit=cfg.aug_shift_limit, scale_limit=cfg.aug_scale_limit,
            rotate_limit=cfg.aug_rotate_limit, p=cfg.aug_probability)
        self.ema_cfg = EmaConfig(beta=cfg.ema_beta,
                                 update_every=cfg.ema_update_every,
                                 update_after_step=cfg.ema_update_after_step)
        from denoising_diffusion_deep_fake_tpu.ops.color import (
            ColorJitterConfig)

        self.jitter = ColorJitterConfig(
            *getattr(cfg, "color_jitter", (0.0,) * 4),
            probability=getattr(cfg, "color_jitter_p", 1.0))
        from denoising_diffusion_deep_fake_tpu.parallel.mesh import (
            spatial_activation_constraint)

        # Re-pins post-augment activations to the ('data','spatial') mesh —
        # without it the warp's H-gather kills H-sharding at the first op
        # and spatial mode silently replicates the whole U-Net (see
        # spatial_activation_constraint). Identity when spatial_parallel<=1.
        self._pin_spatial = spatial_activation_constraint(
            getattr(cfg, "data_parallel", None),
            getattr(cfg, "spatial_parallel", 1))

    # ---------------------------------------------------------------- states

    def init_states(self, rng: jax.Array,
                    with_ema: bool | None = None) -> dict[str, ModelState]:
        """Fresh states; ``with_ema`` overrides the mode-derived default
        (needed to build restore targets matching a checkpoint saved in the
        *other* mode — the ``modify`` flow)."""
        rng_a, rng_b = jax.random.split(rng)
        shape = (1, self.image_size, self.image_size, 3)
        if with_ema is None:
            with_ema = self.cfg.mode == "swap"
        return {
            "a": create_model_state(self.model, rng_a, shape, self.tx,
                                    with_ema=with_ema),
            "b": create_model_state(self.model, rng_b, shape, self.tx,
                                    with_ema=with_ema),
        }

    def ensure_ema(self, states: dict[str, ModelState]) -> dict[str, ModelState]:
        """Attach EMA shadows to checkpoint states that lack them — the
        ``modify`` denoise->swap flip (Lightning's ``strict=False`` analog,
        SURVEY.md §3.5)."""
        out = {}
        for name, s in states.items():
            if s.ema_params is None:
                s = s.replace(
                    ema_params=jax.tree.map(jnp.copy, s.params),
                    ema_batch_stats=jax.tree.map(jnp.copy, s.batch_stats),
                    ema_step=jnp.zeros((), jnp.int32))
            out[name] = s
        return out

    # ------------------------------------------------------------ primitives

    def _forward_train(self, params, batch_stats, x, rng=None):
        # rng (when given) drives stochastic depth in encoders that use it
        # (efficientnet). The EMA fake-generation forward stays deterministic
        # (no rng) so swap targets are stable; the gradient forward gets one.
        return self.model.apply({"params": params, "batch_stats": batch_stats},
                                x, train=True, mutable=["batch_stats"],
                                rngs={"dropout": rng} if rng is not None
                                else None)

    def _ema_forward(self, state: ModelState, x):
        """Shadow-model forward, train-mode BN, stat updates discarded."""
        y, _ = self._forward_train(state.ema_params, state.ema_batch_stats, x)
        return jax.lax.stop_gradient(y)

    def _train_one_model(self, state: ModelState, noisy, target, rng=None):
        from denoising_diffusion_deep_fake_tpu.training.state import (
            maybe_remat)

        fwd = maybe_remat(
            lambda params, x: self._forward_train(params, state.batch_stats,
                                                  x, rng),
            getattr(self.cfg, "remat", "none"))

        def loss_fn(params):
            pred, mutated = fwd(params, noisy)
            return mse_ssim_loss(pred, target), (mutated["batch_stats"], pred)

        (loss, (new_bs, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, self.tx, new_bs)
        return new_state, loss, pred

    # ------------------------------------------------------------ train step

    def make_train_step(self, *, with_images: bool = False, donate: bool = True):
        """Compile the fused two-model step.

        Returns ``f(states, batch_a_u8, batch_b_u8, rng) ->
        (states, metrics[, images])``. ``with_images`` compiles a second
        variant that also returns the TB image panels — only used on logging
        steps so the common path transfers nothing but scalars.
        """
        step = functools.partial(self._train_step, with_images=with_images)
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def _train_step(self, states, batch_a_u8, batch_b_u8, rng, *, with_images):
        cfg = self.cfg
        from denoising_diffusion_deep_fake_tpu.ops.image import unpack_upload

        upload = getattr(cfg, "upload_format", "rgb")
        batch_a_u8 = unpack_upload(batch_a_u8, upload)
        batch_b_u8 = unpack_upload(batch_b_u8, upload)
        # Per-step key derived on device from model_a's step counter (see
        # denoiser.py) — host passes a constant base key.
        rng = jax.random.fold_in(rng, states["a"].step)
        k_a, k_b = jax.random.split(jax.random.fold_in(rng, 0))
        k_aug_a, k_noise_a = jax.random.split(k_a)
        k_aug_b, k_noise_b = jax.random.split(k_b)
        # fold_in (not a wider split) so the aug/noise streams — and the
        # pinned golden losses — are unchanged by the drop-key addition.
        k_drop_a, k_drop_b = jax.random.fold_in(k_a, 1), jax.random.fold_in(k_b, 1)

        warp = getattr(cfg, "warp_method", "auto")
        real_a = augment_batch(k_aug_a, batch_a_u8, cfg.mean_a, cfg.std_a,
                               self.aug, method=warp)
        real_b = augment_batch(k_aug_b, batch_b_u8, cfg.mean_b, cfg.std_b,
                               self.aug, method=warp)
        if self.jitter.enabled:
            from denoising_diffusion_deep_fake_tpu.ops.color import (
                color_jitter_normalised, sample_color_jitter_params)

            # fold_in(k, 2): new per-identity streams — aug/noise/drop keys
            # (and the goldens, which run with jitter off) are unchanged.
            def jit_one(key, x, mean, std):
                params = sample_color_jitter_params(
                    jax.random.fold_in(key, 2), x.shape[0], self.jitter)
                return color_jitter_normalised(x, params, mean, std)

            real_a = jit_one(k_a, real_a, cfg.mean_a, cfg.std_a)
            real_b = jit_one(k_b, real_b, cfg.mean_b, cfg.std_b)
        real_a = self._pin_spatial(real_a)
        real_b = self._pin_spatial(real_b)

        metrics: dict[str, Any] = {}
        images: dict[str, Any] = {}
        state_a, state_b = states["a"], states["b"]

        # LearningRateMonitor parity (lit_module.py:129).
        from denoising_diffusion_deep_fake_tpu.training.optim import (
            cosine_annealing_lr)

        metrics["lr"] = cosine_annealing_lr(
            cfg.learning_rate, cfg.cosine_t_max,
            state_a.step // self.steps_per_epoch)

        if cfg.mode == "denoise":
            for name, state, real, k in (("a", state_a, real_a, k_noise_a),
                                         ("b", state_b, real_b, k_noise_b)):
                noisy, _ = blend_random_amount_of_noise(
                    k, real, cfg.noise_exponential_sampling_lambda)
                new_state, loss, pred = self._train_one_model(
                    state, noisy, real, k_drop_a if name == "a" else k_drop_b)
                metrics[f"loss_denoise/train_{name}"] = loss
                if with_images:
                    images[f"denoise_1_model_input/{name}"] = noisy
                    images[f"denoise_2_model_prediction/{name}"] = pred
                if name == "a":
                    state_a = new_state
                else:
                    state_b = new_state
        else:  # swap
            # 1-2: ema_b update, then train model_a on noised ema_b(real_a).
            state_b = state_b.update_ema(self.ema_cfg)
            fake_a = self._ema_forward(state_b, real_a)
            metrics["swap_difference/a"] = mse_loss(real_a, fake_a)
            noisy_fake_a, _ = blend_random_amount_of_noise(
                k_noise_a, fake_a, cfg.noise_exponential_sampling_lambda)
            state_a, loss_a, pred_a = self._train_one_model(
                state_a, noisy_fake_a, real_a, k_drop_a)
            metrics["loss_swap/train_a"] = loss_a

            # 3-4: ema_a update (sees a's post-step params), then train model_b.
            state_a = state_a.update_ema(self.ema_cfg)
            fake_b = self._ema_forward(state_a, real_b)
            metrics["swap_difference/b"] = mse_loss(real_b, fake_b)
            noisy_fake_b, _ = blend_random_amount_of_noise(
                k_noise_b, fake_b, cfg.noise_exponential_sampling_lambda)
            state_b, loss_b, pred_b = self._train_one_model(
                state_b, noisy_fake_b, real_b, k_drop_b)
            metrics["loss_swap/train_b"] = loss_b

            if with_images:
                images.update({
                    "swap_1_real/a": real_a,
                    "swap_2_fake/a_to_fake": fake_a,
                    "swap_3_model_input/a": noisy_fake_a,
                    "swap_4_model_prediction/a": pred_a,
                    "swap_1_real/b": real_b,
                    "swap_2_fake/b_to_fake": fake_b,
                    "swap_3_model_input/b": noisy_fake_b,
                    "swap_4_model_prediction/b": pred_b,
                })

        new_states = {"a": state_a, "b": state_b}
        if with_images:
            from denoising_diffusion_deep_fake_tpu.ops.image import (
                panel_grid_u8)

            # Panels leave the step display-ready (uint8 3x3 grids built on
            # device): the swap workload's 8 panels fetched ~300 MB/step as
            # full fp32 batches at 448² — now ~5 MB each.
            images = {tag: panel_grid_u8(x) for tag, x in images.items()}
            return new_states, metrics, images
        return new_states, metrics

    # -------------------------------------------------------------- inference

    def make_predict_fake(self, *, use_ema: bool = False):
        """Single-forward face swap, jitted: normalized frame batch -> fake.

        Parity with ``predict_fake`` (`lit_module.py:251-270`): the reference
        swaps through the **online** model (``self.model_a``) in eval mode
        (running-average BN); model "a" maps identity A through model_a but
        denormalizes with identity B's statistics — the caller picks mean/std.
        ``use_ema=True`` swaps through the EMA shadow instead (an extension;
        usually smoother).
        """
        def predict(state: ModelState, x):
            if use_ema and state.ema_params is not None:
                params, stats = state.ema_params, state.ema_batch_stats
            else:
                params, stats = state.params, state.batch_stats
            return self.model.apply({"params": params, "batch_stats": stats},
                                    x, train=False)

        return jax.jit(predict)

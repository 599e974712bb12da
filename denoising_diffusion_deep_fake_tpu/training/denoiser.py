"""Single-model denoiser pretrainer.

Parity target: `/root/reference/d3f/train_denoiser/lit_module.py:28-173`
(SURVEY.md §2 #5): one U-Net, Kornia ``RandomAffine(degrees=15,
translate=[.2,.2], scale=[.8,1.2], p=1)`` applied on-device to the whole
batch, random truncated-exponential noise blend, MSE+SSIM loss, Adam +
per-epoch cosine annealing.

Note on the data path: the reference's denoiser dataloader is broken as
written (albumentations calling convention vs ``nn.Sequential`` transform, and
0-255-scale mean/std — SURVEY.md appendix #2). This rebuild gives all three
workloads the one working path: uint8 batches from the loader, normalization
on-device with 0-1-scale mean/std (255-scale configs are auto-converted at
config load with a warning).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from denoising_diffusion_deep_fake_tpu.config import DenoiserConfig
from denoising_diffusion_deep_fake_tpu.models import create_unet
from denoising_diffusion_deep_fake_tpu.ops import (
    blend_random_amount_of_noise,
    mse_ssim_loss,
)
from denoising_diffusion_deep_fake_tpu.ops.augment import (
    AffineAugmentConfig,
    augment_batch,
)
from denoising_diffusion_deep_fake_tpu.training.optim import (
    make_adam_with_cosine,
)
from denoising_diffusion_deep_fake_tpu.training.state import (
    ModelState,
    create_model_state,
)


class DenoiserTrainer:
    def __init__(self, cfg: DenoiserConfig, *, steps_per_epoch: int,
                 image_size: int):
        cfg.validate()
        self.cfg = cfg
        self.image_size = image_size
        self.steps_per_epoch = steps_per_epoch
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.model = create_unet(cfg.encoder_name, dtype=dtype,
                                 patchify=getattr(cfg, "patchify_stem", 1))
        # Reference uses default Adam betas here (lit_module.py:95).
        self.tx = make_adam_with_cosine(
            cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2,
            cosine_t_max=cfg.cosine_t_max, steps_per_epoch=steps_per_epoch)
        self.aug = AffineAugmentConfig.random_affine(
            degrees=cfg.aug_degrees, translate=cfg.aug_translate,
            scale_min=cfg.aug_scale_min, scale_max=cfg.aug_scale_max, p=1.0)
        from denoising_diffusion_deep_fake_tpu.ops.color import (
            ColorJitterConfig)

        self.jitter = ColorJitterConfig(
            *getattr(cfg, "color_jitter", (0.0,) * 4),
            probability=getattr(cfg, "color_jitter_p", 1.0))
        from denoising_diffusion_deep_fake_tpu.parallel.mesh import (
            spatial_activation_constraint)

        # See deep_fake.py: restores real H-sharding past the warp's gather.
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

        batch_u8 = unpack_upload(batch_u8,
                                 getattr(cfg, "upload_format", "rgb"))
        # Derive the per-step key ON DEVICE from the step counter: the host
        # passes one constant base key, avoiding a tunnel round-trip per step
        # (measured 10x throughput loss from per-step host PRNGKey calls).
        rng = jax.random.fold_in(rng, state.step)
        k_aug, k_noise = jax.random.split(rng)
        # fold_in (not a wider split) keeps the aug/noise streams — and the
        # pinned golden losses — unchanged by the drop-key addition.
        k_drop = jax.random.fold_in(rng, 1)
        image = augment_batch(k_aug, batch_u8, cfg.mean, cfg.std, self.aug,
                              method=getattr(cfg, "warp_method", "auto"))
        if self.jitter.enabled:
            from denoising_diffusion_deep_fake_tpu.ops.color import (
                color_jitter_normalised, sample_color_jitter_params)

            # fold_in(rng, 2): a NEW stream — k_aug/k_noise/k_drop (and the
            # pinned goldens, which run with jitter off) are unchanged.
            jit_params = sample_color_jitter_params(
                jax.random.fold_in(rng, 2), image.shape[0], self.jitter)
            image = color_jitter_normalised(image, jit_params,
                                            cfg.mean, cfg.std)
        image = self._pin_spatial(image)
        noisy, _ = blend_random_amount_of_noise(
            k_noise, image, cfg.noise_exponential_sampling_lambda)

        from denoising_diffusion_deep_fake_tpu.training.state import (
            maybe_remat)

        fwd = maybe_remat(
            lambda params, x: self.model.apply(
                {"params": params, "batch_stats": state.batch_stats}, x,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": k_drop}),
            getattr(cfg, "remat", "none"))

        def loss_fn(params):
            # The "dropout" collection drives stochastic depth in encoders
            # that use it (efficientnet); inert for the other families.
            pred, mutated = fwd(params, noisy)
            return mse_ssim_loss(pred, image), (mutated["batch_stats"], pred)

        (loss, (new_bs, pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, self.tx, new_bs)

        # LearningRateMonitor parity (train_denoiser/train_denoiser.py:40).
        from denoising_diffusion_deep_fake_tpu.training.optim import (
            cosine_annealing_lr)

        lr = cosine_annealing_lr(cfg.learning_rate, cfg.cosine_t_max,
                                 state.step // self.steps_per_epoch)
        metrics = {"loss": loss, "lr": lr}
        if with_images:
            from denoising_diffusion_deep_fake_tpu.ops.image import (
                panel_grid_u8)

            # Panels leave the step display-ready (uint8 3x3 grids built on
            # device) — ~56x fewer bytes per panel fetch at 448².
            images = {tag: panel_grid_u8(x) for tag, x in
                      {"image": image, "image_noisy": noisy,
                       "image_prediction": pred}.items()}
            return new_state, metrics, images
        return new_state, metrics

    def make_denoise_fn(self):
        """Jitted eval-mode forward (running-average BN)."""
        def denoise(state: ModelState, x):
            return self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats}, x,
                train=False)

        return jax.jit(denoise)

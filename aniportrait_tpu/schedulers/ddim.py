"""DDIM noise schedule + sampler, pure JAX.

Covers the reference's two scheduler configurations:
  * inference: DDIM with zero-SNR beta rescale, v-prediction, "trailing"
    timestep spacing (reference ``configs/inference/inference_v2.yaml:24-32``)
  * training: DDPM-style ``add_noise``/``get_velocity`` on a scaled-linear
    schedule (reference ``train_stage_1.py:233-263``), with optional zero-SNR.

All tables are precomputed with numpy at construction; ``step``/``add_noise``
are jittable pure functions of traced arrays.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def make_betas(
    num_train_timesteps: int,
    beta_start: float,
    beta_end: float,
    beta_schedule: str,
) -> np.ndarray:
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
            )
            ** 2
        )
    raise ValueError(f"unknown beta_schedule: {beta_schedule}")


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale betas so the terminal step has zero SNR (Lin et al. 2023,
    'Common Diffusion Noise Schedules and Sample Steps are Flawed')."""
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_bar_sqrt = np.sqrt(alphas_cumprod)

    alphas_bar_sqrt_0 = alphas_bar_sqrt[0].copy()
    alphas_bar_sqrt_T = alphas_bar_sqrt[-1].copy()

    # shift last to zero, scale first back to original value
    alphas_bar_sqrt -= alphas_bar_sqrt_T
    alphas_bar_sqrt *= alphas_bar_sqrt_0 / (alphas_bar_sqrt_0 - alphas_bar_sqrt_T)

    alphas_bar = alphas_bar_sqrt**2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = np.concatenate([alphas_bar[0:1], alphas])
    return 1.0 - alphas


class DDIMScheduler:
    """Functional DDIM scheduler.

    Unlike the stateful diffusers API, ``set_timesteps`` returns the timestep
    table, and ``step`` takes the current timestep value explicitly so it can
    sit inside a ``lax.fori_loop``/``scan``.
    """

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "linear",
        clip_sample: bool = False,
        set_alpha_to_one: bool = True,
        steps_offset: int = 1,
        prediction_type: str = "v_prediction",
        timestep_spacing: str = "trailing",
        rescale_betas_zero_snr: bool = True,
        **_unused,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.clip_sample = clip_sample
        self.steps_offset = steps_offset
        self.timestep_spacing = timestep_spacing

        betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        self.betas = jnp.asarray(betas, dtype=jnp.float32)
        self.alphas_cumprod = jnp.asarray(acp, dtype=jnp.float32)
        self.final_alpha_cumprod = jnp.asarray(
            1.0 if set_alpha_to_one else acp[0], dtype=jnp.float32
        )
        # initial noise sigma: DDIM latents start as unit gaussian
        self.init_noise_sigma = 1.0

    # ------------------------------------------------------------------ setup
    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending int32 timesteps for the given step count."""
        T, S = self.num_train_timesteps, num_inference_steps
        if self.timestep_spacing == "trailing":
            ts = np.round(np.arange(T, 0, -T / S)).astype(np.int64) - 1
        elif self.timestep_spacing == "leading":
            step_ratio = T // S
            ts = (np.arange(0, S) * step_ratio).round()[::-1].astype(np.int64)
            ts = ts + self.steps_offset
        elif self.timestep_spacing == "linspace":
            ts = np.linspace(0, T - 1, S).round()[::-1].astype(np.int64)
        else:
            raise ValueError(f"unknown timestep_spacing: {self.timestep_spacing}")
        return ts.astype(np.int32)

    # ------------------------------------------------------------------ train
    def add_noise(self, sample, noise, t):
        acp = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (sample.ndim - 1)
        sa = jnp.sqrt(acp).reshape(shape).astype(sample.dtype)
        sb = jnp.sqrt(1.0 - acp).reshape(shape).astype(sample.dtype)
        return sa * sample + sb * noise

    def get_velocity(self, sample, noise, t):
        acp = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (sample.ndim - 1)
        sa = jnp.sqrt(acp).reshape(shape).astype(sample.dtype)
        sb = jnp.sqrt(1.0 - acp).reshape(shape).astype(sample.dtype)
        return sa * noise - sb * sample

    # -------------------------------------------------------------- inference
    def scale_model_input(self, sample, t):
        return sample  # DDIM: identity

    def step(self, model_output, t, sample, num_inference_steps: int):
        """One deterministic (eta=0) DDIM update.

        Args:
          model_output: UNet output at timestep ``t``.
          t: scalar int32 timestep (traced OK).
          sample: current latents.
          num_inference_steps: static python int.
        Returns: previous-timestep latents.
        """
        out_f32 = model_output.astype(jnp.float32)
        sample_f32 = sample.astype(jnp.float32)

        prev_t = t - self.num_train_timesteps // num_inference_steps
        alpha_prod_t = self.alphas_cumprod[t]
        alpha_prod_prev = jnp.where(
            prev_t >= 0,
            self.alphas_cumprod[jnp.clip(prev_t, 0)],
            self.final_alpha_cumprod,
        )
        beta_prod_t = 1.0 - alpha_prod_t

        sqrt_a = jnp.sqrt(alpha_prod_t)
        sqrt_b = jnp.sqrt(beta_prod_t)

        if self.prediction_type == "epsilon":
            pred_x0 = (sample_f32 - sqrt_b * out_f32) / sqrt_a
            pred_eps = out_f32
        elif self.prediction_type == "v_prediction":
            pred_x0 = sqrt_a * sample_f32 - sqrt_b * out_f32
            pred_eps = sqrt_a * out_f32 + sqrt_b * sample_f32
        elif self.prediction_type == "sample":
            pred_x0 = out_f32
            pred_eps = (sample_f32 - sqrt_a * pred_x0) / sqrt_b
        else:
            raise ValueError(f"unknown prediction_type: {self.prediction_type}")

        if self.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
            pred_eps = (sample_f32 - sqrt_a * pred_x0) / sqrt_b

        prev = (
            jnp.sqrt(alpha_prod_prev) * pred_x0
            + jnp.sqrt(1.0 - alpha_prod_prev) * pred_eps
        )
        return prev.astype(sample.dtype)


def compute_snr(alphas_cumprod, timesteps):
    """Signal-to-noise ratio per timestep, for Min-SNR loss weighting
    (reference ``train_stage_1.py:101-128``)."""
    acp = alphas_cumprod[timesteps]
    return acp / (1.0 - acp)

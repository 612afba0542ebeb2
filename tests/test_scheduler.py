import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aniportrait_tpu.schedulers import DDIMScheduler, compute_snr


def test_zero_snr_terminal():
    s = DDIMScheduler(rescale_betas_zero_snr=True)
    assert float(s.alphas_cumprod[-1]) < 1e-6
    # first alpha preserved vs non-rescaled
    s2 = DDIMScheduler(rescale_betas_zero_snr=False)
    np.testing.assert_allclose(
        float(s.alphas_cumprod[0]), float(s2.alphas_cumprod[0]), rtol=1e-5
    )


def test_trailing_timesteps():
    s = DDIMScheduler(timestep_spacing="trailing")
    ts = s.timesteps(25)
    assert ts[0] == 999
    assert ts[-1] == 39
    assert len(ts) == 25
    assert np.all(np.diff(ts) == -40)


def test_leading_timesteps_offset():
    s = DDIMScheduler(timestep_spacing="leading", steps_offset=1)
    ts = s.timesteps(50)
    assert ts[0] == 981
    assert ts[-1] == 1


def test_add_noise_roundtrip_epsilon():
    """For a perfect epsilon model, DDIM steps reconstruct x0 progressively."""
    s = DDIMScheduler(
        beta_schedule="scaled_linear",
        prediction_type="epsilon",
        rescale_betas_zero_snr=False,
        timestep_spacing="leading",
    )
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 8, 8, 4), dtype=jnp.float32)
    noise = jnp.asarray(rng.randn(2, 8, 8, 4), dtype=jnp.float32)
    t = jnp.asarray([500, 500])
    xt = s.add_noise(x0, noise, t)
    # one DDIM step with the true noise as the model output moves toward x0
    prev = s.step(noise, jnp.int32(500), xt, num_inference_steps=10)
    t_prev = jnp.asarray([400, 400])
    expected = s.add_noise(x0, noise, t_prev)
    np.testing.assert_allclose(np.asarray(prev), np.asarray(expected), atol=1e-4)


def test_v_prediction_identity():
    """v-pred: x0 = sqrt(a)*x - sqrt(1-a)*v must invert get_velocity."""
    s = DDIMScheduler(prediction_type="v_prediction", rescale_betas_zero_snr=False)
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(1, 4, 4, 4), dtype=jnp.float32)
    noise = jnp.asarray(rng.randn(1, 4, 4, 4), dtype=jnp.float32)
    t = jnp.asarray([999])
    xt = s.add_noise(x0, noise, t)
    v = s.get_velocity(x0, noise, t)
    prev = s.step(v, jnp.int32(999), xt, num_inference_steps=1000)
    # one step of size 1 from perfect v ≈ add_noise at t-1
    expected = s.add_noise(x0, noise, jnp.asarray([998]))
    np.testing.assert_allclose(np.asarray(prev), np.asarray(expected), atol=1e-4)


def test_step_jittable():
    s = DDIMScheduler()
    step = jax.jit(lambda o, t, x: s.step(o, t, x, num_inference_steps=25))
    x = jnp.zeros((1, 4, 4, 4))
    o = jnp.ones((1, 4, 4, 4))
    y = step(o, jnp.int32(999), x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_compute_snr():
    s = DDIMScheduler(rescale_betas_zero_snr=False, beta_schedule="scaled_linear")
    snr = compute_snr(s.alphas_cumprod, jnp.asarray([0, 500, 999]))
    snr = np.asarray(snr)
    assert snr[0] > snr[1] > snr[2] > 0

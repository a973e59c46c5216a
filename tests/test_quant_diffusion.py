"""int8 Fast-DDPM sampling path (serve/quant_diffusion.py).

Layered like the UNet quant tests (tests/test_quant.py): first prove the
raw-param float mirror is bit-equal to the Flax module, then that the int8
forward tracks the float forward within quantization noise, then that the
whole sampler runs int8 end to end.

Calibration regimes per test: a RANDOM-INIT net's ancestral trajectory
explodes (1/sqrt(abar) ~ 158 at t=999 amplifies garbage eps, so trajectory
absmax lands ~1e4 while unit-variance forward inputs are ~4 — everything
would quantize to zero).  That is a property of untrained weights, not of
the quantizer: the forward-tracking test therefore calibrates on
representative inputs (calibrate_fastddpm_inputs), and the end-to-end
sampler test uses a LOW-noise schedule (num_timesteps=50 -> abar >= 0.6)
whose trajectory stays bounded even under a random net.  The trajectory
calibrator itself is exercised against an exploding chain (scales must
cover what the sampler visits).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrisr_tpu.models.diffusion import (
    DiffusionSchedule,
    FastDDPMUNet,
    sample_ancestral,
)
from mrisr_tpu.serve.quant_diffusion import (
    calibrate_fastddpm,
    calibrate_fastddpm_inputs,
    fastddpm_float_apply,
    fastddpm_int8_apply,
    quantize_fastddpm,
)

BASE, TDIM, HW = 8, 16, 32


@pytest.fixture(scope="module")
def model_and_vars():
    model = FastDDPMUNet(base_features=BASE, time_dim=TDIM)
    x = jnp.zeros((2, HW, HW, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32))
    return model, variables


def _input_calib(variables, keys_and_ts):
    batches = [
        (jax.random.normal(jax.random.PRNGKey(k), (2, HW, HW, 3)),
         jnp.full((2,), t, jnp.int32))
        for k, t in keys_and_ts
    ]
    return calibrate_fastddpm_inputs(
        variables, batches, dtype=jnp.float32, time_dim=TDIM
    )


def test_float_mirror_matches_module(model_and_vars):
    """fastddpm_float_apply reimplements FastDDPMUNet.apply exactly —
    the calibration forward must see the true activations."""
    model, variables = model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(1), (2, HW, HW, 3))
    t = jnp.array([7, 900], jnp.int32)
    ref = model.apply(variables, x, t)
    got = fastddpm_float_apply(
        variables["params"], x, t, dtype=jnp.float32, time_dim=TDIM
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_calibration_covers_every_conv_site(model_and_vars):
    _, variables = model_and_vars
    calib = _input_calib(variables, [(11, 100)])
    # init + 7 resblocks x 2 convs + 6 channel-changing skips + 3 upconvs
    # + final  (bottleneck keeps channels -> no skip conv)
    assert len(calib) == 1 + 7 * 2 + 6 + 3 + 1
    assert all(v > 0 for v in calib.values())
    for site in ("init_conv", "bottleneck/conv1", "dec1/skip", "upconv2",
                 "final_conv"):
        assert site in calib


def test_trajectory_calibration_covers_sampler_ranges(model_and_vars):
    """The trajectory calibrator must see the (exploding, under random
    weights) x_t states the sampler actually visits — its input scale must
    dwarf the static unit-variance one."""
    _, variables = model_and_vars
    schedule = DiffusionSchedule.create(
        num_timesteps=1000, num_inference_steps=4, beta_schedule="linear",
        selection="linspace",
    )
    cond = jax.random.normal(jax.random.PRNGKey(3), (2, HW, HW, 2))
    traj = calibrate_fastddpm(
        variables, schedule, [cond], jax.random.PRNGKey(4),
        dtype=jnp.float32, time_dim=TDIM,
    )
    static = _input_calib(variables, [(12, 999)])
    assert set(traj) - {"__timesteps__"} == set(static)
    # per-step rows, one per inference step, plus the t -> row lookup
    assert traj["init_conv"].shape == (4,)
    assert traj["__timesteps__"].shape == (4,)
    # the random-init chain multiplies x by 1/sqrt(abar_t) each step, so
    # the LAST steps' (low-t) rows dwarf the first forward's — exactly the
    # per-site range drift that forces per-step scales
    assert traj["init_conv"].max() > 10 * static["init_conv"]
    assert traj["init_conv"].max() > 10 * traj["init_conv"].min() > 0


def test_quantize_rejects_incomplete_calibration(model_and_vars):
    _, variables = model_and_vars
    with pytest.raises(KeyError, match="init_conv"):
        quantize_fastddpm(variables, {})


def test_int8_forward_tracks_float(model_and_vars):
    model, variables = model_and_vars
    calib = _input_calib(variables, [(11, 100), (12, 900), (13, 500)])
    q = quantize_fastddpm(variables, calib)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, HW, HW, 3))
    t = jnp.array([100, 900], jnp.int32)
    ref = np.asarray(model.apply(variables, x, t))
    got = np.asarray(
        fastddpm_int8_apply(q, x, t, dtype=jnp.float32, time_dim=TDIM)
    )
    assert np.all(np.isfinite(got))
    rel_rmse = np.sqrt(np.mean((got - ref) ** 2)) / (ref.std() + 1e-8)
    assert rel_rmse < 0.15, rel_rmse
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99, corr


def test_deep_only_quantization(model_and_vars):
    """quantize_fastddpm(only=DEEP_SITES): the 256²-level convs stay float
    (higher fidelity) and the apply falls back per site."""
    from mrisr_tpu.serve.quant_diffusion import DEEP_SITES

    model, variables = model_and_vars
    calib = _input_calib(variables, [(11, 100), (12, 900)])
    q = quantize_fastddpm(variables, calib, only=DEEP_SITES)
    assert set(q["int8"]) == set(DEEP_SITES)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, HW, HW, 3))
    t = jnp.array([100, 900], jnp.int32)
    ref = np.asarray(model.apply(variables, x, t))
    got = np.asarray(
        fastddpm_int8_apply(q, x, t, dtype=jnp.float32, time_dim=TDIM)
    )
    full = np.asarray(
        fastddpm_int8_apply(
            quantize_fastddpm(variables, calib), x, t,
            dtype=jnp.float32, time_dim=TDIM,
        )
    )
    err = lambda a: np.sqrt(np.mean((a - ref) ** 2))  # noqa: E731
    assert err(got) <= err(full) + 1e-6  # fewer quantized sites, less noise


def test_int8_sampler_end_to_end(model_and_vars):
    """sample_ancestral with the int8 eps_fn: runs under jit, finite, and
    lands near the float sampler (same keys -> same noise trajectory).
    Low-noise schedule so the random-init trajectory stays bounded and one
    static activation scale is representative (module docstring)."""
    model, variables = model_and_vars
    schedule = DiffusionSchedule.create(
        num_timesteps=50, num_inference_steps=4, beta_schedule="linear",
        selection="linspace",
    )
    cond = jax.random.normal(jax.random.PRNGKey(6), (2, HW, HW, 2))
    key = jax.random.PRNGKey(7)
    calib = calibrate_fastddpm(
        variables, schedule, [cond], jax.random.PRNGKey(8),
        dtype=jnp.float32, time_dim=TDIM,
    )
    q = quantize_fastddpm(variables, calib)

    ref = jax.jit(
        lambda c, k: sample_ancestral(
            lambda xi, ti: model.apply(variables, xi, ti), c, k, schedule
        )
    )(cond, key)
    got = jax.jit(
        lambda c, k: sample_ancestral(
            lambda xi, ti: fastddpm_int8_apply(
                q, xi, ti, dtype=jnp.float32, time_dim=TDIM
            ),
            c, k, schedule,
        )
    )(cond, key)
    got, ref = np.asarray(got), np.asarray(ref)
    assert got.shape == (2, HW, HW, 1)
    assert np.all(np.isfinite(got))
    # quantization noise compounds through the 4-step chain; same-noise
    # trajectories must still stay close
    rel = np.sqrt(np.mean((got - ref) ** 2)) / (ref.std() + 1e-8)
    assert rel < 0.35, rel


def test_per_step_scales_beat_static(model_and_vars):
    """Collapsing the per-step calibration to one static absmax per site
    (the r3-draft scheme) must never sample closer to the float chain than
    the per-step tables — the range drift across steps is the whole reason
    the tables exist (measured −0.3 SSIM end-to-end with static scales on
    the demo checkpoint)."""
    model, variables = model_and_vars
    schedule = DiffusionSchedule.create(
        num_timesteps=1000, num_inference_steps=4, beta_schedule="linear",
        selection="linspace",
    )
    cond = jax.random.normal(jax.random.PRNGKey(21), (2, HW, HW, 2))
    key = jax.random.PRNGKey(22)
    calib = calibrate_fastddpm(
        variables, schedule, [cond], jax.random.PRNGKey(23),
        dtype=jnp.float32, time_dim=TDIM,
    )
    static_calib = {
        k: float(np.max(v)) for k, v in calib.items()
        if k != "__timesteps__"
    }
    ref = jax.jit(
        lambda c, k: sample_ancestral(
            lambda xi, ti: model.apply(variables, xi, ti), c, k, schedule
        )
    )(cond, key)

    def run(q):
        return np.asarray(jax.jit(
            lambda c, k: sample_ancestral(
                lambda xi, ti: fastddpm_int8_apply(
                    q, xi, ti, dtype=jnp.float32, time_dim=TDIM
                ),
                c, k, schedule,
            )
        )(cond, key))

    err_step = np.sqrt(np.mean(
        (run(quantize_fastddpm(variables, calib)) - np.asarray(ref)) ** 2
    ))
    err_static = np.sqrt(np.mean(
        (run(quantize_fastddpm(variables, static_calib)) - np.asarray(ref))
        ** 2
    ))
    assert np.isfinite(err_step)
    assert err_step <= err_static * 1.05, (err_step, err_static)

"""Serving bundles (serve/bundle.py): quantize -> save -> load -> identical
outputs, plus the bf16 (quant='none') variant and the engine entry point."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrisr_tpu.ckpt.fold_bn import fold_unet_batchnorm
from mrisr_tpu.models import UNet
from mrisr_tpu.serve import (
    calibrate_unet,
    engine_from_bundle,
    load_bundle,
    quantize_unet,
    save_bundle,
    unet_int8_fused_apply,
)
from mrisr_tpu.serve.bundle import make_bundle_apply

HW = 16
F = 4


@pytest.fixture(scope="module")
def folded():
    model = UNet(features=F)
    x = jnp.zeros((1, HW, HW, 2))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return fold_unet_batchnorm(variables["params"], variables["batch_stats"])


@pytest.fixture(scope="module")
def batch():
    return jax.random.normal(jax.random.PRNGKey(7), (2, HW, HW, 2))


@pytest.mark.slow
def test_int8_bundle_roundtrip(folded, batch, tmp_path):
    q = quantize_unet(folded, calibrate_unet(folded, [batch]))
    y_direct = np.asarray(jax.jit(unet_int8_fused_apply)(q, batch))

    path = save_bundle(
        str(tmp_path / "b"), q, model_name="unet", quant="int8_fused",
        base_features=F, image_size=(HW, HW), calibration="1 batch, absmax",
    )
    params, meta = load_bundle(path)
    assert meta["quant"] == "int8_fused"
    assert meta["base_features"] == F
    # int8 weight tables survive bit-exactly
    np.testing.assert_array_equal(
        np.asarray(params["enc1"]["Conv_0"]["w_int8"]),
        np.asarray(q["enc1"]["Conv_0"]["w_int8"]),
    )
    # bf16 upconv params survive bit-exactly through the uint16 tagging
    assert params["final"]["kernel"].dtype == jnp.bfloat16
    # make_bundle_apply closes the params over as jit CONSTANTS, which lets
    # XLA fuse the bf16 float path differently than the traced-arg call —
    # outputs agree to bf16 noise, not bit-exactly (the param tables above
    # ARE bit-exact, which is the roundtrip contract)
    y_loaded = np.asarray(make_bundle_apply(params, meta)(batch))
    np.testing.assert_allclose(y_loaded, y_direct, atol=2e-2)


def test_bf16_bundle_roundtrip(folded, batch, tmp_path):
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        folded,
    )
    path = save_bundle(
        str(tmp_path / "b"), variables, model_name="unet", quant="none",
        base_features=F, image_size=(HW, HW),
    )
    params, meta = load_bundle(path)
    y = np.asarray(make_bundle_apply(params, meta)(batch))
    module = UNet(features=F, use_bn=False, dtype=jnp.bfloat16)
    ref = np.asarray(
        jax.jit(lambda v, b: module.apply(v, b, train=False))(
            variables, batch
        )
    )
    np.testing.assert_allclose(y, ref, atol=2e-2)  # closure-vs-arg jit, bf16


def test_engine_from_bundle(folded, batch, tmp_path):
    q = quantize_unet(folded, calibrate_unet(folded, [batch]))
    path = save_bundle(
        str(tmp_path / "b"), q, model_name="unet", quant="int8_fused",
        base_features=F, image_size=(HW, HW),
    )
    with engine_from_bundle(path, batch_size=2) as eng:
        y = eng.predict(np.zeros((HW, HW, 2), np.float32))
    assert y.shape == (HW, HW, 1)
    assert np.all(np.isfinite(y))


@pytest.mark.slow
def test_export_serving_cli(tmp_path):
    """End-to-end through the CLI against a tiny fresh-ish checkpoint."""
    from mrisr_tpu.data.synthetic import make_synthetic_store
    from mrisr_tpu import cli

    store_dir = str(tmp_path / "store")
    make_synthetic_store(
        store_dir, num_patients=8, slices_per_volume=8, height=16, width=16
    )
    # train 1 epoch so a checkpoint exists for checkpoint='required'
    cli.main([
        "train", "--preset", "unet", "--data", store_dir, "--epochs", "1",
        "--batch-size", "4", "--image-size", "16", "--features", "4",
        "--checkpoint-dir", str(tmp_path / "models"),
        "--results-dir", str(tmp_path / "results"),
    ])
    cli.main([
        "export-serving", "--model", "unet", "--data", store_dir,
        "--image-size", "16", "--features", "4",
        "--checkpoint-dir", str(tmp_path / "models"),
        "--out", str(tmp_path / "bundle"),
    ])
    params, meta = load_bundle(str(tmp_path / "bundle"))
    assert meta["quant"] == "int8_fused"
    assert meta["calibration"].endswith("absmax")
    y = make_bundle_apply(params, meta)(jnp.zeros((1, 16, 16, 2)))
    assert y.shape == (1, 16, 16, 1)


# ---------------------------------------------------------- diffusion bundles

DHW, DBASE, DTDIM = 32, 8, 16


@pytest.fixture(scope="module")
def diffusion_loaded():
    """A LoadedModel-shaped fastddpm with a low-noise schedule (random-init
    trajectories stay bounded — tests/test_quant_diffusion.py docstring)."""
    from mrisr_tpu.api import LoadedModel
    from mrisr_tpu.models.diffusion import DiffusionSchedule, FastDDPMUNet

    model = FastDDPMUNet(base_features=DBASE, time_dim=DTDIM)
    x = jnp.zeros((2, DHW, DHW, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32)
    )
    schedule = DiffusionSchedule.create(
        num_timesteps=50, num_inference_steps=4, beta_schedule="linear",
        selection="linspace",
    )
    return LoadedModel(
        name="fastddpm", module=model, variables=variables,
        kind="diffusion", schedule=schedule,
    )


@pytest.fixture(scope="module")
def cond_batch():
    return jax.random.normal(jax.random.PRNGKey(9), (2, DHW, DHW, 2))


@pytest.mark.slow
def test_diffusion_bundle_bf16_roundtrip(diffusion_loaded, cond_batch,
                                         tmp_path):
    from mrisr_tpu.models.diffusion import sample_ancestral
    from mrisr_tpu.serve.bundle import _export_diffusion_bundle
    from mrisr_tpu.serve.quant_diffusion import fastddpm_float_apply

    path = _export_diffusion_bundle(
        str(tmp_path / "b"), diffusion_loaded, quant="none",
        calibration_batches=None, image_size=(DHW, DHW),
    )
    params, meta = load_bundle(path)
    assert meta["kind"] == "diffusion"
    assert meta["quant"] == "none"
    assert meta["time_dim"] == DTDIM
    assert meta["base_features"] == DBASE
    # schedule tables ship verbatim
    np.testing.assert_array_equal(
        np.asarray(params["schedule"]["timesteps"]),
        np.asarray(diffusion_loaded.schedule.timesteps),
    )
    y = np.asarray(make_bundle_apply(params, meta)(cond_batch))
    assert y.shape == (2, DHW, DHW, 1)
    assert np.all(np.isfinite(y))
    # same fixed key + same bf16 eps -> same trajectory as the direct call
    bf16_params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        diffusion_loaded.variables["params"],
    )
    ref = np.asarray(jax.jit(
        lambda c: sample_ancestral(
            lambda xi, ti: fastddpm_float_apply(
                bf16_params, xi, ti, dtype=jnp.bfloat16, time_dim=DTDIM
            ),
            c, jax.random.PRNGKey(0), diffusion_loaded.schedule,
        )
    )(cond_batch))
    rel = np.sqrt(np.mean((y - ref) ** 2)) / (ref.std() + 1e-8)
    assert rel < 0.05, rel  # closure-vs-arg jit fusion noise only


def test_diffusion_bundle_int8_deep(diffusion_loaded, cond_batch, tmp_path):
    from mrisr_tpu.models.diffusion import sample_ancestral
    from mrisr_tpu.serve.bundle import _export_diffusion_bundle
    from mrisr_tpu.serve.quant_diffusion import DEEP_SITES

    path = _export_diffusion_bundle(
        str(tmp_path / "b"), diffusion_loaded, quant="int8_deep",
        calibration_batches=[cond_batch], image_size=(DHW, DHW),
    )
    params, meta = load_bundle(path)
    assert meta["quant"] == "int8_deep"
    # '/'-bearing site names survive the flatten/unflatten roundtrip
    from mrisr_tpu.serve.bundle import _reflatten_int8_sites

    sites = _reflatten_int8_sites(params["int8"])
    assert set(sites) == set(DEEP_SITES)
    assert sites["enc2/conv1"]["w_int8"].dtype == np.int8
    y = np.asarray(make_bundle_apply(params, meta)(cond_batch))
    assert y.shape == (2, DHW, DHW, 1)
    assert np.all(np.isfinite(y))
    # near the float sampler under the same keys (noise compounds over the
    # 4-step chain; bound mirrors test_int8_sampler_end_to_end)
    ref = np.asarray(jax.jit(
        lambda c: sample_ancestral(
            lambda xi, ti: diffusion_loaded.module.apply(
                diffusion_loaded.variables, xi, ti
            ),
            c, jax.random.PRNGKey(0), diffusion_loaded.schedule,
        )
    )(cond_batch))
    rel = np.sqrt(np.mean((y - ref) ** 2)) / (ref.std() + 1e-8)
    assert rel < 0.35, rel


def test_diffusion_bundle_engine(diffusion_loaded, cond_batch, tmp_path):
    from mrisr_tpu.serve.bundle import _export_diffusion_bundle

    path = _export_diffusion_bundle(
        str(tmp_path / "b"), diffusion_loaded, quant="int8_deep",
        calibration_batches=[cond_batch], image_size=(DHW, DHW),
    )
    with engine_from_bundle(path, batch_size=2) as eng:
        y = eng.predict(np.zeros((DHW, DHW, 2), np.float32))
    assert y.shape == (DHW, DHW, 1)
    assert np.all(np.isfinite(y))


@pytest.fixture(scope="module")
def stepdistilled_loaded(diffusion_loaded):
    """A step-distilled-student-shaped LoadedModel: same architecture,
    2-point subgrid of the base schedule, DDIM-grid sampler (what
    api.load_model('fastddpm_steps2') returns)."""
    from mrisr_tpu.api import LoadedModel
    from mrisr_tpu.serve.distill_diffusion import (
        grid_positions,
        subgrid_schedule,
    )

    sub = subgrid_schedule(diffusion_loaded.schedule, grid_positions(4, 2))
    return LoadedModel(
        name="fastddpm_steps2", module=diffusion_loaded.module,
        variables=diffusion_loaded.variables, kind="diffusion",
        schedule=sub, sampler="ddim_grid",
    )


def test_stepdistilled_bundle_uses_ddim_grid(stepdistilled_loaded,
                                             cond_batch, tmp_path):
    """A fastddpm_steps<N> bundle must serve with the DDIM-grid sampler the
    student was distilled under, not the ancestral chain."""
    from mrisr_tpu.serve.bundle import _export_diffusion_bundle
    from mrisr_tpu.serve.distill_diffusion import sample_ddim_grid
    from mrisr_tpu.serve.quant_diffusion import fastddpm_float_apply

    path = _export_diffusion_bundle(
        str(tmp_path / "b"), stepdistilled_loaded, quant="none",
        calibration_batches=None, image_size=(DHW, DHW),
    )
    params, meta = load_bundle(path)
    assert meta["sampler"] == "ddim_grid"
    assert meta["model_name"] == "fastddpm_steps2"
    np.testing.assert_array_equal(
        np.asarray(params["schedule"]["timesteps"]),
        np.asarray(stepdistilled_loaded.schedule.timesteps),
    )
    y = np.asarray(make_bundle_apply(params, meta)(cond_batch))
    assert y.shape == (2, DHW, DHW, 1)
    bf16_params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        stepdistilled_loaded.variables["params"],
    )
    ref = np.asarray(jax.jit(
        lambda c: sample_ddim_grid(
            lambda xi, ti: fastddpm_float_apply(
                bf16_params, xi, ti, dtype=jnp.bfloat16, time_dim=DTDIM
            ),
            c, jax.random.PRNGKey(0), stepdistilled_loaded.schedule,
        )
    )(cond_batch))
    rel = np.sqrt(np.mean((y - ref) ** 2)) / (ref.std() + 1e-8)
    assert rel < 0.05, rel


@pytest.mark.slow
def test_stepdistilled_bundle_int8_deep_engine(stepdistilled_loaded,
                                               cond_batch, tmp_path):
    """int8_deep student bundle: calibration runs the DDIM-grid trajectory
    (per-step scales over the 2-step grid) and the engine serves it."""
    from mrisr_tpu.serve.bundle import (
        _export_diffusion_bundle,
        _reflatten_int8_sites,
    )
    from mrisr_tpu.serve.distill_diffusion import sample_ddim_grid

    path = _export_diffusion_bundle(
        str(tmp_path / "b"), stepdistilled_loaded, quant="int8_deep",
        calibration_batches=[cond_batch], image_size=(DHW, DHW),
    )
    params, meta = load_bundle(path)
    assert meta["sampler"] == "ddim_grid"
    sites = _reflatten_int8_sites(params["int8"])
    # per-step a_scale rows match the STUDENT grid length
    assert sites["enc2/conv1"]["a_scale"].shape == (2,)
    y = np.asarray(make_bundle_apply(params, meta)(cond_batch))
    ref = np.asarray(jax.jit(
        lambda c: sample_ddim_grid(
            lambda xi, ti: stepdistilled_loaded.module.apply(
                stepdistilled_loaded.variables, xi, ti
            ),
            c, jax.random.PRNGKey(0), stepdistilled_loaded.schedule,
        )
    )(cond_batch))
    rel = np.sqrt(np.mean((y - ref) ** 2)) / (ref.std() + 1e-8)
    assert rel < 0.35, rel
    with engine_from_bundle(path, batch_size=2) as eng:
        out = eng.predict(np.zeros((DHW, DHW, 2), np.float32))
    assert out.shape == (DHW, DHW, 1)
    assert np.all(np.isfinite(out))


def test_diffusion_bundle_rejects_bad_quant(diffusion_loaded, tmp_path):
    from mrisr_tpu.serve.bundle import _export_diffusion_bundle

    with pytest.raises(ValueError, match="int8_deep"):
        _export_diffusion_bundle(
            str(tmp_path / "b"), diffusion_loaded, quant="int8_fused",
            calibration_batches=None, image_size=(DHW, DHW),
        )


def test_pair_bundle_rejects_diffusion_quant(folded, batch, tmp_path):
    """`export-serving --model unet --quant int8_deep` must error, not
    silently save a bf16 bundle whose meta claims int8_deep."""
    import unittest.mock as mock

    from mrisr_tpu.api import LoadedModel
    from mrisr_tpu.models import UNet
    from mrisr_tpu.serve.bundle import export_serving_bundle

    loaded = LoadedModel(
        name="unet", module=UNet(features=F, use_bn=False),
        variables={"params": folded["params"]}, kind="pair",
    )
    with mock.patch("mrisr_tpu.api.load_model", return_value=loaded):
        with pytest.raises(ValueError, match="int8_deep is the diffusion"):
            export_serving_bundle(
                str(tmp_path / "b"), "unet", quant="int8_deep",
                calibration_batches=[batch], image_size=(HW, HW),
            )


@pytest.mark.slow
def test_make_bundle_apply_does_not_mutate_params(diffusion_loaded,
                                                  cond_batch, tmp_path):
    """A second make_bundle_apply on the same loaded tree must work (the
    schedule entry is read, not popped)."""
    from mrisr_tpu.serve.bundle import _export_diffusion_bundle

    path = _export_diffusion_bundle(
        str(tmp_path / "b"), diffusion_loaded, quant="none",
        calibration_batches=None, image_size=(DHW, DHW),
    )
    params, meta = load_bundle(path)
    y1 = np.asarray(make_bundle_apply(params, meta)(cond_batch))
    assert "schedule" in params
    y2 = np.asarray(make_bundle_apply(params, meta)(cond_batch))
    np.testing.assert_array_equal(y1, y2)


@pytest.mark.slow
def test_diffusion_bundle_percentile_calibration(diffusion_loaded,
                                                 cond_batch, tmp_path):
    """--percentile reaches the trajectory calibrator (it was silently
    dropped for diffusion bundles before r3)."""
    from mrisr_tpu.serve.bundle import _export_diffusion_bundle

    path = _export_diffusion_bundle(
        str(tmp_path / "b"), diffusion_loaded, quant="int8_deep",
        calibration_batches=[cond_batch], image_size=(DHW, DHW),
        percentile=99.0,
    )
    params, meta = load_bundle(path)
    assert meta["calibration"].endswith("p99.0")
    y = np.asarray(make_bundle_apply(params, meta)(cond_batch))
    assert y.shape == (2, DHW, DHW, 1)
    assert np.all(np.isfinite(y))


def test_diffusion_bundle_engine_data_parallel(diffusion_loaded, cond_batch,
                                               tmp_path):
    """DP serving of a diffusion bundle on the virtual 8-device mesh ==
    single-device results (the packaged sampler is batch-independent and
    threefry bits are sharding-invariant)."""
    import jax

    from mrisr_tpu.serve.bundle import _export_diffusion_bundle

    assert jax.device_count() == 8
    path = _export_diffusion_bundle(
        str(tmp_path / "b"), diffusion_loaded, quant="int8_deep",
        calibration_batches=[cond_batch], image_size=(DHW, DHW),
    )
    rng = np.random.RandomState(4)
    xs = [rng.rand(DHW, DHW, 2).astype(np.float32) for _ in range(8)]
    with engine_from_bundle(path, batch_size=8, max_delay_ms=20.0) as single:
        ys_single = single.predict_many(xs)
    with engine_from_bundle(
        path, batch_size=8, max_delay_ms=20.0, data_parallel=True
    ) as dp:
        ys_dp = dp.predict_many(xs)
    for a, b in zip(ys_single, ys_dp):
        np.testing.assert_allclose(a, b, atol=2e-2)

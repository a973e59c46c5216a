"""Eval layer tests: metric semantics + volume prediction paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrisr_tpu.data.synthetic import make_synthetic_volume
from mrisr_tpu.eval.metrics import compute_metrics, per_sample_metrics, spacing_metrics
from mrisr_tpu.eval.volume_eval import (
    normalize_volume,
    predict_volume,
    predict_volume_hierarchical,
    predict_volume_progressive,
)

HW = (32, 32)


@pytest.fixture(scope="module")
def volume():
    return make_synthetic_volume(num_slices=12, height=32, width=32, seed=3)


def _avg_predict(x):
    """A perfect-for-smooth-volumes baseline: mean of pre and post."""
    return jnp.mean(x, axis=-1, keepdims=True)


def test_compute_metrics_identity():
    v = make_synthetic_volume(6, 32, 32, seed=1)
    m = compute_metrics(v, v)
    assert m["ssim_mean"] == pytest.approx(1.0, abs=1e-5)
    assert m["mae"] == pytest.approx(0.0, abs=1e-7)


def test_compute_metrics_original_range_normalization():
    """Predictions are normalized by the ORIGINAL's range and clipped —
    the V6 subtlety that changes reported numbers."""
    rng = np.random.default_rng(0)
    orig = rng.random((4, 16, 16)).astype(np.float32)
    pred = orig + 5.0  # way outside original range
    m = compute_metrics(orig, pred)
    # after clipping to [0,1] every pred pixel is 1.0
    assert np.allclose(m["pred_norm"], 1.0)
    # manual MAE against the formula
    orig_norm = (orig - orig.min()) / (orig.max() - orig.min() + 1e-8)
    assert m["mae"] == pytest.approx(float(np.mean(np.abs(orig_norm - 1.0))), abs=1e-6)


def test_per_sample_metrics_modes():
    rng = np.random.default_rng(1)
    gt = rng.standard_normal((5, 16, 16)).astype(np.float32)
    pred = gt + 0.1 * rng.standard_normal((5, 16, 16)).astype(np.float32)
    m1 = per_sample_metrics(gt, pred, mode="minmax-each")
    m2 = per_sample_metrics(np.tanh(gt), np.tanh(pred), mode="denorm-11")
    assert m1["num_samples"] == 5
    assert 0 < m1["ssim_mean"] <= 1
    assert np.isfinite(m2["psnr_mean"])


def test_spacing_metrics_separate():
    rng = np.random.default_rng(2)
    gt = rng.random((6, 16, 16)).astype(np.float32)
    pred = gt.copy()
    pred[3:] += 0.3 * rng.random((3, 16, 16)).astype(np.float32)
    dist = np.array([2, 2, 2, 4, 4, 4])
    out = spacing_metrics(gt, pred, dist)
    assert set(out) == {"3mm", "6mm"}
    # d2 samples are identical -> SSIM 1; d4 corrupted -> lower
    assert out["3mm"]["ssim_mean"] > out["6mm"]["ssim_mean"]


def test_predict_volume_fills_odd_indices(volume):
    res = predict_volume(_avg_predict, volume, batch_size=4, image_size=HW)
    work = res["volume_original"]
    pred = res["volume_predicted"]
    # stride-2 triplets predict middle slices 1, 3, 5, ... (even i -> i+1)
    filled = res["predicted_indices"]
    assert filled == [1, 3, 5, 7, 9]
    untouched = [i for i in range(12) if i not in filled]
    np.testing.assert_array_equal(pred[untouched], work[untouched])
    # averaging neighbors on a smooth phantom is a decent prediction
    assert res["metrics"]["ssim_mean"] > 0.8


def test_predict_volume_hierarchical(volume):
    res = predict_volume_hierarchical(
        _avg_predict, volume, batch_size=4, image_size=HW
    )
    work = res["volume_original"]
    pred = res["volume_predicted"]
    # windows i in 0..7; filled indices are i+1, i+2, i+3 for each i
    changed = sorted(set(range(1, 11)))
    for idx in changed:
        assert not np.allclose(pred[idx], work[idx])
    np.testing.assert_array_equal(pred[0], work[0])
    np.testing.assert_array_equal(pred[11], work[11])
    assert res["metrics"]["ssim_mean"] > 0.6
    assert set(res["stage_predictions"]) == {"i1", "i2", "i3"}


def test_predict_volume_progressive(volume):
    def fake_progressive(w):
        # pretend-model: average outer pairs per stage
        p2 = jnp.mean(w[..., [0, 4]], axis=-1, keepdims=True)
        p1 = jnp.mean(jnp.stack([w[..., 0], p2[..., 0]], -1), -1, keepdims=True)
        p3 = jnp.mean(jnp.stack([p2[..., 0], w[..., 4]], -1), -1, keepdims=True)
        return p1, p2, p3

    res = predict_volume_progressive(
        fake_progressive, volume, batch_size=4, image_size=HW
    )
    assert res["volume_predicted"].shape == (12, *HW)
    assert np.isfinite(res["metrics"]["ssim_mean"])


def test_figures_render(tmp_path, volume):
    from mrisr_tpu.eval.figures import parallel_views_figure, triplet_grid_figure

    res = predict_volume(_avg_predict, volume, batch_size=4, image_size=HW)
    p = parallel_views_figure(
        {"avg": res}, "synthetic", save_path=str(tmp_path / "cmp.png"),
        sagittal_x=16,
    )
    assert p and (tmp_path / "cmp.png").exists()

    v = normalize_volume(volume)
    p2 = triplet_grid_figure(
        v[0], v[2], v[1], {"avg": (v[0] + v[2]) / 2},
        save_path=str(tmp_path / "trip.png"),
    )
    assert p2 and (tmp_path / "trip.png").exists()


def test_single_view_figure(tmp_path, volume):
    """V8 single-view all-models row (sagittal X / axial Z selection)."""
    from mrisr_tpu.eval.figures import single_view_figure

    res = predict_volume(_avg_predict, volume, batch_size=4, image_size=HW)
    results = {"avg": res, "avg2": res}
    p = single_view_figure(
        results, view="sagittal", index=16,
        save_path=str(tmp_path / "sv_sag.png"),
    )
    assert p and (tmp_path / "sv_sag.png").exists()
    p = single_view_figure(
        results, view="axial", save_path=str(tmp_path / "sv_ax.png"),
    )
    assert p and (tmp_path / "sv_ax.png").exists()
    import pytest

    with pytest.raises(ValueError, match="view"):
        single_view_figure(results, view="coronal")


def test_api_loaded_model_contract(tmp_path):
    """NCHW contract: (B, 2, H, W) -> (B, 1, H, W) (BASELINE.json)."""
    from mrisr_tpu.api import load_model
    from mrisr_tpu.config import ModelConfig

    m = load_model(
        "unet", models_dir=str(tmp_path),
        cfg=ModelConfig(name="unet", base_features=8), image_size=HW,
    )
    x = jnp.zeros((2, 2, *HW))
    y = m(x)
    assert y.shape == (2, 1, *HW)


def test_volume_views_figure(tmp_path, volume):
    from mrisr_tpu.eval.figures import volume_views_figure

    p = volume_views_figure(volume, save_path=str(tmp_path / "views.png"))
    assert p and (tmp_path / "views.png").exists()


def test_api_diffusion_models_sample(tmp_path):
    """Both diffusion lineages sample through the API with the right
    scheduler: 'fastddpm' -> ancestral over original timesteps;
    'fastddpm_simple' -> DDIM over the compressed schedule, clamped."""
    from mrisr_tpu.api import load_model
    from mrisr_tpu.config import ModelConfig

    x = jnp.zeros((1, 2, *HW))
    m1 = load_model(
        "fastddpm", models_dir=str(tmp_path),
        cfg=ModelConfig(name="fastddpm", base_features=8, time_dim=16),
        image_size=HW,
    )
    y1 = m1(x, key=jax.random.PRNGKey(0))
    assert y1.shape == (1, 1, *HW)
    assert np.isfinite(np.asarray(y1)).all()

    m2 = load_model(
        "fastddpm_simple", models_dir=str(tmp_path),
        cfg=ModelConfig(name="fastddpm_simple", base_features=8),
        image_size=HW,
    )
    y2 = m2(x, key=jax.random.PRNGKey(0))
    assert y2.shape == (1, 1, *HW)
    o = np.asarray(y2)
    assert o.min() >= -1.0 and o.max() <= 1.0  # DDIM clamp


def test_predicted_only_metrics_finite(volume):
    """Whole-volume PSNR can be inf (untouched slices identical — the V6
    behavior); the predicted-only metrics must always be finite."""
    res = predict_volume(_avg_predict, volume, batch_size=4, image_size=HW)
    mp = res["metrics_predicted_only"]
    assert np.isfinite(mp["psnr_mean"]) and np.isfinite(mp["ssim_mean"])
    res = predict_volume_hierarchical(
        _avg_predict, volume, batch_size=4, image_size=HW
    )
    assert np.isfinite(res["metrics_predicted_only"]["psnr_mean"])


@pytest.mark.slow
def test_load_model_gan_orbax_checkpoint(tmp_path):
    """load_model must read GANTrainer's {generator, discriminator} Orbax
    layout (eval of a trained GAN failed with KeyError 'params' in the r2
    demo runs)."""
    import dataclasses

    import jax

    from mrisr_tpu.api import load_model
    from mrisr_tpu.config import PRESETS, DataConfig
    from mrisr_tpu.train import GANTrainer

    hw = (32, 32)
    cfg = PRESETS["unet_gan"]
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(batch_size=4, image_size=hw),
        model=dataclasses.replace(cfg.model, base_features=4),
        train=dataclasses.replace(
            cfg.train, checkpoint_dir=str(tmp_path / "m"),
            save_every_epoch=False,
        ),
    )
    trainer = GANTrainer(cfg, image_size=hw)
    trainer.save(str(tmp_path / "m" / "unet_gan_best"), epoch=1, best_loss=0.5)

    model = load_model(
        "unet_gan", models_dir=str(tmp_path / "m"), cfg=cfg.model,
        image_size=hw, checkpoint="required",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 2))
    y = model.predict_nhwc(x)
    assert y.shape == (2, 32, 32, 1)
    # loaded params are the trainer's generator params, not a fresh init
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(model.variables["params"]["enc1"]["Conv_0"]["kernel"]),
        np.asarray(trainer.g_state.params["enc1"]["Conv_0"]["kernel"]),
    )

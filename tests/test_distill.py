"""Serving distillation (serve/distill.py): student trains against a
frozen teacher, loss decreases, and the student checkpoint loads back
through the regular api.load_model path."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrisr_tpu.config import PRESETS
from mrisr_tpu.data.pipeline import build_loader
from mrisr_tpu.data.synthetic import make_synthetic_store
from mrisr_tpu.serve.distill import DistillationTrainer, make_distill_steps

HW = (32, 32)


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("distillstore")
    return make_synthetic_store(
        str(d), num_patients=8, slices_per_volume=10, height=32, width=32
    )


def _cfg(tmp_path):
    base = PRESETS["unet_distilled"]
    return dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, image_size=HW, batch_size=4),
        model=dataclasses.replace(base.model, base_features=4),
        train=dataclasses.replace(
            base.train,
            epochs=2,
            compute_dtype="float32",
            checkpoint_dir=os.path.join(str(tmp_path), "models"),
            results_dir=os.path.join(str(tmp_path), "results"),
            save_every_epoch=False,
        ),
    )


def _mean_teacher(x):
    # analytic "teacher": the slice-interpolation identity baseline
    return (x[..., 0:1] + x[..., 1:2]) / 2.0


@pytest.mark.slow
def test_distill_training_decreases_loss(store, tmp_path):
    cfg = _cfg(tmp_path)
    trainer = DistillationTrainer(cfg, teacher_fn=_mean_teacher, image_size=HW)
    train_loader = build_loader(store, "train", cfg.data)
    val_loader = build_loader(store, "val", cfg.data)
    hist = trainer.fit(train_loader, val_loader, verbose=False)
    losses = hist.series["train_loss"]
    assert len(losses) == 2
    assert losses[-1] < losses[0]
    # both loss components logged (history JSON parity with other trainers)
    assert "train_teacher_mse" in hist.series
    assert "train_gt_mse" in hist.series

    # the student checkpoint loads like any pair model, at its OWN width
    from mrisr_tpu.api import load_model

    loaded = load_model(
        "unet_distilled", models_dir=cfg.train.checkpoint_dir,
        cfg=cfg.model, image_size=HW, checkpoint="required",
    )
    assert loaded.kind == "pair"
    x = jnp.zeros((2, *HW, 2), jnp.float32)
    y = loaded.predict_nhwc(x)
    assert y.shape == (2, *HW, 1)

    # fold_bn must cover the student too (api.py fold list): int8 serving
    # quantizes the folded tree, and an unfolded one would silently drop BN
    folded = load_model(
        "unet_distilled", models_dir=cfg.train.checkpoint_dir,
        cfg=cfg.model, image_size=HW, checkpoint="required", fold_bn=True,
    )
    assert not folded.variables.get("batch_stats")
    assert "BatchNorm_0" not in folded.variables["params"]["enc1"]
    xr = jax.random.normal(jax.random.PRNGKey(3), (2, *HW, 2))
    np.testing.assert_allclose(
        np.asarray(folded.predict_nhwc(xr)),
        np.asarray(loaded.predict_nhwc(xr)),
        atol=1e-4,
    )


def test_distill_registry_default_width():
    """With no explicit cfg, unet_distilled must build at the preset's
    base_features=32 — not the reference UNet's 64."""
    from mrisr_tpu.models.registry import init_model, param_count

    _, variables, kind = init_model("unet_distilled", image_size=(32, 32))
    assert kind == "pair"
    n = param_count(variables["params"])
    # half-width M2 topology: ~7.77 M params (vs 31,042,945 at width 64)
    assert 7_000_000 < n < 8_000_000, n


def test_distill_alpha_weights_components():
    """alpha=1 ignores ground truth; alpha=0 ignores the teacher."""
    from mrisr_tpu.config import ModelConfig, TrainConfig
    from mrisr_tpu.models.registry import init_model
    from mrisr_tpu.train.state import create_train_state, make_optimizer

    model, variables, _ = init_model(
        "unet", ModelConfig(name="unet", base_features=4), image_size=HW
    )
    state = create_train_state(model, variables, make_optimizer(TrainConfig()))
    batch = jax.random.normal(jax.random.PRNGKey(0), (2, *HW, 3))

    for alpha in (0.0, 1.0):
        _, eval_step = make_distill_steps(_mean_teacher, alpha=alpha)
        m = eval_step(state, batch)
        expect = alpha * m["teacher_mse"] + (1 - alpha) * m["gt_mse"]
        np.testing.assert_allclose(
            float(m["loss"]), float(expect), rtol=1e-6
        )


def test_distill_ema_matches_analytic_average():
    """ema_decay maintains state.ema_params = d*ema + (1-d)*params per step
    (exactly, tracked against a numpy replay of the parameter trajectory),
    and the eval step scores the EMA weights, not the live ones."""
    from mrisr_tpu.config import ModelConfig, TrainConfig
    from mrisr_tpu.models.registry import init_model
    from mrisr_tpu.train.state import create_train_state, make_optimizer

    model, variables, _ = init_model(
        "unet", ModelConfig(name="unet", base_features=4), image_size=HW
    )
    state = create_train_state(model, variables, make_optimizer(TrainConfig()))
    state = state.replace(ema_params=state.params)

    d = 0.9
    train_step, eval_step = make_distill_steps(
        _mean_teacher, alpha=1.0, ema_decay=d, donate=False
    )
    rng = np.random.default_rng(0)
    expect_ema = jax.tree.map(np.asarray, state.params)
    for i in range(3):
        batch = jnp.asarray(rng.standard_normal((2, *HW, 3)), jnp.float32)
        state, _ = train_step(state, batch)
        expect_ema = jax.tree.map(
            lambda e, p: d * e + (1 - d) * np.asarray(p),
            expect_ema, state.params,
        )
    for got, want in zip(
        jax.tree_util.tree_leaves(state.ema_params),
        jax.tree_util.tree_leaves(expect_ema),
    ):
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    # eval scores the EMA weights: plant distinct params in the two slots
    # and check the metrics equal a no-EMA eval of the planted EMA weights
    other = init_model(
        "unet", ModelConfig(name="unet", base_features=4),
        image_size=HW, seed=7,
    )[1]["params"]
    planted = state.replace(ema_params=other)
    _, eval_plain = make_distill_steps(_mean_teacher, alpha=1.0, donate=False)
    batch = jnp.asarray(rng.standard_normal((2, *HW, 3)), jnp.float32)
    m_ema = eval_step(planted, batch)
    m_ref = eval_plain(planted.replace(params=other), batch)
    np.testing.assert_allclose(
        float(m_ema["loss"]), float(m_ref["loss"]), rtol=1e-6
    )


def test_distill_ema_best_checkpoint_ships_averaged_weights(store, tmp_path):
    """With --ema, the `_best` checkpoint's `params` slot holds the EMA
    weights (what api.load_model serves), `live_params` the raw ones, and a
    resume restores both exactly."""
    import dataclasses as dc

    cfg = _cfg(tmp_path)
    cfg = dc.replace(
        cfg,
        loss=dc.replace(cfg.loss, distill_alpha=1.0, distill_ema=0.95),
        train=dc.replace(cfg.train, epochs=1),
    )
    trainer = DistillationTrainer(cfg, teacher_fn=_mean_teacher, image_size=HW)
    train_loader = build_loader(store, "train", cfg.data)
    trainer.fit(train_loader, None, verbose=False)

    # one epoch: _best was written from the final state
    ema = jax.tree_util.tree_leaves(trainer.state.ema_params)
    live = jax.tree_util.tree_leaves(trainer.state.params)
    assert any(
        not np.allclose(np.asarray(e), np.asarray(p))
        for e, p in zip(ema, live)
    ), "EMA should lag the live weights after training"

    from mrisr_tpu.api import load_model

    loaded = load_model(
        "unet_distilled", models_dir=cfg.train.checkpoint_dir,
        cfg=cfg.model, image_size=HW, checkpoint="required",
    )
    for got, want in zip(
        jax.tree_util.tree_leaves(loaded.variables["params"]), ema
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # resume: both trees restored exactly
    fresh = DistillationTrainer(cfg, teacher_fn=_mean_teacher, image_size=HW)
    fresh.load(os.path.join(cfg.train.checkpoint_dir, "unet_distilled_latest"))
    for got, want in zip(
        jax.tree_util.tree_leaves(fresh.state.ema_params), ema
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(
        jax.tree_util.tree_leaves(fresh.state.params), live
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_distill_lambda_ssim_term():
    """lambda_ssim adds a (1 - SSIM(student, teacher)) component: the eval
    loss must equal alpha*teacher_mse + (1-alpha)*gt_mse + lam*ssim_loss,
    and the train step must still produce finite params."""
    from mrisr_tpu.models import UNet
    from mrisr_tpu.train.state import create_train_state, make_optimizer

    teacher = UNet(features=4)
    hw = (32, 32)
    tvars = teacher.init(jax.random.PRNGKey(1), jnp.zeros((1, *hw, 2)),
                         train=False)

    def teacher_fn(x):
        return teacher.apply(tvars, x, train=False)

    student = UNet(features=4)
    svars = student.init(jax.random.PRNGKey(2), jnp.zeros((1, *hw, 2)),
                         train=False)
    tx = make_optimizer(PRESETS["unet_distilled"].train)
    state = create_train_state(student, svars, tx)

    alpha, lam = 0.7, 0.5
    train_step, eval_step = make_distill_steps(
        teacher_fn, alpha=alpha, lambda_ssim=lam, donate=False
    )
    batch = jnp.asarray(
        np.random.default_rng(3).standard_normal((4, *hw, 3)), jnp.float32
    )
    m = eval_step(state, batch)
    assert set(m) >= {"loss", "teacher_mse", "gt_mse", "ssim_loss"}
    expect = (alpha * float(m["teacher_mse"])
              + (1 - alpha) * float(m["gt_mse"])
              + lam * float(m["ssim_loss"]))
    assert float(m["loss"]) == pytest.approx(expect, rel=1e-5)

    state2, tm = train_step(state, batch)
    assert np.isfinite(float(tm["loss"])) and "ssim_loss" in tm
    for leaf in jax.tree_util.tree_leaves(state2.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.slow
def test_distill_against_quantized_teacher(tmp_path):
    """make_teacher_fn(quant='int8_fused') reproduces the SERVING numerics
    exactly — its outputs equal unet_int8_fused_apply over an independently
    folded+calibrated+quantized copy of the same checkpoint — and the
    distill step trains against it."""
    from mrisr_tpu.ckpt import save_checkpoint
    from mrisr_tpu.ckpt.fold_bn import fold_unet_batchnorm
    from mrisr_tpu.config import ModelConfig, TrainConfig
    from mrisr_tpu.models.registry import init_model
    from mrisr_tpu.serve.distill import make_teacher_fn
    from mrisr_tpu.serve.quant import (
        calibrate_unet, quantize_unet, unet_int8_fused_apply,
    )
    from mrisr_tpu.train.state import create_train_state, make_optimizer

    mcfg = ModelConfig(name="unet", base_features=4)
    _, variables, _ = init_model("unet", mcfg, image_size=HW)
    save_checkpoint(
        str(tmp_path / "unet_best"),
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
    )
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.standard_normal((2, *HW, 2)), jnp.float32)
             for _ in range(2)]

    with pytest.raises(ValueError, match="calibration"):
        make_teacher_fn("unet", models_dir=str(tmp_path), image_size=HW,
                        cfg=mcfg, quant="int8_fused")

    tfn = make_teacher_fn("unet", models_dir=str(tmp_path), image_size=HW,
                          cfg=mcfg, quant="int8_fused",
                          calibration_batches=calib)
    x = jnp.asarray(rng.standard_normal((2, *HW, 2)), jnp.float32)
    got = np.asarray(tfn(x))

    folded = fold_unet_batchnorm(
        variables["params"], variables["batch_stats"])
    want = unet_int8_fused_apply(
        quantize_unet(folded, calibrate_unet(folded, calib)), x)
    np.testing.assert_allclose(got, np.asarray(want, np.float32), atol=1e-5)
    assert got.shape == (2, *HW, 1)

    # a student step against the quantized teacher runs and returns the
    # teacher-mse component
    smcfg = ModelConfig(name="unet", base_features=4)
    _, svars, _ = init_model("unet", smcfg, image_size=HW, seed=1)
    model = init_model("unet", smcfg, image_size=HW, seed=1)[0]
    state = create_train_state(model, svars, make_optimizer(TrainConfig()))
    train_step, _ = make_distill_steps(tfn, alpha=1.0, donate=False)
    batch = jnp.asarray(rng.standard_normal((2, *HW, 3)), jnp.float32)
    _, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

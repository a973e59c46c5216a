"""End-to-end training tests on synthetic data (small models, few steps).

The synthetic phantoms are smooth along Z, so interpolation is learnable:
these tests assert the loss actually decreases — stronger than the
reference's noise-fixture smoke run (`/root/reference/src/unet_model.py:313`).
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrisr_tpu.config import PRESETS, Config, DataConfig, ModelConfig, TrainConfig
from mrisr_tpu.data.pipeline import build_loader
from mrisr_tpu.data.synthetic import make_synthetic_store

HW = (32, 32)


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("trainstore")
    return make_synthetic_store(
        str(d), num_patients=8, slices_per_volume=10, height=32, width=32
    )


def _cfg(preset_name, tmp_path, **model_kw):
    base = PRESETS[preset_name]
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, image_size=HW, batch_size=4),
        model=dataclasses.replace(base.model, base_features=8, **model_kw),
        train=dataclasses.replace(
            base.train,
            epochs=2,
            checkpoint_dir=os.path.join(str(tmp_path), "models"),
            results_dir=os.path.join(str(tmp_path), "results"),
            save_every_epoch=False,
        ),
    )
    return cfg


def test_unet_mse_training_decreases_loss(store, tmp_path):
    from mrisr_tpu.train import SupervisedTrainer

    cfg = _cfg("unet", tmp_path)
    trainer = SupervisedTrainer(cfg, image_size=HW)
    train_loader = build_loader(store, "train", cfg.data)
    val_loader = build_loader(store, "val", cfg.data)
    hist = trainer.fit(train_loader, val_loader, verbose=False)
    losses = hist.series["train_loss"]
    assert len(losses) == 2
    assert losses[-1] < losses[0]
    # artifacts written
    assert os.path.exists(
        os.path.join(cfg.train.results_dir, "unet_history.json")
    )
    assert os.path.isdir(os.path.join(cfg.train.checkpoint_dir, "unet_best"))


def test_checkpoint_roundtrip(store, tmp_path):
    from mrisr_tpu.train import SupervisedTrainer

    cfg = _cfg("unet", tmp_path)
    trainer = SupervisedTrainer(cfg, image_size=HW)
    loader = build_loader(store, "train", cfg.data)
    trainer.fit(loader, None, epochs=1, verbose=False)
    pred_before = trainer.predict(jnp.zeros((1, *HW, 2)))

    trainer2 = SupervisedTrainer(cfg, image_size=HW)
    trainer2.load(os.path.join(cfg.train.checkpoint_dir, "unet_latest"))
    pred_after = trainer2.predict(jnp.zeros((1, *HW, 2)))
    np.testing.assert_allclose(
        np.asarray(pred_before), np.asarray(pred_after), atol=1e-6
    )
    assert trainer2.start_epoch == 2


def test_combined_loss_training(store, tmp_path):
    from mrisr_tpu.losses.vgg import make_perceptual_fn
    from mrisr_tpu.train import SupervisedTrainer

    cfg = _cfg("unet_combined", tmp_path)
    trainer = SupervisedTrainer(
        cfg, perceptual_fn=make_perceptual_fn(), image_size=HW
    )
    loader = build_loader(store, "train", cfg.data)
    hist = trainer.fit(loader, None, epochs=1, verbose=False)
    assert "train_mse" in hist.series
    assert "train_ssim" in hist.series
    assert "train_perceptual" in hist.series


@pytest.mark.slow
def test_deepcnn_training(store, tmp_path):
    from mrisr_tpu.train import SupervisedTrainer

    cfg = _cfg("deepcnn", tmp_path)
    trainer = SupervisedTrainer(cfg, image_size=HW)
    loader = build_loader(store, "train", cfg.data)
    hist = trainer.fit(loader, None, epochs=1, verbose=False)
    assert np.isfinite(hist.series["train_loss"][0])


def test_progressive_training(store, tmp_path):
    from mrisr_tpu.train import SupervisedTrainer

    cfg = _cfg("progressive_unet", tmp_path)
    trainer = SupervisedTrainer(cfg, image_size=HW)
    loader = build_loader(store, "train", cfg.data, kind="window")
    hist = trainer.fit(loader, None, epochs=2, verbose=False)
    assert "train_i1" in hist.series and "train_i2" in hist.series
    assert hist.series["train_loss"][-1] < hist.series["train_loss"][0]


def test_gan_training_runs(store, tmp_path):
    from mrisr_tpu.train import GANTrainer

    cfg = _cfg("unet_gan", tmp_path)
    trainer = GANTrainer(cfg, image_size=HW)
    loader = build_loader(store, "train", cfg.data)
    hist = trainer.fit(loader, None, epochs=1, verbose=False)
    # per-loss histories, matching unet_gan_history.json keys
    for k in ("train_g", "train_d", "train_l1", "train_adv"):
        assert k in hist.series, hist.series.keys()
    pred = trainer.predict(jnp.zeros((2, *HW, 2)))
    assert pred.shape == (2, *HW, 1)


@pytest.mark.slow
def test_diffusion_training_and_resume(store, tmp_path):
    from mrisr_tpu.train import DiffusionTrainer

    cfg = _cfg("fastddpm", tmp_path, time_dim=16)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, save_every_epoch=True)
    )
    trainer = DiffusionTrainer(cfg, image_size=HW)
    loader = build_loader(store, "train", cfg.data)
    hist = trainer.fit(loader, None, epochs=2, verbose=False)
    assert len(hist.series["train_loss"]) == 2

    # auto-resume from the per-epoch checkpoint
    trainer2 = DiffusionTrainer(cfg, image_size=HW)
    assert trainer2.try_resume()
    assert trainer2.start_epoch == 3

    # sampling produces finite output of the right shape
    cond = jnp.zeros((2, *HW, 2))
    out = trainer2.sample(cond, jax.random.PRNGKey(0))
    assert out.shape == (2, *HW, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_simple_diffusion_training_and_ddim_sampling(store, tmp_path):
    """fastddpm_simple (M10): compressed-T steps + DDIM sampling through
    the same DiffusionTrainer, reachable via its preset (VERDICT r2 #6)."""
    from mrisr_tpu.models.diffusion import FastNoiseSchedule
    from mrisr_tpu.train import DiffusionTrainer

    cfg = _cfg("fastddpm_simple", tmp_path)
    trainer = DiffusionTrainer(cfg, image_size=HW)
    assert trainer.simple
    assert isinstance(trainer.schedule, FastNoiseSchedule)
    loader = build_loader(store, "train", cfg.data)
    hist = trainer.fit(loader, None, epochs=2, verbose=False)
    assert len(hist.series["train_loss"]) == 2
    assert all(np.isfinite(v) for v in hist.series["train_loss"])

    cond = jnp.zeros((2, *HW, 2))
    out = trainer.sample(cond, jax.random.PRNGKey(0))
    assert out.shape == (2, *HW, 1)
    a = np.asarray(out)
    assert np.isfinite(a).all() and a.min() >= -1.0 and a.max() <= 1.0


def test_early_stopping(store, tmp_path):
    from mrisr_tpu.train import SupervisedTrainer

    cfg = _cfg("unet", tmp_path)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, early_stopping_patience=1)
    )
    trainer = SupervisedTrainer(cfg, image_size=HW)

    class ConstantLoader:
        """Yields identical batches; with zero targets the val loss can't
        improve after convergence of the first epochs."""

        def __init__(self, n=2):
            self.batch = jnp.zeros((4, *HW, 3))
            self.n = n

        def __iter__(self):
            return iter([self.batch] * self.n)

    hist = trainer.fit(ConstantLoader(), ConstantLoader(), epochs=10,
                       verbose=False)
    # val loss on all-zero batches quickly stops improving -> early stop
    assert len(hist.series["val_loss"]) < 10


def test_supervised_try_resume(store, tmp_path):
    from mrisr_tpu.train import SupervisedTrainer

    cfg = _cfg("unet", tmp_path)
    trainer = SupervisedTrainer(cfg, image_size=HW)
    loader = build_loader(store, "train", cfg.data)
    trainer.fit(loader, None, epochs=1, verbose=False)

    fresh = SupervisedTrainer(cfg, image_size=HW)
    assert fresh.try_resume()
    assert fresh.start_epoch == 2

    empty_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, checkpoint_dir=str(tmp_path / "nothing")
        )
    )
    assert not SupervisedTrainer(empty_cfg, image_size=HW).try_resume()


def test_resume_restores_history(store, tmp_path):
    """Resumed runs continue the history series (T7 contract)."""
    from mrisr_tpu.train import SupervisedTrainer

    cfg = _cfg("unet", tmp_path)
    t1 = SupervisedTrainer(cfg, image_size=HW)
    loader = build_loader(store, "train", cfg.data)
    t1.fit(loader, None, epochs=1, verbose=False)

    t2 = SupervisedTrainer(cfg, image_size=HW)
    assert t2.try_resume()
    t2.fit(loader, None, epochs=2, verbose=False)
    assert t2.history.series["epoch"] == [1.0, 2.0]
    assert len(t2.history.series["train_loss"]) == 2


def test_light_checkpoints_mode(store, tmp_path):
    """--light-checkpoints: best (async, flushed by fit) + one final latest,
    no per-epoch snapshots, and the saved state round-trips."""
    from mrisr_tpu.train import SupervisedTrainer

    cfg = _cfg("unet", tmp_path)
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, save_every_epoch=False, light_checkpoints=True
        ),
    )
    trainer = SupervisedTrainer(cfg, image_size=HW)
    loader = build_loader(store, "train", cfg.data)
    trainer.fit(loader, None, epochs=2, verbose=False)
    names = sorted(os.listdir(cfg.train.checkpoint_dir))
    assert "unet_best" in names and "unet_latest" in names
    assert not any("epoch_" in n for n in names), names

    pred_before = trainer.predict(jnp.zeros((1, *HW, 2)))
    trainer2 = SupervisedTrainer(cfg, image_size=HW)
    trainer2.load(os.path.join(cfg.train.checkpoint_dir, "unet_latest"))
    pred_after = trainer2.predict(jnp.zeros((1, *HW, 2)))
    np.testing.assert_allclose(
        np.asarray(pred_before), np.asarray(pred_after), atol=1e-6
    )
    assert trainer2.start_epoch == 3

"""BN folding must be numerically equivalent to the eval-mode BN forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrisr_tpu.ckpt.fold_bn import fold_unet_batchnorm
from mrisr_tpu.models import UNet


@pytest.mark.parametrize("use_bias", [True, False])
def test_folded_unet_matches_eval_forward(use_bias):
    model = UNet(features=8, use_bias=use_bias)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 2))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    # give the running stats non-trivial values by running a train step
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mutated["batch_stats"]}

    want = model.apply(variables, x, train=False)

    folded = fold_unet_batchnorm(
        variables["params"], variables["batch_stats"]
    )
    folded_model = UNet(features=8, use_bias=use_bias, use_bn=False)
    # folded tree must structurally match a fresh use_bn=False init
    init_folded = folded_model.init(jax.random.PRNGKey(2), x, train=False)
    assert jax.tree_util.tree_structure(
        folded["params"]
    ) == jax.tree_util.tree_structure(init_folded["params"])

    got = folded_model.apply(folded, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


@pytest.mark.slow
def test_api_fold_bn_matches(tmp_path):
    """load_model(fold_bn=True) must produce the same predictions as the
    unfolded model, after a short training run so stats are non-trivial."""
    import dataclasses
    import os

    from mrisr_tpu.api import load_model
    from mrisr_tpu.config import PRESETS, DataConfig, ModelConfig
    from mrisr_tpu.data.pipeline import build_loader
    from mrisr_tpu.data.synthetic import make_synthetic_store
    from mrisr_tpu.train import SupervisedTrainer

    store = make_synthetic_store(
        str(tmp_path / "s"), num_patients=8, slices_per_volume=8,
        height=32, width=32,
    )
    cfg = PRESETS["unet"]
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(batch_size=8, image_size=(32, 32)),
        model=ModelConfig(name="unet", base_features=8),
        train=dataclasses.replace(
            cfg.train, epochs=1,
            checkpoint_dir=str(tmp_path / "m"),
            results_dir=str(tmp_path / "r"),
            save_every_epoch=False,
        ),
    )
    trainer = SupervisedTrainer(cfg, image_size=(32, 32))
    trainer.fit(build_loader(store, "train", cfg.data), None, verbose=False)

    mc = ModelConfig(name="unet", base_features=8)
    plain = load_model("unet", models_dir=str(tmp_path / "m"),
                       cfg=mc, image_size=(32, 32))
    folded = load_model("unet", models_dir=str(tmp_path / "m"),
                        cfg=mc, image_size=(32, 32), fold_bn=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 32, 32))
    np.testing.assert_allclose(
        np.asarray(plain(x)), np.asarray(folded(x)), atol=2e-5, rtol=1e-4
    )

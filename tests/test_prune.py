"""Teacher-pruned student init (serve/prune.py): identity at equal width,
Network-Slimming channel selection by BN |gamma|, shape-correct slices that
run through the real student model and a distill step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrisr_tpu.config import ModelConfig, TrainConfig
from mrisr_tpu.models.registry import init_model
from mrisr_tpu.serve.prune import (
    prune_unet_teacher,
    select_channel_indices,
)

HW = (32, 32)


def _unet_vars(features, seed=0):
    model, variables, _ = init_model(
        "unet", ModelConfig(name="unet", base_features=features),
        image_size=HW, seed=seed,
    )
    return model, variables


def test_prune_identity_at_equal_width():
    """f == F keeps every channel in order: the pruned tree equals the
    teacher bit-for-bit and the forward matches."""
    t_model, t_vars = _unet_vars(8)
    _, s_vars = _unet_vars(8, seed=1)
    pruned = prune_unet_teacher(t_vars, s_vars)

    for got, want in zip(
        jax.tree_util.tree_leaves(pruned),
        jax.tree_util.tree_leaves({"params": t_vars["params"],
                                   "batch_stats": t_vars["batch_stats"]}),
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    x = jax.random.normal(jax.random.PRNGKey(2), (2, *HW, 2))
    np.testing.assert_allclose(
        np.asarray(t_model.apply(pruned, x, train=False)),
        np.asarray(t_model.apply(t_vars, x, train=False)),
        atol=1e-6,
    )


def test_prune_selects_by_bn_gamma():
    """Channels whose BN_1 |gamma| is zeroed are dropped; the survivors are
    exactly the high-|gamma| ones, in ascending order."""
    _, t_vars = _unet_vars(8)
    _, s_vars = _unet_vars(4, seed=1)

    gamma = np.array(t_vars["params"]["enc1"]["BatchNorm_1"]["scale"])
    gamma[:] = 1.0
    dead = [0, 3, 5, 6]
    gamma[dead] = 0.0
    t_vars = jax.tree_util.tree_map(lambda a: a, t_vars)  # shallow copy ok
    t_vars["params"]["enc1"]["BatchNorm_1"]["scale"] = jnp.asarray(gamma)

    idx = select_channel_indices(t_vars, s_vars["params"])
    kept = idx["enc1.out"].tolist()
    assert kept == [1, 2, 4, 7]
    assert all(k not in dead for k in kept)


def test_prune_half_width_runs_and_trains():
    """A width-4 slice of a width-8 teacher loads into the real student
    module, its BN stats come from the teacher, and one distill train step
    produces finite loss."""
    from mrisr_tpu.serve.distill import make_distill_steps
    from mrisr_tpu.train.state import create_train_state, make_optimizer

    _, t_vars = _unet_vars(8)
    s_model, s_vars = _unet_vars(4, seed=1)
    pruned = prune_unet_teacher(t_vars, s_vars)

    # shapes identical to the student template everywhere
    for got, want in zip(
        jax.tree_util.tree_leaves(pruned["params"]),
        jax.tree_util.tree_leaves(s_vars["params"]),
    ):
        assert np.asarray(got).shape == np.asarray(want).shape

    # BN stats sliced from the teacher, not re-initialized
    enc1_mean = np.asarray(pruned["batch_stats"]["enc1"]["BatchNorm_0"]["mean"])
    idx = select_channel_indices(t_vars, s_vars["params"])["enc1.mid"]
    np.testing.assert_array_equal(
        enc1_mean,
        np.asarray(t_vars["batch_stats"]["enc1"]["BatchNorm_0"]["mean"])[idx],
    )

    x = jax.random.normal(jax.random.PRNGKey(2), (2, *HW, 2))
    y = s_model.apply(
        {"params": jax.tree.map(jnp.asarray, pruned["params"]),
         "batch_stats": jax.tree.map(jnp.asarray, pruned["batch_stats"])},
        x, train=False,
    )
    assert y.shape == (2, *HW, 1)
    assert bool(jnp.all(jnp.isfinite(y)))

    state = create_train_state(
        s_model,
        {"params": jax.tree.map(jnp.asarray, pruned["params"]),
         "batch_stats": jax.tree.map(jnp.asarray, pruned["batch_stats"])},
        make_optimizer(TrainConfig()),
    )
    train_step, _ = make_distill_steps(
        lambda v: (v[..., 0:1] + v[..., 1:2]) / 2.0, alpha=1.0, donate=False
    )
    batch = jax.random.normal(jax.random.PRNGKey(3), (2, *HW, 3))
    _, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_prune_rejects_student_wider_than_teacher():
    _, t_vars = _unet_vars(4)
    _, s_vars = _unet_vars(8, seed=1)
    with pytest.raises(ValueError, match="exceeds teacher"):
        prune_unet_teacher(t_vars, s_vars)

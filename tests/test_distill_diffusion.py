"""Progressive step-distillation (serve/distill_diffusion.py).

The target math is tested through its exact invariants (a one-sub-step
teacher must produce its own x0 prediction as the target; a same-ᾱ DDIM
step must be an identity), then a tiny end-to-end round checks the driver
trains, shrinks the grid, and actually reduces the distillation loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrisr_tpu.models.diffusion import DiffusionSchedule, FastDDPMUNet
from mrisr_tpu.serve.distill_diffusion import (
    distill_sampler_round,
    grid_positions,
    make_stepdistill_steps,
    progressive_distill,
    sample_ddim_grid,
    solve_x0_target,
    subgrid_schedule,
)
from mrisr_tpu.train.state import TrainState


def tiny_model_and_schedule(n_steps=6):
    model = FastDDPMUNet(base_features=4, time_dim=8)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    schedule = DiffusionSchedule.create(
        num_timesteps=100, num_inference_steps=n_steps,
        beta_schedule="cosine", selection="linspace",
    )
    return model, variables["params"], schedule


def test_grid_positions():
    np.testing.assert_array_equal(grid_positions(10, 2), [1, 3, 5, 7, 9])
    np.testing.assert_array_equal(grid_positions(5, 2), [0, 2, 4])
    np.testing.assert_array_equal(grid_positions(5, 1), [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(grid_positions(10, 3), [0, 3, 6, 9])
    # always keeps the TOP noise level (sampling starts there)
    for n in range(2, 12):
        for f in (1, 2, 3, 4):
            pos = grid_positions(n, f)
            assert pos[-1] == n - 1
            assert len(pos) == -(-n // f)  # ceil


@pytest.mark.slow
def test_subgrid_schedule_keeps_tables():
    _, _, schedule = tiny_model_and_schedule(6)
    sub = subgrid_schedule(schedule, grid_positions(6, 2))
    assert sub.num_inference_steps == 3
    np.testing.assert_array_equal(
        np.asarray(sub.timesteps), np.asarray(schedule.timesteps)[[1, 3, 5]]
    )
    # full ᾱ table untouched: add_noise still indexes by ORIGINAL t values
    np.testing.assert_array_equal(
        np.asarray(sub.alphas_cumprod), np.asarray(schedule.alphas_cumprod)
    )


def test_same_alpha_ddim_step_is_identity():
    """Recomposing x from its (x0, ε) decomposition at the SAME ᾱ returns x
    exactly — the property the padded sub-steps rely on."""
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 8, 8, 1))
    eps = jax.random.normal(jax.random.fold_in(key, 1), x.shape)
    a = jnp.float32(0.37)
    x0 = (x - jnp.sqrt(1 - a) * eps) / jnp.sqrt(a)
    x_re = jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * eps
    np.testing.assert_allclose(np.asarray(x_re), np.asarray(x), atol=1e-6)


def test_solve_x0_target_one_substep_invariant():
    """With a one-sub-step teacher, the solved x0* IS the teacher's own x0
    prediction — the closed form inverts the DDIM update exactly."""
    key = jax.random.PRNGKey(2)
    x_t = jax.random.normal(key, (3, 8, 8, 1))
    eps = jax.random.normal(jax.random.fold_in(key, 1), x_t.shape)
    for a_t, a_pp in [(0.2, 0.7), (0.5, 0.9), (0.11, 1.0)]:
        x0 = (x_t - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        x_pp = jnp.sqrt(a_pp) * x0 + jnp.sqrt(1 - a_pp) * eps
        x0_star = solve_x0_target(x_t, x_pp, jnp.float32(a_t),
                                  jnp.float32(a_pp))
        np.testing.assert_allclose(
            np.asarray(x0_star), np.asarray(x0), atol=1e-4
        )


@pytest.mark.parametrize("loss_space", ["eps", "x_snr_trunc"])
def test_student_equals_teacher_has_zero_loss_at_factor_one(loss_space):
    """factor=1: the student is asked to match ONE teacher step — with
    student == teacher the loss must vanish (target math is consistent)."""
    model, params, schedule = tiny_model_and_schedule(4)

    def teacher_eps(x_in, t):
        return model.apply({"params": params}, x_in, t)

    _, eval_step = make_stepdistill_steps(
        schedule, factor=1, teacher_eps_fn=teacher_eps, loss_space=loss_space
    )
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=__import__("optax").sgd(0.0)
    )
    batch = jax.random.normal(jax.random.PRNGKey(3), (4, 16, 16, 3))
    loss = float(eval_step(state, batch, jax.random.PRNGKey(0))["loss"])
    assert loss < 1e-6, loss


def test_sample_ddim_grid_single_step_is_x0_prediction():
    model, params, schedule = tiny_model_and_schedule(5)
    sub = subgrid_schedule(schedule, [4])  # one step: straight to clean
    cond = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 2))
    key = jax.random.PRNGKey(5)
    out = sample_ddim_grid(
        lambda xi, ti: model.apply({"params": params}, xi, ti),
        cond, key, sub,
    )
    # manual: x_T ~ N(0,1); out = (x_T - sqrt(1-abar) eps)/sqrt(abar)
    x_init = jax.random.normal(key, (2, 16, 16, 1))
    t_val = sub.timesteps[0]
    eps = model.apply(
        {"params": params},
        jnp.concatenate([cond, x_init], -1),
        jnp.full((2,), t_val, jnp.int32),
    )
    a = sub.alphas_cumprod[t_val]
    manual = (x_init - jnp.sqrt(1 - a) * eps) / jnp.sqrt(a)
    # values are O(1/sqrt(abar_top)) ~ 1e4, so relative tolerance
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(manual), rtol=2e-4, atol=1e-3
    )


@pytest.mark.slow
def test_distill_round_trains_and_halves_grid():
    model, params, schedule = tiny_model_and_schedule(6)
    rng = np.random.default_rng(0)
    loader = [rng.normal(size=(4, 16, 16, 3)).astype(np.float32)
              for _ in range(3)]
    student, sub, hist = distill_sampler_round(
        model, params, schedule, loader, val_loader=loader[:1],
        factor=2, epochs=4, learning_rate=1e-3, verbose=False,
    )
    assert sub.num_inference_steps == 3
    assert len(hist["train_loss"]) == 4
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(student)
    )
    # the student samples on its subgrid with the SAME model class
    cond = jnp.zeros((2, 16, 16, 2), jnp.float32)
    out = sample_ddim_grid(
        lambda xi, ti: model.apply({"params": student}, xi, ti),
        cond, jax.random.PRNGKey(0), sub,
    )
    assert out.shape == (2, 16, 16, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_load_model_steps_pattern_roundtrip(tmp_path):
    """`<base>_steps<N>` names resolve to the base architecture + the
    sidecar's timestep grid, sampling with the DDIM-grid sampler."""
    import json

    from mrisr_tpu.api import load_model
    from mrisr_tpu.ckpt import save_checkpoint
    from mrisr_tpu.config import ModelConfig

    mcfg = ModelConfig(name="fastddpm", base_features=4, time_dim=8)
    model, params, _ = tiny_model_and_schedule()
    save_checkpoint(str(tmp_path / "fastddpm_steps3_best"),
                    {"params": params, "batch_stats": {}})
    grid = [175, 799, 999]
    (tmp_path / "fastddpm_steps3_grid.json").write_text(
        json.dumps({"base": "fastddpm", "factor": 2, "timesteps": grid})
    )
    loaded = load_model("fastddpm_steps3", models_dir=str(tmp_path),
                        cfg=mcfg, image_size=(16, 16))
    assert loaded.kind == "diffusion" and loaded.sampler == "ddim_grid"
    assert loaded.schedule.num_inference_steps == 3
    np.testing.assert_array_equal(np.asarray(loaded.schedule.timesteps), grid)
    out = loaded.predict_nhwc(jnp.zeros((2, 16, 16, 2), jnp.float32))
    assert out.shape == (2, 16, 16, 1)
    assert bool(jnp.all(jnp.isfinite(out)))

    # mismatched sidecar length is rejected, not silently mis-sampled
    save_checkpoint(str(tmp_path / "fastddpm_steps5_best"),
                    {"params": params, "batch_stats": {}})
    (tmp_path / "fastddpm_steps5_grid.json").write_text(
        json.dumps({"base": "fastddpm", "factor": 2, "timesteps": grid})
    )
    with pytest.raises(ValueError, match="timesteps"):
        load_model("fastddpm_steps5", models_dir=str(tmp_path), cfg=mcfg,
                   image_size=(16, 16))


@pytest.mark.slow
def test_load_model_steps_rejects_non_diffusion(tmp_path):
    from mrisr_tpu.api import load_model

    with pytest.raises(ValueError, match="diffusion"):
        load_model("unet_steps5", models_dir=str(tmp_path))


def test_load_model_steps_rejects_explicit_checkpoint(tmp_path):
    """An explicit checkpoint path has no grid sidecar to pair with — it
    must be rejected, not silently ignored (ADVICE r3)."""
    from mrisr_tpu.api import load_model

    with pytest.raises(ValueError, match="models_dir"):
        load_model("fastddpm_steps5", models_dir=str(tmp_path),
                   checkpoint=str(tmp_path / "some_ckpt"))


def test_load_model_steps_rejects_corrupt_sidecar(tmp_path):
    """Out-of-range or non-ascending sidecar timesteps would silently sample
    with the wrong ᾱ (clamp-indexing) — must raise (ADVICE r3)."""
    import json

    from mrisr_tpu.api import load_model
    from mrisr_tpu.ckpt import save_checkpoint
    from mrisr_tpu.config import ModelConfig

    mcfg = ModelConfig(name="fastddpm", base_features=4, time_dim=8)
    _, params, _ = tiny_model_and_schedule()
    save_checkpoint(str(tmp_path / "fastddpm_steps3_best"),
                    {"params": params, "batch_stats": {}})
    sidecar = tmp_path / "fastddpm_steps3_grid.json"

    # default num_timesteps is 1000: 1000 is out of range
    sidecar.write_text(json.dumps(
        {"base": "fastddpm", "factor": 2, "timesteps": [175, 799, 1000]}))
    with pytest.raises(ValueError, match="lie in"):
        load_model("fastddpm_steps3", models_dir=str(tmp_path), cfg=mcfg,
                   image_size=(16, 16))

    sidecar.write_text(json.dumps(
        {"base": "fastddpm", "factor": 2, "timesteps": [799, 175, 999]}))
    with pytest.raises(ValueError, match="ascending"):
        load_model("fastddpm_steps3", models_dir=str(tmp_path), cfg=mcfg,
                   image_size=(16, 16))


def test_distill_round_returns_best_val_params():
    """`_best` semantics: with a val loader, the returned params are the
    best-val epoch's snapshot, not the final epoch's (ADVICE r3).  A huge
    learning rate makes the loss sequence chaotic (non-monotone), so the
    best epoch is interior; a rerun with the same seed truncated AT that
    epoch must reproduce the returned params exactly — the training-step
    key sequence does not depend on the total epoch count."""
    model, params, schedule = tiny_model_and_schedule(4)
    rng = np.random.default_rng(2)
    loader = [rng.normal(size=(4, 16, 16, 3)).astype(np.float32)
              for _ in range(2)]

    student_full, _, hist = distill_sampler_round(
        model, params, schedule, loader, val_loader=loader[:1],
        factor=2, epochs=3, learning_rate=5.0, seed=7, verbose=False,
    )
    best_epoch = int(np.argmin(hist["val_loss"]))  # 0-indexed
    # sanity: the chaotic lr makes the FINAL epoch not the best one, so
    # best-val selection is actually distinguishable from final-epoch
    assert best_epoch != len(hist["val_loss"]) - 1

    student_trunc, _, _ = distill_sampler_round(
        model, params, schedule, loader, val_loader=loader[:1],
        factor=2, epochs=best_epoch + 1, learning_rate=5.0, seed=7,
        verbose=False,
    )
    for a, b in zip(jax.tree.leaves(student_full),
                    jax.tree.leaves(student_trunc)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_progressive_distill_chains_rounds():
    model, params, schedule = tiny_model_and_schedule(6)
    rng = np.random.default_rng(1)
    loader = [rng.normal(size=(4, 16, 16, 3)).astype(np.float32)
              for _ in range(2)]
    rounds = progressive_distill(
        model, params, schedule, loader, rounds=2, factor=2, epochs=1,
        verbose=False,
    )
    assert [r[1].num_inference_steps for r in rounds] == [3, 2]

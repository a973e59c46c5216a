"""Model zoo tests: shapes, exact parameter parity with the reference,
torch op-level parity for the tricky pieces, jit-ability.

Reference parameter counts (torch ``.parameters()``, which excludes BN
running stats — comparable to flax 'params' excluding 'batch_stats'):
  UNet 31,042,945 / UNetGenerator (bias-free) 31,037,057 /
  DeepCNN 11,173,889 / ProgressiveUNet 93,111,171 /
  UNet2D "simple" 2,162,177 (all from /root/reference/src/ModelLoader.py)
  FastDDPM (Fixed notebook) 13,899,905 at base 64
  (`notebooks/FastDDPM_Training_Fixed.ipynb:cell7` output).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrisr_tpu.config import ModelConfig
from mrisr_tpu.models import (
    DeepCNN,
    DiffusionSchedule,
    FastDDPMUNet,
    FastNoiseSchedule,
    PatchGAN,
    ProgressiveUNet,
    SimpleDiffusionUNet,
    UNet,
)
from mrisr_tpu.models.diffusion import (
    sample_ancestral,
    sample_ddim,
    timestep_embedding,
)
from mrisr_tpu.models.registry import init_model, param_count

HW = 64  # small spatial size for speed; all models are fully convolutional


def _init(model, *args, **kwargs):
    return model.init(jax.random.PRNGKey(0), *args, **kwargs)


# ----------------------------------------------------------------- shapes


def test_unet_shape_and_params():
    model = UNet()
    x = jnp.zeros((2, HW, HW, 2))
    variables = _init(model, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, HW, HW, 1)
    assert param_count(variables["params"]) == 31_042_945


def test_unet_gan_generator_params():
    model = UNet(use_bias=False)
    variables = _init(model, jnp.zeros((1, HW, HW, 2)), train=False)
    assert param_count(variables["params"]) == 31_037_057


def test_deepcnn_shape_and_params():
    model = DeepCNN()
    x = jnp.zeros((2, HW, HW, 2))
    variables = _init(model, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, HW, HW, 1)  # stride-1 everywhere: no downsampling
    assert param_count(variables["params"]) == 11_173_889


def test_progressive_shape_and_params():
    model = ProgressiveUNet()
    x = jnp.zeros((2, HW, HW, 5))
    variables = _init(model, x, train=False)
    p1, p2, p3 = model.apply(variables, x, train=False)
    assert p1.shape == p2.shape == p3.shape == (2, HW, HW, 1)
    assert param_count(variables["params"]) == 93_111_171


def test_fastddpm_shape_and_exact_params():
    model = FastDDPMUNet(base_features=64, time_dim=128)
    x = jnp.zeros((2, HW, HW, 3))
    t = jnp.zeros((2,), jnp.int32)
    variables = _init(model, x, t)
    y = model.apply(variables, x, t)
    assert y.shape == (2, HW, HW, 1)
    assert param_count(variables["params"]) == 13_899_905


def test_simple_diffusion_params():
    model = SimpleDiffusionUNet()
    x = jnp.zeros((1, HW, HW, 3))
    t = jnp.zeros((1,), jnp.int32)
    variables = _init(model, x, t)
    assert param_count(variables["params"]) == 2_162_177
    y = model.apply(variables, x, t)
    assert y.shape == (1, HW, HW, 1)


def test_patchgan_shape():
    model = PatchGAN()
    x = jnp.zeros((2, 256, 256, 3))
    variables = _init(model, x, train=False)
    y = model.apply(variables, x, train=False)
    # 70x70 PatchGAN at 256² -> 30x30 patch map
    assert y.shape == (2, 30, 30, 1)


def test_patchgan_rejects_too_small_input():
    """A <32 px input collapses the patch map to zero size — the LSGAN
    losses' mean over it would be a silent NaN, so the module raises at
    trace time instead."""
    import pytest

    model = PatchGAN()
    x = jnp.zeros((2, 16, 16, 3))
    with pytest.raises(ValueError, match="empty"):
        _init(model, x, train=False)


@pytest.mark.slow
def test_registry_init_all():
    for name in ("unet", "deepcnn", "progressive_unet", "unet_gan",
                 "fastddpm", "fastddpm_simple"):
        model, variables, kind = init_model(
            name, ModelConfig(name=name), image_size=(32, 32)
        )
        assert "params" in variables


# ------------------------------------------------- torch op-level parity


def test_convtranspose_2x2_matches_torch():
    """flax ConvTranspose(k2, s2, VALID) equals torch ConvTranspose2d(2, 2)
    when the torch weight (in, out, kh, kw) is mapped to flax HWIO with the
    spatial dims FLIPPED — the conversion rule used by ckpt/torch_convert.py
    (SURVEY.md §7 'Transposed-conv parity')."""
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 10, 12)).astype(np.float32)  # NHWC, C=12
    tw = rng.standard_normal((12, 5, 2, 2)).astype(np.float32)  # torch layout
    b = rng.standard_normal((5,)).astype(np.float32)

    from flax import linen as nn

    w_flax = tw.transpose(2, 3, 0, 1)[::-1, ::-1].copy()  # HWIO, flipped
    mod = nn.ConvTranspose(5, (2, 2), strides=(2, 2), padding="VALID")
    variables = {"params": {"kernel": jnp.asarray(w_flax), "bias": jnp.asarray(b)}}
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))

    tconv = torch.nn.ConvTranspose2d(12, 5, 2, 2)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(tw))
        tconv.bias.copy_(torch.from_numpy(b))
        want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_maxpool_3x3_s1_matches_torch():
    import torch

    from mrisr_tpu.models.blocks import max_pool_3x3_s1

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 9, 9, 3)).astype(np.float32)
    got = np.asarray(max_pool_3x3_s1(jnp.asarray(x)))
    want = (
        torch.nn.functional.max_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 1, 1
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_timestep_embedding_matches_torch_formula():
    """Both embedding variants vs direct transcription of the formulas."""
    t = np.array([0, 1, 57, 999], dtype=np.int64)
    for variant, denom_off in (("ddpm", -1), ("simple", 0)):
        dim = 128
        half = dim // 2
        denom = half + denom_off
        freqs = np.exp(-np.log(10000.0) * np.arange(half) / denom)
        args = t[:, None].astype(np.float64) * freqs[None]
        want = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
        got = np.asarray(timestep_embedding(jnp.asarray(t), dim, variant))
        np.testing.assert_allclose(got, want, atol=1e-4)


# --------------------------------------------------------------- schedules


def test_linear_beta_table():
    sch = DiffusionSchedule.create(1000, 10, "linear", "nonuniform-4060")
    betas = np.asarray(sch.betas)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    np.testing.assert_allclose(
        np.asarray(sch.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-5
    )


def test_cosine_beta_table_matches_torch():
    import torch

    sch = DiffusionSchedule.create(1000, 10, "cosine", "nonuniform-4060")
    s = 0.008
    steps = torch.arange(0, 1001, dtype=torch.float32)
    abar = torch.cos(((steps / 1000) + s) / (1 + s) * torch.pi * 0.5) ** 2
    abar = abar / abar[0]
    betas = 1.0 - (abar[1:] / abar[:-1])
    betas = torch.clamp(betas, 0.0001, 0.9999)
    # ours is computed in float64, torch's in float32 -> tail diverges ~3e-5
    np.testing.assert_allclose(
        np.asarray(sch.betas), betas.numpy(), atol=1e-4
    )


def test_nonuniform_4060_selection_exact():
    """The trained config's 10 steps (Fixed:cell5 ceil-based selection)."""
    sch = DiffusionSchedule.create(1000, 10, "linear", "nonuniform-4060")
    assert np.asarray(sch.timesteps).tolist() == [
        0, 175, 350, 525, 699, 749, 799, 849, 899, 949,
    ]


def test_uniform_and_linspace_and_paper_selection():
    sch = DiffusionSchedule.create(1000, 10, "linear", "uniform")
    assert np.asarray(sch.timesteps).tolist() == list(range(0, 1000, 100))
    sch = DiffusionSchedule.create(1000, 50, "linear", "linspace")
    ts = np.asarray(sch.timesteps)
    assert ts[0] == 0 and ts[-1] == 999 and len(ts) == 50
    sch = DiffusionSchedule.create(1000, 10, "linear", "paper10")
    assert np.asarray(sch.timesteps).tolist() == [
        0, 199, 399, 599, 699, 799, 849, 899, 949, 999,
    ]


def test_fastnoise_schedule_compressed():
    """ModelLoader FastNoiseScheduler: early [0,233,466,699] + late
    [699,759,819,879,939,999] (torch linspace().long() truncation)."""
    sch = FastNoiseSchedule.create(10)
    assert sch.T == 10
    full_betas = np.linspace(1e-4, 0.02, 1000)
    idxs = sorted([0, 233, 466, 699] + [699, 759, 819, 879, 939, 999])
    np.testing.assert_allclose(np.asarray(sch.betas), full_betas[idxs], atol=1e-8)


def test_add_noise_formula():
    sch = DiffusionSchedule.create(1000, 10, "linear", "nonuniform-4060")
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8, 8, 1))
    noise = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 1))
    t = jnp.array([0, 175, 699, 949])
    got = sch.add_noise(x0, t, noise)
    abar = np.asarray(sch.alphas_cumprod)[np.asarray(t)]
    want = (
        np.sqrt(abar)[:, None, None, None] * np.asarray(x0)
        + np.sqrt(1 - abar)[:, None, None, None] * np.asarray(noise)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


# ---------------------------------------------------------------- samplers


@pytest.fixture(scope="module")
def tiny_ddpm():
    model = FastDDPMUNet(base_features=8, time_dim=16)
    x = jnp.zeros((1, 32, 32, 3))
    t = jnp.zeros((1,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t)
    return model, variables


def test_sample_ancestral_runs_and_shape(tiny_ddpm):
    model, variables = tiny_ddpm
    sch = DiffusionSchedule.create(1000, 10, "linear", "nonuniform-4060")
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 2))

    def eps_fn(x_in, t):
        return model.apply(variables, x_in, t)

    out = jax.jit(
        lambda c, k: sample_ancestral(eps_fn, c, k, sch, combine="first")
    )(cond, jax.random.PRNGKey(3))
    assert out.shape == (2, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()

    out_mean = sample_ancestral(
        eps_fn, cond, jax.random.PRNGKey(3), sch, num_samples=3, combine="mean"
    )
    assert out_mean.shape == (2, 32, 32, 1)


def test_sample_ancestral_deterministic_given_key(tiny_ddpm):
    model, variables = tiny_ddpm
    sch = DiffusionSchedule.create(1000, 10, "linear", "nonuniform-4060")
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 2))

    def eps_fn(x_in, t):
        return model.apply(variables, x_in, t)

    a = sample_ancestral(eps_fn, cond, jax.random.PRNGKey(7), sch)
    b = sample_ancestral(eps_fn, cond, jax.random.PRNGKey(7), sch)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_ddim_runs_and_clamped(tiny_ddpm):
    model, variables = tiny_ddpm
    sch = FastNoiseSchedule.create(10)
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 2))

    def eps_fn(x_in, t):
        return model.apply(variables, x_in, t)

    out = jax.jit(lambda c, k: sample_ddim(eps_fn, c, k, sch))(
        cond, jax.random.PRNGKey(3)
    )
    assert out.shape == (2, 32, 32, 1)
    o = np.asarray(out)
    assert o.min() >= -1.0 and o.max() <= 1.0


# ------------------------------------------------------------------- BN


def test_batchnorm_updates_stats():
    model = UNet(features=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 2))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    y, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_pixel_shuffle_upconv_equals_convtranspose():
    """The default pixel-shuffle upconv must match nn.ConvTranspose(k2,s2)
    bit-for-bit on identical parameters (same tree: kernel HWIO + bias)."""
    from flax import linen as nn

    from mrisr_tpu.models.blocks import PixelShuffleUpConv

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((2, 2, 6, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))
    variables = {"params": {"kernel": w, "bias": b}}

    want = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding="VALID").apply(
        variables, x
    )
    got = PixelShuffleUpConv(4).apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_fastddpm_128_param_count():
    """base_ch=128 / time_dim=256 variant: 55,562,497 params
    (cosine/inc-channel notebooks' cell8 output, SURVEY.md M11)."""
    model = FastDDPMUNet(base_features=128, time_dim=256)
    x = jnp.zeros((1, 32, 32, 3))
    t = jnp.zeros((1,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, t)
    assert param_count(variables["params"]) == 55_562_497


@pytest.mark.slow
def test_unet_remat_matches_plain():
    """remat=True must change only the backward's memory schedule: same
    params, same loss, same gradients as the plain UNet (it feeds the
    training-batch sweep in benchmarks/train_throughput.py --remat)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 2))
    m0, m1 = UNet(features=4), UNet(features=4, remat=True)
    v = m0.init(jax.random.PRNGKey(0), x, train=False)
    # identical init: remat does not alter the param tree
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1)

    def loss_and_grads(model):
        def f(p):
            y, _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"],
            )
            return jnp.mean(jnp.square(y))

        return jax.jit(jax.value_and_grad(f))(v["params"])

    l0, g0 = loss_and_grads(m0)
    l1, g1 = loss_and_grads(m1)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

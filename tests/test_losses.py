"""Loss-math unit tests (SURVEY.md §4 test-pyramid: losses)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrisr_tpu.losses import (
    combined_loss,
    l1,
    lsgan_d_loss,
    lsgan_g_loss,
    mse,
    progressive_loss,
    ssim_loss,
)
from mrisr_tpu.losses.vgg import make_perceptual_fn


def test_mse_l1():
    a = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    b = jnp.array([[1.0, 0.0], [3.0, 8.0]])
    assert float(mse(a, b)) == pytest.approx((0 + 4 + 0 + 16) / 4)
    assert float(l1(a, b)) == pytest.approx((0 + 2 + 0 + 4) / 4)


def test_lsgan_formulas():
    d_real = jnp.array([0.8, 1.2])
    d_fake = jnp.array([0.1, -0.1])
    # D: 0.5 * (mean((real-1)^2) + mean(fake^2))
    want_d = 0.5 * (np.mean([0.04, 0.04]) + np.mean([0.01, 0.01]))
    assert float(lsgan_d_loss(d_real, d_fake)) == pytest.approx(want_d)
    # G: mean((fake-1)^2)
    want_g = np.mean([0.81, 1.21])
    assert float(lsgan_g_loss(d_fake)) == pytest.approx(want_g)
    # perfect discriminator -> D loss 0; fooled discriminator -> G loss 0
    assert float(lsgan_d_loss(jnp.ones(3), jnp.zeros(3))) == 0.0
    assert float(lsgan_g_loss(jnp.ones(3))) == 0.0


def test_ssim_loss_zero_for_identical():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16))
    assert float(ssim_loss(x, x)) == pytest.approx(0.0, abs=1e-5)


def test_ssim_loss_differentiable():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16))
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16))
    g = jax.grad(lambda p: ssim_loss(p, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_combined_loss_composition():
    key = jax.random.PRNGKey(0)
    pred = jax.random.normal(key, (2, 32, 32, 1))
    target = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))

    total_no_perc, comps = combined_loss(pred, target, perceptual_fn=None,
                                         lambda_ssim=0.3)
    assert set(comps) == {"mse", "ssim"}
    assert float(total_no_perc) == pytest.approx(
        float(comps["mse"]) + 0.3 * float(comps["ssim"]), rel=1e-6
    )

    perc = make_perceptual_fn()
    total, comps = combined_loss(pred, target, perceptual_fn=perc,
                                 lambda_perceptual=0.5, lambda_ssim=0.3)
    assert float(total) == pytest.approx(
        float(comps["mse"]) + 0.3 * float(comps["ssim"])
        + 0.5 * float(comps["perceptual"]),
        rel=1e-6,
    )


def test_perceptual_fn_properties():
    perc = make_perceptual_fn()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 1))
    y = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 1))
    assert float(perc(x, x)) == pytest.approx(0.0, abs=1e-6)
    d = float(perc(x, y))
    assert d > 0
    # deterministic fallback init: same fn twice gives the same distance
    perc2 = make_perceptual_fn()
    assert float(perc2(x, y)) == pytest.approx(d, rel=1e-6)
    # differentiable
    g = jax.grad(lambda p: perc(p, y))(x)
    assert float(jnp.abs(g).sum()) > 0


def test_progressive_loss_weights():
    key = jax.random.PRNGKey(0)
    window = jax.random.normal(key, (2, 8, 8, 5))
    p1 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    p2 = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
    p3 = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 1))
    total, comps = progressive_loss((p1, p2, p3), window,
                                    w_i1=0.5, w_i2=1.0, w_i3=0.5)
    want = (
        0.5 * float(mse(p1, window[..., 1:2]))
        + 1.0 * float(mse(p2, window[..., 2:3]))
        + 0.5 * float(mse(p3, window[..., 3:4]))
    )
    assert float(total) == pytest.approx(want, rel=1e-6)
    assert set(comps) == {"i1", "i2", "i3", "total"}


def test_vgg16_torch_weight_conversion(tmp_path):
    """torchvision-named VGG16 state dict -> npz -> perceptual fn uses it."""
    import numpy as np

    from mrisr_tpu.losses.vgg import (
        VGG16Features,
        convert_torch_vgg16,
        load_vgg16_params,
        make_perceptual_fn,
    )

    rng = np.random.default_rng(0)
    plan = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
            (10, 128, 256), (12, 256, 256), (14, 256, 256)]
    sd = {}
    for ti, cin, cout in plan:
        sd[f"features.{ti}.weight"] = rng.standard_normal(
            (cout, cin, 3, 3)).astype(np.float32) * 0.05
        sd[f"features.{ti}.bias"] = rng.standard_normal(cout).astype(np.float32)

    npz = str(tmp_path / "vgg16.npz")
    convert_torch_vgg16(sd, npz)
    variables = load_vgg16_params(npz)
    # kernels landed as HWIO with the right shapes
    assert variables["params"]["conv0"]["kernel"].shape == (3, 3, 3, 64)
    assert variables["params"]["conv6"]["kernel"].shape == (3, 3, 256, 256)

    perc_real = make_perceptual_fn(npz)
    perc_fallback = make_perceptual_fn()  # seeded random init
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 1))
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 1))
    d_real = float(perc_real(x, y))
    d_fb = float(perc_fallback(x, y))
    assert d_real > 0 and d_fb > 0
    assert d_real != pytest.approx(d_fb)  # genuinely different weights


def test_gabor_perceptual_properties():
    """Fixed Gabor/LoG distance (the weight-free default since r2):
    zero for identical images, DC-invariant, structure-sensitive, jittable."""
    from mrisr_tpu.losses.perceptual import make_gabor_perceptual_fn

    perc = make_gabor_perceptual_fn()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 64, 64, 1))
    assert float(perc(x, x)) == 0.0
    # zero-mean filters: a constant intensity shift is (nearly) invisible
    assert float(perc(x, x + 3.0)) == pytest.approx(0.0, abs=1e-4)
    # genuine structural difference is not
    y = jnp.flip(x, axis=2)
    assert float(perc(x, y)) > 1e-3
    # a blur (structure loss) registers
    blurred = jnp.asarray(
        np.stack([_np_blur(np.asarray(x[i, ..., 0])) for i in range(2)])
    )[..., None]
    assert float(perc(x, blurred)) > 1e-3
    # jit + grad clean
    g = jax.grad(lambda a: perc(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    d_jit = float(jax.jit(perc)(x, y))
    assert d_jit == pytest.approx(float(perc(x, y)), rel=1e-5)


def _np_blur(img):
    out = img.copy()
    for axis in (0, 1):
        out = (np.roll(out, 1, axis) + out + np.roll(out, -1, axis)) / 3.0
    return out


def test_perceptual_dispatcher(tmp_path, monkeypatch):
    """'auto' -> gabor without weights, vgg with; 'vgg' raises without."""
    from mrisr_tpu.losses.perceptual import make_perceptual_fn

    monkeypatch.delenv("MRISR_VGG16_NPZ", raising=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 1))
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 1))

    auto = make_perceptual_fn("auto")
    gabor = make_perceptual_fn("gabor")
    assert float(auto(x, y)) == pytest.approx(float(gabor(x, y)), rel=1e-6)

    with pytest.raises(FileNotFoundError):
        make_perceptual_fn("vgg")
    with pytest.raises(ValueError):
        make_perceptual_fn("nonsense")

    # with a weights file present, 'auto' routes to VGG
    from mrisr_tpu.losses.vgg import convert_torch_vgg16

    rng = np.random.default_rng(0)
    plan = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
            (10, 128, 256), (12, 256, 256), (14, 256, 256)]
    sd = {}
    for ti, cin, cout in plan:
        sd[f"features.{ti}.weight"] = rng.standard_normal(
            (cout, cin, 3, 3)).astype(np.float32) * 0.05
        sd[f"features.{ti}.bias"] = rng.standard_normal(cout).astype(np.float32)
    npz = str(tmp_path / "vgg16.npz")
    convert_torch_vgg16(sd, npz)
    auto_vgg = make_perceptual_fn("auto", npz_path=npz)
    assert float(auto_vgg(x, y)) != pytest.approx(float(gabor(x, y)))

"""Parity tests for the Pallas int8 upconv kernel (ops/upconv_pallas.py)
against the reference lowering (serve/quant.py:_upconv_int8, 'convt' impl):
same int8 codes out, for every decoder level shape of the M2 topology
(`/root/reference/src/ModelLoader.py:121-137`), with and without the fused
skip-concat."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrisr_tpu.ops.upconv_pallas import pack_upconv, upconv2x2_int8
from mrisr_tpu.serve.quant import _upconv_int8


def _random_entry(key, c, co):
    k1, k2, k3 = jax.random.split(key, 3)
    w = jax.random.randint(k1, (2, 2, c, co), -127, 128, jnp.int8)
    scale = jax.random.uniform(k2, (co,), jnp.float32, 0.001, 0.01)
    qbias = jax.random.uniform(k3, (co,), jnp.float32, -0.5, 0.5)
    return {"w_int8": w, "scale": scale, "qbias": qbias}


# (H, W, C, Co): upconv4..upconv1 of the M2 UNet at batch small
LEVELS = [(4, 4, 64, 32), (8, 8, 32, 16), (16, 16, 16, 8)]


@pytest.mark.parametrize("h,w,c,co", LEVELS)
def test_upconv_pallas_matches_convt(h, w, c, co):
    key = jax.random.PRNGKey(h * 100 + c)
    ent = _random_entry(key, c, co)
    x = jax.random.randint(
        jax.random.fold_in(key, 1), (2, h, w, c), -127, 128, jnp.int8
    )
    a_next = 0.037
    ref = _upconv_int8(x, ent, a_next, impl="convt")

    w2, s4, b4 = pack_upconv(
        ent["w_int8"], ent["scale"] / a_next, ent["qbias"] / a_next
    )
    got = upconv2x2_int8(x, w2, s4, b4)
    assert got.shape == ref.shape
    # identical int8 codes up to fp32 rounding order at the .5 boundary
    diff = np.abs(got.astype(np.int32) - np.asarray(ref, np.int32))
    assert (diff > 1).sum() == 0
    assert (diff == 1).mean() < 0.01


def test_upconv_pallas_fused_skip_concat():
    key = jax.random.PRNGKey(7)
    c, co, h, w = 32, 16, 8, 8
    ent = _random_entry(key, c, co)
    x = jax.random.randint(
        jax.random.fold_in(key, 1), (2, h, w, c), -127, 128, jnp.int8
    )
    skip = jax.random.randint(
        jax.random.fold_in(key, 2), (2, 2 * h, 2 * w, co), -127, 128, jnp.int8
    )
    a_next = 0.02
    w2, s4, b4 = pack_upconv(
        ent["w_int8"], ent["scale"] / a_next, ent["qbias"] / a_next
    )
    alone = upconv2x2_int8(x, w2, s4, b4)
    fused = upconv2x2_int8(x, w2, s4, b4, skip=skip)
    assert fused.shape == (2, 2 * h, 2 * w, 2 * co)
    np.testing.assert_array_equal(np.asarray(fused[..., :co]), np.asarray(alone))
    np.testing.assert_array_equal(np.asarray(fused[..., co:]), np.asarray(skip))

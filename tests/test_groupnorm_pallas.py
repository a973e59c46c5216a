"""Parity tests for the fused GroupNorm+SiLU(+int8) Pallas kernel.

The kernel (ops/groupnorm_pallas.py) must match flax.linen.GroupNorm
(epsilon=1e-5, biased variance) followed by nn.silu — and, with a
quant_scale, the symmetric int8 quantizer the serving path applies after
that chain (serve/quant_diffusion.py).  All runs interpreted on CPU; the
TPU measurement lives in benchmarks/diffusion_sampling.py --gn-impl.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mrisr_tpu.ops.groupnorm_pallas import (
    gn_pallas_eligible,
    groupnorm_silu_pallas,
)


def _ref(x, gamma, beta, groups):
    y = nn.GroupNorm(num_groups=groups, epsilon=1e-5).apply(
        {"params": {"scale": gamma, "bias": beta}}, x
    )
    return nn.silu(y)


def _case(key, b, h, w, c):
    x = jax.random.normal(key, (b, h, w, c), jnp.float32) * 3.0 + 0.5
    gamma = jax.random.normal(jax.random.fold_in(key, 1), (c,)) * 0.5 + 1.0
    beta = jax.random.normal(jax.random.fold_in(key, 2), (c,)) * 0.2
    return x, gamma, beta


@pytest.mark.parametrize(
    "b,h,w,c",
    [
        (2, 16, 32, 128),   # minimal strip
        (1, 8, 32, 256),    # single strip, two lane chunks
        (2, 32, 32, 128),   # the bottleneck-level shape class
        (1, 24, 64, 384),   # non-power-of-two H, three chunks (dec2 class)
    ],
)
def test_matches_flax_groupnorm_silu(b, h, w, c):
    groups = c // 4  # the DiffResBlock rule (models/diffusion.py)
    x, gamma, beta = _case(jax.random.PRNGKey(b * h + c), b, h, w, c)
    ref = _ref(x, gamma, beta, groups)
    y = groupnorm_silu_pallas(
        x, gamma, beta, num_groups=groups, interpret=True
    ).astype(jnp.float32)
    # bf16 emission: one output rounding step of bf16 resolution
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=0.03)


def test_int8_emission_matches_quantized_reference():
    b, h, w, c = 2, 16, 32, 256
    groups = c // 4
    x, gamma, beta = _case(jax.random.PRNGKey(7), b, h, w, c)
    ref = _ref(x, gamma, beta, groups)
    scale = float(jnp.max(jnp.abs(ref))) / 127.0
    q = groupnorm_silu_pallas(
        x, gamma, beta, num_groups=groups, quant_scale=scale, interpret=True
    )
    assert q.dtype == jnp.int8
    qref = jnp.clip(jnp.round(ref / scale), -127, 127).astype(jnp.int32)
    diff = np.abs(np.asarray(q, np.int32) - np.asarray(qref))
    # the kernel quantizes from an f32 chain, the reference from the same
    # math — only round-boundary ties may move one code
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_traced_quant_scale():
    """quant_scale may be a traced scalar (the per-step a_scale lookup)."""
    b, h, w, c = 1, 8, 32, 128
    groups = c // 4
    x, gamma, beta = _case(jax.random.PRNGKey(3), b, h, w, c)

    @jax.jit
    def go(x, s):
        return groupnorm_silu_pallas(
            x, gamma, beta, num_groups=groups, quant_scale=s, interpret=True
        )

    ref = _ref(x, gamma, beta, groups)
    s = jnp.float32(float(jnp.max(jnp.abs(ref))) / 127.0)
    q = go(x, s)
    qref = jnp.clip(jnp.round(ref / s), -127, 127).astype(jnp.int32)
    assert np.abs(np.asarray(q, np.int32) - np.asarray(qref)).max() <= 1


def test_eligibility_rules():
    gs4 = 128 // 4
    assert gn_pallas_eligible((8, 128, 128, 128), 128 // 4)
    assert gn_pallas_eligible((1, 64, 64, 768), 768 // 4)
    assert not gn_pallas_eligible((1, 64, 64, 96), 96 // 4)      # C % 128
    assert not gn_pallas_eligible((1, 64, 16, 128), gs4)         # W tile (int8)
    assert gn_pallas_eligible((1, 64, 16, 128), gs4, quantized=False)
    assert not gn_pallas_eligible((1, 12, 64, 128), gs4)         # H strip
    assert not gn_pallas_eligible((1, 256, 256, 128), gs4)       # VMEM budget
    assert gn_pallas_eligible((1, 64, 64, 128), 1)               # gs=128 | 128
    assert not gn_pallas_eligible((1, 64, 64, 384), 128)         # gs=3 !| 128


@pytest.mark.slow
def test_int8_apply_gn_impl_parity():
    """fastddpm_int8_apply(gn_impl='pallas') == ('xla') within the bf16
    GN noise floor, on a geometry where the deep sites ARE eligible."""
    from mrisr_tpu.models.diffusion import DiffusionSchedule, FastDDPMUNet
    from mrisr_tpu.serve.quant_diffusion import (
        DEEP_SITES,
        calibrate_fastddpm,
        fastddpm_int8_apply,
        quantize_fastddpm,
    )

    model = FastDDPMUNet(base_features=64, time_dim=128, dtype=jnp.bfloat16)
    hw = 64  # enc2/dec2 at 32² (C=128/256/384): eligible fused sites
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3), jnp.float32),
        jnp.zeros((1,), jnp.int32),
    )
    schedule = DiffusionSchedule.create()
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, 2))
    calib = calibrate_fastddpm(
        variables, schedule, [cond], jax.random.PRNGKey(2)
    )
    q = quantize_fastddpm(variables, calib, only=DEEP_SITES)

    x_in = jax.random.normal(jax.random.PRNGKey(3), (1, hw, hw, 3))
    t = jnp.full((1,), int(schedule.timesteps[-1]), jnp.int32)
    y_xla = fastddpm_int8_apply(q, x_in, t, gn_impl="xla")
    y_pal = fastddpm_int8_apply(q, x_in, t, gn_impl="pallas")
    # the fused path quantizes from an f32 GN/SiLU chain where the XLA
    # path rounds through bf16 first; codes may differ by 1 at a few
    # sites, feeding convs — compare eps maps at the activation scale
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_xla), atol=0.05
    )
    assert not np.allclose(np.asarray(y_pal), 0.0)

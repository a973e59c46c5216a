"""int8 serving-path quantization (serve/quant.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrisr_tpu.ckpt.fold_bn import fold_unet_batchnorm
from mrisr_tpu.models import UNet
from mrisr_tpu.serve import (
    calibrate_unet,
    quantize_unet,
    unet_int8_apply,
    unet_int8_fused_apply,
)
from mrisr_tpu.serve.quant import _unet_float_with_stats

HW = 32
F = 8


@pytest.fixture(scope="module")
def folded():
    model = UNet(features=F)
    x = jnp.zeros((1, HW, HW, 2))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return fold_unet_batchnorm(
        variables["params"], variables["batch_stats"]
    )


@pytest.fixture(scope="module")
def batch():
    return jax.random.normal(jax.random.PRNGKey(7), (4, HW, HW, 2))


def test_float_forward_matches_flax(folded, batch):
    """The explicit serving forward must equal UNet(use_bn=False).apply —
    it is the calibration reference."""
    model = UNet(features=F, use_bn=False)
    ref = model.apply(folded, batch, train=False)
    got, stats = _unet_float_with_stats(
        folded["params"], batch, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    # one absmax per conv of the 9 double-conv blocks, plus the 4 upconv
    # inputs and the final-conv input (full-int8 decoder, r3)
    assert len(stats) == 23
    assert all(float(v) > 0 for v in stats.values())


def test_int8_close_to_float(folded, batch):
    calib = calibrate_unet(folded, [batch], dtype=jnp.float32)
    q = quantize_unet(folded, calib)
    y_fp = UNet(features=F, use_bn=False).apply(folded, batch, train=False)
    y_q = jax.jit(lambda p, x: unet_int8_apply(p, x, dtype=jnp.float32))(
        q, batch
    )
    assert y_q.shape == y_fp.shape
    y_fp, y_q = np.asarray(y_fp), np.asarray(y_q)
    assert np.isfinite(y_q).all()
    rel = np.linalg.norm(y_q - y_fp) / (np.linalg.norm(y_fp) + 1e-12)
    # 8-bit weights+activations through 18 convs: a few percent is expected,
    # an order more means the scales are wrong
    assert rel < 0.15, rel


def test_int8_weight_tables(folded, batch):
    calib = calibrate_unet(folded, [batch], dtype=jnp.float32)
    q = quantize_unet(folded, calib)
    c0 = q["enc1"]["Conv_0"]
    assert c0["w_int8"].dtype == jnp.int8
    assert int(jnp.max(jnp.abs(c0["w_int8"]))) == 127  # absmax maps to 127
    assert c0["scale"].shape == (F,)
    # upconv/final carry BOTH forms: bf16 (plain path / old bundles) and
    # int8 tables (full-int8 fused decoder)
    assert q["final"]["kernel"].dtype == jnp.bfloat16
    assert q["final"]["w_int8"].dtype == jnp.int8
    assert q["upconv4"]["w_int8"].dtype == jnp.int8
    assert q["upconv4"]["w_int8"].shape == q["upconv4"]["kernel"].shape
    assert q["upconv4"]["qbias"].dtype == jnp.float32


def test_int8_fused_matches_plain(folded, batch):
    """The int8-resident-activation forward is the same quantization scheme
    as the plain path — requantization just happens in the conv epilogue —
    so both must land equally close to the float reference, and close to
    each other (they differ only by bf16 rounding of intermediates)."""
    calib = calibrate_unet(folded, [batch], dtype=jnp.float32)
    q = quantize_unet(folded, calib)
    y_fp = np.asarray(
        UNet(features=F, use_bn=False).apply(folded, batch, train=False)
    )
    y_plain = np.asarray(
        jax.jit(lambda p, x: unet_int8_apply(p, x, dtype=jnp.float32))(
            q, batch
        )
    )
    y_fused = np.asarray(
        jax.jit(lambda p, x: unet_int8_fused_apply(p, x, dtype=jnp.float32))(
            q, batch
        )
    )
    assert np.isfinite(y_fused).all()
    rel_fused = np.linalg.norm(y_fused - y_fp) / (
        np.linalg.norm(y_fp) + 1e-12
    )
    rel_plain = np.linalg.norm(y_plain - y_fp) / (
        np.linalg.norm(y_fp) + 1e-12
    )
    assert rel_fused < 0.15, rel_fused
    # no worse than the plain path (small slack for rounding differences)
    assert rel_fused < rel_plain * 1.5 + 0.01, (rel_fused, rel_plain)
    rel_pair = np.linalg.norm(y_fused - y_plain) / (
        np.linalg.norm(y_plain) + 1e-12
    )
    assert rel_pair < 0.1, rel_pair


def test_fused_full_int8_decoder(folded, batch):
    """With upconv/final calibrated, the fused path runs the decoder in
    int8 end-to-end and must stay close to float; with an r2-style calib
    (no upconv/final entries) it must fall back to the bf16 decoder and
    still work (old serving bundles)."""
    calib = calibrate_unet(folded, [batch], dtype=jnp.float32)
    assert "upconv4" in calib and "final" in calib
    y_fp = np.asarray(
        UNet(features=F, use_bn=False).apply(folded, batch, train=False)
    )

    q_full = quantize_unet(folded, calib)
    y_full = np.asarray(
        jax.jit(lambda p, x: unet_int8_fused_apply(p, x, dtype=jnp.float32))(
            q_full, batch
        )
    )
    assert np.isfinite(y_full).all()
    rel_full = np.linalg.norm(y_full - y_fp) / (np.linalg.norm(y_fp) + 1e-12)
    assert rel_full < 0.15, rel_full

    legacy_calib = {
        k: v for k, v in calib.items()
        if not (k.startswith("upconv") or k == "final")
    }
    q_legacy = quantize_unet(folded, legacy_calib)
    assert "w_int8" not in q_legacy["upconv4"]
    y_legacy = np.asarray(
        jax.jit(lambda p, x: unet_int8_fused_apply(p, x, dtype=jnp.float32))(
            q_legacy, batch
        )
    )
    rel_legacy = np.linalg.norm(y_legacy - y_fp) / (
        np.linalg.norm(y_fp) + 1e-12
    )
    assert rel_legacy < 0.15, rel_legacy
    # full int8 should not be meaningfully worse than the bf16-decoder path
    assert rel_full < rel_legacy * 1.5 + 0.02, (rel_full, rel_legacy)


def test_quantize_rejects_unfolded_tree(batch):
    """Quantizing a tree that still has BatchNorm would silently drop BN
    (the walkers only read Conv_0/Conv_1) — must raise instead."""
    model = UNet(features=F)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 2)), train=False
    )
    unfolded = {"params": variables["params"]}
    with pytest.raises(ValueError, match="BN-FOLDED"):
        calibrate_unet(unfolded, [batch])
    with pytest.raises(ValueError, match="BN-FOLDED"):
        quantize_unet(unfolded, {})


@pytest.mark.slow
def test_percentile_calibration(folded, batch):
    """p99.9 scales are <= absmax scales (outlier tail clipped) and the
    quantized forward stays finite and close to float."""
    absmax = calibrate_unet(folded, [batch])
    p999 = calibrate_unet(folded, [batch], percentile=99.9)
    assert set(absmax) == set(p999)
    for k in absmax:
        assert p999[k] <= absmax[k] + 1e-6
    q = quantize_unet(folded, p999)
    y = unet_int8_apply(q, batch)
    ref = _unet_float_with_stats(folded["params"], batch,
                                 dtype=jnp.float32)[0]
    assert np.all(np.isfinite(np.asarray(y)))
    err = float(jnp.mean(jnp.abs(y - ref))) / (
        float(jnp.mean(jnp.abs(ref))) + 1e-8)
    assert err < 0.25  # same sanity bound as the absmax-path test


def test_fused_pallas_upconvs_match_convt(folded, batch):
    """upconv_impl='pallas' (ops/upconv_pallas.py: matmul + in-VMEM phase
    shuffle + fused concat) must produce the same program output as the
    default conv_transpose lowering up to int8 rounding at .5 boundaries."""
    calib = calibrate_unet(folded, [batch], dtype=jnp.float32)
    q = quantize_unet(folded, calib)
    run = lambda impl: np.asarray(  # noqa: E731
        jax.jit(
            lambda p, x: unet_int8_fused_apply(
                p, x, dtype=jnp.float32, upconv_impl=impl
            )
        )(q, batch)
    )
    y_convt = run("convt")
    y_pallas = run("pallas")
    # off-by-one int8 codes in the upconv can propagate; demand tight
    # agreement in relative norm rather than exact codes
    rel = np.linalg.norm(y_pallas - y_convt) / (
        np.linalg.norm(y_convt) + 1e-12
    )
    assert rel < 0.02, rel


def test_fused_shared_skip_emit(folded, batch):
    """skip_emit='shared' (one int8 emission per encoder output, exact
    ratio-folded dequant at both consumers) must stay close to float and
    to the dual-emission path."""
    calib = calibrate_unet(folded, [batch], dtype=jnp.float32)
    q = quantize_unet(folded, calib)
    y_fp = np.asarray(
        UNet(features=F, use_bn=False).apply(folded, batch, train=False)
    )
    run = lambda se: np.asarray(  # noqa: E731
        jax.jit(
            lambda p, x: unet_int8_fused_apply(
                p, x, dtype=jnp.float32, skip_emit=se
            )
        )(q, batch)
    )
    y_dual, y_shared = run("dual"), run("shared")
    rel_dual = np.linalg.norm(y_dual - y_fp) / (np.linalg.norm(y_fp) + 1e-12)
    rel_shared = np.linalg.norm(y_shared - y_fp) / (
        np.linalg.norm(y_fp) + 1e-12
    )
    assert np.isfinite(y_shared).all()
    # coarser skip codes may cost a little accuracy, but the same order
    assert rel_shared < rel_dual * 2.0 + 0.02, (rel_shared, rel_dual)

    # legacy tables cannot express shared emission
    legacy = quantize_unet(
        folded,
        {k: v for k, v in calib.items()
         if not (k.startswith("upconv") or k == "final")},
    )
    with pytest.raises(ValueError, match="shared"):
        unet_int8_fused_apply(legacy, batch, skip_emit="shared")


def test_resolve_variants_reports_what_runs(folded, batch):
    """resolve_variants is the single source of truth for what the fused
    apply executes: full r3 tables resolve the default to 'shared'; legacy
    (pre-r3) tables degrade a DEFAULT 'shared' to 'dual' (there is no
    shared emission they can express); explicit choices pass through."""
    from mrisr_tpu.serve.quant import resolve_variants

    calib = calibrate_unet(folded, [batch], dtype=jnp.float32)
    q_full = quantize_unet(folded, calib)
    legacy_calib = {
        k: v for k, v in calib.items()
        if not k.startswith("upconv") and k != "final"
    }
    q_legacy = quantize_unet(folded, legacy_calib)

    assert resolve_variants(q_full) == ("convt", "shared")
    assert resolve_variants(q_legacy) == ("convt", "dual")
    assert resolve_variants(q_full, "einsum", "dual") == ("einsum", "dual")

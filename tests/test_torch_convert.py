"""Torch-checkpoint converter tests.

The strong test is end-to-end numeric parity for the UNet: a torch state
dict (synthesized with the reference's exact parameter names) is run through
BOTH a functional torch forward and our converter + flax model; outputs must
match.  This validates conv/convT layout rules, BN eval semantics, and the
converter's name mapping in one shot.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mrisr_tpu.ckpt.torch_convert import convert_torch_checkpoint
from mrisr_tpu.models import UNet
from mrisr_tpu.models.registry import init_model, param_count

FEAT = 4  # tiny UNet for speed; the name map is feature-count independent


def _rand_torch_unet_sd(rng, feat=FEAT, in_ch=2, bias=True):
    """Random torch state dict with the reference UNet's parameter names
    (`/root/reference/src/ModelLoader.py:66-145` module structure)."""
    sd = {}

    def conv(prefix, i, o, k):
        sd[f"{prefix}.weight"] = torch.tensor(
            rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.2
        )
        if bias:
            sd[f"{prefix}.bias"] = torch.tensor(
                rng.standard_normal((o,)).astype(np.float32) * 0.1
            )

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.tensor(
            (rng.standard_normal(c) * 0.1 + 1).astype(np.float32)
        )
        sd[f"{prefix}.bias"] = torch.tensor(
            rng.standard_normal(c).astype(np.float32) * 0.1
        )
        sd[f"{prefix}.running_mean"] = torch.tensor(
            rng.standard_normal(c).astype(np.float32) * 0.1
        )
        sd[f"{prefix}.running_var"] = torch.tensor(
            (np.abs(rng.standard_normal(c)) + 0.5).astype(np.float32)
        )

    def block(name, cin, cout):
        conv(f"{name}.conv.0", cin, cout, 3)
        bn(f"{name}.conv.1", cout)
        conv(f"{name}.conv.3", cout, cout, 3)
        bn(f"{name}.conv.4", cout)

    f = feat
    block("enc1", in_ch, f)
    block("enc2", f, f * 2)
    block("enc3", f * 2, f * 4)
    block("enc4", f * 4, f * 8)
    block("bottleneck", f * 8, f * 16)
    for lvl, (cin, cout) in zip(
        (4, 3, 2, 1), ((f * 16, f * 8), (f * 8, f * 4), (f * 4, f * 2), (f * 2, f))
    ):
        # ConvTranspose2d weight: (in, out, 2, 2), always has bias
        sd[f"upconv{lvl}.weight"] = torch.tensor(
            rng.standard_normal((cin, cout, 2, 2)).astype(np.float32) * 0.2
        )
        sd[f"upconv{lvl}.bias"] = torch.tensor(
            rng.standard_normal((cout,)).astype(np.float32) * 0.1
        )
        block(f"dec{lvl}", cout * 2, cout)
    conv("final_conv", f, 1, 1)
    if not bias:  # final conv keeps bias even in bias-free blocks
        sd["final_conv.bias"] = torch.tensor(
            rng.standard_normal((1,)).astype(np.float32) * 0.1
        )
    return sd


def _torch_unet_forward(sd, x):
    """Functional torch forward with the reference UNet's topology."""

    def dc(name, h):
        for ci, bi in ((0, 1), (3, 4)):
            h = F.conv2d(
                h, sd[f"{name}.conv.{ci}.weight"],
                sd.get(f"{name}.conv.{ci}.bias"), padding=1,
            )
            h = F.batch_norm(
                h, sd[f"{name}.conv.{bi}.running_mean"],
                sd[f"{name}.conv.{bi}.running_var"],
                sd[f"{name}.conv.{bi}.weight"], sd[f"{name}.conv.{bi}.bias"],
                training=False, eps=1e-5,
            )
            h = F.relu(h)
        return h

    skips = {}
    h = x
    for name in ("enc1", "enc2", "enc3", "enc4"):
        skips[name] = dc(name, h)
        h = F.max_pool2d(skips[name], 2, 2)
    h = dc("bottleneck", h)
    for lvl, enc in ((4, "enc4"), (3, "enc3"), (2, "enc2"), (1, "enc1")):
        h = F.conv_transpose2d(
            h, sd[f"upconv{lvl}.weight"], sd[f"upconv{lvl}.bias"], stride=2
        )
        h = torch.cat([h, skips[enc]], dim=1)
        h = dc(f"dec{lvl}", h)
    return F.conv2d(h, sd["final_conv.weight"], sd.get("final_conv.bias"))


def test_unet_converter_end_to_end_numeric_parity():
    rng = np.random.default_rng(0)
    sd = _rand_torch_unet_sd(rng)
    x = rng.standard_normal((2, 2, 16, 16)).astype(np.float32)

    with torch.no_grad():
        want = _torch_unet_forward(sd, torch.from_numpy(x)).numpy()

    variables = convert_torch_checkpoint("unet", sd)
    model = UNet(features=FEAT, use_bias=True)
    got = np.asarray(
        model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            train=False,
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_unet_converter_tree_matches_flax_init():
    """Converted tree must be structurally identical to a flax init."""
    import jax

    rng = np.random.default_rng(1)
    sd = _rand_torch_unet_sd(rng, feat=64)
    variables = convert_torch_checkpoint("unet", sd)
    _, init_vars, _ = init_model("unet", image_size=(16, 16))

    conv_paths = jax.tree_util.tree_structure(variables["params"])
    init_paths = jax.tree_util.tree_structure(init_vars["params"])
    assert conv_paths == init_paths
    for a, b in zip(
        jax.tree_util.tree_leaves(variables["params"]),
        jax.tree_util.tree_leaves(init_vars["params"]),
    ):
        assert a.shape == b.shape
    assert param_count(variables["params"]) == 31_042_945


def test_state_dict_layouts_unwrapped():
    rng = np.random.default_rng(2)
    sd = _rand_torch_unet_sd(rng)
    for wrap in (
        lambda d: d,
        lambda d: {"model_state_dict": d, "epoch": 3},
        lambda d: {"generator_state_dict": d},
    ):
        variables = convert_torch_checkpoint("unet", wrap(sd))
        assert "params" in variables and "batch_stats" in variables


# ------------------------------------------------------------- FastDDPM


def _rand_torch_fastddpm_sd(rng, base=8, time_dim=16, in_ch=3):
    """Random torch state dict with the Fixed-notebook FastDDPM parameter
    names (`notebooks/FastDDPM_Training_Fixed.ipynb:cell7` module structure)."""
    sd = {}

    def lin(prefix, i, o):
        sd[f"{prefix}.weight"] = torch.tensor(
            rng.standard_normal((o, i)).astype(np.float32) * 0.2
        )
        sd[f"{prefix}.bias"] = torch.tensor(
            rng.standard_normal((o,)).astype(np.float32) * 0.1
        )

    def conv(prefix, i, o, k):
        sd[f"{prefix}.weight"] = torch.tensor(
            rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.2
        )
        sd[f"{prefix}.bias"] = torch.tensor(
            rng.standard_normal((o,)).astype(np.float32) * 0.1
        )

    def gn(prefix, c):
        sd[f"{prefix}.weight"] = torch.tensor(
            (rng.standard_normal(c) * 0.1 + 1).astype(np.float32)
        )
        sd[f"{prefix}.bias"] = torch.tensor(
            rng.standard_normal(c).astype(np.float32) * 0.1
        )

    def res(name, cin, cout):
        gn(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cin, cout, 3)
        gn(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout, 3)
        lin(f"{name}.time_fc", time_dim, cout)
        if cin != cout:
            conv(f"{name}.skip", cin, cout, 1)

    lin("time_emb.fc.0", time_dim, time_dim * 2)
    lin("time_emb.fc.2", time_dim * 2, time_dim)
    conv("init_conv", in_ch, base, 3)
    res("enc1", base, base * 2)
    res("enc2", base * 2, base * 4)
    res("enc3", base * 4, base * 8)
    res("bottleneck", base * 8, base * 8)
    for lvl, (cin, cout) in ((3, (base * 8, base * 4)),
                             (2, (base * 4, base * 2)),
                             (1, (base * 2, base))):
        sd[f"upconv{lvl}.weight"] = torch.tensor(
            rng.standard_normal((cin, cout, 2, 2)).astype(np.float32) * 0.2
        )
        sd[f"upconv{lvl}.bias"] = torch.tensor(
            rng.standard_normal((cout,)).astype(np.float32) * 0.1
        )
    res("dec3", base * 4 + base * 8, base * 4)
    res("dec2", base * 2 + base * 4, base * 2)
    res("dec1", base + base * 2, base)
    gn("final.0", base)
    conv("final.2", base, 1, 3)
    return sd


def _torch_fastddpm_forward(sd, x, t, base=8, time_dim=16):
    import math

    def timestep_emb(t, dim):
        half = dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
        emb = t.float()[:, None] * emb[None, :]
        return torch.cat([torch.sin(emb), torch.cos(emb)], dim=1)

    def lin(p, h):
        return F.linear(h, sd[f"{p}.weight"], sd[f"{p}.bias"])

    t_emb = timestep_emb(t, time_dim)
    t_emb = lin("time_emb.fc.2", F.silu(lin("time_emb.fc.0", t_emb)))

    def gnorm(p, h):
        c = sd[f"{p}.weight"].shape[0]
        return F.group_norm(h, max(1, c // 4), sd[f"{p}.weight"],
                            sd[f"{p}.bias"], eps=1e-5)

    def conv(p, h, pad):
        return F.conv2d(h, sd[f"{p}.weight"], sd[f"{p}.bias"], padding=pad)

    def res(name, h):
        y = conv(f"{name}.conv1", F.silu(gnorm(f"{name}.norm1", h)), 1)
        y = y + lin(f"{name}.time_fc", t_emb)[:, :, None, None]
        y = conv(f"{name}.conv2", F.silu(gnorm(f"{name}.norm2", y)), 1)
        skip = conv(f"{name}.skip", h, 0) if f"{name}.skip.weight" in sd else h
        return y + skip

    h = conv("init_conv", x, 1)
    e1 = res("enc1", h)
    e2 = res("enc2", F.max_pool2d(e1, 2))
    e3 = res("enc3", F.max_pool2d(e2, 2))
    h = res("bottleneck", F.max_pool2d(e3, 2))
    for lvl, e in ((3, e3), (2, e2), (1, e1)):
        h = F.conv_transpose2d(h, sd[f"upconv{lvl}.weight"],
                               sd[f"upconv{lvl}.bias"], stride=2)
        h = res(f"dec{lvl}", torch.cat([h, e], dim=1))
    return conv("final.2", F.silu(gnorm("final.0", h)), 1)


def test_fastddpm_converter_end_to_end_numeric_parity():
    from mrisr_tpu.models import FastDDPMUNet

    rng = np.random.default_rng(3)
    sd = _rand_torch_fastddpm_sd(rng)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    t = np.array([7, 521], dtype=np.int64)

    with torch.no_grad():
        want = _torch_fastddpm_forward(
            sd, torch.from_numpy(x), torch.from_numpy(t)
        ).numpy()

    variables = convert_torch_checkpoint("fastddpm", sd)
    model = FastDDPMUNet(base_features=8, time_dim=16)
    got = np.asarray(
        model.apply(
            {"params": variables["params"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t),
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_fastddpm_converter_tree_matches_flax_init():
    import jax

    from mrisr_tpu.config import ModelConfig

    rng = np.random.default_rng(4)
    sd = _rand_torch_fastddpm_sd(rng, base=64, time_dim=128)
    variables = convert_torch_checkpoint("fastddpm", sd)
    _, init_vars, _ = init_model(
        "fastddpm", ModelConfig(name="fastddpm"), image_size=(16, 16)
    )
    assert jax.tree_util.tree_structure(
        variables["params"]
    ) == jax.tree_util.tree_structure(init_vars["params"])
    assert param_count(variables["params"]) == 13_899_905


# ----------------------------------------------- DeepCNN / Progressive


def _rand_torch_deepcnn_sd(rng, feat=64, in_ch=2, blocks=(2, 2, 2, 2)):
    """Random torch state dict with the reference DeepCNN's parameter names
    (`/root/reference/src/ModelLoader.py:309-377` module structure)."""
    sd = {}

    def conv(prefix, i, o, k, bias=False):
        sd[f"{prefix}.weight"] = torch.tensor(
            rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.1
        )
        if bias:
            sd[f"{prefix}.bias"] = torch.tensor(
                rng.standard_normal((o,)).astype(np.float32) * 0.1
            )

    def bn(prefix, c):
        for suffix, val in (
            ("weight", rng.standard_normal(c) * 0.1 + 1),
            ("bias", rng.standard_normal(c) * 0.1),
            ("running_mean", rng.standard_normal(c) * 0.1),
            ("running_var", np.abs(rng.standard_normal(c)) + 0.5),
        ):
            sd[f"{prefix}.{suffix}"] = torch.tensor(val.astype(np.float32))

    conv("conv1", in_ch, feat, 7)
    bn("bn1", feat)
    widths = [feat, feat * 2, feat * 4, feat * 8]
    cin = feat
    for li, (w, nb) in enumerate(zip(widths, blocks), start=1):
        for b in range(nb):
            p = f"layer{li}.{b}"
            conv(f"{p}.conv1", cin if b == 0 else w, w, 3)
            bn(f"{p}.bn1", w)
            conv(f"{p}.conv2", w, w, 3)
            bn(f"{p}.bn2", w)
            if b == 0 and cin != w:
                conv(f"{p}.downsample.0", cin, w, 1)
                bn(f"{p}.downsample.1", w)
        cin = w
    conv("output_conv", feat * 8, 1, 1, bias=True)
    return sd


def test_deepcnn_converter_tree_matches_flax_init():
    import jax

    rng = np.random.default_rng(5)
    sd = _rand_torch_deepcnn_sd(rng)
    variables = convert_torch_checkpoint("deepcnn", sd)
    _, init_vars, _ = init_model("deepcnn", image_size=(16, 16))
    assert jax.tree_util.tree_structure(
        variables["params"]
    ) == jax.tree_util.tree_structure(init_vars["params"])
    assert jax.tree_util.tree_structure(
        variables["batch_stats"]
    ) == jax.tree_util.tree_structure(init_vars["batch_stats"])
    assert param_count(variables["params"]) == 11_173_889
    # and the converted weights actually run
    from mrisr_tpu.models import DeepCNN

    y = DeepCNN().apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.zeros((1, 16, 16, 2)), train=False,
    )
    assert y.shape == (1, 16, 16, 1)


def test_progressive_converter_tree_matches_flax_init():
    import jax

    rng = np.random.default_rng(6)
    sd = {}
    for stage in ("unet1", "unet2", "unet3"):
        stage_sd = _rand_torch_unet_sd(rng, feat=64, bias=False)
        # reference UNetStage names its head 'final', not 'final_conv'
        stage_sd[f"final.weight"] = stage_sd.pop("final_conv.weight")
        stage_sd[f"final.bias"] = stage_sd.pop("final_conv.bias")
        sd.update({f"{stage}.{k}": v for k, v in stage_sd.items()})
    variables = convert_torch_checkpoint("progressive_unet", sd)
    _, init_vars, _ = init_model("progressive_unet", image_size=(16, 16))
    assert jax.tree_util.tree_structure(
        variables["params"]
    ) == jax.tree_util.tree_structure(init_vars["params"])
    assert param_count(variables["params"]) == 93_111_171


# ------------------------------------------- FastDDPM "Simple" (M10/UNet2D)


def _rand_torch_unet2d_sd(rng, base=8, time_dim=16, in_ch=3):
    """Random state dict with ModelLoader UNet2D names
    (`/root/reference/src/ModelLoader.py:536-584`)."""
    def w(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    sd = {
        "time_mlp.0.weight": w(time_dim, time_dim),
        "time_mlp.0.bias": w(time_dim),
        "time_mlp.2.weight": w(time_dim, time_dim),
        "time_mlp.2.bias": w(time_dim),
    }
    chans = {
        "inc": (in_ch + time_dim, base),
        "down1": (base, base * 2),
        "down2": (base * 2, base * 4),
        "up2": (base * 4 + base * 2, base * 2),
        "up1": (base * 2 + base, base),
    }
    for name, (ci, co) in chans.items():
        sd[f"{name}.block.0.weight"] = w(co, ci, 3, 3)
        sd[f"{name}.block.0.bias"] = w(co)
        sd[f"{name}.block.2.weight"] = w(co, co, 3, 3)
        sd[f"{name}.block.2.bias"] = w(co)
    sd["outc.weight"] = w(1, base, 1, 1)
    sd["outc.bias"] = w(1)
    return sd


def _torch_unet2d_forward(sd, x, t, base=8, time_dim=16):
    """Literal UNet2D forward per the reference source (spec under test)."""
    import math

    import torch.nn.functional as F

    def conv(h, name, pad=1):
        return F.conv2d(h, torch.from_numpy(sd[name + ".weight"]),
                        torch.from_numpy(sd[name + ".bias"]), padding=pad)

    def block(h, name):
        h = F.relu(conv(h, f"{name}.block.0"))
        return F.relu(conv(h, f"{name}.block.2"))

    half = time_dim // 2
    freqs = torch.exp(
        -math.log(10000) * torch.arange(0, half, dtype=torch.float32) / half
    )
    args = t[:, None].float() * freqs[None]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    emb = F.linear(emb, torch.from_numpy(sd["time_mlp.0.weight"]),
                   torch.from_numpy(sd["time_mlp.0.bias"]))
    emb = F.relu(emb)
    emb = F.linear(emb, torch.from_numpy(sd["time_mlp.2.weight"]),
                   torch.from_numpy(sd["time_mlp.2.bias"]))
    emb = emb[:, :, None, None].repeat(1, 1, x.shape[2], x.shape[3])
    h = torch.cat([x, emb], dim=1)

    c1 = block(h, "inc")
    c2 = block(F.max_pool2d(c1, 2), "down1")
    c3 = block(F.max_pool2d(c2, 2), "down2")
    u2 = F.interpolate(c3, scale_factor=2)
    u2 = block(torch.cat([u2, c2], dim=1), "up2")
    u1 = F.interpolate(u2, scale_factor=2)
    u1 = block(torch.cat([u1, c1], dim=1), "up1")
    return conv(u1, "outc", pad=0)


def test_fastddpm_simple_converter_numeric_parity():
    from mrisr_tpu.models import SimpleDiffusionUNet

    rng = np.random.default_rng(11)
    sd = _rand_torch_unet2d_sd(rng)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    t = np.array([3, 8], dtype=np.int64)

    with torch.no_grad():
        want = _torch_unet2d_forward(
            sd, torch.from_numpy(x), torch.from_numpy(t)
        ).numpy()

    # the ModelLoader checkpoint wraps the UNet2D under 'unet.' — the
    # converter must strip it for 'fastddpm_simple' ...
    wrapped = {f"unet.{k}": v for k, v in sd.items()}
    variables = convert_torch_checkpoint("fastddpm_simple", wrapped)
    model = SimpleDiffusionUNet(base_features=8, time_dim=16)
    got = np.asarray(
        model.apply(
            {"params": variables["params"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t),
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)

    # ... and 'fastddpm' must refuse the wrapped layout with a pointer
    import pytest

    with pytest.raises(ValueError, match="fastddpm_simple"):
        convert_torch_checkpoint("fastddpm", wrapped)

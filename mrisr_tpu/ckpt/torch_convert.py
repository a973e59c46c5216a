"""PyTorch checkpoint -> flax variables converter.

Lets users of the reference bring their trained ``.pt`` checkpoints
(``unet_best.pt``, ``deepcnn_best.pt``, ``progressive_unet_best.pt``,
``unet_gan_best.pt``, FastDDPM ``fastddpm_best.pt``) straight into this
framework.  Handles the reference's three dict layouts
(`/root/reference/src/ModelLoader.py:693-705`): ``generator_state_dict`` /
``model_state_dict`` / raw state dict.

Tensor layout rules (parity-tested in tests/test_models.py /
tests/test_torch_convert.py):
- Conv2d      (O, I, kh, kw) -> HWIO  transpose(2, 3, 1, 0)
- ConvTransp. (I, O, kh, kw) -> HWIO  transpose(2, 3, 0, 1) + spatial flip
- Linear      (O, I)         -> (I, O) transpose
- Norm weight/bias           -> scale/bias; BN running stats -> batch_stats
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _conv_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 3, 1, 0)


def _convT_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def _lin_w(t) -> np.ndarray:
    return np.asarray(t).transpose(1, 0)


def _set(tree: dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


class _Builder:
    def __init__(self, sd: Dict[str, Any]):
        self.sd = sd
        self.params: dict = {}
        self.batch_stats: dict = {}

    def conv(self, flax_path, torch_prefix, bias=True):
        _set(self.params, flax_path + ("kernel",), _conv_w(self.sd[torch_prefix + ".weight"]))
        if bias:
            _set(self.params, flax_path + ("bias",), self.sd[torch_prefix + ".bias"])

    def convT(self, flax_path, torch_prefix):
        _set(self.params, flax_path + ("kernel",), _convT_w(self.sd[torch_prefix + ".weight"]))
        _set(self.params, flax_path + ("bias",), self.sd[torch_prefix + ".bias"])

    def linear(self, flax_path, torch_prefix):
        _set(self.params, flax_path + ("kernel",), _lin_w(self.sd[torch_prefix + ".weight"]))
        _set(self.params, flax_path + ("bias",), self.sd[torch_prefix + ".bias"])

    def bn(self, flax_path, torch_prefix):
        _set(self.params, flax_path + ("scale",), self.sd[torch_prefix + ".weight"])
        _set(self.params, flax_path + ("bias",), self.sd[torch_prefix + ".bias"])
        _set(self.batch_stats, flax_path + ("mean",), self.sd[torch_prefix + ".running_mean"])
        _set(self.batch_stats, flax_path + ("var",), self.sd[torch_prefix + ".running_var"])

    def gn(self, flax_path, torch_prefix):
        _set(self.params, flax_path + ("scale",), self.sd[torch_prefix + ".weight"])
        _set(self.params, flax_path + ("bias",), self.sd[torch_prefix + ".bias"])

    def variables(self) -> dict:
        out = {"params": self.params}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out


def _double_conv(b: _Builder, flax_name: str, torch_name: str, bias: bool,
                 prefix: Tuple[str, ...] = ()):
    """UNetBlock/ProgressiveUNetBlock: torch Sequential indices
    0=conv, 1=bn, 3=conv, 4=bn (`/root/reference/src/ModelLoader.py:16-63`)."""
    base = prefix + (flax_name,)
    b.conv(base + ("Conv_0",), f"{torch_name}.conv.0", bias=bias)
    b.bn(base + ("BatchNorm_0",), f"{torch_name}.conv.1")
    b.conv(base + ("Conv_1",), f"{torch_name}.conv.3", bias=bias)
    b.bn(base + ("BatchNorm_1",), f"{torch_name}.conv.4")


def _unet_tree(sd, bias: bool, torch_prefix: str = "",
               final_name: str = "final_conv",
               flax_prefix: Tuple[str, ...] = (),
               b: Optional[_Builder] = None) -> _Builder:
    b = b or _Builder(sd)
    for enc in ("enc1", "enc2", "enc3", "enc4", "bottleneck"):
        _double_conv(b, enc, torch_prefix + enc, bias, flax_prefix)
    for lvl in (4, 3, 2, 1):
        b.convT(flax_prefix + (f"upconv{lvl}",), f"{torch_prefix}upconv{lvl}")
        _double_conv(b, f"dec{lvl}", f"{torch_prefix}dec{lvl}", bias, flax_prefix)
    b.conv(flax_prefix + ("final",), torch_prefix + final_name)
    return b


def _convert_unet(sd, bias: bool, final_name: str) -> dict:
    return _unet_tree(sd, bias, final_name=final_name).variables()


def _convert_progressive(sd) -> dict:
    b = None
    for stage in ("unet1", "unet2", "unet3"):
        b = _unet_tree(
            sd, bias=False, torch_prefix=f"{stage}.", final_name="final",
            flax_prefix=(stage,), b=b,
        )
    return b.variables()


def _convert_deepcnn(sd, num_blocks=(2, 2, 2, 2)) -> dict:
    b = _Builder(sd)
    b.conv(("conv1",), "conv1", bias=False)
    b.bn(("bn1",), "bn1")
    for layer_idx, blocks in enumerate(num_blocks, start=1):
        for blk in range(blocks):
            fl = (f"layer{layer_idx}_block{blk}",)
            tp = f"layer{layer_idx}.{blk}"
            b.conv(fl + ("conv1",), f"{tp}.conv1", bias=False)
            b.bn(fl + ("bn1",), f"{tp}.bn1")
            b.conv(fl + ("conv2",), f"{tp}.conv2", bias=False)
            b.bn(fl + ("bn2",), f"{tp}.bn2")
            if f"{tp}.downsample.0.weight" in sd:
                b.conv(fl + ("downsample_conv",), f"{tp}.downsample.0", bias=False)
                b.bn(fl + ("downsample_bn",), f"{tp}.downsample.1")
    b.conv(("output_conv",), "output_conv")
    return b.variables()


def _convert_fastddpm(sd) -> dict:
    """Notebook 'Fixed' lineage FastDDPM (Fixed:cell7 names)."""
    b = _Builder(sd)
    b.linear(("time_emb", "Dense_0"), "time_emb.fc.0")
    b.linear(("time_emb", "Dense_1"), "time_emb.fc.2")
    b.conv(("init_conv",), "init_conv")
    for res in ("enc1", "enc2", "enc3", "bottleneck", "dec3", "dec2", "dec1"):
        b.gn((res, "norm1"), f"{res}.norm1")
        b.conv((res, "conv1"), f"{res}.conv1")
        b.gn((res, "norm2"), f"{res}.norm2")
        b.conv((res, "conv2"), f"{res}.conv2")
        b.linear((res, "time_fc"), f"{res}.time_fc")
        if f"{res}.skip.weight" in sd:
            b.conv((res, "skip"), f"{res}.skip")
    for lvl in (3, 2, 1):
        b.convT((f"upconv{lvl}",), f"upconv{lvl}")
    b.gn(("final_norm",), "final.0")
    b.conv(("final_conv",), "final.2")
    return b.variables()


def _convert_fastddpm_simple(sd) -> dict:
    """ModelLoader M10 lineage (UNet2D inside the FastDDPM wrapper,
    `/root/reference/src/ModelLoader.py:536-584`): time MLP as Sequential
    indices 0/2, DoubleConv blocks as ``<name>.block.{0,2}``, 1x1 outc."""
    b = _Builder(sd)
    b.linear(("time_mlp1",), "time_mlp.0")
    b.linear(("time_mlp2",), "time_mlp.2")
    for blk in ("inc", "down1", "down2", "up2", "up1"):
        b.conv((f"{blk}_conv1",), f"{blk}.block.0")
        b.conv((f"{blk}_conv2",), f"{blk}.block.2")
    b.conv(("outc",), "outc")
    return b.variables()


def _unwrap_state_dict(checkpoint) -> Dict[str, Any]:
    if isinstance(checkpoint, dict):
        if "generator_state_dict" in checkpoint:
            return checkpoint["generator_state_dict"]
        if "model_state_dict" in checkpoint:
            return checkpoint["model_state_dict"]
    return checkpoint


def convert_torch_checkpoint(model_name: str, checkpoint) -> dict:
    """Convert a loaded torch checkpoint (any of the reference's layouts)
    into flax ``{'params': ..., 'batch_stats': ...}`` for ``model_name``.

    ``checkpoint`` may be the dict returned by ``torch.load`` or a raw state
    dict; tensors may be torch tensors or numpy arrays.
    """
    sd = _unwrap_state_dict(checkpoint)
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    name = model_name.lower()
    if name in ("unet", "unet_combined"):
        return _convert_unet(sd, bias=True, final_name="final_conv")
    if name == "unet_gan":
        return _convert_unet(sd, bias=False, final_name="final")
    if name == "progressive_unet":
        return _convert_progressive(sd)
    if name == "deepcnn":
        return _convert_deepcnn(sd)
    if name == "fastddpm":
        if any(k.startswith("unet.") for k in sd):
            # the 'unet.' wrapper exists ONLY in ModelLoader's FastDDPM
            # (M10/UNet2D lineage) — that architecture is
            # 'fastddpm_simple' here, not the trained-notebook FastDDPMUNet
            raise ValueError(
                "this checkpoint wraps a ModelLoader UNet2D ('unet.*' "
                "keys) — convert it as model 'fastddpm_simple'"
            )
        return _convert_fastddpm(sd)
    if name == "fastddpm_simple":
        if any(k.startswith("unet.") for k in sd):
            sd = {k[len("unet."):]: v for k, v in sd.items()
                  if k.startswith("unet.")}
        return _convert_fastddpm_simple(sd)
    raise ValueError(f"no torch converter for model '{model_name}'")

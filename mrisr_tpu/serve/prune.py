"""Teacher-pruned student initialization for serving distillation.

Starting the width-f student from a magnitude-pruned channel slice of the
trained width-F teacher (instead of a random init) hands distillation a
model that is already a coarse approximation of the function it must mimic.
Channel selection is Network-Slimming style (Liu et al. 2017): every conv
in this UNet family is followed by BatchNorm, which normalizes away the
conv kernel's output scale — so the signal for "does this channel matter"
is the BN scale |gamma| of the producing normalization, NOT the kernel
norm.  Upconv outputs have no BN, so they fall back to per-output-channel
kernel L2 norm.

Index-set plumbing (models/unet.py topology): each activation gets ONE
ascending index set, consumed consistently everywhere it flows —
- block intermediates (Conv_0 out -> BN_0 -> Conv_1 in),
- block outputs (Conv_1 out -> BN_1 -> pool -> next block in, AND the
  encoder skip into the matching decoder's concat),
- bottleneck out -> upconv4 in; upconv_k out -> first half of dec_k's
  concat input (the second half is the skip set offset by the teacher's
  encoder width at that level).

BN running statistics are sliced along too: they are the teacher's stats
for the kept channels, biased for the pruned net (fewer input channels per
conv), but a far better starting estimate than zeros/ones — the first
distillation epochs re-estimate them.

Reference: the reference repo has no distillation or pruning; this extends
the serving story past `/root/reference/README.md:121-130`'s fixed-width
models.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

BLOCKS = (
    "enc1", "enc2", "enc3", "enc4", "bottleneck",
    "dec4", "dec3", "dec2", "dec1",
)
UPCONVS = ("upconv4", "upconv3", "upconv2", "upconv1")
# decoder block -> (matching upconv, matching encoder skip)
DEC_INPUTS = {
    "dec4": ("upconv4", "enc4"),
    "dec3": ("upconv3", "enc3"),
    "dec2": ("upconv2", "enc2"),
    "dec1": ("upconv1", "enc1"),
}


def _topk_ascending(score: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k largest scores, in ascending index order (keeps the
    teacher's relative channel layout)."""
    if k > score.shape[0]:
        raise ValueError(
            f"student width {k} exceeds teacher width {score.shape[0]}"
        )
    return np.sort(np.argpartition(score, -k)[-k:])


def _block_widths(params: Dict, block: str) -> tuple:
    c0 = params[block]["Conv_0"]["kernel"].shape[-1]
    c1 = params[block]["Conv_1"]["kernel"].shape[-1]
    return c0, c1


def select_channel_indices(
    teacher_vars: Dict, student_params: Dict
) -> Dict[str, np.ndarray]:
    """One ascending index set per produced activation.

    Keys: ``<block>.mid`` (Conv_0 output), ``<block>.out`` (Conv_1 output),
    ``<upconv>.out``.
    """
    tp = teacher_vars["params"]
    idx: Dict[str, np.ndarray] = {}
    for blk in BLOCKS:
        k_mid, k_out = _block_widths(student_params, blk)
        g0 = np.abs(np.asarray(tp[blk]["BatchNorm_0"]["scale"]))
        g1 = np.abs(np.asarray(tp[blk]["BatchNorm_1"]["scale"]))
        idx[f"{blk}.mid"] = _topk_ascending(g0, k_mid)
        idx[f"{blk}.out"] = _topk_ascending(g1, k_out)
    for up in UPCONVS:
        w = np.asarray(tp[up]["kernel"])  # (2, 2, ci, co)
        score = np.sqrt((w.astype(np.float64) ** 2).sum(axis=(0, 1, 2)))
        k = student_params[up]["kernel"].shape[-1]
        idx[f"{up}.out"] = _topk_ascending(score, k)
    return idx


def _input_indices(
    tp: Dict, idx: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Input-channel index set per consuming layer."""
    n_in = tp["enc1"]["Conv_0"]["kernel"].shape[-2]
    ins: Dict[str, np.ndarray] = {"enc1.Conv_0": np.arange(n_in)}
    order = ("enc1", "enc2", "enc3", "enc4", "bottleneck")
    for prev, cur in zip(order[:-1], order[1:]):
        ins[f"{cur}.Conv_0"] = idx[f"{prev}.out"]  # max-pool keeps channels
    for blk in BLOCKS:
        ins[f"{blk}.Conv_1"] = idx[f"{blk}.mid"]
    ins["upconv4"] = idx["bottleneck.out"]
    for k in (3, 2, 1):
        ins[f"upconv{k}"] = idx[f"dec{k + 1}.out"]
    for dec, (up, skip) in DEC_INPUTS.items():
        up_width = tp[up]["kernel"].shape[-1]
        ins[f"{dec}.Conv_0"] = np.concatenate(
            [idx[f"{up}.out"], up_width + idx[f"{skip}.out"]]
        )
    ins["final"] = idx["dec1.out"]
    return ins


def prune_unet_teacher(teacher_vars: Dict, student_vars: Dict) -> Dict:
    """Magnitude-pruned teacher slice shaped like ``student_vars``.

    teacher_vars: UNFOLDED trained teacher ({'params', 'batch_stats'}).
    student_vars: the student's init tree (shape template).
    Returns a new {'params', 'batch_stats'} tree (float32 numpy-backed).
    """
    tp, tbs = teacher_vars["params"], teacher_vars["batch_stats"]
    sp = student_vars["params"]
    idx = select_channel_indices(teacher_vars, sp)
    ins = _input_indices(tp, idx)

    params: Dict = {}
    stats: Dict = {}
    for blk in BLOCKS:
        blk_p: Dict = {}
        blk_s: Dict = {}
        for ci, conv in enumerate(("Conv_0", "Conv_1")):
            out = idx[f"{blk}.{'mid' if ci == 0 else 'out'}"]
            inn = ins[f"{blk}.{conv}"]
            src = tp[blk][conv]
            ent = {"kernel": np.asarray(src["kernel"])[:, :, inn][..., out]}
            if "bias" in src:
                ent["bias"] = np.asarray(src["bias"])[out]
            blk_p[conv] = ent
            bn = f"BatchNorm_{ci}"
            blk_p[bn] = {
                "scale": np.asarray(tp[blk][bn]["scale"])[out],
                "bias": np.asarray(tp[blk][bn]["bias"])[out],
            }
            blk_s[bn] = {
                "mean": np.asarray(tbs[blk][bn]["mean"])[out],
                "var": np.asarray(tbs[blk][bn]["var"])[out],
            }
        params[blk] = blk_p
        stats[blk] = blk_s
    for up in UPCONVS:
        out, inn = idx[f"{up}.out"], ins[up]
        params[up] = {
            "kernel": np.asarray(tp[up]["kernel"])[:, :, inn][..., out],
            "bias": np.asarray(tp[up]["bias"])[out],
        }
    params["final"] = {
        "kernel": np.asarray(tp["final"]["kernel"])[:, :, ins["final"], :],
        "bias": np.asarray(tp["final"]["bias"]),
    }

    # shape-check against the student template: a topology mismatch must
    # fail loudly here, not as an XLA shape error mid-training
    import jax

    def _check(path, a, b):
        if tuple(a.shape) != tuple(b.shape):
            raise ValueError(
                f"pruned tree shape mismatch at {jax.tree_util.keystr(path)}: "
                f"{a.shape} vs student {b.shape}"
            )
        return np.asarray(a, np.float32)

    params = jax.tree_util.tree_map_with_path(_check, params, sp)
    stats = jax.tree_util.tree_map_with_path(
        _check, stats, student_vars["batch_stats"]
    )
    return {"params": params, "batch_stats": stats}


def load_pruned_student_init(
    teacher_name: str,
    models_dir: str,
    student_vars: Dict,
    image_size=(256, 256),
    cfg=None,
) -> Dict:
    """Load the teacher checkpoint (unfolded) and prune it to the student
    template's widths."""
    from mrisr_tpu.api import load_model

    loaded = load_model(
        teacher_name, models_dir=models_dir, checkpoint="required",
        image_size=image_size, cfg=cfg, fold_bn=False,
    )
    if not loaded.variables.get("batch_stats"):
        raise ValueError(
            "pruned init needs the UNFOLDED teacher (with batch_stats); "
            f"{teacher_name!r} loaded without them"
        )
    return prune_unet_teacher(loaded.variables, student_vars)

"""Serving distillation: train a reduced-topology UNet student against a
trained teacher.

Why this exists (BASELINE.md "Roofline"): the exact reference M2 topology
(`/root/reference/src/ModelLoader.py:66-145`, 31 M params) costs ~94 GFLOP
per 256² slice — its bf16 single-chip ceiling on v5e is ~2.1k slices/s, so
the 5k slices/s/chip serving target is unreachable for the exact topology
no matter how well it is scheduled.  A half-width student (``features=32``,
~7.8 M params) costs ~4× less FLOPs with the same receptive field, putting
the target back inside the roofline; distilling it from the trained 31 M
teacher (instead of training from scratch) is the standard way to keep the
teacher's accuracy at serving time.  The reference has no distillation
anywhere — this is a TPU-serving addition, measured like the int8 path
(speed via ``bench.py --features``, accuracy via ``cli eval --model
unet_distilled`` — demo anchor at results_demo/unet_distilled_test_metrics.json).

Loss: ``alpha * MSE(student, teacher(x)) + (1 - alpha) * MSE(student, gt)``
— soft-target matching plus ground-truth anchoring.  The teacher runs
frozen, BN-folded, in bf16 inside the same jitted step (its forward is
~4× the student's backward cost at features=32; still one fused XLA
program, no host round-trips).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from mrisr_tpu.config import Config
from mrisr_tpu.losses import mse
from mrisr_tpu.train.steps import _apply
from mrisr_tpu.train.trainer import SupervisedTrainer


def make_distill_steps(
    teacher_fn: Callable[[jax.Array], jax.Array],
    alpha: float = 0.5,
    lambda_ssim: float = 0.0,
    ema_decay: float = 0.0,
    donate: bool = True,
    jit_steps: bool = True,
):
    """Steps for pair-input distillation: batch (B, H, W, 3).

    ``teacher_fn`` is a frozen forward ``(B, H, W, 2) -> (B, H, W, 1)``
    (its params ride along as jit constants, device-resident).  Metrics
    report the two components separately so the history JSON shows how much
    of the loss is teacher-matching vs ground truth.

    ``lambda_ssim`` adds a (1 - SSIM(student, teacher)) term — the eval
    contract is SSIM (`/root/reference/README.md:121-130`), and MSE-only
    mimicry spends the student's limited capacity on L2 rather than on the
    structure SSIM measures; same differentiable SSIM as combined_loss (T2).

    ``ema_decay`` > 0 maintains ``state.ema_params``, a per-step exponential
    moving average ``ema = d*ema + (1-d)*params`` updated inside the fused
    step (one extra fma per param, carried through scan epochs on-device).
    The EVAL step then scores the EMA weights, so best-val selection picks
    the checkpoint the serving path will actually use.  Motivation: the
    measured ±0.004 SSIM rerun spread of bf16 distillation comes from
    reduction-order noise compounding through training — averaging the
    parameter trajectory is the standard variance-kill (Polyak averaging);
    BN running stats are shared with the live weights (they track activation
    statistics, not the loss surface).
    """
    from mrisr_tpu.losses import ssim_loss

    def train_step(state, batch: jax.Array):
        inputs, target = batch[..., :2], batch[..., 2:3]
        t_pred = jax.lax.stop_gradient(teacher_fn(inputs))

        def loss_wrapped(params):
            pred, new_stats = _apply(state, params, inputs, train=True)
            l_teacher = mse(pred, t_pred)
            l_gt = mse(pred, target)
            loss = alpha * l_teacher + (1.0 - alpha) * l_gt
            comps = {"teacher_mse": l_teacher, "gt_mse": l_gt}
            if lambda_ssim:
                l_ssim = ssim_loss(pred[..., 0], t_pred[..., 0])
                loss = loss + lambda_ssim * l_ssim
                comps["ssim_loss"] = l_ssim
            return loss, (comps, new_stats)

        (loss, (comps, new_stats)), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            state = state.replace(batch_stats=new_stats)
        if ema_decay:
            state = state.replace(ema_params=jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema_params, state.params,
            ))
        return state, {"loss": loss, **comps}

    def eval_step(state, batch: jax.Array):
        inputs, target = batch[..., :2], batch[..., 2:3]
        t_pred = teacher_fn(inputs)
        eval_params = state.ema_params if ema_decay else state.params
        pred, _ = _apply(state, eval_params, inputs, train=False)
        l_teacher = mse(pred, t_pred)
        l_gt = mse(pred, target)
        loss = alpha * l_teacher + (1.0 - alpha) * l_gt
        out = {"loss": loss, "teacher_mse": l_teacher, "gt_mse": l_gt}
        if lambda_ssim:
            l_ssim = ssim_loss(pred[..., 0], t_pred[..., 0])
            out["loss"] = loss + lambda_ssim * l_ssim
            out["ssim_loss"] = l_ssim
        return out

    if not jit_steps:
        return train_step, eval_step
    donate_args = (0,) if donate else ()
    return (
        jax.jit(train_step, donate_argnums=donate_args),
        jax.jit(eval_step),
    )


def make_teacher_fn(
    teacher_name: str = "unet",
    models_dir: str = "models",
    image_size=(256, 256),
    cfg=None,
    quant: str = "none",
    calibration_batches=None,
) -> Callable[[jax.Array], jax.Array]:
    """Frozen BN-folded bf16 forward of a trained pair-model checkpoint.

    ``quant='int8'|'int8_fused'`` distills against the QUANTIZED teacher —
    the exact serving numerics (`serve/quant.py` tables calibrated on
    ``calibration_batches``, a list of (B, H, W, 2) inputs).  Rationale: a
    production fleet serves the int8_fused teacher, so a student trained to
    mimic the bf16 weights is matching a model nobody serves; targeting the
    quantized outputs folds the teacher's quantization error into the
    distillation objective instead of stacking it on top.
    """
    from mrisr_tpu.api import load_model

    loaded = load_model(
        teacher_name, models_dir=models_dir, checkpoint="required",
        image_size=image_size, cfg=cfg, fold_bn=True,
    )
    if loaded.kind != "pair":
        raise ValueError(
            f"distillation teacher must be a pair model; {teacher_name!r} "
            f"is kind={loaded.kind!r}"
        )
    if quant != "none":
        if quant not in ("int8", "int8_fused"):
            raise ValueError(f"unknown teacher quant {quant!r}")
        if not calibration_batches:
            raise ValueError("a quantized teacher needs calibration_batches")
        from mrisr_tpu.serve.quant import (
            calibrate_unet, quantize_unet, unet_int8_apply,
            unet_int8_fused_apply,
        )

        calib = calibrate_unet(loaded.variables, calibration_batches)
        qparams = quantize_unet(loaded.variables, calib)
        q_apply = (unet_int8_fused_apply if quant == "int8_fused"
                   else unet_int8_apply)

        def teacher_fn_q(x):
            return q_apply(qparams, x).astype(jnp.float32)

        return teacher_fn_q

    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        loaded.variables,
    )
    module = loaded.module

    def teacher_fn(x):
        return module.apply(variables, x, train=False).astype(jnp.float32)

    return teacher_fn


class DistillationTrainer(SupervisedTrainer):
    """SupervisedTrainer with the distillation objective swapped in.

    Everything else (epoch loop, early stopping, Orbax best/latest/per-epoch
    checkpoints, history JSON/PNG, scan-epoch device runner) is inherited —
    the student checkpoint is a regular ``<preset>_best`` that
    ``api.load_model``/the serving engine load like any other pair model.
    """

    def __init__(
        self,
        config: Config,
        teacher_fn: Optional[Callable] = None,
        teacher_name: str = "unet",
        teacher_models_dir: str = "models",
        teacher_cfg=None,
        teacher_quant: str = "none",
        teacher_calibration_batches=None,
        init_from_teacher: bool = False,
        image_size=(256, 256),
        mesh=None,
        steps_per_epoch=None,
    ):
        super().__init__(config, image_size=image_size, mesh=mesh,
                         steps_per_epoch=steps_per_epoch)
        if self.kind != "pair":
            raise ValueError("distillation supports pair models only")
        if init_from_teacher:
            # replace the random student init with a magnitude-pruned
            # channel slice of the trained teacher (serve/prune.py) —
            # distillation then fine-tunes an approximation of the teacher
            # instead of learning it from scratch
            from mrisr_tpu.serve.prune import load_pruned_student_init

            pruned = load_pruned_student_init(
                teacher_name, models_dir=teacher_models_dir,
                student_vars={"params": self.state.params,
                              "batch_stats": self.state.batch_stats},
                image_size=image_size, cfg=teacher_cfg,
            )
            self.state = self.state.replace(
                params=jax.tree.map(jnp.asarray, pruned["params"]),
                batch_stats=jax.tree.map(jnp.asarray, pruned["batch_stats"]),
            )
        if teacher_fn is None:
            teacher_fn = make_teacher_fn(
                teacher_name, models_dir=teacher_models_dir,
                image_size=image_size, cfg=teacher_cfg,
                quant=teacher_quant,
                calibration_batches=teacher_calibration_batches,
            )
        alpha = config.loss.distill_alpha
        lam_ssim = config.loss.distill_lambda_ssim
        self._ema_decay = config.loss.distill_ema
        if self._ema_decay:
            # seed the average at the init point — as a COPY: aliasing the
            # params buffers would make the donated train-step state donate
            # the same buffer twice (jit donate_argnums=(0,))
            self.state = self.state.replace(
                ema_params=jax.tree.map(jnp.copy, self.state.params)
            )
        self.train_step, self.eval_step = make_distill_steps(
            teacher_fn, alpha=alpha, lambda_ssim=lam_ssim,
            ema_decay=self._ema_decay, donate=config.train.donate_batch,
        )
        self._raw_train_step, _ = make_distill_steps(
            teacher_fn, alpha=alpha, lambda_ssim=lam_ssim,
            ema_decay=self._ema_decay, jit_steps=False
        )

    # --------------------------------------------------------------- ckpt
    # With EMA on, every checkpoint stores the EMA weights in the regular
    # ``params`` slot — that is the model the eval step scored and the one
    # api.load_model / the serving engine load from ``_best`` — and the
    # live training weights in ``live_params``, so resume restores both and
    # optimizer dynamics continue exactly.
    def _state_dict(self, epoch: int, best_loss: float) -> dict:
        d = super()._state_dict(epoch, best_loss)
        if self._ema_decay:
            d["params"] = self.state.ema_params
            d["live_params"] = self.state.params
        return d

    def load(self, path: str) -> None:
        if not self._ema_decay:
            return super().load(path)
        from mrisr_tpu.ckpt import restore_checkpoint

        template = self._state_dict(0, 0.0)
        restored = restore_checkpoint(path, template)
        self.state = self.state.replace(
            params=restored["live_params"],
            ema_params=restored["params"],
            batch_stats=restored["batch_stats"] or None,
            opt_state=restored["opt_state"],
            step=int(restored["step"]),
        )
        self.best_loss = float(restored["best_loss"])
        self.start_epoch = int(restored["epoch"]) + 1

"""Progressive step-distillation of the Fast-DDPM sampler (T=10 → 5 → 3 …).

Why this exists: diffusion serving cost is T sequential UNet forwards per
slice — the T=10 sampler measures 77 slices/s bf16 / 85.6 int8_deep at
batch 128 (docs/SERVING.md), and the per-op profile shows it already runs
at 64-72 % MFU, so the only remaining 2-3× lever is *fewer steps*, not a
faster step.  The reference's Fast-DDPM is itself the compressed-T=10
recipe (`/root/reference/src/ModelLoader.py:486-513`) with no few-step
path below that; like ``serve/distill.py`` this module is a TPU-serving
addition, measured the same way (speed via
``benchmarks/diffusion_sampling.py --num-steps``, accuracy as end-to-end
SSIM vs the teacher's own samples).

Method (standard progressive distillation, Salimans & Ho 2022, adapted to
the Fixed-lineage ``DiffusionSchedule`` grid): one student DDIM step from
grid point ``t`` straight to the point ``factor`` positions lower must
reproduce the teacher's ``factor`` consecutive DDIM sub-steps.  Given the
teacher's multi-step result ``x''`` between noise levels ᾱ_t and ᾱ'',
the unique (x0*, ε*) pair a single DDIM step needs is solved in closed
form (``solve_x0_target``) and the student — still a plain ε-prediction
``FastDDPMUNet``, so checkpoints/samplers/converters all keep working —
is regressed onto ε* (default) or onto x0* with the paper's
truncated-SNR weight.  The paper distills v-/x-parameterized models
because ε-space targets degenerate near ᾱ → 1; these grids never start
a step there (the lowest start t of the 10-step reference grid has
ᾱ ≈ 0.93, so sqrt(1-ᾱ_t) ≥ 0.27 and ε* stays bounded), while the
x-space loss DOES hit its mirror degeneracy at the top step (ᾱ ≈ 1e-5
→ 1/sqrt(ᾱ) amplification dominates every batch), so ε-space — the
objective the teacher itself was trained with — is the conditioned
choice here and the default.  Repeating rounds halves the grid each
time: 10 → 5 → 3 → 2.

Everything is one fused jitted step (teacher sub-chain + student
fwd+bwd+AdamW); the teacher rides along as jit constants in bf16.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mrisr_tpu.models.diffusion import DiffusionSchedule
from mrisr_tpu.train.state import TrainState


# --------------------------------------------------------------------- grids


def grid_positions(n_steps: int, factor: int) -> np.ndarray:
    """Student-grid positions into a length-``n_steps`` teacher grid.

    Descending from the TOP noise level every ``factor`` positions
    (sampling must start at the teacher's highest t so the x_T prior
    matches), returned ascending.  The lowest kept position pairs with
    "clean" (ᾱ = 1): its teacher sub-chain runs down through the remaining
    grid points and finishes with the final to-clean step, exactly like
    ``sample_ddim``'s last iteration.  len(result) = ceil(n_steps/factor).
    """
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    pos = np.arange(n_steps - 1, -1, -factor, dtype=np.int64)
    return pos[::-1].copy()


def subgrid_schedule(
    schedule: DiffusionSchedule, positions: Sequence[int]
) -> DiffusionSchedule:
    """The schedule a distilled student samples with: same full β/ᾱ tables,
    timesteps restricted to ``positions`` of the parent grid (ascending)."""
    pos = np.asarray(positions, dtype=np.int64)
    return DiffusionSchedule(
        betas=schedule.betas,
        alphas=schedule.alphas,
        alphas_cumprod=schedule.alphas_cumprod,
        timesteps=schedule.timesteps[pos],
    )


# ------------------------------------------------------------------- sampler


def sample_ddim_grid(
    eps_fn: Callable[[jax.Array, jax.Array], jax.Array],
    cond: jax.Array,
    key: jax.Array,
    schedule: DiffusionSchedule,
) -> jax.Array:
    """Deterministic DDIM over a ``DiffusionSchedule`` grid (Fixed-lineage
    input order ``[pre, post, x]``, original t values — the convention of
    ``sample_ancestral``, models/diffusion.py:365).

    One ``lax.scan`` over the grid descending; the final step targets
    ᾱ = 1 (the clean state), returning the x0 prediction directly.  This
    is both the distillation teacher's sub-step rule and the student's
    serving sampler.  No clamp — matches the Fixed lineage's eval
    convention (``sample_ancestral`` does not clamp either).
    """
    b, h, w, _ = cond.shape
    ts = schedule.timesteps
    n = int(ts.shape[0])
    order = jnp.arange(n - 1, -1, -1)
    t_vals = ts[order]
    abar_t = schedule.alphas_cumprod[t_vals]
    abar_next = jnp.where(
        order > 0,
        schedule.alphas_cumprod[ts[jnp.maximum(order - 1, 0)]],
        1.0,
    )
    x_init = jax.random.normal(key, (b, h, w, 1), jnp.float32)

    def step(x, per_step):
        t_val, a_cur, a_nxt = per_step
        t_batch = jnp.full((b,), t_val, jnp.int32)
        eps = eps_fn(jnp.concatenate([cond, x], axis=-1), t_batch)
        x0 = (x - jnp.sqrt(1.0 - a_cur) * eps) / jnp.sqrt(a_cur)
        x = jnp.sqrt(a_nxt) * x0 + jnp.sqrt(1.0 - a_nxt) * eps
        return x, None

    x, _ = jax.lax.scan(step, x_init, (t_vals, abar_t, abar_next))
    return x


# ------------------------------------------------------------------- targets


def solve_x0_target(x_t, x_pp, abar_t, abar_pp):
    """The x0 a single DDIM step from (x_t, ᾱ_t) to ᾱ'' must predict to
    land exactly on x''.

    From the DDIM decomposition x = sqrt(ᾱ) x0 + sqrt(1-ᾱ) ε holding at
    both noise levels with shared (x0, ε):

        x0* = (sqrt(1-ᾱ_t) x'' - sqrt(1-ᾱ'') x_t) / den,
        den = sqrt(ᾱ''(1-ᾱ_t)) - sqrt(ᾱ_t(1-ᾱ''))

    den > 0 whenever ᾱ'' > ᾱ_t (squaring both terms: ᾱ''(1-ᾱ_t) >
    ᾱ_t(1-ᾱ'') ⇔ ᾱ'' > ᾱ_t), and at ᾱ'' = 1 it reduces to sqrt(1-ᾱ_t), so the bottom
    to-clean pair needs no special case: there x0* = x'' exactly.
    Invariant (tested): with a ONE-sub-step teacher, x0* equals the
    teacher's own x0 prediction identically.
    """
    den = jnp.sqrt(abar_pp * (1.0 - abar_t)) - jnp.sqrt(
        abar_t * (1.0 - abar_pp)
    )
    return (jnp.sqrt(1.0 - abar_t) * x_pp - jnp.sqrt(1.0 - abar_pp) * x_t) / den


def _per_step_tables(schedule: DiffusionSchedule, factor: int):
    """Static per-student-step constant tables.

    For student step m starting at grid position p = spos[m], the teacher
    walks positions p, p-1, …, p-factor; positions below 0 are "clean"
    (ᾱ = 1).  A DDIM step whose target ᾱ equals its current ᾱ is an exact
    identity (recomposing with the same ᾱ returns x bit-for-bit), so
    sub-paths that bottom out early are padded with clean→clean identity
    steps and the scan stays rectangular — no data-dependent trip counts.
    """
    ts = np.asarray(schedule.timesteps)
    abar_full = np.asarray(schedule.alphas_cumprod)
    n = len(ts)
    spos = grid_positions(n, factor)
    s = len(spos)

    t_path = np.zeros((s, factor), np.int32)  # teacher sub-step t values
    abar_path = np.ones((s, factor + 1), np.float32)  # ᾱ along the sub-path
    for m, p in enumerate(spos):
        for k in range(factor + 1):
            q = p - k
            abar_path[m, k] = abar_full[ts[q]] if q >= 0 else 1.0
            if k < factor:
                t_path[m, k] = ts[q] if q >= 0 else ts[0]
    return (
        jnp.asarray(spos, jnp.int32),
        jnp.asarray(ts[spos], jnp.int32),  # start t per student step
        jnp.asarray(t_path),
        jnp.asarray(abar_path),
    )


# --------------------------------------------------------------------- steps


def make_stepdistill_steps(
    schedule: DiffusionSchedule,
    factor: int,
    teacher_eps_fn: Callable[[jax.Array, jax.Array], jax.Array],
    loss_space: str = "eps",
    donate: bool = True,
    jit_steps: bool = True,
):
    """Train/eval steps distilling ``factor`` teacher DDIM sub-steps into one
    student step.  ``teacher_eps_fn(x_in (B,H,W,3), t (B,)) -> (B,H,W,1)``
    runs frozen (bf16 params as jit constants).  Batch layout matches every
    other trainer: (B, H, W, 3) = [pre, post, middle].

    ``loss_space``: 'eps' (default) regresses the solved ε* — the same
    objective space the teacher trained in, well-conditioned on grids
    whose lowest start step is not near-clean (see module docstring);
    'x_snr_trunc' regresses x0* with the paper's ``max(SNR, 1)`` weight —
    only appropriate for model parameterizations/grids where the x-space
    target does not blow up at the top noise level.
    """
    if loss_space not in ("eps", "x_snr_trunc"):
        raise ValueError(loss_space)
    spos, t_start, t_path, abar_path = _per_step_tables(schedule, factor)
    n_student = int(spos.shape[0])

    def _teacher_chain(cond, x_t, m):
        """factor frozen DDIM sub-steps with per-sample step indices m."""
        x = x_t
        for k in range(factor):
            t_b = t_path[m, k]
            a_cur = abar_path[m, k].reshape(-1, 1, 1, 1)
            a_nxt = abar_path[m, k + 1].reshape(-1, 1, 1, 1)
            eps = teacher_eps_fn(jnp.concatenate([cond, x], axis=-1), t_b)
            x0 = (x - jnp.sqrt(1.0 - a_cur) * eps) / jnp.sqrt(a_cur)
            x = jnp.sqrt(a_nxt) * x0 + jnp.sqrt(1.0 - a_nxt) * eps
        return jax.lax.stop_gradient(x)

    def _loss(state, params, batch, m, key):
        cond, target = batch[..., :2], batch[..., 2:3]
        t_b = t_start[m]
        a_t = abar_path[m, 0].reshape(-1, 1, 1, 1)
        a_pp = abar_path[m, factor].reshape(-1, 1, 1, 1)
        noise = jax.random.normal(key, target.shape, jnp.float32)
        x_t = jnp.sqrt(a_t) * target + jnp.sqrt(1.0 - a_t) * noise
        x_pp = _teacher_chain(cond, x_t, m)
        x0_star = solve_x0_target(x_t, x_pp, a_t, a_pp)

        eps_s = state.apply_fn(
            {"params": params}, jnp.concatenate([cond, x_t], axis=-1), t_b
        )
        if loss_space == "eps":
            # ε* from the same shared decomposition as x0* — bounded while
            # sqrt(1-ᾱ_t) stays away from 0, which these grids guarantee
            eps_star = (x_t - jnp.sqrt(a_t) * x0_star) / jnp.sqrt(1.0 - a_t)
            per_sample = jnp.mean((eps_s - eps_star) ** 2, axis=(1, 2, 3))
        else:  # x_snr_trunc
            x0_s = (x_t - jnp.sqrt(1.0 - a_t) * eps_s) / jnp.sqrt(a_t)
            # truncated-SNR weighting (Salimans & Ho eq. 9): x-space MSE
            # scaled by max(SNR, 1) so near-clean steps aren't drowned out
            w = jnp.maximum(a_t / (1.0 - a_t), 1.0)
            per_sample = jnp.mean(w * (x0_s - x0_star) ** 2, axis=(1, 2, 3))
        return jnp.mean(per_sample)

    def train_step(state: TrainState, batch: jax.Array, key: jax.Array):
        b = batch.shape[0]
        k_m, k_n = jax.random.split(key)
        m = jax.random.randint(k_m, (b,), 0, n_student)
        loss, grads = jax.value_and_grad(
            lambda p: _loss(state, p, batch, m, k_n)
        )(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss}

    def eval_step(state: TrainState, batch: jax.Array, key: jax.Array):
        b = batch.shape[0]
        # fixed linspace step coverage, like the diffusion eval_step
        m = jnp.floor(jnp.linspace(0.0, n_student - 1, b)).astype(jnp.int32)
        return {"loss": _loss(state, state.params, batch, m, key)}

    if not jit_steps:
        return train_step, eval_step
    donate_args = (0,) if donate else ()
    return (
        jax.jit(train_step, donate_argnums=donate_args),
        jax.jit(eval_step),
    )


# -------------------------------------------------------------------- driver


def distill_sampler_round(
    module,
    teacher_params: Dict,
    schedule: DiffusionSchedule,
    train_loader,
    val_loader=None,
    factor: int = 2,
    epochs: int = 30,
    learning_rate: float = 2e-4,
    grad_clip_norm: float = 1.0,
    loss_space: str = "eps",
    seed: int = 0,
    verbose: bool = True,
) -> tuple[Dict, DiffusionSchedule, Dict]:
    """One distillation round: grid N → ceil(N/factor).

    Student = same ``module``, initialized FROM the teacher weights (the
    paper's recipe — the student starts as a working N-step sampler and
    only has to learn to skip).  Returns (student_params, student_schedule,
    history); the returned params are the BEST-val-loss epoch's when a
    ``val_loader`` is given (matching every other trainer's ``_best``
    semantics), else the final epoch's.  The student is a drop-in Fast-DDPM
    checkpoint that samples with ``sample_ddim_grid(…, student_schedule)``.
    """
    teacher_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        teacher_params,
    )

    def teacher_eps(x_in, t):
        return module.apply(
            {"params": teacher_bf16}, x_in, t
        ).astype(jnp.float32)

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adamw(learning_rate),
    )
    # the student starts FROM the teacher weights — as a fresh copy, because
    # the donated train step consumes the state's buffers and the caller's
    # teacher arrays must survive (they run the teacher chain / later evals)
    state = TrainState.create(
        apply_fn=module.apply,
        params=jax.tree.map(jnp.array, teacher_params),
        tx=tx,
    )
    train_step, eval_step = make_stepdistill_steps(
        schedule, factor, teacher_eps, loss_space=loss_space
    )

    key = jax.random.PRNGKey(seed)
    history: Dict[str, List[float]] = {"train_loss": [], "val_loss": []}
    # best-val selection, matching every other trainer's `_best` semantics:
    # the snapshot must be a COPY because the donated train step consumes
    # the live state's buffers on the next epoch
    best_val = float("inf")
    best_params: Optional[Dict] = None
    for epoch in range(epochs):
        losses = []
        for batch in train_loader:
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, jnp.asarray(batch), sub)
            losses.append(metrics["loss"])
        train_loss = float(jnp.mean(jnp.stack(losses)))
        history["train_loss"].append(train_loss)
        if val_loader is not None:
            vlosses = [
                eval_step(state, jnp.asarray(vb), jax.random.PRNGKey(1))[
                    "loss"
                ]
                for vb in val_loader
            ]
            val_loss = float(jnp.mean(jnp.stack(vlosses)))
            history["val_loss"].append(val_loss)
            if val_loss < best_val:
                best_val = val_loss
                best_params = jax.tree.map(jnp.array, state.params)
        if verbose:
            vmsg = (
                f" val {history['val_loss'][-1]:.5f}"
                if history["val_loss"]
                else ""
            )
            print(
                f"[distill-steps x{factor}] epoch {epoch + 1}/{epochs} "
                f"train {train_loss:.5f}{vmsg}",
                flush=True,
            )

    spos = grid_positions(int(schedule.timesteps.shape[0]), factor)
    params = best_params if best_params is not None else state.params
    return params, subgrid_schedule(schedule, spos), history


def progressive_distill(
    module,
    teacher_params: Dict,
    schedule: DiffusionSchedule,
    train_loader,
    val_loader=None,
    rounds: int = 2,
    factor: int = 2,
    epochs: int = 30,
    learning_rate: float = 2e-4,
    loss_space: str = "eps",
    seed: int = 0,
    verbose: bool = True,
):
    """Chain ``rounds`` halvings; each round's student teaches the next.

    Returns a list of (params, schedule, history) per round — callers keep
    whichever speed/accuracy point they want (10→5 is usually free, 10→3
    costs a little; measure per checkpoint).
    """
    out = []
    params, sched = teacher_params, schedule
    for r in range(rounds):
        if int(sched.timesteps.shape[0]) <= 1:
            break
        params, sched, hist = distill_sampler_round(
            module, params, sched, train_loader, val_loader,
            factor=factor, epochs=epochs, learning_rate=learning_rate,
            loss_space=loss_space, seed=seed + r, verbose=verbose,
        )
        out.append((params, sched, hist))
    return out

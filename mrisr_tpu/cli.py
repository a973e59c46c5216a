"""Command-line interface — the reference had none (notebooks were its CLI,
SURVEY.md §1); this is the end-to-end surface:

  python -m mrisr_tpu.cli extract  <zip> <out_dir>
  python -m mrisr_tpu.cli clean    <dataset_root> [--yes]
  python -m mrisr_tpu.cli pack     <dicom_root> <out_store> [--slices 60]
  python -m mrisr_tpu.cli synth    <out_store> [--patients 8]
  python -m mrisr_tpu.cli train    --preset unet --data <store> [...]
  python -m mrisr_tpu.cli eval     --model unet --data <store> [...]
  python -m mrisr_tpu.cli predict-volume --model unet --data <store> [...]
  python -m mrisr_tpu.cli bench
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _preset_base(name):
    """Preset key for a model name: step-distilled students
    ('fastddpm_steps5') resolve to their base preset's config — the
    student shares the teacher's architecture and β tables."""
    import re

    return re.sub(r"_steps\d+$", "", name)


def _add_common_train_args(p, data_required=True):
    p.add_argument("--data", required=data_required,
                   help="packed VolumeStore dir")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    # None = "not passed": the preset (or --config file) value is kept;
    # effective defaults are 256 / 'models' / 'results' via the presets
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--distance", type=int, default=None, choices=(2, 4))
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--results-dir", default=None)
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--lr", type=float, default=None,
                   help="learning rate override (default: preset value)")
    p.add_argument("--lr-schedule", default=None,
                   choices=("constant", "cosine"),
                   help="LR schedule; 'cosine' decays to 0 over the full "
                        "--epochs budget (disable early stopping with a "
                        "large --patience when using it)")
    p.add_argument("--patience", type=int, default=None,
                   help="early-stopping patience override (epochs)")
    p.add_argument("--train-seed", type=int, default=None,
                   help="training RNG seed override (init, shuffling, "
                        "augmentation; default: preset value 0) — rerun a "
                        "recipe under several seeds to measure its spread")
    p.add_argument("--light-checkpoints", action="store_true",
                   help="save only the best (async) + one final latest "
                        "checkpoint — skips the per-epoch resume snapshots "
                        "whose sync device→host fetches dominate short "
                        "epochs on slow links (sweep/campaign runs)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--backend", default="host", choices=("host", "device"))
    p.add_argument("--features", type=int, default=None,
                   help="base feature width override (default 64)")
    p.add_argument("--allow-fresh", action="store_true",
                   help="permit eval/predict with freshly initialized "
                        "weights when no checkpoint exists (default: the "
                        "CLI refuses — random-weight metrics are noise)")
    p.add_argument("--mesh-data", type=int, default=None,
                   help="data-parallel mesh axis size (-1 = all remaining "
                        "devices; default: all devices when >1 are visible)")
    p.add_argument("--mesh-model", type=int, default=None,
                   help="model (tensor-parallel) mesh axis size (default 1)")
    p.add_argument("--shard-hosts", action="store_true",
                   help="multi-host: each process loads only its own "
                        "patient shard (round-robin by patient)")


def _build_config(args, preset_name):
    from mrisr_tpu.config import Config, PRESETS

    if getattr(args, "config", None):
        with open(args.config) as f:
            cfg = Config.from_dict(json.load(f))
    else:
        cfg = PRESETS[preset_name]
    # CLI flags override only when EXPLICITLY passed (defaults are None),
    # so a --config file's image_size/checkpoint_dir/results_dir stick
    data = dataclasses.replace(
        cfg.data,
        root=args.data,
        **({"image_size": (args.image_size, args.image_size)}
           if args.image_size else {}),
        **({"batch_size": args.batch_size} if args.batch_size else {}),
        **({"distance_filter": args.distance} if args.distance else {}),
    )
    train = dataclasses.replace(
        cfg.train,
        **({"checkpoint_dir": args.checkpoint_dir}
           if args.checkpoint_dir else {}),
        **({"results_dir": args.results_dir} if args.results_dir else {}),
        **({"epochs": args.epochs} if args.epochs else {}),
        **({"compute_dtype": "bfloat16"} if args.bf16 else {}),
        **({"learning_rate": args.lr}
           if getattr(args, "lr", None) is not None else {}),
        **({"lr_schedule": args.lr_schedule}
           if getattr(args, "lr_schedule", None) else {}),
        **({"early_stopping_patience": args.patience}
           if getattr(args, "patience", None) is not None else {}),
        **({"seed": args.train_seed}
           if getattr(args, "train_seed", None) is not None else {}),
        **({"save_every_epoch": False, "light_checkpoints": True}
           if getattr(args, "light_checkpoints", False) else {}),
    )
    model = cfg.model
    if getattr(args, "features", None):
        model = dataclasses.replace(model, base_features=args.features)
    mesh = dataclasses.replace(
        cfg.mesh,
        **({"data": args.mesh_data}
           if getattr(args, "mesh_data", None) is not None else {}),
        **({"model": args.mesh_model}
           if getattr(args, "mesh_model", None) is not None else {}),
    )
    cfg = dataclasses.replace(cfg, data=data, train=train, model=model,
                              mesh=mesh)
    # reflect the effective values back onto args: several commands use
    # args.checkpoint_dir / args.results_dir directly
    args.checkpoint_dir = cfg.train.checkpoint_dir
    args.results_dir = cfg.train.results_dir
    args.image_size = cfg.data.image_size[0]
    return cfg


def _training_mesh(cfg):
    """Build the ('data', 'model') training mesh from ``cfg.mesh``
    (SURVEY.md §2.5 DP row — data parallelism is first-class in training,
    not just in tests/serving).  Returns None on a single visible device so
    the single-chip program is byte-identical to the unmeshed build.

    With the default MeshConfig (data=-1) the data axis is auto-shrunk to
    the largest divisor of the batch size, so the reference's small preset
    batches (e.g. 4) still train on a multi-chip host instead of erroring;
    an EXPLICIT --mesh-data/--mesh-model is honored strictly."""
    import math

    import jax

    from mrisr_tpu.parallel.mesh import MeshSpec, make_mesh

    explicit = cfg.mesh.data > 0 or cfg.mesh.model > 1
    if jax.device_count() == 1:
        if explicit and max(cfg.mesh.data, 1) * max(cfg.mesh.model, 1) > 1:
            # honor an explicit mesh request strictly: silently training
            # single-chip under the user's nose is worse than erroring
            raise SystemExit(
                f"--mesh-data/--mesh-model requests "
                f"{max(cfg.mesh.data, 1)}x{max(cfg.mesh.model, 1)} devices "
                f"but only 1 is visible"
            )
        return None
    if explicit:
        if cfg.mesh.data > 0:
            # an explicit mesh smaller than the host takes the first
            # data*model devices (mirrors the auto-shrink path below) —
            # so the divisibility error's own advice ("shrink the mesh
            # with --mesh-data") actually works on a big host
            n = cfg.mesh.data * max(cfg.mesh.model, 1)
            if n > jax.device_count():
                raise SystemExit(
                    f"--mesh-data/--mesh-model requests {n} devices but "
                    f"only {jax.device_count()} are visible"
                )
            mesh = make_mesh(
                MeshSpec(data=cfg.mesh.data, model=cfg.mesh.model),
                devices=jax.devices()[:n],
            )
        else:  # model-only request: data axis = all remaining devices
            mesh = make_mesh(MeshSpec(data=-1, model=cfg.mesh.model))
        n_data = mesh.shape["data"]
        if cfg.data.batch_size % n_data != 0:
            raise SystemExit(
                f"batch_size {cfg.data.batch_size} is not divisible by the "
                f"mesh's data axis ({n_data}); pass --batch-size k*{n_data} "
                "or shrink the mesh with --mesh-data"
            )
        return mesh
    n_data = math.gcd(cfg.data.batch_size, jax.device_count())
    if n_data <= 1:
        return None
    if n_data < jax.device_count():
        print(
            f"note: data axis shrunk to {n_data} of {jax.device_count()} "
            f"devices (largest divisor of batch_size "
            f"{cfg.data.batch_size}); raise --batch-size to use all chips"
        )
    devices = jax.devices()[:n_data]
    return make_mesh(MeshSpec(data=n_data, model=1), devices=devices)


def cmd_extract(args):
    from mrisr_tpu.data.extract import extract_zip

    ok, failed = extract_zip(args.zip, args.out, verbose=True)
    print(f"extracted {ok} members, {failed} failed")


def cmd_clean(args):
    from mrisr_tpu.data.clean import clean_dataset, scan_dataset

    to_delete, total = scan_dataset(args.root)
    print(f"total series: {total}; to delete: {len(to_delete)}")
    for item in to_delete[:5]:
        print(f"  {item.patient}/{item.study}/{item.series}")
    if len(to_delete) > 5:
        print(f"  ... and {len(to_delete) - 5} more")
    if args.dry_run:
        print("dry run: nothing deleted")
        return
    if not args.yes:
        answer = input("Proceed with DELETION? (yes/no): ").strip().lower()
        if answer != "yes":
            print("cancelled")
            return
    removed = clean_dataset(to_delete)
    print(f"removed {removed} series; kept {total - removed}")


def cmd_pack(args):
    from mrisr_tpu.data.volumes import VolumeStore

    store = VolumeStore.pack_dicom_tree(
        args.out, args.root, require_slices=args.slices
    )
    print(f"packed {len(store)} series -> {args.out}")


def cmd_synth(args):
    from mrisr_tpu.data.synthetic import make_synthetic_store

    store = make_synthetic_store(
        args.out, num_patients=args.patients,
        slices_per_volume=args.slices, height=args.size, width=args.size,
        seed=args.seed,
    )
    print(f"packed {len(store)} synthetic series -> {args.out}")


def cmd_train(args):
    import jax.numpy as jnp

    from mrisr_tpu.data.pipeline import build_loader
    from mrisr_tpu.data.volumes import VolumeStore

    cfg = _build_config(args, args.preset)
    store = VolumeStore.open(args.data)
    hw = cfg.data.image_size
    kind = "window" if cfg.model.name == "progressive_unet" else "triplet"
    mesh = _training_mesh(cfg)
    sharding = None
    if mesh is not None:
        from mrisr_tpu.parallel.mesh import batch_sharding

        sharding = batch_sharding(mesh)
        print(f"training mesh: {dict(mesh.shape)}")
    train_loader = build_loader(store, "train", cfg.data, kind=kind,
                                backend=args.backend, sharding=sharding,
                                shard_by_host=args.shard_hosts)
    val_loader = build_loader(store, "val", cfg.data, kind=kind,
                              backend=args.backend)

    if cfg.loss.kind == "distill":
        raise SystemExit(
            "preset 'unet_distilled' trains against a teacher checkpoint — "
            "use: python -m mrisr_tpu.cli distill --teacher unet ..."
        )
    if cfg.loss.kind == "gan":
        from mrisr_tpu.losses.perceptual import make_perceptual_fn
        from mrisr_tpu.train import GANTrainer

        trainer = GANTrainer(
            cfg, perceptual_fn=make_perceptual_fn(cfg.loss.perceptual),
            image_size=hw, mesh=mesh, steps_per_epoch=len(train_loader),
        )
    elif cfg.loss.kind == "diffusion":
        from mrisr_tpu.train import DiffusionTrainer

        trainer = DiffusionTrainer(cfg, image_size=hw, mesh=mesh,
                                   steps_per_epoch=len(train_loader))
    else:
        perceptual_fn = None
        if cfg.loss.kind == "combined":
            from mrisr_tpu.losses.perceptual import make_perceptual_fn

            perceptual_fn = make_perceptual_fn(cfg.loss.perceptual)
        from mrisr_tpu.train import SupervisedTrainer

        trainer = SupervisedTrainer(cfg, perceptual_fn=perceptual_fn,
                                    image_size=hw, mesh=mesh,
                                    steps_per_epoch=len(train_loader))
    if args.scan_epochs:
        if args.backend != "device":
            raise SystemExit("--scan-epochs requires --backend device")
        trainer.enable_device_epochs(train_loader.bank, train_loader.plan_flat)
    if args.resume and trainer.try_resume():
        print(f"resumed from epoch {trainer.start_epoch - 1}")
    hist = trainer.fit(train_loader, val_loader)
    print(f"best val loss: {hist.extra.get('best_val_loss'):.4f}")


def cmd_distill(args):
    """Serving distillation (serve/distill.py): train a reduced-width UNet
    student against a trained teacher checkpoint.  The student lands in the
    regular checkpoint layout, so `eval --model unet_distilled` and the
    serving engine pick it up like any pair model."""
    from mrisr_tpu.data.pipeline import build_loader
    from mrisr_tpu.data.volumes import VolumeStore
    from mrisr_tpu.serve.distill import DistillationTrainer

    cfg = _build_config(args, args.preset)
    loss_over = {}
    if args.distill_alpha is not None:
        loss_over["distill_alpha"] = args.distill_alpha
    if args.distill_lambda_ssim is not None:
        loss_over["distill_lambda_ssim"] = args.distill_lambda_ssim
    if args.ema is not None:
        loss_over["distill_ema"] = args.ema
    if loss_over:
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, **loss_over))
    store = VolumeStore.open(args.data)
    hw = cfg.data.image_size
    mesh = _training_mesh(cfg)
    sharding = None
    if mesh is not None:
        from mrisr_tpu.parallel.mesh import batch_sharding

        sharding = batch_sharding(mesh)
        print(f"training mesh: {dict(mesh.shape)}")
    train_loader = build_loader(store, "train", cfg.data, kind="triplet",
                                backend=args.backend, sharding=sharding,
                                shard_by_host=args.shard_hosts)
    val_loader = build_loader(store, "val", cfg.data, kind="triplet",
                              backend=args.backend)
    teacher_cfg = None
    if args.teacher_features:
        from mrisr_tpu.config import ModelConfig

        teacher_cfg = ModelConfig(
            name=args.teacher, base_features=args.teacher_features
        )
    calib_batches = None
    if args.teacher_quant != "none":
        # calibrate the quantized teacher on a handful of val inputs (same
        # convention as export-serving's bundle calibration)
        import itertools

        calib_batches = [
            b[..., :2] for b in itertools.islice(iter(val_loader), 4)
        ]
    trainer = DistillationTrainer(
        cfg,
        teacher_name=args.teacher,
        teacher_models_dir=args.teacher_dir or args.checkpoint_dir,
        teacher_cfg=teacher_cfg,
        teacher_quant=args.teacher_quant,
        teacher_calibration_batches=calib_batches,
        init_from_teacher=args.init_from_teacher,
        image_size=hw,
        mesh=mesh,
        steps_per_epoch=len(train_loader),
    )
    if args.scan_epochs:
        if args.backend != "device":
            raise SystemExit("--scan-epochs requires --backend device")
        trainer.enable_device_epochs(train_loader.bank, train_loader.plan_flat)
    if args.resume and trainer.try_resume():
        print(f"resumed from epoch {trainer.start_epoch - 1}")
    hist = trainer.fit(train_loader, val_loader)
    print(f"best val loss: {hist.extra.get('best_val_loss'):.4f}")


def cmd_distill_steps(args):
    """Progressive step-distillation of a trained Fast-DDPM checkpoint
    (serve/distill_diffusion.py): shrink the sampler grid by --factor,
    --rounds times (T=10 → 5 → 3 by default) — each round's student is one
    DDIM step per `factor` teacher sub-steps.  Rounds land as
    `<teacher>_steps<N>_best` Orbax checkpoints plus `<name>_grid.json`
    timestep sidecars, loadable by `api.load_model("fastddpm_steps5")` /
    `cli eval --model fastddpm_steps5` like any model; per-round eval
    (same fixed sampling key as the teacher's) is written next to the
    training histories."""
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.api import load_model
    from mrisr_tpu.ckpt import save_checkpoint
    from mrisr_tpu.data.pipeline import build_loader
    from mrisr_tpu.data.volumes import VolumeStore
    from mrisr_tpu.eval.runner import evaluate_pair_model_test_set
    from mrisr_tpu.models.diffusion import sample_ancestral
    from mrisr_tpu.serve.distill_diffusion import (
        progressive_distill,
        sample_ddim_grid,
    )

    from mrisr_tpu.config import PRESETS

    if args.teacher not in PRESETS or \
            PRESETS[args.teacher].loss.kind != "diffusion":
        raise SystemExit(
            f"--teacher must be a diffusion preset, got {args.teacher!r}"
        )
    cfg = _build_config(args, args.teacher)
    store = VolumeStore.open(args.data)
    hw = cfg.data.image_size
    loaded = load_model(
        args.teacher, models_dir=args.teacher_dir or args.checkpoint_dir,
        checkpoint="required", cfg=cfg.model, image_size=hw,
    )
    # on the TPU tunnel use --backend device: the slice bank uploads ONCE
    # and batches are device-side gathers (host batches move at ~5.6 MB/s
    # through the tunnel — see CLAUDE.md)
    train_loader = build_loader(store, "train", cfg.data, kind="triplet",
                                backend=args.backend)
    val_loader = build_loader(store, "val", cfg.data, kind="triplet",
                              backend=args.backend)

    rounds = progressive_distill(
        loaded.module, loaded.variables["params"], loaded.schedule,
        train_loader, val_loader, rounds=args.rounds, factor=args.factor,
        epochs=cfg.train.epochs, learning_rate=cfg.train.learning_rate,
    )

    def _eval(fn):
        jfn = jax.jit(fn)
        return evaluate_pair_model_test_set(
            jfn, store, cfg.data, max_batches=args.max_eval_batches
        )

    results = {}
    if not args.no_eval:
        results["teacher"] = _eval(
            lambda cond: sample_ancestral(
                lambda xi, ti: loaded.module.apply(loaded.variables, xi, ti),
                cond, jax.random.PRNGKey(0), loaded.schedule,
            )
        )
        print(f"teacher ({loaded.schedule.num_inference_steps} steps): "
              f"{json.dumps(results['teacher'])}")
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    os.makedirs(args.results_dir, exist_ok=True)
    for params, sched, hist in rounds:
        n = sched.num_inference_steps
        name = f"{args.teacher}_steps{n}"
        save_checkpoint(os.path.join(args.checkpoint_dir, f"{name}_best"),
                        {"params": params, "batch_stats": {}})
        with open(os.path.join(args.checkpoint_dir,
                               f"{name}_grid.json"), "w") as f:
            json.dump({"base": args.teacher, "factor": args.factor,
                       "timesteps": [int(t) for t in sched.timesteps]}, f)
        entry = {"history": hist}
        if not args.no_eval:
            module = loaded.module
            entry["eval"] = _eval(
                lambda cond, p=params, s=sched: sample_ddim_grid(
                    lambda xi, ti: module.apply({"params": p}, xi, ti),
                    cond, jax.random.PRNGKey(0), s,
                )
            )
            for sp in ("3mm", "6mm"):
                if sp in entry["eval"] and sp in results.get("teacher", {}):
                    entry["ssim_delta_vs_teacher_" + sp] = round(
                        entry["eval"][sp]["ssim_mean"]
                        - results["teacher"][sp]["ssim_mean"], 6
                    )
            print(f"{name}: {json.dumps(entry['eval'])}")
        results[name] = entry
        print(f"saved {name}_best + {name}_grid.json")
    out = os.path.join(args.results_dir,
                       f"{args.teacher}_stepdistill.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"results -> {out}")


def cmd_export_serving(args):
    """Export a trained model as a one-artifact serving bundle
    (serve/bundle.py): BN-folded + optionally int8-quantized (pair
    models), or the packaged T-step sampler (fastddpm), loadable by
    `engine_from_bundle` with no checkpoint or calibration at startup."""
    from mrisr_tpu.config import PRESETS
    from mrisr_tpu.serve.bundle import export_serving_bundle

    # step-distilled students ('fastddpm_steps5') resolve to their base
    # preset's config — same architecture and β tables as the teacher
    base = _preset_base(args.model)
    cfg = _build_config(args, base if base in PRESETS else "unet")
    calib = None
    if args.quant != "none":
        from mrisr_tpu.data.pipeline import build_loader
        from mrisr_tpu.data.volumes import VolumeStore

        store = VolumeStore.open(args.data)
        loader = build_loader(store, "val", cfg.data)
        calib = []
        for i, batch in enumerate(loader):
            if i >= args.calib_batches:
                break
            calib.append(batch[..., :2])
    path = export_serving_bundle(
        args.out, model_name=args.model, models_dir=args.checkpoint_dir,
        quant=args.quant, calibration_batches=calib,
        percentile=args.percentile, cfg=cfg.model,
        image_size=cfg.data.image_size,
    )
    print(f"serving bundle -> {path}")


def cmd_serve(args):
    """Serve a bundle over HTTP (serve/http.py): .npy in, .npy out, with
    the micro-batching engine underneath."""
    from mrisr_tpu.serve.http import serve_bundle

    server = serve_bundle(
        args.bundle, host=args.host, port=args.port,
        batch_size=args.batch_size, max_delay_ms=args.max_delay_ms,
    )
    print(f"serving {args.bundle} on http://{server.host}:{server.port} "
          f"(batch {args.batch_size}; POST /predict, GET /stats)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("shutting down")
        server.close()


def cmd_eval(args):
    from mrisr_tpu.api import load_model
    from mrisr_tpu.config import PRESETS
    from mrisr_tpu.data.volumes import VolumeStore
    from mrisr_tpu.eval.runner import evaluate_and_save

    base = _preset_base(args.model)
    cfg = _build_config(args, base if base in PRESETS else "unet")
    store = VolumeStore.open(args.data)
    hw = cfg.data.image_size
    model = load_model(args.model, models_dir=args.checkpoint_dir,
                       cfg=cfg.model, image_size=hw,
                       checkpoint=None if args.allow_fresh else "required")
    out = os.path.join(args.results_dir, f"{args.model}_test_metrics.json")
    if model.kind == "window":
        from mrisr_tpu.eval.runner import evaluate_progressive_test_set

        metrics = evaluate_progressive_test_set(
            model.predict_nhwc, store, cfg.data,
            mode=args.metric_mode, max_batches=args.max_batches,
            backend=args.backend,
        )
        os.makedirs(args.results_dir, exist_ok=True)
        with open(out, "w") as f:
            json.dump(metrics, f, indent=2)
    else:
        metrics = evaluate_and_save(
            model.predict_nhwc, store, cfg.data, out_json=out,
            mode=args.metric_mode, max_batches=args.max_batches,
            backend=args.backend,
        )
    print(json.dumps(metrics, indent=2))


def cmd_predict_volume(args):
    import numpy as np

    from mrisr_tpu.api import load_model
    from mrisr_tpu.data.split import split_for
    from mrisr_tpu.data.volumes import VolumeStore
    from mrisr_tpu.eval.figures import parallel_views_figure
    from mrisr_tpu.eval.volume_eval import (
        predict_volume,
        predict_volume_hierarchical,
        predict_volume_progressive,
    )

    cfg = _build_config(args, "unet")
    store = VolumeStore.open(args.data)
    # V1 semantics: pick a (seeded) random valid test-set volume
    import random

    test_patients = split_for(store.patient_ids, "test")
    rng = random.Random(args.seed)
    candidates = store.series_for_patients(test_patients)
    rng.shuffle(candidates)
    if not candidates:
        print("no test-set series found", file=sys.stderr)
        sys.exit(1)
    volume = np.asarray(store.load_series(candidates[0]))

    from mrisr_tpu.config import PRESETS

    hw = cfg.data.image_size
    results = {}
    for name in args.model:
        # per-model config: fastddpm's β schedule, unet_distilled's width
        # etc. live in each preset's ModelConfig — passing the first
        # model's cfg to all of them would sample/build wrongly
        mcfg = _build_config(
            args,
            _preset_base(name) if _preset_base(name) in PRESETS else "unet",
        ).model
        model = load_model(name, models_dir=args.checkpoint_dir,
                           cfg=mcfg, image_size=hw,
                           checkpoint=None if args.allow_fresh else "required")
        if model.kind == "window":
            res = predict_volume_progressive(
                model.predict_nhwc, volume, image_size=hw
            )
        elif args.hierarchical:
            res = predict_volume_hierarchical(
                model.predict_nhwc, volume, image_size=hw
            )
        else:
            res = predict_volume(model.predict_nhwc, volume, image_size=hw)
        results[name] = res
        m = res["metrics"]
        print(
            f"{name}: SSIM {m['ssim_mean']:.4f}±{m['ssim_std']:.3f} "
            f"PSNR {m['psnr_mean']:.2f}±{m['psnr_std']:.2f} MAE {m['mae']:.4f}"
        )
        mp = res.get("metrics_predicted_only")
        if mp is not None:
            print(
                f"  predicted slices only: SSIM {mp['ssim_mean']:.4f} "
                f"PSNR {mp['psnr_mean']:.2f} MAE {mp['mae']:.4f}"
            )
        if args.export_dicom:
            # DICOM-in -> DICOM-out: the predicted volume as a DICOM series
            # (the reference only ever wrote PNGs, VolumeVisualization.py)
            from mrisr_tpu.data.export import export_volume_dicom

            out_dir = export_volume_dicom(
                res["volume_predicted"],
                os.path.join(args.export_dicom, name),
                patient_id=f"seed{args.seed}",
                series_description=f"mrisr-tpu {name} predicted",
            )
            print(f"  DICOM series -> {out_dir}")
    if args.figure:
        if args.view == "parallel":
            path = parallel_views_figure(
                results, f"seed{args.seed}", save_path=args.figure,
                sagittal_x=hw[1] // 2,
            )
        else:
            # V8 single-view comparison (reference defaults X=128 / Z=30,
            # VolumeVisualization.py:1042-1271)
            from mrisr_tpu.eval.figures import single_view_figure

            path = single_view_figure(
                results, view=args.view, index=args.view_index,
                patient_name=f"seed{args.seed}", save_path=args.figure,
            )
        print(f"figure -> {path}")


def _compare_row_from_metrics(name, m):
    """Map one model's test-metrics dict to a (name, ssim3, psnr3, ssim6,
    psnr6) table row.  Pair/diffusion models carry '3mm'/'6mm' keys;
    progressive metrics carry per-stage 'i1'/'i2'/'i3' — i1/i3 predict
    across 3 mm gaps and i2 across 6 mm, same mapping the reference README
    table uses for its Progressive row (`/root/reference/README.md:129`).
    Missing stages/keys (truncated or partial artifacts) render as 'n/a'
    cells rather than crashing — --from-results ingests external files."""
    def g(stage, key):
        v = m.get(stage)
        return v.get(key) if isinstance(v, dict) else None

    def avg(a, b):
        return (a + b) / 2 if a is not None and b is not None else None

    if "i1" in m and "i2" in m:
        return (name,
                avg(g("i1", "ssim_mean"), g("i3", "ssim_mean")),
                avg(g("i1", "psnr_mean"), g("i3", "psnr_mean")),
                g("i2", "ssim_mean"), g("i2", "psnr_mean"))
    return (name,
            g("3mm", "ssim_mean"), g("3mm", "psnr_mean"),
            g("6mm", "ssim_mean"), g("6mm", "psnr_mean"))


def cmd_compare(args):
    """Evaluate several models and emit the README-style results table
    (SSIM/PSNR per spacing, never aggregated) as markdown + CSV — the
    metrics-table artifact of the reference (`v3:cell27` CSV,
    README.md:121-130 table).

    ``--from-results`` skips live evaluation and assembles the table from
    the per-model ``<results_dir>/<model>_test_metrics.json`` artifacts that
    ``cli eval`` writes — this is how rows whose evaluation is expensive
    (fastddpm's T=10 sampling) or whose checkpoints live elsewhere join one
    table, and it mirrors how the reference compiled its README table from
    per-run history JSONs."""
    from mrisr_tpu.config import PRESETS

    if args.from_results:
        rows = []
        results_dir = args.results_dir or "results"
        for name in args.model:
            path = os.path.join(results_dir, f"{name}_test_metrics.json")
            if not os.path.exists(path):
                print(f"skipping {name}: no {path}")
                continue
            with open(path) as f:
                rows.append(_compare_row_from_metrics(name, json.load(f)))
        _emit_compare_table(args, rows)
        return

    if not args.data:
        raise SystemExit("compare: --data is required unless --from-results")

    from mrisr_tpu.api import load_model
    from mrisr_tpu.data.volumes import VolumeStore
    from mrisr_tpu.eval.runner import evaluate_pair_model_test_set

    store = VolumeStore.open(args.data)
    rows = []
    for name in args.model:
        cfg = _build_config(args, name if name in PRESETS else "unet")
        model = load_model(name, models_dir=args.checkpoint_dir,
                           cfg=cfg.model, image_size=cfg.data.image_size,
                           checkpoint=None if args.allow_fresh else "required")
        if model.kind == "window":
            from mrisr_tpu.eval.runner import evaluate_progressive_test_set

            m = evaluate_progressive_test_set(
                model.predict_nhwc, store, cfg.data,
                mode=args.metric_mode, max_batches=args.max_batches,
                backend=args.backend,
            )
        else:
            m = evaluate_pair_model_test_set(
                model.predict_nhwc, store, cfg.data,
                mode=args.metric_mode, max_batches=args.max_batches,
                backend=args.backend,
            )
        rows.append(_compare_row_from_metrics(name, m))
    _emit_compare_table(args, rows)


def _emit_compare_table(args, rows):
    import csv

    header = ("Model", "SSIM (3mm)", "PSNR (3mm)", "SSIM (6mm)", "PSNR (6mm)")
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    for r in rows:
        cells = [r[0]] + [
            ("n/a" if v is None else (f"{v:.4f}" if i in (0, 2) else f"{v:.2f}"))
            for i, v in enumerate(r[1:])
        ]
        print("| " + " | ".join(cells) + " |")

    results_dir = args.results_dir or "results"
    os.makedirs(results_dir, exist_ok=True)
    csv_path = os.path.join(results_dir, "comparison_metrics.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    print(f"csv -> {csv_path}")


def cmd_triplet_figure(args):
    """V10 parity: one seeded random mid-volume triplet, all models
    (`/root/reference/src/VolumeVisualization.py:737-881`)."""
    import random

    import numpy as np

    from mrisr_tpu.api import load_model
    from mrisr_tpu.data.split import split_for
    from mrisr_tpu.data.volumes import VolumeStore
    from mrisr_tpu.eval.figures import triplet_grid_figure
    from mrisr_tpu.eval.volume_eval import normalize_volume

    cfg = _build_config(args, "unet")
    store = VolumeStore.open(args.data)
    test_patients = split_for(store.patient_ids, "test")
    candidates = store.series_for_patients(test_patients)
    rng = random.Random(args.seed)
    rng.shuffle(candidates)
    if not candidates:
        print("no test-set series found", file=sys.stderr)
        sys.exit(1)
    vol = normalize_volume(np.asarray(store.load_series(candidates[0])))
    z = vol.shape[0]
    if z < 7:
        print(f"volume has only {z} slices; need >= 7 for a mid-volume "
              "triplet", file=sys.stderr)
        sys.exit(1)
    # mid-volume triplet, seeded (reference picks a random central one)
    i = rng.randrange(z // 4, 3 * z // 4 - 2)
    pre, gt, post = vol[i], vol[i + 1], vol[i + 2]

    import jax.numpy as jnp

    from mrisr_tpu.config import PRESETS

    hw = cfg.data.image_size
    preds = {}
    for name in args.model:
        mcfg = _build_config(
            args,
            _preset_base(name) if _preset_base(name) in PRESETS else "unet",
        ).model  # per-model config (see cmd_predict_volume)
        model = load_model(name, models_dir=args.checkpoint_dir,
                           cfg=mcfg, image_size=hw,
                           checkpoint=None if args.allow_fresh else "required")
        if model.kind == "window":
            # the V10 grid is per-triplet (2-in/1-out); the reference's
            # figure likewise has no progressive column
            print(f"(skipping {name}: 5-slice-window models have no "
                  "single-triplet prediction)")
            continue
        x = jnp.stack([jnp.asarray(pre), jnp.asarray(post)], axis=-1)[None]
        preds[name] = np.asarray(model.predict_nhwc(x))[0, ..., 0]
    path = triplet_grid_figure(pre, post, gt, preds, save_path=args.figure)
    print(f"figure -> {path}")


def cmd_bench(args):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    from bench import bench_unet_inference

    print(json.dumps(bench_unet_inference(
        batch_size=args.batch_size, quant=args.quant,
        features=args.features)))


def main(argv=None):
    from mrisr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(prog="mrisr")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("extract")
    q.add_argument("zip")
    q.add_argument("out")
    q.set_defaults(fn=cmd_extract)

    q = sub.add_parser("clean")
    q.add_argument("root")
    q.add_argument("--yes", action="store_true")
    q.add_argument("--dry-run", action="store_true")
    q.set_defaults(fn=cmd_clean)

    q = sub.add_parser("pack")
    q.add_argument("root")
    q.add_argument("out")
    q.add_argument("--slices", type=int, default=60)
    q.set_defaults(fn=cmd_pack)

    q = sub.add_parser("synth")
    q.add_argument("out")
    q.add_argument("--patients", type=int, default=8)
    q.add_argument("--slices", type=int, default=60)
    q.add_argument("--size", type=int, default=256)
    q.add_argument("--seed", type=int, default=0,
                   help="base phantom seed (patient p uses seed+p); pick a "
                        "disjoint range to build a store whose anatomy does "
                        "not overlap another store's, e.g. a distillation "
                        "corpus vs the eval store")
    q.set_defaults(fn=cmd_synth)

    from mrisr_tpu.config import PRESETS as _PRESETS

    q = sub.add_parser("train")
    q.add_argument("--preset", required=True, choices=sorted(_PRESETS))
    q.add_argument("--config", default=None,
                   help="JSON config file overriding the preset "
                        "(see mrisr_tpu/configs/*.json)")
    q.add_argument(
        "--scan-epochs", action="store_true",
        help="run each train epoch as ONE on-device lax.scan "
             "(all presets, requires --backend device)",
    )
    _add_common_train_args(q)
    q.set_defaults(fn=cmd_train)

    q = sub.add_parser("distill")
    q.add_argument("--preset", default="unet_distilled",
                   choices=sorted(k for k in _PRESETS
                                  if _PRESETS[k].loss.kind == "distill"))
    q.add_argument("--teacher", default="unet",
                   help="trained pair-model checkpoint to distill from")
    q.add_argument("--teacher-dir", default=None,
                   help="teacher checkpoint dir (default: --checkpoint-dir)")
    q.add_argument("--teacher-features", type=int, default=None,
                   help="teacher base feature width if not the default 64")
    q.add_argument("--distill-alpha", type=float, default=None,
                   help="weight of the teacher-matching MSE term "
                        "(1-alpha weighs ground truth; 1.0 = pure "
                        "teacher mimicry, the serving-replica setting)")
    q.add_argument("--distill-lambda-ssim", type=float, default=None,
                   help="weight of an added (1 - SSIM(student, teacher)) "
                        "term — optimizes the eval metric directly "
                        "(default 0 = MSE-only, the r2 objective)")
    q.add_argument("--ema", type=float, default=None, metavar="DECAY",
                   help="Polyak/EMA-average the student params per step "
                        "(e.g. 0.999); eval + the _best checkpoint use the "
                        "averaged weights — kills bf16 rerun spread")
    q.add_argument("--teacher-quant", default="none",
                   choices=("none", "int8", "int8_fused"),
                   help="distill against the QUANTIZED teacher's outputs "
                        "(the serving numerics) instead of its bf16 "
                        "forward; calibrated on 4 val batches")
    q.add_argument("--init-from-teacher", action="store_true",
                   help="initialize the student as a magnitude-pruned "
                        "channel slice of the teacher (BN |gamma| scores, "
                        "serve/prune.py) instead of a random init")
    q.add_argument("--config", default=None)
    q.add_argument("--scan-epochs", action="store_true")
    _add_common_train_args(q)
    q.set_defaults(fn=cmd_distill)

    q = sub.add_parser("distill-steps")
    q.add_argument("--teacher", default="fastddpm",
                   help="trained diffusion preset checkpoint to distill")
    q.add_argument("--teacher-dir", default=None,
                   help="teacher checkpoint dir (default: --checkpoint-dir)")
    q.add_argument("--factor", type=int, default=2,
                   help="teacher sub-steps folded into one student step "
                        "per round (grid shrinks to ceil(N/factor))")
    q.add_argument("--rounds", type=int, default=2,
                   help="number of grid-shrink rounds (10 -> 5 -> 3)")
    q.add_argument("--no-eval", action="store_true",
                   help="skip the per-round test-set eval")
    q.add_argument("--max-eval-batches", type=int, default=None)
    q.add_argument("--config", default=None)
    _add_common_train_args(q)
    q.set_defaults(fn=cmd_distill_steps)

    q = sub.add_parser("export-serving")
    q.add_argument("--model", default="unet")
    q.add_argument("--out", required=True, help="bundle output directory")
    q.add_argument("--quant", default="int8_fused",
                   choices=("none", "int8", "int8_fused", "int8_deep"),
                   help="pair models: none/int8/int8_fused (default); "
                        "fastddpm: none/int8/int8_deep (int8_deep is the "
                        "measured recommendation)")
    q.add_argument("--calib-batches", type=int, default=4)
    q.add_argument("--percentile", type=float, default=None,
                   help="activation calibration |x| percentile "
                        "(default absmax)")
    _add_common_train_args(q)
    q.set_defaults(fn=cmd_export_serving)

    q = sub.add_parser("serve")
    q.add_argument("--bundle", required=True,
                   help="serving bundle dir (see export-serving)")
    q.add_argument("--host", default="127.0.0.1")
    q.add_argument("--port", type=int, default=8000)
    q.add_argument("--batch-size", type=int, default=128)
    q.add_argument("--max-delay-ms", type=float, default=2.0)
    q.set_defaults(fn=cmd_serve)

    q = sub.add_parser("eval")
    q.add_argument("--model", required=True)
    q.add_argument("--metric-mode", default="minmax-each",
                   choices=("minmax-each", "denorm-11", "raw"))
    q.add_argument("--max-batches", type=int, default=None)
    _add_common_train_args(q)
    q.set_defaults(fn=cmd_eval)

    q = sub.add_parser("predict-volume")
    q.add_argument("--model", nargs="+", required=True)
    q.add_argument("--seed", type=int, default=42)
    q.add_argument("--hierarchical", action="store_true")
    q.add_argument("--figure", default=None)
    q.add_argument("--view", default="parallel",
                   choices=("parallel", "sagittal", "axial"),
                   help="figure layout: 3-row parallel views (V7) or the "
                        "V8 single-view all-models row")
    q.add_argument("--view-index", type=int, default=None,
                   help="sagittal X / axial Z index (default: mid-volume; "
                        "reference used X=128 / Z=30)")
    q.add_argument("--export-dicom", default=None, metavar="DIR",
                   help="also write each model's predicted volume as a "
                        "DICOM series under DIR/<model>/ (data/export.py) — "
                        "closes the DICOM-in -> DICOM-out loop")
    _add_common_train_args(q)
    q.set_defaults(fn=cmd_predict_volume)

    q = sub.add_parser("compare")
    q.add_argument("--model", nargs="+", required=True)
    q.add_argument("--metric-mode", default="minmax-each",
                   choices=("minmax-each", "denorm-11", "raw"))
    q.add_argument("--max-batches", type=int, default=None)
    q.add_argument("--from-results", action="store_true",
                   help="assemble the table from existing "
                        "<results_dir>/<model>_test_metrics.json artifacts "
                        "instead of evaluating live (no --data needed)")
    _add_common_train_args(q, data_required=False)
    q.set_defaults(fn=cmd_compare)

    q = sub.add_parser("triplet-figure")
    q.add_argument("--model", nargs="+", required=True)
    q.add_argument("--seed", type=int, default=42)
    q.add_argument("--figure", default="results/single_triplet.png")
    _add_common_train_args(q)
    q.set_defaults(fn=cmd_triplet_figure)

    q = sub.add_parser("bench")
    q.add_argument("--batch-size", type=int, default=128)
    q.add_argument("--quant", default="int8_fused",
                   choices=("none", "int8", "int8_fused"))
    q.add_argument("--features", type=int, default=64)
    q.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

"""CLI smoke tests: synth -> train -> eval end to end through main()."""

import json
import os

import pytest


def test_cli_synth_train_eval(tmp_path, capsys, monkeypatch):
    from mrisr_tpu import cli

    store_dir = str(tmp_path / "store")
    cli.main(["synth", store_dir, "--patients", "8", "--slices", "8",
              "--size", "32"])
    out = capsys.readouterr().out
    assert "packed 8 synthetic series" in out

    ckpt_dir = str(tmp_path / "models")
    res_dir = str(tmp_path / "results")
    cli.main([
        "train", "--preset", "unet", "--data", store_dir,
        "--epochs", "1", "--batch-size", "4", "--image-size", "32",
        "--checkpoint-dir", ckpt_dir, "--results-dir", res_dir,
    ])
    out = capsys.readouterr().out
    assert "best val loss" in out
    assert os.path.isdir(os.path.join(ckpt_dir, "unet_best"))
    assert os.path.exists(os.path.join(res_dir, "unet_history.json"))

    cli.main([
        "eval", "--model", "unet", "--data", store_dir,
        "--image-size", "32", "--checkpoint-dir", ckpt_dir,
        "--results-dir", res_dir, "--max-batches", "2",
    ])
    out = capsys.readouterr().out
    metrics = json.loads(out[out.index("{"):])
    assert "3mm" in metrics and "6mm" in metrics
    assert 0 <= metrics["3mm"]["ssim_mean"] <= 1
    saved = json.load(open(os.path.join(res_dir, "unet_test_metrics.json")))
    assert saved.keys() == metrics.keys()


def test_cli_predict_volume(tmp_path, capsys):
    from mrisr_tpu import cli

    store_dir = str(tmp_path / "store")
    cli.main(["synth", store_dir, "--patients", "8", "--slices", "8",
              "--size", "32"])
    capsys.readouterr()
    fig = str(tmp_path / "cmp.png")
    cli.main([
        "predict-volume", "--model", "unet", "--data", store_dir, "--allow-fresh",
        "--image-size", "32", "--checkpoint-dir", str(tmp_path / "nomodels"),
        "--figure", fig,
    ])
    out = capsys.readouterr().out
    assert "SSIM" in out
    assert os.path.exists(fig)


def test_cli_triplet_figure(tmp_path, capsys):
    from mrisr_tpu import cli

    store_dir = str(tmp_path / "store")
    cli.main(["synth", store_dir, "--patients", "8", "--slices", "8",
              "--size", "32"])
    capsys.readouterr()
    fig = str(tmp_path / "trip.png")
    cli.main([
        "triplet-figure", "--model", "unet", "--data", store_dir, "--allow-fresh",
        "--image-size", "32", "--checkpoint-dir", str(tmp_path / "none"),
        "--figure", fig,
    ])
    assert os.path.exists(fig)


def test_cli_eval_progressive(tmp_path, capsys):
    from mrisr_tpu import cli

    store_dir = str(tmp_path / "store")
    cli.main(["synth", store_dir, "--patients", "8", "--slices", "8",
              "--size", "32"])
    capsys.readouterr()
    cli.main([
        "eval", "--model", "progressive_unet", "--data", store_dir, "--allow-fresh",
        "--image-size", "32", "--checkpoint-dir", str(tmp_path / "none"),
        "--results-dir", str(tmp_path / "res"), "--max-batches", "2",
    ])
    out = capsys.readouterr().out
    metrics = json.loads(out[out.index("{"):])
    assert set(metrics) == {"i1", "i2", "i3", "average"}
    assert "ssim_mean" in metrics["i2"]


def test_cli_train_scan_epochs(tmp_path, capsys):
    from mrisr_tpu import cli

    store_dir = str(tmp_path / "store")
    cli.main(["synth", store_dir, "--patients", "8", "--slices", "8",
              "--size", "32"])
    capsys.readouterr()
    cli.main([
        "train", "--preset", "unet", "--data", store_dir,
        "--epochs", "2", "--batch-size", "8", "--image-size", "32",
        "--features", "8", "--backend", "device", "--scan-epochs",
        "--checkpoint-dir", str(tmp_path / "m"),
        "--results-dir", str(tmp_path / "r"),
    ])
    out = capsys.readouterr().out
    assert "best val loss" in out
    import json as _json
    h = _json.load(open(str(tmp_path / "r" / "unet_history.json")))
    assert len(h["train_loss"]) == 2
    assert h["train_loss"][1] < h["train_loss"][0]


def test_cli_compare_table(tmp_path, capsys):
    from mrisr_tpu import cli

    store_dir = str(tmp_path / "store")
    cli.main(["synth", store_dir, "--patients", "8", "--slices", "8",
              "--size", "32"])
    capsys.readouterr()
    cli.main([
        "compare", "--model", "unet", "deepcnn", "--data", store_dir, "--allow-fresh",
        "--image-size", "32", "--features", "8",
        "--checkpoint-dir", str(tmp_path / "none"),
        "--results-dir", str(tmp_path / "res"), "--max-batches", "2",
    ])
    out = capsys.readouterr().out
    assert "| Model | SSIM (3mm)" in out
    assert "| unet |" in out and "| deepcnn |" in out
    assert os.path.exists(str(tmp_path / "res" / "comparison_metrics.csv"))


def test_cli_eval_fastddpm_sampling(tmp_path, capsys):
    """Diffusion eval through the CLI: sampling-based metrics per spacing."""
    from mrisr_tpu import cli

    store_dir = str(tmp_path / "store")
    cli.main(["synth", store_dir, "--patients", "8", "--slices", "8",
              "--size", "32"])
    capsys.readouterr()
    cli.main([
        "eval", "--model", "fastddpm", "--data", store_dir, "--allow-fresh",
        "--image-size", "32", "--features", "8", "--batch-size", "4",
        "--checkpoint-dir", str(tmp_path / "none"),
        "--results-dir", str(tmp_path / "res"), "--max-batches", "1",
    ])
    out = capsys.readouterr().out
    metrics = json.loads(out[out.index("{"):])
    assert "3mm" in metrics and "6mm" in metrics


def test_config_json_roundtrip():
    """Every shipped preset JSON loads back into an equivalent Config."""
    import glob

    from mrisr_tpu.config import Config, PRESETS

    files = sorted(glob.glob("mrisr_tpu/configs/*.json"))
    assert len(files) == len(PRESETS)
    for f in files:
        name = os.path.splitext(os.path.basename(f))[0]
        cfg = Config.from_dict(json.load(open(f)))
        assert cfg == PRESETS[name]


def test_cli_train_fastddpm_scan_epochs(tmp_path, capsys):
    from mrisr_tpu import cli

    store_dir = str(tmp_path / "store")
    cli.main(["synth", store_dir, "--patients", "8", "--slices", "8",
              "--size", "32"])
    capsys.readouterr()
    cli.main([
        "train", "--preset", "fastddpm", "--data", store_dir,
        "--epochs", "1", "--batch-size", "8", "--image-size", "32",
        "--features", "8", "--backend", "device", "--scan-epochs",
        "--checkpoint-dir", str(tmp_path / "m"),
        "--results-dir", str(tmp_path / "r"),
    ])
    out = capsys.readouterr().out
    assert "best val loss" in out


def test_eval_refuses_fresh_weights(tmp_path):
    """CLI eval without a checkpoint must fail loudly, not score random
    weights (a fresh model silently produced metrics in the r2 demo runs)."""
    import pytest

    from mrisr_tpu import cli
    from mrisr_tpu.data.synthetic import make_synthetic_store

    store = str(tmp_path / "store")
    make_synthetic_store(store, num_patients=4, slices_per_volume=8,
                         height=32, width=32)
    with pytest.raises(FileNotFoundError, match="Checkpoint not found"):
        cli.main([
            "eval", "--model", "deepcnn", "--data", store,
            "--image-size", "32", "--features", "8",
            "--checkpoint-dir", str(tmp_path / "nonexistent"),
            "--results-dir", str(tmp_path / "results"),
        ])

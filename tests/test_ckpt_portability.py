"""Cross-device checkpoint portability (ckpt/io.py numpy fallback).

A checkpoint written on a TPU host embeds device/sharding metadata; opening
it on a CPU-only box used to fail inside Orbax with "Device ... was not
found in jax.local_devices()".  ``restore_checkpoint`` now falls back to
``restore_checkpoint_numpy`` (leaves forced to host numpy, saved shardings
ignored) — the situation the reference hits trivially because torch.load
(map_location="cpu") is device-agnostic by default.
"""

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
import pytest

from mrisr_tpu.ckpt import (
    restore_checkpoint,
    restore_checkpoint_numpy,
    save_checkpoint,
)


@pytest.fixture
def tree():
    return {
        "params": {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
                   "b": jnp.ones((4,), jnp.bfloat16)},
        "step": jnp.asarray(7, jnp.int32),
    }


def test_numpy_restore_roundtrip(tmp_path, tree):
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree)
    r = restore_checkpoint_numpy(path)
    assert set(r) == {"params", "step"}
    for leaf in jax.tree_util.tree_leaves(r):
        assert isinstance(leaf, np.ndarray)
    np.testing.assert_array_equal(r["params"]["w"],
                                  np.asarray(tree["params"]["w"]))
    np.testing.assert_array_equal(
        r["params"]["b"].astype(np.float32),
        np.asarray(tree["params"]["b"], np.float32))
    assert int(r["step"]) == 7


def test_restore_falls_back_on_foreign_device(tmp_path, tree, monkeypatch):
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree)

    # simulate the TPU-written-checkpoint-on-CPU-host failure mode
    def boom(self, *a, **k):
        raise ValueError(
            "Device TPU v5 lite0 was not found in jax.local_devices().")

    monkeypatch.setattr(ocp.StandardCheckpointer, "restore", boom)
    r = restore_checkpoint(path)
    np.testing.assert_array_equal(r["params"]["w"],
                                  np.asarray(tree["params"]["w"]))


def test_restore_reraises_other_valueerrors(tmp_path, tree, monkeypatch):
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, tree)

    def boom(self, *a, **k):
        raise ValueError("something unrelated")

    monkeypatch.setattr(ocp.StandardCheckpointer, "restore", boom)
    with pytest.raises(ValueError, match="unrelated"):
        restore_checkpoint(path)

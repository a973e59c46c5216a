"""Direct tests for device-side paired augmentation (ops/augment.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrisr_tpu.ops.augment import _rotate_bilinear, paired_augment


def test_rotation_zero_angle_is_identity():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    y = _rotate_bilinear(x, jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_rotation_90deg_matches_rot90_interior():
    """A 90° rotation must equal np.rot90 away from the zero-filled border."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 17, 17, 1))
    y = np.asarray(_rotate_bilinear(x, jnp.array([np.pi / 2])))[0, :, :, 0]
    want = np.asarray(x)[0, :, :, 0]
    # inverse-mapping rotation by +90° about the center
    want_rot = np.rot90(want, k=-1)
    np.testing.assert_allclose(y[2:-2, 2:-2], want_rot[2:-2, 2:-2], atol=1e-4)


def test_rotation_preserves_pairing():
    """All channels of one sample get the identical rotation."""
    key = jax.random.PRNGKey(2)
    base = jax.random.normal(key, (4, 16, 16, 1))
    batch = jnp.concatenate([base, base], axis=-1)  # two identical channels
    out = paired_augment(
        jax.random.PRNGKey(3), batch,
        hflip=False, vflip=False, rot90=False, rotate_degrees=5.0,
    )
    np.testing.assert_allclose(
        np.asarray(out[..., 0]), np.asarray(out[..., 1]), atol=1e-6
    )
    # and the rotation actually changed something
    assert not np.allclose(np.asarray(out[..., 0]), np.asarray(base[..., 0]))


def test_rotation_angles_within_bounds_vary_per_sample():
    x = jnp.ones((8, 16, 16, 1))
    out = paired_augment(
        jax.random.PRNGKey(4), x,
        hflip=False, vflip=False, rot90=False, rotate_degrees=5.0,
    )
    # zero-fill corners differ per sample iff angles differ
    corners = np.asarray(out[:, 0, 0, 0])
    assert len(np.unique(np.round(corners, 6))) > 1

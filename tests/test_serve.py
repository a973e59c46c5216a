"""Serving engine tests: micro-batching correctness, padding, concurrency.

CPU-only (conftest forces jax_platforms=cpu); the apply fn is a tiny jitted
function so results are exactly checkable against a direct call.
"""

import threading

import numpy as np
import pytest

from mrisr_tpu.serve.engine import InferenceEngine

SHAPE = (8, 8, 2)


def _make_apply():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def apply_fn(x):  # (B, 8, 8, 2) -> (B, 8, 8, 1): mean of channels + 1
        return (jnp.mean(x, axis=-1, keepdims=True) + 1.0).astype(jnp.float32)

    return apply_fn


def _expected(x):
    return np.mean(np.asarray(x, np.float32), axis=-1, keepdims=True) + 1.0


def test_single_request_padded_batch():
    with InferenceEngine(_make_apply(), batch_size=4, input_shape=SHAPE) as eng:
        x = np.random.RandomState(0).rand(*SHAPE).astype(np.float32)
        y = eng.predict(x)
        np.testing.assert_allclose(y, _expected(x), rtol=1e-6)
    assert eng.stats.requests == 1
    assert eng.stats.batches == 1
    assert eng.stats.padded_slots == 3  # wrap-padded to the static batch


def test_many_requests_exact_and_batched():
    rng = np.random.RandomState(1)
    xs = [rng.rand(*SHAPE).astype(np.float32) for _ in range(11)]
    with InferenceEngine(
        _make_apply(), batch_size=4, input_shape=SHAPE, max_delay_ms=20.0
    ) as eng:
        ys = eng.predict_many(xs)
        for x, y in zip(xs, ys):
            np.testing.assert_allclose(y, _expected(x), rtol=1e-6)
        assert eng.stats.requests == 11
        # 11 requests at batch 4 need at least ceil(11/4)=3 dispatches
        assert eng.stats.batches >= 3


def test_concurrent_submitters():
    rng = np.random.RandomState(2)
    xs = [rng.rand(*SHAPE).astype(np.float32) for _ in range(24)]
    results = {}
    with InferenceEngine(
        _make_apply(), batch_size=8, input_shape=SHAPE, max_delay_ms=10.0
    ) as eng:

        def worker(idx):
            results[idx] = eng.predict(xs[idx])

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(24)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    for i, x in enumerate(xs):
        np.testing.assert_allclose(results[i], _expected(x), rtol=1e-6)
    assert eng.stats.requests == 24
    assert eng.stats.occupancy > 0.0


def test_shape_validation_and_close():
    eng = InferenceEngine(_make_apply(), batch_size=2, input_shape=SHAPE)
    with pytest.raises(ValueError):
        eng.submit(np.zeros((4, 4, 2), np.float32))
    eng.close()
    with pytest.raises(RuntimeError):
        eng.submit(np.zeros(SHAPE, np.float32))
    eng.close()  # idempotent


def test_apply_error_resolves_futures():
    import jax

    @jax.jit
    def bad(x):
        return x[..., :1]

    def raising(x):
        raise RuntimeError("boom")

    with InferenceEngine(raising, batch_size=2, input_shape=SHAPE) as eng:
        fut = eng.submit(np.zeros(SHAPE, np.float32))
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=10)
        # dispatcher survives; next request still works after swapping fn
        eng._apply = bad
        y = eng.predict(np.ones(SHAPE, np.float32))
        assert y.shape == (8, 8, 1)


def test_engine_from_model_fresh_unet(tmp_path):
    # fresh (untrained) tiny UNet end-to-end through the engine
    from mrisr_tpu.config import ModelConfig
    import mrisr_tpu.serve.engine as engine_mod

    eng = None
    try:
        from mrisr_tpu.api import load_model

        loaded = load_model("unet", models_dir=str(tmp_path),
                            cfg=ModelConfig(base_features=4),
                            image_size=(16, 16))
        import jax

        apply_fn = jax.jit(
            lambda x: loaded.module.apply(loaded.variables, x, train=False)
        )
        eng = engine_mod.InferenceEngine(
            apply_fn, batch_size=2, input_shape=(16, 16, 2)
        )
        y = eng.predict(np.zeros((16, 16, 2), np.float32))
        assert y.shape == (16, 16, 1)
        assert np.all(np.isfinite(y))
    finally:
        if eng is not None:
            eng.close()


def test_engine_data_parallel_matches_single_device(tmp_path):
    # DP serving on the virtual 8-device CPU mesh == single-device results
    import jax

    from mrisr_tpu.config import ModelConfig
    from mrisr_tpu.serve.engine import engine_from_model

    assert jax.device_count() == 8
    rng = np.random.RandomState(3)
    xs = [rng.rand(16, 16, 2).astype(np.float32) for _ in range(10)]
    kwargs = dict(
        models_dir=str(tmp_path), cfg=ModelConfig(base_features=4),
        image_size=(16, 16), batch_size=8, max_delay_ms=20.0,
        require_checkpoint=False,  # fresh weights are the fixture here
    )
    with engine_from_model("unet", **kwargs) as single:
        ys_single = single.predict_many(xs)
    with engine_from_model("unet", data_parallel=True, **kwargs) as dp:
        ys_dp = dp.predict_many(xs)
    for a, b in zip(ys_single, ys_dp):
        np.testing.assert_allclose(a, b, atol=2e-2)  # bf16 forward


def test_engine_data_parallel_batch_divisibility(tmp_path):
    from mrisr_tpu.config import ModelConfig
    from mrisr_tpu.serve.engine import engine_from_model

    with pytest.raises(ValueError, match="divide"):
        engine_from_model(
            "unet", models_dir=str(tmp_path), cfg=ModelConfig(base_features=4),
            image_size=(16, 16), batch_size=6, data_parallel=True,
            require_checkpoint=False,
        )


def test_engine_from_model_rejects_window_models(tmp_path):
    from mrisr_tpu.config import ModelConfig
    from mrisr_tpu.serve.engine import engine_from_model

    with pytest.raises(ValueError, match="pair"):
        engine_from_model(
            "progressive_unet", models_dir=str(tmp_path),
            image_size=(16, 16), cfg=ModelConfig(base_features=4),
            require_checkpoint=False,
        )


@pytest.mark.parametrize("quant", ["int8", "int8_fused"])
@pytest.mark.parametrize("model_name", ["unet", "unet_gan"])
def test_engine_from_model_quantized(tmp_path, quant, model_name):
    """Both int8 serving variants run end-to-end through engine_from_model
    for both UNet-family topologies (bias and bias-free/GAN generator;
    fresh tiny weights, calibration batches supplied)."""
    from mrisr_tpu.config import ModelConfig
    from mrisr_tpu.serve.engine import engine_from_model

    rng = np.random.RandomState(7)
    calib = [rng.rand(4, 16, 16, 2).astype(np.float32)]
    with engine_from_model(
        model_name, models_dir=str(tmp_path),
        cfg=ModelConfig(name=model_name, base_features=4),
        image_size=(16, 16), batch_size=4, quant=quant,
        calibration_batches=calib, require_checkpoint=False,
    ) as eng:
        y = eng.predict(rng.rand(16, 16, 2).astype(np.float32))
    assert y.shape == (16, 16, 1)
    assert np.all(np.isfinite(y))


def test_engine_quant_rejects_non_unet(tmp_path):
    """int8 serving names the UNet block structure; deepcnn must be
    rejected with a clear message, not a KeyError."""
    from mrisr_tpu.config import ModelConfig
    from mrisr_tpu.serve.engine import engine_from_model

    with pytest.raises(ValueError, match="UNet-family"):
        engine_from_model(
            "deepcnn", models_dir=str(tmp_path),
            cfg=ModelConfig(name="deepcnn", base_features=4),
            image_size=(16, 16), batch_size=4, quant="int8",
            calibration_batches=[np.zeros((1, 16, 16, 2), np.float32)],
            require_checkpoint=False,
        )


def test_engine_requires_checkpoint_by_default(tmp_path):
    """A typo'd/empty models_dir must fail loudly, not serve random
    weights (production default)."""
    from mrisr_tpu.config import ModelConfig
    from mrisr_tpu.serve.engine import engine_from_model

    with pytest.raises(FileNotFoundError):
        engine_from_model(
            "unet", models_dir=str(tmp_path / "nope"),
            cfg=ModelConfig(base_features=4), image_size=(16, 16),
        )


def test_cancelled_future_does_not_kill_dispatcher():
    """A client-cancelled Future must not raise InvalidStateError inside
    the dispatcher thread (that would hang every later request)."""
    import time as _time

    slow_gate = threading.Event()

    def slow_apply(x):
        slow_gate.wait(timeout=5)
        return np.mean(x, axis=-1, keepdims=True)

    with InferenceEngine(
        slow_apply, batch_size=1, input_shape=SHAPE, max_delay_ms=0.0
    ) as eng:
        fut = eng.submit(np.zeros(SHAPE, np.float32))
        assert fut.cancel() or True  # cancel (succeeds while queued/pending)
        slow_gate.set()
        _time.sleep(0.05)
        # dispatcher survived: a fresh request still resolves
        y = eng.predict(np.ones(SHAPE, np.float32))
        assert y.shape == (8, 8, 1)

"""HTTP serving front-end (serve/http.py): npy round-trip, concurrent
clients batch through the engine, stats/health endpoints, bad input."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np

from mrisr_tpu.serve.engine import InferenceEngine
from mrisr_tpu.serve.http import ServingServer

SHAPE = (8, 8, 2)


def _make_apply():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def apply_fn(x):
        return (jnp.mean(x, axis=-1, keepdims=True) + 1.0).astype(jnp.float32)

    return apply_fn


def _post_npy(url, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(url + "/predict", data=buf.getvalue())
    with urllib.request.urlopen(req, timeout=30) as resp:
        return np.load(io.BytesIO(resp.read()))


def test_http_predict_roundtrip_and_stats():
    eng = InferenceEngine(
        _make_apply(), batch_size=4, input_shape=SHAPE, max_delay_ms=10.0
    )
    with ServingServer(eng, port=0).start_background() as srv:
        url = f"http://{srv.host}:{srv.port}"
        x = np.random.RandomState(0).rand(*SHAPE).astype(np.float32)
        y = _post_npy(url, x)
        np.testing.assert_allclose(
            y, np.mean(x, axis=-1, keepdims=True) + 1.0, rtol=1e-6
        )

        # concurrent clients share engine batches
        results = {}

        def client(i):
            results[i] = _post_npy(url, x + np.float32(i))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(8):
            np.testing.assert_allclose(
                results[i],
                np.mean(x + np.float32(i), axis=-1, keepdims=True) + 1.0,
                rtol=1e-5,
            )

        with urllib.request.urlopen(url + "/healthz", timeout=10) as r:
            assert r.read() == b"ok"
        with urllib.request.urlopen(url + "/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 9
        assert stats["batches"] >= 1
        assert 0.0 < stats["occupancy"] <= 1.0


def test_http_bad_input_is_400():
    eng = InferenceEngine(
        _make_apply(), batch_size=2, input_shape=SHAPE, max_delay_ms=0.0
    )
    with ServingServer(eng, port=0).start_background() as srv:
        url = f"http://{srv.host}:{srv.port}"
        # wrong shape
        try:
            _post_npy(url, np.zeros((4, 4, 2), np.float32))
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
        # not npy at all
        req = urllib.request.Request(
            url + "/predict", data=b"definitely not npy"
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # unknown path
        try:
            urllib.request.urlopen(url + "/nope", timeout=10)
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # server still alive afterwards
        y = _post_npy(url, np.zeros(SHAPE, np.float32))
        assert y.shape == (8, 8, 1)

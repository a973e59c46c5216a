"""Micro-batching inference engine: the TPU serving runtime.

The reference has no serving layer at all (inference happens inline in
notebook cells, one batch at a time — `/root/reference/src/
VolumeVisualization.py:185-204`).  On TPU, serving efficiency is set by two
hardware facts this engine is built around:

- **Static shapes**: XLA compiles one program per shape, so the engine runs
  a FIXED batch size and wrap-pads partial batches (same trick as
  eval/volume_eval.py) — every dispatch reuses the single compiled program.
- **Batch amortization**: per-dispatch overhead (host->device transfer +
  launch) is amortized across the whole micro-batch; the measured sweet
  spot for the 31 M UNet is batch 128 (bench.py).

Design: callers submit individual requests (numpy `(H, W, 2)` slice pairs)
from any thread and get a `Future`.  A single dispatcher thread drains the
queue, assembles up to `batch_size` requests (waiting at most
`max_delay_ms` for stragglers once the first request of a batch arrives),
runs ONE jitted forward, and resolves the futures — keeping one batch in
flight (double buffering) so host-side batch assembly and result fetch
overlap device compute.  Model variants: plain bf16, BN-folded, or int8
(serve/quant.py) — any `(B, H, W, 2) -> (B, H, W, 1)` jitted callable
works.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple

import numpy as np


@dataclass
class EngineStats:
    """Cumulative serving counters (read with `Engine.stats`).

    ``total_batch_time_s`` includes the FIRST dispatch's XLA compile;
    call ``engine.reset_stats()`` after a warm-up batch when measuring
    steady-state throughput.  ``assemble_time_s`` / ``fetch_time_s`` break
    the host-side overhead into batch assembly (queue drain + row copies
    into the ping-pong buffer) and device-result fetch (the sync point) so
    a serving regression can be localized without a profiler.
    """

    requests: int = 0
    batches: int = 0
    padded_slots: int = 0
    total_batch_time_s: float = 0.0
    assemble_time_s: float = 0.0
    fetch_time_s: float = 0.0

    @property
    def occupancy(self) -> float:
        """Mean fraction of real (non-padding) slots per dispatched batch."""
        total = self.requests + self.padded_slots
        return self.requests / total if total else 0.0

    @property
    def slices_per_sec(self) -> float:
        if self.total_batch_time_s == 0:
            return 0.0
        return self.requests / self.total_batch_time_s


@dataclass
class _Pending:
    x: np.ndarray
    future: Future


class InferenceEngine:
    """Threaded micro-batching wrapper around one jitted forward.

    Parameters
    ----------
    apply_fn : (B, H, W, C_in) float32 -> (B, H, W, C_out) jitted callable.
    batch_size : static micro-batch size (one compiled program).
    input_shape : per-request (H, W, C_in).
    max_delay_ms : max time to hold an open batch waiting for more requests
        once it has at least one.  0 dispatches immediately (latency-first).
    """

    def __init__(
        self,
        apply_fn: Callable,
        batch_size: int = 128,
        input_shape: Tuple[int, int, int] = (256, 256, 2),
        max_delay_ms: float = 2.0,
    ):
        self._apply = apply_fn
        self.batch_size = int(batch_size)
        self.input_shape = tuple(input_shape)
        self.max_delay_s = max_delay_ms / 1e3
        self._queue: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self.stats = EngineStats()
        self._closed = False
        self._close_lock = threading.Lock()
        self._busy_until = 0.0  # end of the last accounted busy interval
        # ping-pong host batch buffers: rows are copied in as requests are
        # collected, so dispatch hands XLA one contiguous array with NO
        # per-batch 67 MB allocation (np.stack alloc + page-fault churn
        # measured ~10 ms/batch at 128x256x256x2).  Two buffers because
        # double buffering keeps one batch in flight while the next is
        # assembled.
        self._buffers = [
            np.empty((self.batch_size, *self.input_shape), np.float32)
            for _ in range(2)
        ]
        self._buf_idx = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def reset_stats(self) -> None:
        """Zero the counters (e.g. after a warm-up batch, so compile time
        does not pollute steady-state ``stats.slices_per_sec``)."""
        self.stats = EngineStats()
        self._busy_until = 0.0

    # ------------------------------------------------------------ client
    def submit(self, x: np.ndarray) -> Future:
        """Enqueue one `(H, W, C_in)` request; returns a Future of
        `(H, W, C_out)`."""
        x = np.asarray(x, np.float32)
        if x.shape != self.input_shape:
            raise ValueError(
                f"request shape {x.shape} != engine input {self.input_shape}"
            )
        item = _Pending(x=x, future=Future())
        # lock against close(): without it a request enqueued between the
        # closed-check and put() could land after the close sentinel and
        # never resolve
        with self._close_lock:
            if self._closed:
                raise RuntimeError("engine is closed")
            self._queue.put(item)
        return item.future

    def predict(self, x: np.ndarray) -> np.ndarray:
        """Blocking single-request convenience."""
        return self.submit(x).result()

    def predict_many(self, xs: List[np.ndarray]) -> List[np.ndarray]:
        futures = [self.submit(x) for x in xs]
        return [f.result() for f in futures]

    def close(self):
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # --------------------------------------------------------- dispatcher
    def _collect(self, buf: np.ndarray) -> Optional[List[_Pending]]:
        """Block for the first request, then drain up to batch_size within
        max_delay, copying each request row straight into ``buf`` (the
        assembly memcpy overlaps queue waits instead of bursting at
        dispatch)."""
        first = self._queue.get()
        if first is None:
            return None
        # assembly clock starts at the first request: the blocking wait
        # above is idle time, not assembly overhead
        t_asm = time.perf_counter()
        buf[0] = first.x
        batch = [first]
        deadline = time.monotonic() + self.max_delay_s
        while len(batch) < self.batch_size:
            remaining = deadline - time.monotonic()
            try:
                nxt = (
                    self._queue.get_nowait()
                    if remaining <= 0
                    else self._queue.get(timeout=remaining)
                )
            except queue.Empty:
                break
            if nxt is None:  # close sentinel: put it back for the loop
                self._queue.put(None)
                break
            buf[len(batch)] = nxt.x
            batch.append(nxt)
        self.stats.assemble_time_s += time.perf_counter() - t_asm
        return batch

    @staticmethod
    def _set(future: Future, *, result=None, exception=None) -> None:
        """Resolve a future, tolerating client-side cancellation — a raised
        InvalidStateError here would kill the dispatcher thread and hang
        every later request."""
        try:
            if exception is not None:
                future.set_exception(exception)
            else:
                future.set_result(result)
        except Exception:
            pass  # future was cancelled by the client; nothing to deliver

    def _resolve(self, pending) -> None:
        """Fetch a dispatched batch's device result and resolve futures."""
        dev_out, batch, t0 = pending
        t_fetch = time.perf_counter()
        try:
            out = np.asarray(dev_out)  # host fetch = the device sync
        except Exception as e:
            for p in batch:
                self._set(p.future, exception=e)
            return
        self.stats.fetch_time_s += time.perf_counter() - t_fetch
        now = time.perf_counter()
        n = len(batch)
        self.stats.requests += n
        self.stats.batches += 1
        self.stats.padded_slots += self.batch_size - n
        # under double buffering batch N resolves after batch N+1 was
        # dispatched, so [t0, now] intervals OVERLAP; accumulate only the
        # non-overlapping part so slices_per_sec reflects wall-clock
        self.stats.total_batch_time_s += now - max(t0, self._busy_until)
        self._busy_until = now
        for i, p in enumerate(batch):
            self._set(p.future, result=out[i])

    def _loop(self):
        # Double-buffered dispatch: JAX dispatch is asynchronous — the
        # jitted call returns device arrays immediately and only the host
        # fetch (np.asarray) synchronizes.  Keeping ONE batch in flight
        # lets the host assemble + dispatch batch N+1 while the device is
        # still computing batch N, so under sustained load the device never
        # idles on host work.  A lone request still resolves immediately:
        # with an empty queue the pending batch is fetched before blocking.
        pending = None
        while True:
            if pending is not None and self._queue.empty():
                self._resolve(pending)
                pending = None
                continue
            xs = self._buffers[self._buf_idx]
            batch = self._collect(xs)
            if batch is None:
                if pending is not None:
                    self._resolve(pending)
                return
            n = len(batch)
            if n < self.batch_size:
                # wrap-pad to the static batch so the compiled program is
                # reused (padding repeats real rows; results are discarded)
                t_pad = time.perf_counter()
                for i in range(n, self.batch_size):
                    xs[i] = xs[i % n]
                self.stats.assemble_time_s += time.perf_counter() - t_pad
            t0 = time.perf_counter()
            try:
                dev_out = self._apply(xs)  # async dispatch, no sync here
            except Exception as e:  # resolve, don't kill the dispatcher
                for p in batch:
                    self._set(p.future, exception=e)
                continue  # buffer not in flight (dispatch failed): reuse it
            # flip only after a successful dispatch: the other buffer's
            # batch (pending) resolves before that buffer is reused, so an
            # in-flight input is never overwritten
            self._buf_idx ^= 1
            if pending is not None:
                self._resolve(pending)
            pending = (dev_out, batch, t0)


def engine_from_model(
    model_name: str = "unet",
    models_dir: str = "models",
    quant: str = "none",
    batch_size: int = 128,
    image_size: Tuple[int, int] = (256, 256),
    calibration_batches: Optional[List] = None,
    cfg=None,
    data_parallel: bool = False,
    require_checkpoint: bool = True,
    **engine_kwargs,
) -> InferenceEngine:
    """Build a serving engine from a checkpoint.

    quant='none': BN-folded bf16 forward (the 1,627 slices/s path).
    quant='int8': serve/quant.py int8 forward (the 2,246 slices/s path);
    requires `calibration_batches` (a few `(B, H, W, 2)` arrays).
    quant='int8_fused': int8-resident activations (requant in the conv
    epilogue, `unet_int8_fused_apply`) — same tables and calibration.
    data_parallel=True shards each micro-batch over the ('data',) axis of a
    mesh spanning all local devices (params replicated) — serving DP over
    ICI; batch_size must divide by the device count.
    """
    import jax
    import jax.numpy as jnp

    from mrisr_tpu.api import load_model

    # require_checkpoint=True by default: load_model's fresh-weight
    # fallback is useful for tests, but a serving engine quietly built on
    # random weights (typo'd models_dir, unsynced checkpoint) would serve
    # garbage with no error
    loaded = load_model(
        model_name, models_dir=models_dir, image_size=image_size,
        cfg=cfg, fold_bn=True,
        checkpoint="required" if require_checkpoint else None,
    )
    if loaded.kind != "pair":
        raise ValueError(
            "the serving engine batches 2-in/1-out pair models; "
            f"{model_name!r} is kind={loaded.kind!r}"
        )
    if quant in ("int8", "int8_fused"):
        from mrisr_tpu.serve.quant import (
            calibrate_unet,
            quantize_unet,
            unet_int8_apply,
            unet_int8_fused_apply,
        )

        if "enc1" not in loaded.variables.get("params", {}):
            # quantize_unet walks the UNet block names (enc*/dec*/bottleneck)
            raise ValueError(
                "int8 serving covers the UNet-family topology; "
                f"{model_name!r} has no enc1 block — serve it with "
                "quant='none'"
            )
        if not calibration_batches:
            raise ValueError("int8 serving requires calibration_batches")
        qparams = quantize_unet(
            loaded.variables, calibrate_unet(loaded.variables, calibration_batches)
        )
        fwd = unet_int8_fused_apply if quant == "int8_fused" else unet_int8_apply
        apply_fn = jax.jit(lambda x: fwd(qparams, x))
    else:
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            loaded.variables,
        )
        module = loaded.module
        apply_fn = jax.jit(
            lambda x: module.apply(variables, x, train=False).astype(jnp.float32)
        )
    if data_parallel:
        apply_fn = data_parallel_apply(apply_fn, batch_size)

    return InferenceEngine(
        apply_fn, batch_size=batch_size,
        input_shape=(image_size[0], image_size[1], 2), **engine_kwargs,
    )


def data_parallel_apply(apply_fn, batch_size: int):
    """Wrap a jitted ``(B, H, W, C) -> (B, H, W, C')`` forward to run
    data-parallel over the ('data',) axis of a mesh spanning all local
    devices (params replicated as jit constants) — serving DP over ICI.
    batch_size must divide by the device count.  Works for any
    batch-independent forward, including a diffusion bundle's packaged
    T-step sampler."""
    import jax
    from jax.sharding import PartitionSpec as P

    from mrisr_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh()
    n_dev = mesh.devices.size
    if batch_size % n_dev:
        raise ValueError(
            f"batch_size {batch_size} must divide over {n_dev} devices"
        )
    sharding = batch_sharding(mesh)
    sharded_fwd = jax.jit(
        apply_fn, out_shardings=jax.NamedSharding(mesh, P())
    )

    def wrapped(x, _fwd=sharded_fwd, _sh=sharding):
        # place each micro-batch sharded on 'data' straight from the
        # host numpy array (wrapping in jnp.asarray first would commit
        # the whole batch to device 0 and re-distribute it); GSPMD runs
        # the forward per shard, params replicated; gather at the end
        return _fwd(jax.device_put(x, _sh))

    return wrapped

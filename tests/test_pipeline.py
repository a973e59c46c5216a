"""End-to-end data pipeline tests on a synthetic packed store."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrisr_tpu.config import DataConfig
from mrisr_tpu.data.pipeline import (
    SliceBank,
    TripletLoader,
    WindowLoader,
    _AugmentSpec,
    build_loader,
    preprocess_volume,
)
from mrisr_tpu.data.split import patient_level_split
from mrisr_tpu.data.synthetic import make_synthetic_store
from mrisr_tpu.data.volumes import VolumeStore


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("packed")
    return make_synthetic_store(
        str(d), num_patients=8, slices_per_volume=12, height=64, width=64
    )


def test_store_roundtrip(store):
    assert len(store) == 8
    reopened = VolumeStore.open(store.root)
    assert [e.file for e in reopened.entries] == [e.file for e in store.entries]
    vol = reopened.load_series(0)
    assert vol.shape == (12, 64, 64)
    assert vol.dtype == np.float32


def test_patient_split_is_deterministic_and_disjoint(store):
    train, val, test = patient_level_split(store.patient_ids)
    assert set(train) | set(val) | set(test) == set(store.patient_ids)
    assert not (set(train) & set(val)) and not (set(val) & set(test))
    train2, val2, test2 = patient_level_split(store.patient_ids)
    assert (train, val, test) == (train2, val2, test2)


def test_split_fractions_match_reference():
    # with 100 patients: 70 / 12 / 18 (SURVEY.md D8)
    ids = [f"P{i:03d}" for i in range(100)]
    train, val, test = patient_level_split(ids)
    assert len(train) == 70 and len(val) == 12 and len(test) == 18


def test_preprocess_volume_order(store):
    vol = np.asarray(store.load_series(0))
    out = preprocess_volume(vol, (32, 32))
    assert out.shape == (12, 32, 32)
    # z-score happened at native res BEFORE resize: resized slices need not
    # have exactly zero mean, but must be close for smooth images
    assert abs(out[0].mean()) < 0.2


def test_preprocess_value_range_minmax11(store):
    """value_range='zscore_minmax11' (the fastddpm_simple preset, whose M10
    sampler clamps to [-1, 1] — ModelLoader.py:636): every slice spans
    exactly [-1, 1]; the default stays plain z-score."""
    vol = np.asarray(store.load_series(0))
    out = preprocess_volume(vol, (32, 32), value_range="zscore_minmax11")
    assert out.shape == (12, 32, 32)
    np.testing.assert_allclose(out.min(axis=(1, 2)), -1.0, atol=1e-5)
    np.testing.assert_allclose(out.max(axis=(1, 2)), 1.0, atol=1e-5)
    # affine per slice w.r.t. the default path (same structure, new range)
    base = preprocess_volume(vol, (32, 32))
    c = np.corrcoef(base[0].ravel(), out[0].ravel())[0, 1]
    assert c > 0.99999
    with pytest.raises(ValueError, match="value_range"):
        preprocess_volume(vol, (32, 32), value_range="bogus")


def test_build_loader_value_range(store):
    """DataConfig.value_range flows through build_loader into the bank."""
    cfg = DataConfig(batch_size=4, image_size=(32, 32),
                     value_range="zscore_minmax11", prefetch=0)
    loader = build_loader(store, "train", cfg)
    b = np.asarray(next(iter(loader)))
    assert b.min() >= -1.0 - 1e-5 and b.max() <= 1.0 + 1e-5


def test_triplet_loader_batches(store):
    bank = SliceBank(store, list(range(len(store))), image_size=(64, 64))
    loader = TripletLoader(bank, None, batch_size=8, shuffle=True, seed=1)
    # 8 series x 12 slices: (12-2) + (12-4) = 18 per series -> 144 samples
    assert loader.num_samples == 144
    batches = list(loader)
    assert len(batches) == 18  # ceil(144/8) with wrap-pad
    for b in batches:
        assert b.shape == (8, 64, 64, 3)
        assert b.dtype == jnp.float32


def test_triplet_loader_content_matches_manual(store):
    """Batch content must equal the manually normalized gathered slices."""
    bank = SliceBank(store, [0], image_size=(64, 64))
    loader = TripletLoader(bank, 2, batch_size=5, shuffle=False, seed=0)
    batch = next(iter(loader))  # first 5 d2 triplets of series 0
    vol = np.asarray(store.load_series(0))
    norm = np.stack(
        [(s - s.mean()) / (s.std() + 1e-6) for s in vol]
    )
    for j in range(5):
        np.testing.assert_allclose(
            np.asarray(batch[j, :, :, 0]), norm[j], atol=1e-5
        )  # pre = slice j
        np.testing.assert_allclose(
            np.asarray(batch[j, :, :, 1]), norm[j + 2], atol=1e-5
        )  # post = j+2
        np.testing.assert_allclose(
            np.asarray(batch[j, :, :, 2]), norm[j + 1], atol=1e-5
        )  # target = j+1


def test_distance_filters(store):
    bank = SliceBank(store, list(range(len(store))), image_size=(64, 64))
    l2 = TripletLoader(bank, 2, batch_size=4, shuffle=False)
    l4 = TripletLoader(bank, 4, batch_size=4, shuffle=False)
    assert l2.num_samples == 8 * 10
    assert l4.num_samples == 8 * 8
    assert (l2.distances == 2).all()
    assert (l4.distances == 4).all()


def test_window_loader(store):
    bank = SliceBank(store, list(range(len(store))), image_size=(64, 64))
    loader = WindowLoader(bank, batch_size=4, shuffle=False, drop_last=True)
    assert loader.num_samples == 8 * 8
    b = next(iter(loader))
    assert b.shape == (4, 64, 64, 5)
    # consecutive window: channel j is slice j of series 0
    vol = np.asarray(store.load_series(0))
    norm0 = (vol[3] - vol[3].mean()) / (vol[3].std() + 1e-6)
    np.testing.assert_allclose(np.asarray(b[0, :, :, 3]), norm0, atol=1e-5)


def test_augmentation_is_paired(store):
    bank = SliceBank(store, [0], image_size=(64, 64))
    aug = _AugmentSpec(enabled=True, hflip=True, vflip=True, rot90=True)
    loader = TripletLoader(
        bank, None, batch_size=6, shuffle=False, seed=3, augment=aug
    )
    plain = TripletLoader(bank, None, batch_size=6, shuffle=False, seed=3)
    a = np.asarray(next(iter(loader)))
    p = np.asarray(next(iter(plain)))
    # each sample must be one of the 16 paired transforms of the original
    for j in range(6):
        cands = []
        for fh in (False, True):
            for fv in (False, True):
                for k in range(4):
                    x = p[j]
                    if fh:
                        x = x[:, ::-1]
                    if fv:
                        x = x[::-1]
                    x = np.rot90(x, k=k, axes=(0, 1))
                    cands.append(x)
        assert any(
            np.allclose(a[j], c, atol=1e-5) for c in cands
        ), f"sample {j} is not a paired transform"


def test_augmentation_epochs_differ(store):
    bank = SliceBank(store, [0], image_size=(64, 64))
    aug = _AugmentSpec(enabled=True)
    loader = TripletLoader(
        bank, None, batch_size=18, shuffle=False, seed=3, augment=aug
    )
    e1 = np.asarray(next(iter(loader)))
    e2 = np.asarray(next(iter(loader)))
    assert not np.allclose(e1, e2)


def test_build_loader_end_to_end(store):
    cfg = DataConfig(batch_size=4, augment=True, image_size=(64, 64))
    tr = build_loader(store, "train", cfg)
    va = build_loader(store, "val", cfg)
    te = build_loader(store, "test", cfg)
    total = tr.num_samples + va.num_samples + te.num_samples
    assert total == 144  # all triplets, split by patient
    b = next(iter(tr))
    assert b.shape == (4, 64, 64, 3)


def test_device_backend_gather(store):
    bank = SliceBank(store, [0, 1], image_size=(64, 64), backend="device")
    loader = TripletLoader(bank, None, batch_size=4, shuffle=False)
    b = next(iter(loader))
    assert b.shape == (4, 64, 64, 3)
    host_bank = SliceBank(store, [0, 1], image_size=(64, 64))
    hb = next(iter(TripletLoader(host_bank, None, batch_size=4, shuffle=False)))
    # device bank stores bf16 -> ~2-3 significant digits on z-scores
    np.testing.assert_allclose(np.asarray(b), np.asarray(hb), atol=0.05)


def test_tiny_dataset_wrap_pad(store):
    """Batch size larger than the dataset: wrap-pad must tile."""
    bank = SliceBank(store, [0], image_size=(64, 64))
    loader = TripletLoader(bank, 4, batch_size=32, shuffle=False)  # 8 samples
    b = next(iter(loader))
    assert b.shape == (32, 64, 64, 3)


def test_prefetch_iterator_equivalence(store):
    from mrisr_tpu.data.pipeline import PrefetchIterator

    bank = SliceBank(store, [0], image_size=(64, 64))
    base = TripletLoader(bank, None, batch_size=6, shuffle=False, seed=5)
    pre = PrefetchIterator(
        TripletLoader(bank, None, batch_size=6, shuffle=False, seed=5),
        depth=2,
    )
    a = [np.asarray(b) for b in base]
    b = [np.asarray(x) for x in pre]
    assert len(a) == len(b) == len(base) == len(pre)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_prefetch_iterator_early_break_stops_worker(store):
    """Abandoning a prefetching iteration mid-way must not leak a worker
    thread blocked in q.put() holding batches."""
    import threading
    import time

    from mrisr_tpu.data.pipeline import PrefetchIterator

    bank = SliceBank(store, [0, 1], image_size=(64, 64))
    before = threading.active_count()
    for _ in range(5):
        pre = PrefetchIterator(
            TripletLoader(bank, None, batch_size=2, shuffle=False), depth=1
        )
        it = iter(pre)
        next(it)  # take one batch, then abandon
        it.close()
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1  # workers exited


def test_prefetch_slow_consumer_keeps_tail_batches(store):
    """A consumer slower than the producer must still see EVERY batch.

    Deterministic reproduction of the r2 tail-drop bug: with depth=2 the
    queue is full when the producer finishes, and the old sentinel path
    evicted up to ``depth`` real batches to make room for _END.  Guards the
    reference DataLoader contract of every-batch-delivered-once
    (/root/reference/src/ModelDataGenerator.py:276-282).
    """
    import time

    from mrisr_tpu.data.pipeline import PrefetchIterator

    bank = SliceBank(store, [0, 1], image_size=(64, 64))
    base = TripletLoader(bank, None, batch_size=3, shuffle=False, seed=7)
    expected = [np.asarray(b) for b in base]
    assert len(expected) >= 4  # need a real tail beyond the queue depth
    for _ in range(3):  # repeat: the old bug was timing-dependent
        pre = PrefetchIterator(
            TripletLoader(bank, None, batch_size=3, shuffle=False, seed=7),
            depth=2,
        )
        got = []
        for b in pre:
            time.sleep(0.05)  # consumer strictly slower than producer
            got.append(np.asarray(b))
        assert len(got) == len(expected)
        for x, y in zip(expected, got):
            np.testing.assert_array_equal(x, y)


def test_prefetch_propagates_loader_errors(store):
    """An exception in the producer thread must surface in the consumer,
    not silently truncate the epoch."""
    import pytest

    from mrisr_tpu.data.pipeline import PrefetchIterator

    class Boom(Exception):
        pass

    def broken():
        yield np.zeros((2, 4, 4, 3), np.float32)
        raise Boom("loader failed")

    class BrokenLoader:
        def __iter__(self):
            return broken()

        def __len__(self):
            return 2

    pre = PrefetchIterator(BrokenLoader(), depth=2)
    with pytest.raises(Boom):
        list(pre)


def test_host_shard_patients():
    from mrisr_tpu.data.pipeline import host_shard_patients

    ps = [f"P{i}" for i in range(10)]
    shards = [host_shard_patients(ps, i, 4) for i in range(4)]
    flat = [p for s in shards for p in s]
    assert sorted(flat) == sorted(ps)
    assert all(len(s) in (2, 3) for s in shards)
    # single-process: identity
    assert host_shard_patients(ps, 0, 1) == ps

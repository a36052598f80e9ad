import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grafp_tpu.core.config import Config
from grafp_tpu.dsp.augment import AugmentBanks
from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
from grafp_tpu.fp.builder import (
    FingerprintPipeline,
    create_db,
    create_dummy_db,
    create_fp_db,
)
from grafp_tpu.models import build_model
from grafp_tpu.retrieval.memmap_io import load_memmap_data


def tiny_cfg():
    return Config(fs=1000, win_len=256, hop_len=128, n_fft=256, n_mels=16,
                  n_frames=8, overlap=0.5, val_snr=[10, 10])


@pytest.fixture(scope="module")
def pipe():
    cfg = tiny_cfg()
    model = build_model(cfg)
    v = model.init({"params": jax.random.key(0)},
                   jnp.zeros((1, 16, 8)), False)
    return cfg, FingerprintPipeline(
        model, cfg, v["params"], v.get("batch_stats", {}),
        batch_size=16, bucket_s=2.0,
    )


def test_track_logmel_exact_vs_centered(pipe, rng):
    """Bucketed/pre-padded track spectrogram must equal the plain
    centered computation for every frame (exact-tail contract)."""
    cfg, p = pipe
    mcfg = LogMelConfig.from_config(cfg)
    for t_len in (1000, 1503, 2000, 4096):
        wave = rng.randn(t_len).astype(np.float32) * 0.2
        ref = np.asarray(log_mel_spectrogram(jnp.asarray(wave), mcfg))
        got = p.track_logmel(wave)
        assert got.shape == ref.shape == (16, 1 + t_len // 128)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_segments_shape(pipe, rng):
    cfg, p = pipe
    segs = p.segments_for(rng.randn(3000).astype(np.float32))
    # frames = 1+3000//128 = 24; segments = (24-8)//4+1 = 5
    assert segs.shape == (5, 16, 8)


def test_embed_stream_order_and_fullness(pipe, rng, tmp_path):
    cfg, p = pipe
    from grafp_tpu.retrieval.memmap_io import MemmapWriter

    blocks = [rng.randn(n, 16, 8).astype(np.float32) for n in (5, 23, 1, 0, 7)]
    w = MemmapWriter(str(tmp_path), "t", p.d, capacity=100)
    n = p.embed_stream(iter(blocks), w)
    assert n == 36
    w.close()
    data, shape = load_memmap_data(str(tmp_path), "t", display=False)
    assert tuple(shape) == (36, p.d)
    # row order must match per-block embedding
    ref = []
    for blk in blocks:
        for j in range(len(blk)):
            ref.append(blk[j])
    ref = np.stack(ref)
    pad = np.zeros((16 - 36 % 16, 16, 8), np.float32)
    # re-embed in the same batch partitioning to compare exactly
    z_all = []
    buf = np.concatenate([ref, pad])
    for j in range(0, len(buf), 16):
        z_all.append(np.asarray(p._embed(jnp.asarray(buf[j:j + 16]))))
    z_all = np.concatenate(z_all)[:36]
    np.testing.assert_allclose(np.asarray(data), z_all, rtol=1e-4, atol=1e-5)


def _fake_loader(rng, n_tracks, t=3000):
    tracks = [rng.randn(t + 100 * i).astype(np.float32) * 0.3
              for i in range(n_tracks)]

    class L:
        def __len__(self):
            return len(tracks)

        def __iter__(self):
            return iter(tracks)

    return L()


def test_create_dummy_db(pipe, rng, tmp_path):
    cfg, p = pipe
    n, d = create_dummy_db(_fake_loader(rng, 4), p, str(tmp_path),
                           verbose=False)
    data, shape = load_memmap_data(str(tmp_path), "dummy_db", display=False)
    assert shape[0] == n and shape[1] == d == 128
    norms = np.linalg.norm(np.asarray(data), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_fingerprint_tracks_packed_matches_single(pipe, rng):
    """The packed (K, L) program must reproduce per-track fingerprints
    (same math; eval-mode BN has no cross-row coupling) across
    same-length runs, repeat-padded short groups, singletons of a
    different bucket, and too-short tracks."""
    cfg, p = pipe
    waves = [
        rng.randn(3000).astype(np.float32) * 0.3,   # bucket 4000 run
        rng.randn(3100).astype(np.float32) * 0.3,
        rng.randn(3500).astype(np.float32) * 0.3,
        rng.randn(5200).astype(np.float32) * 0.3,   # bucket 6000 singleton
        rng.randn(100).astype(np.float32) * 0.3,    # too short: (0, d)
        rng.randn(2900).astype(np.float32) * 0.3,   # back to bucket 4000
    ]
    ref = [p.fingerprint_track(w) for w in waves]
    for pack in (1, 2, 8):
        got = p.fingerprint_tracks(waves, pack=pack)
        assert len(got) == len(ref)
        for g, r in zip(got, ref):
            assert g.shape == r.shape
            np.testing.assert_allclose(g, r, rtol=1e-4, atol=1e-5)


def test_create_dummy_db_pack_equivalence(pipe, rng, tmp_path):
    """pack=1 (round-4 per-track path) and packed builds write the same
    memmap rows in the same order."""
    cfg, p = pipe
    d1, d3 = tmp_path / "p1", tmp_path / "p3"
    d1.mkdir(), d3.mkdir()
    loader = _fake_loader(rng, 5)  # re-iterable: same tracks both builds
    n1, _ = create_dummy_db(loader, p, str(d1), verbose=False, pack=1)
    n3, _ = create_dummy_db(loader, p, str(d3), verbose=False, pack=3)
    assert n1 == n3
    a, _ = load_memmap_data(str(d1), "dummy_db", display=False)
    b, _ = load_memmap_data(str(d3), "dummy_db", display=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_create_fp_db_row_alignment(pipe, rng, tmp_path):
    cfg, p = pipe
    banks = AugmentBanks.from_arrays(
        noise_clips=[rng.randn(5000).astype(np.float32)],
        ir_clips=[np.r_[1.0, np.zeros(15)].astype(np.float32)],
        noise_len=5000, ir_len=16,
    )
    n, d = create_fp_db(_fake_loader(rng, 3), p, banks, str(tmp_path),
                        verbose=False)
    db, db_shape = load_memmap_data(str(tmp_path), "db", display=False)
    q, q_shape = load_memmap_data(str(tmp_path), "query", display=False)
    assert tuple(db_shape) == tuple(q_shape) == (n, 128)
    # corrupted queries stay closest to their own clean row on average
    sims = np.asarray(db) @ np.asarray(q).T
    own = np.diag(sims).mean()
    other = (sims.sum() - np.trace(sims)) / (sims.size - len(sims))
    assert own > other


def test_corrupt_tracks_matches_per_track(pipe, rng):
    """The vmapped packed corruption must reproduce each per-track
    corrupt_track call: the random draws (clip row, offset, SNR, take)
    are KEY-exact — threefry depends only on the lane's key — so any
    deviation is f32 rounding from batched GEMM scheduling (measured
    ~2e-7; an off-by-one draw would be O(1))."""
    import jax

    from grafp_tpu.fp.builder import track_corruption_keys

    cfg, p = pipe
    banks = AugmentBanks.from_arrays(
        noise_clips=[rng.randn(5000).astype(np.float32),
                     rng.randn(3000).astype(np.float32)],
        ir_clips=[np.r_[1.0, rng.randn(15) * 0.1].astype(np.float32)],
        noise_len=5000, ir_len=16,
    )
    # equal-length run (packed) + a different length (singleton fallback)
    waves = [rng.randn(3000).astype(np.float32) * 0.3 for _ in range(5)]
    waves.append(rng.randn(4200).astype(np.float32) * 0.3)
    subs = track_corruption_keys(3, len(waves))
    ref = []
    for w, s in zip(waves, subs):
        k = jax.random.wrap_key_data(np.asarray(s))
        ref.append(p.corrupt_track(w, banks, k, ir_prob=1.0))
    for pack in (3, 8):
        got = p.corrupt_tracks(waves, banks, subs, ir_prob=1.0, pack=pack)
        for g, r in zip(got, ref):
            assert g.shape == r.shape
            np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-5)


def test_create_fp_db_pack_equivalence(pipe, rng, tmp_path):
    """Packed pair build == per-track pair build: same db AND query rows
    (the corruption keys and row alignment survive packing)."""
    cfg, p = pipe
    banks = AugmentBanks.from_arrays(
        noise_clips=[rng.randn(5000).astype(np.float32)],
        ir_clips=[np.r_[1.0, rng.randn(15) * 0.1].astype(np.float32)],
        noise_len=5000, ir_len=16,
    )
    tracks = [rng.randn(3000).astype(np.float32) * 0.3 for _ in range(5)]

    class L:
        def __len__(self):
            return len(tracks)

        def __iter__(self):
            return iter(tracks)

    d1, d3 = tmp_path / "q1", tmp_path / "q3"
    d1.mkdir(), d3.mkdir()
    n1, _ = create_fp_db(L(), p, banks, str(d1), seed=0, verbose=False,
                         pack=1)
    n3, _ = create_fp_db(L(), p, banks, str(d3), seed=0, verbose=False,
                         pack=3)
    assert n1 == n3
    for fname in ("db", "query"):
        a, _ = load_memmap_data(str(d1), fname, display=False)
        b, _ = load_memmap_data(str(d3), fname, display=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_create_db_npy(pipe, rng, tmp_path):
    cfg, p = pipe
    fp = create_db(_fake_loader(rng, 2), p, str(tmp_path), verbose=False)
    saved = np.load(str(tmp_path / "fingerprints.npy"))
    np.testing.assert_array_equal(fp, saved)
    assert saved.shape[1] == 128


def test_ordered_overlap_preserves_order_and_bounds_inflight():
    import threading
    import time as _time

    from grafp_tpu.fp.builder import _ordered_overlap

    lock = threading.Lock()
    live = {"now": 0, "peak": 0}

    def work(x):
        with lock:
            live["now"] += 1
            live["peak"] = max(live["peak"], live["now"])
        _time.sleep(0.002 * (x % 3))  # ragged latencies scramble finish order
        with lock:
            live["now"] -= 1
        return x * x

    out = list(_ordered_overlap(work, range(50), workers=3, inflight=4))
    assert out == [x * x for x in range(50)]  # submission order kept
    assert live["peak"] <= 4


def test_create_fp_db_key_sequence_matches_serial(pipe, rng, tmp_path):
    """The overlapped pair builder must draw the exact per-track key
    sequence of the old serial loop (key, sub = split(key) per track):
    corruption - hence every query row - is bit-identical."""
    import jax

    key = jax.random.key(0)
    expect = []
    for _ in range(3):
        key, sub = jax.random.split(key)
        expect.append(np.asarray(jax.random.key_data(sub)))

    from grafp_tpu.fp import builder as builder_mod

    seen = []
    orig = builder_mod.FingerprintPipeline.corrupt_track

    def spy(self, wave, banks, k, ir_prob=1.0):
        seen.append(np.asarray(jax.random.key_data(k)))
        return orig(self, wave, banks, k, ir_prob=ir_prob)

    cfg, p = pipe
    from grafp_tpu.dsp.augment import AugmentBanks

    banks = AugmentBanks.from_arrays(
        noise_clips=[rng.randn(5000).astype(np.float32)],
        ir_clips=[np.r_[1.0, rng.randn(15) * 0.1].astype(np.float32)],
        noise_len=5000, ir_len=16,
    )
    import unittest.mock as mock

    with mock.patch.object(builder_mod.FingerprintPipeline, "corrupt_track",
                           spy):
        create_fp_db(_fake_loader(rng, 3), p, banks, str(tmp_path),
                     seed=0, verbose=False)
    assert len(seen) == 3
    for got, exp in zip(sorted(map(tuple, seen)), sorted(map(tuple, expect))):
        assert got == exp


def test_track_corruption_keys_bit_identical_to_eager_chain():
    """ADVICE r3: the one-dispatch lax.scan key chain must reproduce the
    eager `key, sub = split(key)` sequence bit-for-bit (the overlapped
    DB build's corruption sequence contract depends on it)."""
    import jax

    from grafp_tpu.fp.builder import track_corruption_keys

    key = jax.random.key(123)
    eager = []
    for _ in range(17):
        key, sub = jax.random.split(key)
        eager.append(np.asarray(jax.random.key_data(sub)))
    scanned = track_corruption_keys(123, 17)
    np.testing.assert_array_equal(np.stack(eager), scanned)
    assert track_corruption_keys(123, 0).shape[0] == 0

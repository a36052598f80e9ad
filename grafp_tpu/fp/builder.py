"""Fingerprint database builders (reference test_fp.py:87-158,
generate.py:34-57), engineered for static shapes and full batches.

The reference feeds whole tracks through the model one at a time with
ad-hoc chunking (split at 256 segments / torch.split(128)). Here:

  * track audio lengths are BUCKETED (next multiple of bucket_s seconds)
    so the log-mel+unfold program compiles once per bucket, not per
    track; the tail is handled exactly - the true track is reflect-padded
    on host before zero-padding to the bucket, and only the
    reference-defined segment count is kept, so every emitted segment is
    bit-equal to an unbucketed computation;
  * segments from consecutive tracks are packed into one rolling
    (batch_size, n_mels, n_frames) buffer - the embed program always
    sees FULL batches of one shape (the MXU never runs a ragged batch);
  * fingerprints stream straight into the reference's float32 memmap
    format (memmap_io.MemmapWriter) - a 31M-row DB never materializes
    in RAM.

Query corruption (IR + SNR noise on the full track) runs on device via
dsp.augment, equivalent to the reference's val_transform chain
(transformations.py:34-48,97-109).
"""

from __future__ import annotations

import functools
import math
import threading
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from grafp_tpu.dsp.augment import AugmentBanks, augment_waveforms
from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram
from grafp_tpu.dsp.segment import num_segments, unfold_segments
from grafp_tpu.retrieval.memmap_io import MemmapWriter


class FingerprintPipeline:
    """Jitted building blocks shared by all DB builders."""

    def __init__(self, model, cfg, params, batch_stats,
                 batch_size: int = 256, bucket_s: float = 10.0,
                 extra_variables=None):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        # extra variable collections beyond params/batch_stats, e.g. the
        # 'act_scales' calibration for serve_quant='int8_static'
        # (models/simclr.calibrate_act_scales)
        self.extra_variables = dict(extra_variables or {})
        self.batch_size = batch_size
        self.fs = int(cfg["fs"])
        self.bucket = int(bucket_s * self.fs)
        self.n_fft = int(cfg["n_fft"])
        self.hop = int(cfg["hop_len"])
        self.n_frames = int(cfg["n_frames"])
        self.step = cfg.seg_hop_frames
        self.d = int(cfg["d"])
        self.mcfg = LogMelConfig.from_config(cfg)
        self.mcfg_nopad = LogMelConfig(
            sample_rate=self.mcfg.sample_rate, n_fft=self.mcfg.n_fft,
            win_length=self.mcfg.win_length, hop_length=self.mcfg.hop_length,
            n_mels=self.mcfg.n_mels, center=False,
        )

        variables = {"params": params, "batch_stats": batch_stats,
                     **self.extra_variables}
        self._variables = variables
        # serve_quant='int8_static' needs the 'act_scales' collection;
        # when the caller (e.g. the reference-contract CLIs, which only
        # know params/batch_stats) didn't supply one, calibrate lazily
        # on the first data this pipeline sees (_ensure_calibrated).
        quant = str(cfg.get("serve_quant") or "none").lower()
        self._needs_calibration = (
            quant == "int8_static" and "act_scales" not in variables
        )
        self._calib_lock = threading.Lock()
        self._corrupt_cache: dict = {}

        @functools.partial(jax.jit, static_argnames=())
        def _embed(spec):
            _, z = model.apply(variables, spec, False)
            return z

        self._embed = _embed

        @functools.partial(jax.jit, static_argnames=("n_true_frames",))
        def _track_spec(padded_wave, n_true_frames):
            mel = log_mel_spectrogram(padded_wave, self.mcfg_nopad)
            return mel[:, :, :n_true_frames]  # (B, n_mels, true frames)

        self._track_spec = _track_spec

        snr = tuple(float(s) for s in cfg["val_snr"])
        self._val_snr = snr

        # ---- fused per-track device program (one compile per length
        # bucket): padded wave -> log-mel -> unfold -> batched embed ->
        # all fingerprints. Only the wave goes up and the (S, d)
        # fingerprints come down - essential on a remote-attached TPU
        # where per-track host<->device round trips dominate (measured:
        # staging segments through the host capped the build at ~1k fp/s
        # vs ~7k fp/s model throughput).
        @functools.partial(jax.jit, static_argnames=())
        def _embed_track(padded_wave):
            mel = log_mel_spectrogram(padded_wave, self.mcfg_nopad)[0]
            total = mel.shape[1]
            s_b = (total - self.n_frames) // self.step + 1
            segs = unfold_segments(mel, self.n_frames, self.step)
            nb = -(-s_b // self.batch_size)
            pad = nb * self.batch_size - s_b
            segs = jnp.pad(segs, ((0, pad), (0, 0), (0, 0)))
            batches = segs.reshape(nb, self.batch_size, *segs.shape[1:])
            zs = jax.lax.map(self._embed, batches)
            return zs.reshape(nb * self.batch_size, -1)

        self._embed_track = _embed_track

        # ---- packed multi-track program: (K, L) padded waves in ONE
        # upload/dispatch/fetch. The dummy build is transport-bound on
        # the remote-attached TPU (~95 ms of fixed round-trip cost per
        # track vs ~14 ms of model compute), so amortizing the round
        # trip over K tracks is the big lever at fma_medium/large scale.
        # Same per-segment math as _embed_track (eval-mode BN uses
        # running stats, so rows are independent of batch packing).
        # One compile per (K, bucketed length) — callers pad short
        # groups up to K by repeating a wave and drop the extra rows.
        @functools.partial(jax.jit, static_argnames=())
        def _embed_tracks(padded_waves):
            mel = log_mel_spectrogram(padded_waves, self.mcfg_nopad)
            k, _, total = mel.shape
            s_b = (total - self.n_frames) // self.step + 1
            segs = jax.vmap(
                lambda m: unfold_segments(m, self.n_frames, self.step)
            )(mel)                                  # (K, s_b, n_mels, n_frames)
            segs = segs.reshape(k * s_b, *segs.shape[2:])
            nb = -(-(k * s_b) // self.batch_size)
            pad = nb * self.batch_size - k * s_b
            segs = jnp.pad(segs, ((0, pad), (0, 0), (0, 0)))
            batches = segs.reshape(nb, self.batch_size, *segs.shape[1:])
            zs = jax.lax.map(self._embed, batches)
            return zs.reshape(nb * self.batch_size, -1)[: k * s_b]

        self._embed_tracks = _embed_tracks
        # DB-build pack size (tracks per device dispatch); config knob
        # build_pack, default 8. 1 disables packing (per-track program).
        self.build_pack = max(1, int(cfg.get("build_pack") or 8))

    def _ensure_calibrated(self, spec_batch: np.ndarray) -> None:
        """One-shot 'act_scales' calibration for serve_quant='int8_static'
        when no scales were provided: one exact 'int8_calibrate' pass over
        the first (<= batch_size) model inputs this pipeline sees
        (models/simclr.calibrate_act_scales). Runs BEFORE the first embed
        trace so the jitted programs capture the scales; thread-safe
        (builders overlap track calls via _ordered_overlap)."""
        if not self._needs_calibration:
            return
        with self._calib_lock:
            if not self._needs_calibration or len(spec_batch) == 0:
                return
            from grafp_tpu.models.simclr import calibrate_act_scales

            scales = calibrate_act_scales(
                self.cfg, self.params, self.batch_stats,
                [jnp.asarray(spec_batch[: self.batch_size])])
            self.extra_variables["act_scales"] = scales
            self._variables["act_scales"] = scales
            self._needs_calibration = False

    # -- per-track spectrogram, exact tail semantics --------------------
    def track_logmel(self, wave: np.ndarray) -> np.ndarray:
        """(T,) float32 -> (n_mels, 1 + T//hop) log-mel, identical to the
        centered reference computation, one compile per length bucket."""
        t = len(wave)
        n_true_frames = 1 + t // self.hop
        pad = self.n_fft // 2
        # centered reflect pad with TRUE samples, then zero-fill bucket
        w = np.concatenate([wave[pad:0:-1], wave, wave[-2:-pad - 2:-1]])
        bucket_len = pad * 2 + max(
            self.bucket, int(math.ceil(t / self.bucket)) * self.bucket
        )
        if len(w) < bucket_len:
            w = np.pad(w, (0, bucket_len - len(w)))
        spec = self._track_spec(jnp.asarray(w[None, :]), n_true_frames)
        return np.asarray(spec[0])

    def corrupt_track(self, wave: np.ndarray, banks: AugmentBanks,
                      key, ir_prob: float = 1.0) -> np.ndarray:
        """Reference val_transform: IR (p=ir_prob) then noise at val_snr
        (p=1) on the whole track."""
        if banks is None or (banks.noise is None and banks.ir is None):
            return wave
        out = augment_waveforms(
            jnp.asarray(wave[None, :]), banks, key, self._val_snr,
            ir_prob=ir_prob, noise_prob=1.0,
        )
        return np.asarray(out[0])

    def corrupt_tracks(self, waves: list, banks: AugmentBanks, subs_data,
                       ir_prob: float = 1.0, pack: Optional[int] = None
                       ) -> list:
        """Per-track corruption for a list of tracks, packed: runs of
        equal TRUE length share one vmapped device dispatch. vmapping
        augment_waveforms over (wave, key) reproduces each per-track
        call's random draws KEY-exactly (threefry depends only on the
        lane's key: same clip rows, offsets, SNRs, take masks); the
        waveform arithmetic matches to f32 rounding (~2e-7, batched GEMM
        scheduling — tests/test_fp_builder.py). Groups are repeat-padded
        to the static pack size — one compile total. Unequal-length
        singletons fall back to corrupt_track."""
        if banks is None or (banks.noise is None and banks.ir is None):
            return [np.asarray(w, np.float32) for w in waves]
        kpack = self.build_pack if pack is None else max(1, int(pack))
        out: list = [None] * len(waves)
        i = 0
        while i < len(waves):
            t_len = len(waves[i])
            group = [i]
            j = i + 1
            while (j < len(waves) and len(group) < kpack
                   and len(waves[j]) == t_len):
                group.append(j)
                j += 1
            if len(group) == 1:
                sub = jax.random.wrap_key_data(jnp.asarray(subs_data[i]))
                out[i] = self.corrupt_track(
                    np.asarray(waves[i], np.float32), banks, sub,
                    ir_prob=ir_prob)
            else:
                batch = np.stack(
                    [np.asarray(waves[g], np.float32) for g in group])
                keys = np.stack([np.asarray(subs_data[g]) for g in group])
                if len(group) < kpack:
                    batch = np.concatenate(
                        [batch, np.repeat(batch[-1:], kpack - len(group), 0)])
                    keys = np.concatenate(
                        [keys, np.repeat(keys[-1:], kpack - len(group), 0)])
                fn = self._corrupt_batch_fn(banks, float(ir_prob))
                y = np.asarray(fn(jnp.asarray(batch), jnp.asarray(keys)))
                for t, g in enumerate(group):
                    out[g] = y[t]
            i = j
        return out

    def _corrupt_batch_fn(self, banks: AugmentBanks, ir_prob: float):
        """Jitted (K, T) x (K,) keys -> (K, T) corruption, closing over
        the banks (AugmentBanks is not a pytree) — cached per (banks,
        ir_prob) so repeated groups reuse one compiled program."""
        cache_key = (id(banks), ir_prob)
        fn = self._corrupt_cache.get(cache_key)
        if fn is None:
            snr = self._val_snr

            @jax.jit
            def fn(batch, keys_data):
                keys = jax.random.wrap_key_data(keys_data)

                def one(w, k):
                    return augment_waveforms(
                        w[None, :], banks, k, snr,
                        ir_prob=ir_prob, noise_prob=1.0)[0]

                return jax.vmap(one)(batch, keys)

            self._corrupt_cache[cache_key] = fn
        return fn

    def segments_for(self, wave: np.ndarray) -> np.ndarray:
        """(T,) -> (S, n_mels, n_frames) float32 model inputs."""
        spec = self.track_logmel(wave)
        s = num_segments(spec.shape[1], self.n_frames, self.step)
        if s == 0:
            return np.zeros((0, spec.shape[0], self.n_frames), np.float32)
        return np.asarray(
            unfold_segments(jnp.asarray(spec), self.n_frames, self.step)
        )

    def _pad_track(self, wave: np.ndarray) -> Tuple[np.ndarray, int]:
        """Reflect-pad true samples + zero-fill to the length bucket;
        returns (padded (1, L), n_true_segments)."""
        t = len(wave)
        n_true_frames = 1 + t // self.hop
        pad = self.n_fft // 2
        w = np.concatenate([wave[pad:0:-1], wave, wave[-2:-pad - 2:-1]])
        bucket_len = pad * 2 + max(
            self.bucket, int(math.ceil(t / self.bucket)) * self.bucket
        )
        if len(w) < bucket_len:
            w = np.pad(w, (0, bucket_len - len(w)))
        s_true = num_segments(n_true_frames, self.n_frames, self.step)
        return w[None, :], s_true

    def fingerprint_track(self, wave: np.ndarray) -> np.ndarray:
        """(T,) raw audio -> (S, d) fingerprints, fully on device (one
        wave upload, one fingerprint download; identical numerics to
        segments_for + embed)."""
        wave = np.asarray(wave, np.float32)
        padded, s_true = self._pad_track(wave)
        if s_true <= 0:
            return np.zeros((0, self.d), np.float32)
        if self._needs_calibration:
            self._ensure_calibrated(self.segments_for(wave))
        z = self._embed_track(jnp.asarray(padded))
        return np.asarray(z[:s_true])

    def fingerprint_tracks(self, waves, pack: Optional[int] = None) -> list:
        """List of (T_i,) raw tracks -> list of (S_i, d) fingerprints.

        Packs consecutive same-bucket-length tracks into single (K, L)
        device dispatches (K = self.build_pack); runs of one (or
        heterogeneous lengths) fall back to the per-track program, so
        results always match per-track fingerprint_track numerics up to
        XLA batching (identical math; eval-mode BN has no cross-row
        coupling). A short final group is padded to K by repeating its
        last wave — one compile per (K, bucket) — and the extra rows are
        dropped on the host slice."""
        waves = [np.asarray(w, np.float32) for w in waves]
        padded = [self._pad_track(w) for w in waves]
        if self._needs_calibration:
            for w, (_, s_t) in zip(waves, padded):
                if s_t > 0:
                    self._ensure_calibrated(self.segments_for(w))
                    break
        out: list = [None] * len(waves)
        kpack = self.build_pack if pack is None else max(1, int(pack))
        i = 0
        while i < len(waves):
            if padded[i][1] <= 0:
                out[i] = np.zeros((0, self.d), np.float32)
                i += 1
                continue
            length = padded[i][0].shape[1]
            group = [i]
            j = i + 1
            while (j < len(waves) and len(group) < kpack
                   and padded[j][1] > 0
                   and padded[j][0].shape[1] == length):
                group.append(j)
                j += 1
            if kpack == 1:
                z = self._embed_track(jnp.asarray(padded[i][0]))
                out[i] = np.asarray(z[: padded[i][1]])
            else:
                # singleton runs also go through the packed program
                # (repeat-padded): one compile per (K, bucket) total —
                # a tail-of-build singleton must not trigger a fresh
                # minutes-long compile of the per-track program.
                stack = np.concatenate([padded[g][0] for g in group])
                if len(group) < kpack:  # repeat-pad to the static K
                    stack = np.concatenate(
                        [stack, np.repeat(stack[-1:], kpack - len(group), 0)]
                    )
                z = np.asarray(self._embed_tracks(jnp.asarray(stack)))
                s_b = z.shape[0] // kpack
                z = z.reshape(kpack, s_b, -1)
                for t, g in enumerate(group):
                    out[g] = np.ascontiguousarray(z[t, : padded[g][1]])
            i = j
        return out

    # -- rolling full-batch embedder ------------------------------------
    def embed_stream(
        self, segment_blocks: Iterable[np.ndarray], writer: MemmapWriter
    ) -> int:
        """Feed ragged per-track segment blocks; embed in always-full
        (batch_size,) batches; append to writer in order. Returns rows."""
        b = self.batch_size
        buf = np.zeros((0, self.mcfg.n_mels, self.n_frames), np.float32)
        total = 0

        def emit(batch: np.ndarray, n_valid: int):
            nonlocal total
            if self._needs_calibration:
                self._ensure_calibrated(batch[:n_valid])
            z = np.asarray(self._embed(jnp.asarray(batch)))
            writer.append(z[:n_valid])
            total += n_valid

        for block in segment_blocks:
            block = np.asarray(block, np.float32)
            if len(block) == 0:
                continue
            buf = np.concatenate([buf, block]) if len(buf) else block
            while len(buf) >= b:
                emit(buf[:b], b)
                buf = buf[b:]
        if len(buf):
            emit(np.pad(buf, ((0, b - len(buf)), (0, 0), (0, 0))), len(buf))
        return total


def _ordered_overlap(
    fn: Callable, items: Iterable, workers: int = 4, inflight: int = 8
) -> Iterator:
    """Yield ``fn(x)`` for each item IN ORDER while up to ``inflight``
    calls run concurrently in worker threads.

    The DB builders are round-trip-bound on the remote-attached TPU
    (~95 ms/track of upload+dispatch+fetch vs ~14 ms of model compute at
    the measured 14.6k fp/s): a strictly serial loop leaves the chip
    idle most of the time. jit dispatch and host<->device transfers
    release the GIL, so a few threads overlap track N's fetch with
    track N+1's upload/compute. Bounded in-flight keeps memory flat
    (unlike ThreadPoolExecutor.map, which consumes the whole iterable
    up front - fatal at fma_large's 106k tracks). Results are yielded
    strictly in submission order: memmap row order - the ground-truth
    contract of the eval - is preserved exactly.

    Defaults measured on-chip (scripts/profile_build_throughput.py,
    240x20s tracks, two runs): pack8 w4/i8 34.0 & 37.2 tracks/s vs
    serial pack8 18.4 & 24.5 and serial pack1 28.5 & 32.5; w3/i4
    varied 28.7-37.7 and w6/i8 32.6-34.1 across runs, so w4/i8 is the
    consistent pick on this 1-core host. pack1+overlap (32.7-33.0)
    confirms the pack-8 dispatch still matters under overlap.
    """
    with ThreadPoolExecutor(max_workers=workers) as ex:
        pending = deque()
        for x in items:
            pending.append(ex.submit(fn, x))
            while len(pending) >= inflight:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()


def _track_getters(loader) -> Iterable:
    """Per-track thunks for the overlap workers.

    A TrackLoader (duck-typed: .ds + .indices) yields INDEX thunks so
    decode+resample runs INSIDE the worker threads, overlapped with
    device round trips — iterating it directly would serialize decode in
    the main thread between result yields. Any other iterable is passed
    through as already-materialized waves."""
    if hasattr(loader, "ds") and hasattr(loader, "indices"):
        ds = loader.ds
        return (functools.partial(ds.__getitem__, int(i))
                for i in loader.indices)
    return iter(loader)


def _chunks(it: Iterable, n: int) -> Iterator[list]:
    buf: list = []
    for x in it:
        buf.append(x)
        if len(buf) == n:
            yield buf
            buf = []
    if buf:
        yield buf


def _capacity(loader_len: int, cfg, max_track_s: float = 40.0) -> int:
    frames = 1 + int(max_track_s * cfg["fs"]) // cfg["hop_len"]
    per_track = num_segments(frames, cfg["n_frames"], cfg.seg_hop_frames)
    return max(loader_len * per_track, 1024)


def track_corruption_keys(seed: int, n: int) -> np.ndarray:
    """Raw key data (n, ...) for the per-track corruption key sequence.

    Bit-identical to the eager chain ``key, sub = jax.random.split(key)``
    repeated n times from ``jax.random.key(seed)`` (threefry is
    deterministic under jit), but emitted by one jitted lax.scan dispatch
    and fetched once — the eager loop was O(n) serial device round trips
    of up-front latency on the remote transport (ADVICE r3)."""
    if n <= 0:
        return np.zeros((0, 2), np.uint32)

    @functools.partial(jax.jit, static_argnames=("length",))
    def _chain(key, length: int):
        def body(k, _):
            k, sub = jax.random.split(k)
            return k, sub
        _, subs = jax.lax.scan(body, key, None, length=length)
        return jax.random.key_data(subs)

    return np.asarray(_chain(jax.random.key(seed), n))


def create_dummy_db(
    loader, pipeline: FingerprintPipeline, output_root_dir: str,
    fname: str = "dummy_db", verbose: bool = True,
    pack: Optional[int] = None,
) -> Tuple[int, int]:
    """Clean fingerprints of every track (reference test_fp.py:127-158),
    via the fused packed device program: `pack` tracks (default
    cfg build_pack, 8) share one upload/dispatch/fetch, and decode runs
    in the overlap worker threads. pack=1 reproduces the round-4
    per-track path exactly."""
    cfg = pipeline.cfg
    kpack = pipeline.build_pack if pack is None else max(1, int(pack))
    writer = MemmapWriter(output_root_dir, fname, pipeline.d,
                          capacity=_capacity(len(loader), cfg))

    def _group(getters: list) -> list:
        waves = [g() if callable(g) else g for g in getters]
        return pipeline.fingerprint_tracks(waves, pack=kpack)

    done = 0
    for zs in _ordered_overlap(_group, _chunks(_track_getters(loader), kpack)):
        for z in zs:
            if verbose and done % 100 == 0:
                print(f"=> dummy db [{done}/{len(loader)}]")
            done += 1
            if len(z):
                writer.append(z)
    return writer.close()


def create_fp_db(
    loader, pipeline: FingerprintPipeline, banks: Optional[AugmentBanks],
    output_root_dir: str, seed: int = 0, ir_prob: float = 1.0,
    verbose: bool = True, pack: Optional[int] = None,
) -> Tuple[int, int]:
    """Paired clean (db) / corrupted (query) fingerprints per track
    (reference test_fp.py:87-125: z_i from x_i -> db, z_j from the
    noise+IR view -> query). Row alignment between the two files is the
    ground-truth contract of the whole eval.

    Packed like create_dummy_db: per group of `pack` tracks, ONE vmapped
    corruption dispatch + packed clean/dirty embeds (vs 3 round trips
    per track); the per-track corruption KEY sequence is identical to
    the serial loop's (corrupt_tracks vmaps augment_waveforms over
    per-track keys — same clip/offset/SNR draws per track; waveforms
    match to f32 rounding)."""
    cfg = pipeline.cfg
    kpack = pipeline.build_pack if pack is None else max(1, int(pack))
    cap = _capacity(len(loader), cfg)
    w_db = MemmapWriter(output_root_dir, "db", pipeline.d, capacity=cap)
    w_q = MemmapWriter(output_root_dir, "query", pipeline.d, capacity=cap)

    # Per-track corruption keys, in the exact sequence the old serial
    # loop drew them (key, sub = split(key) per track) so the overlapped
    # build is bit-identical to the sequential one. Computed as ONE
    # jitted lax.scan dispatch + one fetch: the eager split loop cost
    # O(n_tracks) serial device round trips of up-front latency on the
    # remote transport (ADVICE r3).
    subs_data = track_corruption_keys(seed, len(loader))

    def _pairs(chunk: list) -> list:
        waves = [g() if callable(g) else g for g, _ in chunk]
        waves = [np.asarray(w, np.float32) for w in waves]
        subs = [s for _, s in chunk]
        z_clean = pipeline.fingerprint_tracks(waves, pack=kpack)
        corrupted = pipeline.corrupt_tracks(waves, banks, subs,
                                            ir_prob=ir_prob, pack=kpack)
        z_dirty = pipeline.fingerprint_tracks(corrupted, pack=kpack)
        return list(zip(z_clean, z_dirty))

    n1 = n2 = 0
    done = 0
    groups = _ordered_overlap(
        _pairs, _chunks(zip(_track_getters(loader), subs_data), kpack))
    for pair_group in groups:
        for z_clean, z_dirty in pair_group:
            if verbose and done % 10 == 0:
                print(f"=> fp db [{done}/{len(loader)}]")
            done += 1
            # row alignment: truncate to the common segment count
            s = min(len(z_clean), len(z_dirty))
            if s:
                w_db.append(z_clean[:s])
                w_q.append(z_dirty[:s])
                n1 += s
                n2 += s
    assert n1 == n2, (n1, n2)
    w_db.close()
    return w_q.close()


def create_db(
    loader, pipeline: FingerprintPipeline, output_dir: str,
    concat: bool = True, verbose: bool = True,
    pack: Optional[int] = None,
) -> np.ndarray:
    """Standalone fingerprint extraction -> fingerprints.npy (reference
    generate.py:34-57), via the packed device program (see
    create_dummy_db)."""
    import os

    kpack = pipeline.build_pack if pack is None else max(1, int(pack))

    def _group(getters: list) -> list:
        waves = [g() if callable(g) else g for g in getters]
        return pipeline.fingerprint_tracks(waves, pack=kpack)

    outs = []
    for zs in _ordered_overlap(_group, _chunks(_track_getters(loader), kpack)):
        for z in zs:
            if verbose and len(outs) % 10 == 0:
                print(f"=> generate [{len(outs)}/{len(loader)}]")
            outs.append(z)
    fp = np.concatenate(outs, axis=0) if concat else np.array(outs, dtype=object)
    os.makedirs(output_dir, exist_ok=True)
    np.save(os.path.join(output_dir, "fingerprints.npy"), fp)
    return fp

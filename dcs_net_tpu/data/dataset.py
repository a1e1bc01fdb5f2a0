"""VoiceBank-DEMAND waveform loader (reference C4, /root/reference/data.py:21-143)
redesigned for the TPU pipeline.

Design inversion vs the reference: the host ships only raw 16 kHz waveform
crops; framing + STFT run ON DEVICE inside the jitted step
(train/steps.batch_from_waves). Host work per item is wav decode, 48k->16k
polyphase resample, and pad-or-random-crop — overlapped with device compute by
a background prefetch thread.

Faithful semantics kept: normalize-on-load, equal-length assert,
crop window = integer_win_size - hop = 8160 samples, zero right-pad for short
utterances, uniform random start otherwise, noise = noisy - clean (done
on-device), NaN/Inf tripwires per item.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

from dcs_net_tpu.core.config import DataConfig
from dcs_net_tpu.data import partition as P
from dcs_net_tpu.data.audio_io import read_wav, resample


class VoiceBankDataset:
    """Map-style dataset of (noisy, clean) 16 kHz crops."""

    def __init__(self, ids: List[str], cfg: DataConfig, mode: str, seed: int = 0):
        assert mode in ("train", "val", "test")
        self.ids = list(ids)
        self.cfg = cfg
        self.mode = mode
        self.seed = seed
        if mode == "test":
            self.clean_dir = P.testset_dir(cfg, clean=True)
            self.noisy_dir = P.testset_dir(cfg, clean=False)
        else:
            self.clean_dir = P.trainset_dir(cfg)
            self.noisy_dir = P.noisy_trainset_dir(cfg)
        self._ram: Optional[Dict[str, tuple]] = {} if cfg.load_into_ram else None

    def __len__(self) -> int:
        return len(self.ids)

    def _load(self, utt_id: str) -> tuple:
        if self._ram is not None and utt_id in self._ram:
            return self._ram[utt_id]
        clean, sr_c = read_wav(os.path.join(self.clean_dir, utt_id + ".wav"),
                               normalize=self.cfg.normalize_audio)
        noisy, sr_n = read_wav(os.path.join(self.noisy_dir, utt_id + ".wav"),
                               normalize=self.cfg.normalize_audio)
        clean = resample(clean, sr_c, self.cfg.sr)
        noisy = resample(noisy, sr_n, self.cfg.sr)
        if clean.shape[0] != noisy.shape[0]:
            raise ValueError(f"clean/noisy length mismatch for {utt_id}")
        pair = (clean, noisy)
        if self._ram is not None:
            self._ram[utt_id] = pair
        return pair

    def get(self, index: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        utt_id = self.ids[index]
        clean, noisy = self._load(utt_id)
        win = self.cfg.crop_samples
        n = clean.shape[0]
        if win > n:
            clean = np.pad(clean, (0, win - n))
            noisy = np.pad(noisy, (0, win - n))
            start = 0
        else:
            start = int(rng.integers(0, n - win)) if n > win else 0
        clean = clean[start:start + win]
        noisy = noisy[start:start + win]
        for name, x in (("clean", clean), ("noisy", noisy)):
            if not np.all(np.isfinite(x)):
                raise FloatingPointError(
                    f"Found inf/-inf/nan in {name} audio for {utt_id}")
        return {"clean": clean, "noisy": noisy, "id": utt_id, "start": start}

    def full_utterance(self, index: int) -> Dict[str, np.ndarray]:
        """Uncropped item — used by the streaming-enhance path."""
        utt_id = self.ids[index]
        clean, noisy = self._load(utt_id)
        return {"clean": clean, "noisy": noisy, "id": utt_id, "start": 0}


class Loader:
    """Seeded per-epoch shuffling batch iterator with background prefetch.

    When the native C++ front-end builds (data/native_loader.py), whole
    batches are decoded/resampled/cropped in one pthread-parallel C call;
    crop starts use the same per-item RNG streams as the Python path, so the
    two paths yield identical batches (tested).
    """

    def __init__(self, dataset: VoiceBankDataset, batch_size: int,
                 shuffle: bool = True, drop_last: bool = False,
                 num_workers: int = 2, prefetch: int = 2, seed: int = 0,
                 use_native: Optional[bool] = None):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.seed = seed
        if use_native is None:
            from dcs_net_tpu.data import native_loader

            use_native = (native_loader.native_available()
                          and not dataset.cfg.load_into_ram)
        self.use_native = use_native
        self._lengths: Optional[List[int]] = None
        # one pool for the Loader's lifetime — creating/tearing down a
        # ThreadPoolExecutor per batch costs thread spawns on the hot path
        self._pool: Optional[ThreadPoolExecutor] = None

    def _get_pool(self) -> ThreadPoolExecutor:
        if self._pool is None:
            self._pool = ThreadPoolExecutor(self.num_workers)
        return self._pool

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def __del__(self):  # best effort; close() is the explicit path
        try:
            self.close()
        except Exception:
            pass

    def _utt_lengths(self) -> List[int]:
        """Post-resample utterance lengths from wav headers (cheap)."""
        if self._lengths is None:
            import math
            import wave as wave_mod

            out = []
            for utt_id in self.ds.ids:
                with wave_mod.open(
                        os.path.join(self.ds.clean_dir, utt_id + ".wav"),
                        "rb") as w:
                    n, sr = w.getnframes(), w.getframerate()
                out.append(int(math.ceil(self.ds.cfg.sr * n / sr)))
            self._lengths = out
        return self._lengths

    def __len__(self) -> int:
        n = len(self.ds)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self, epoch: int) -> List[List[int]]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        out = [order[i:i + self.batch_size].tolist()
               for i in range(0, len(order), self.batch_size)]
        if self.drop_last and out and len(out[-1]) < self.batch_size:
            out.pop()
        return out

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batches(epoch)
        rng = np.random.default_rng((self.seed, epoch, 1))
        crop_seeds = rng.integers(0, 2 ** 31, size=len(self.ds))

        def fetch_python(batch_idx: int) -> Dict[str, np.ndarray]:
            idxs = batches[batch_idx]
            items = list(self._get_pool().map(
                lambda i: self.ds.get(
                    i, np.random.default_rng(int(crop_seeds[i]) + epoch)),
                idxs))
            return {
                "clean": np.stack([it["clean"] for it in items]),
                "noisy": np.stack([it["noisy"] for it in items]),
                "id": [it["id"] for it in items],
                "start": np.asarray([it["start"] for it in items]),
            }

        def fetch_native(batch_idx: int) -> Dict[str, np.ndarray]:
            from dcs_net_tpu.data import native_loader as nl

            idxs = batches[batch_idx]
            lengths = self._utt_lengths()
            win = self.ds.cfg.crop_samples
            starts = []
            for i in idxs:
                n = lengths[i]
                rng_i = np.random.default_rng(int(crop_seeds[i]) + epoch)
                starts.append(int(rng_i.integers(0, n - win)) if n > win else 0)
            ids = [self.ds.ids[i] for i in idxs]
            clean, noisy = nl.fill_batch(
                [os.path.join(self.ds.clean_dir, u + ".wav") for u in ids],
                [os.path.join(self.ds.noisy_dir, u + ".wav") for u in ids],
                starts, win,
                normalize=self.ds.cfg.normalize_audio,
                orig_freq=self.ds.cfg.file_sr, new_freq=self.ds.cfg.sr,
                n_threads=self.num_workers)
            return {"clean": clean, "noisy": noisy, "id": ids,
                    "start": np.asarray(starts)}

        fetch = fetch_native if self.use_native else fetch_python

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            for b in range(len(batches)):
                if stop.is_set():
                    return
                q.put(fetch(b))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

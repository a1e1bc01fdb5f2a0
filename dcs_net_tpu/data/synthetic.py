"""Synthetic VoiceBank-DEMAND-shaped fixtures.

No audio datasets exist in this environment; tests/benches generate a tiny
tree with the reference's on-disk layout (clean/noisy trainset + testset wavs,
48 kHz PCM16) so the full pipeline (decode -> resample -> crop -> STFT) can be
exercised end-to-end.

Clean signals are harmonic "vowels" with AM envelopes; noisy = clean + filtered
noise at a random SNR, matching the additive-noise assumption the reference
relies on (noise = noisy - clean, /root/reference/data.py:105).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from dcs_net_tpu.core.config import DataConfig
from dcs_net_tpu.data import partition as P
from dcs_net_tpu.data.audio_io import write_wav


def _voice_like(rng: np.random.Generator, n: int, sr: int) -> np.ndarray:
    f0 = rng.uniform(90, 250)
    t = np.arange(n) / sr
    sig = np.zeros(n)
    for h in range(1, 6):
        sig += rng.uniform(0.2, 1.0) / h * np.sin(
            2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi))
    env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t))
    sig = sig * env
    return (0.3 * sig / (np.abs(sig).max() + 1e-9)).astype(np.float32)


def _noise_like(rng: np.random.Generator, n: int) -> np.ndarray:
    white = rng.standard_normal(n + 64)
    kernel = np.hanning(65)
    colored = np.convolve(white, kernel / kernel.sum(), mode="valid")[:n]
    return (colored / (np.abs(colored).max() + 1e-9)).astype(np.float32)


def generate(
    root: str,
    n_train: int = 12,
    n_test: int = 4,
    seconds: float = 1.2,
    file_sr: int = 48000,
    dataset_type: int = 28,
    seed: int = 0,
) -> DataConfig:
    """Write the fixture tree and return a DataConfig pointing at it."""
    rng = np.random.default_rng(seed)
    cfg = DataConfig(root=root, dataset_type=dataset_type, file_sr=file_sr)
    dirs = {
        "clean_train": P.trainset_dir(cfg),
        "noisy_train": P.noisy_trainset_dir(cfg),
        "clean_test": P.testset_dir(cfg, clean=True),
        "noisy_test": P.testset_dir(cfg, clean=False),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    n = int(seconds * file_sr)

    def write_pair(clean_dir: str, noisy_dir: str, name: str) -> None:
        clean = _voice_like(rng, n, file_sr)
        snr_db = rng.uniform(0, 15)
        noise = _noise_like(rng, n)
        clean_pow = np.mean(clean ** 2)
        noise_pow = np.mean(noise ** 2) + 1e-12
        noise = noise * np.sqrt(clean_pow / noise_pow / (10 ** (snr_db / 10)))
        write_wav(os.path.join(clean_dir, name + ".wav"), clean, file_sr)
        write_wav(os.path.join(noisy_dir, name + ".wav"),
                  np.clip(clean + noise, -1, 1), file_sr)

    for i in range(n_train):
        write_pair(dirs["clean_train"], dirs["noisy_train"], f"p{i:03d}_{i:03d}")
    for i in range(n_test):
        write_pair(dirs["clean_test"], dirs["noisy_test"], f"t{i:03d}_{i:03d}")
    return cfg

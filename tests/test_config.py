import json

from dcs_net_tpu.core.config import Config, Quirks, config_for_variant


def test_variant_axes():
    assert config_for_variant("dr").model.complex_valued is False
    assert config_for_variant("dr").model.subtractive is False
    assert config_for_variant("dc").model.complex_valued is True
    assert config_for_variant("dc").model.subtractive is False
    assert config_for_variant("drs").model.complex_valued is False
    assert config_for_variant("drs").model.subtractive is True
    assert config_for_variant("dcs").model.complex_valued is True
    assert config_for_variant("dcs").model.subtractive is True
    for v in ("dr", "dc", "drs", "dcs"):
        assert config_for_variant(v).variant == v


def test_stft_derived():
    cfg = config_for_variant("dcs")
    assert cfg.stft.n_bins == 256
    assert cfg.stft.num_frames(cfg.data.crop_samples) == 256
    assert cfg.data.crop_samples == 8160


def test_channel_schedules():
    real = config_for_variant("drs").model
    cplx = config_for_variant("dcs").model
    # encoder: real 1->16->...->256; complex halved (c_network.py:101-115)
    assert real.enc_channels(0) == (1, 16)
    assert cplx.enc_channels(0) == (1, 8)
    assert real.enc_channels(6) == (256, 256)
    assert cplx.enc_channels(6) == (128, 128)
    # decoder: cat(skip) doubles input; final out channel 1
    assert real.dec_channels(0) == (512, 256)
    assert cplx.dec_channels(0) == (256, 128)
    assert real.dec_channels(6) == (32, 1)
    assert cplx.dec_channels(6) == (16, 1)
    assert real.lstm_hidden == 128 and cplx.lstm_hidden == 64
    assert real.fc_features == 256 and cplx.fc_features == 128


def test_serialization_roundtrip():
    cfg = config_for_variant("dcs", faithful=False)
    blob = cfg.to_json()
    back = Config.from_json(blob)
    assert back == cfg
    assert json.loads(blob)["model"]["complex_valued"] is True
    assert back.quirks == Quirks.idiomatic()

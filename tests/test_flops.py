"""Pin the analytic model-math FLOP counter (dcs_net_tpu/utils/flops.py).

These are the FIXED denominators for bench.py's mfu_model: hand-derived
reference-algorithm MACs (VERDICT r4 weak #2). The full-size values are
pinned so an accidental config or formula drift shows up as a test diff,
with the hand arithmetic for one layer of each kind spelled out.
"""

import numpy as np

from dcs_net_tpu.core.config import config_for_variant
from dcs_net_tpu.utils.flops import model_math_flops, train_step_flops


def test_component_hand_checks():
    d = model_math_flops(config_for_variant("dcs"))
    # dec6 (last decoder stage): full-res 256x256, k3, complex 8ch-in
    # (16 with skip concat) -> 1: 4 * 2 * 256*256 * 9 * 16 * 1 = 75.5 M —
    # contained in dec_convs; enc0: 128x128 out, k7, 1->8 complex:
    # 4 * 2 * 128*128 * 49 * 1 * 8 = 51.4 M
    enc0 = 4 * 2 * 128 * 128 * 49 * 1 * 8
    assert d["enc_convs"] > enc0
    # one analysis stream: frames (256, 512) @ basis (512, 256), cos+sin:
    # 2 * 2 * 256 * 512 * 256 = 134.2 M
    np.testing.assert_allclose(d["stft_one"], 2 * 2 * 256 * 512 * 256)
    # one synthesis stream: (256, 257) @ (257, 512), cos+sin
    np.testing.assert_allclose(d["istft_one"], 2 * 2 * 256 * 257 * 512)
    # LSTM layer 0: complex (4 passes) x bidir (2) over seq 64,
    # in 128 -> H 64: 4 * 2 * 2 * 64 * (128*256 + 64*256) = 50.3 M
    lstm0 = 4 * 2 * 2 * 64 * (128 * 4 * 64 + 64 * 4 * 64)
    lstm1 = 4 * 2 * 2 * 64 * (128 * 4 * 64 + 64 * 4 * 64)
    np.testing.assert_allclose(d["lstm"], lstm0 + lstm1)


def test_full_size_pinned():
    d = model_math_flops(config_for_variant("dcs"))
    # pinned absolute values (G) at the product config — the cross-round
    # MFU denominators; see flops.py module docstring for conventions
    np.testing.assert_allclose(d["enc_convs"] / 1e9, 0.9485, rtol=1e-3)
    np.testing.assert_allclose(d["dec_convs"] / 1e9, 2.4909, rtol=1e-3)
    np.testing.assert_allclose(d["forward"] / 1e9, 3.6875, rtol=1e-3)
    np.testing.assert_allclose(d["train_step"] / 1e9, 12.678, rtol=1e-3)
    # step = 3x differentiated work + once-through reference streams
    assert d["train_step"] > 3 * d["forward"]
    np.testing.assert_allclose(
        train_step_flops(config_for_variant("dcs"), 128),
        d["train_step"] * 128)


def test_variant_scaling():
    """Complex counts 4x the real twin on conv/lstm/fc; dr has no noise
    branch iSTFT."""
    dcs = model_math_flops(config_for_variant("dcs"))
    drs = model_math_flops(config_for_variant("drs"))
    # real channels are 2x the complex ones, so a real conv layer costs
    # cin*cout 4x of the complex layer's — net: conv flops about equal
    np.testing.assert_allclose(drs["enc_convs"], dcs["enc_convs"],
                               rtol=0.05)
    dr = model_math_flops(config_for_variant("dr"))
    assert dr["pipeline_grad"] == dcs["istft_one"]      # 1 prediction stream
    assert dcs["pipeline_grad"] == 2 * dcs["istft_one"]  # noise + clean

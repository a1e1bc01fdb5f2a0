"""Composite measures (SegSNR, LLR, WSS, CSIG/CBAK/COVL) sanity + property
tests. The reference's harness for these goes through MATLAB semetrics
(/root/reference/misc.py:296-356); ours is native numpy, so the tests assert
the algorithmic properties the MATLAB implementation has: identity optimum,
monotonicity in SNR, clamping, and the published regression coefficients."""

import numpy as np
import pytest

from dcs_net_tpu.metrics.composite import (
    composite, csig_cbak_covl, llr, segsnr, wss)

SR = 16000


def _speechlike(n=SR, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    # harmonic stack with a slow envelope: enough LPC structure for LLR/WSS
    env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    x = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)) / k
            for k, f in enumerate([220, 440, 880, 1320, 2640], start=1))
    return (env * x + 0.01 * rng.standard_normal(n)).astype(np.float64)


def test_segsnr_identity_hits_ceiling():
    x = _speechlike()
    assert segsnr(x, x, SR) == pytest.approx(35.0)


def test_segsnr_monotonic_in_noise():
    x = _speechlike()
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(x))
    s_hi = segsnr(x, x + 0.01 * noise, SR)
    s_lo = segsnr(x, x + 0.3 * noise, SR)
    assert s_hi > s_lo
    assert -10.0 <= s_lo <= 35.0


def test_llr_identity_is_zero_and_monotonic():
    x = _speechlike()
    assert llr(x, x, SR) == pytest.approx(0.0, abs=1e-10)
    rng = np.random.default_rng(2)
    noise = rng.standard_normal(len(x))
    assert llr(x, x + 0.3 * noise, SR) > llr(x, x + 0.03 * noise, SR) >= 0.0


def test_wss_identity_is_zero_and_monotonic():
    x = _speechlike()
    assert wss(x, x, SR) == pytest.approx(0.0, abs=1e-8)
    rng = np.random.default_rng(3)
    noise = rng.standard_normal(len(x))
    assert wss(x, x + 0.5 * noise, SR) > wss(x, x + 0.05 * noise, SR) >= 0.0


def test_regression_coefficients():
    # Hu & Loizou 2008 published coefficients at a fixed operating point
    out = csig_cbak_covl(pesq_mos=3.0, llr_v=0.5, wss_v=40.0, segsnr_v=5.0)
    assert out["csig"] == pytest.approx(3.093 - 1.029 * 0.5 + 0.603 * 3.0
                                        - 0.009 * 40.0)
    assert out["cbak"] == pytest.approx(1.634 + 0.478 * 3.0 - 0.007 * 40.0
                                        + 0.063 * 5.0)
    assert out["covl"] == pytest.approx(1.594 + 0.805 * 3.0 - 0.512 * 0.5
                                        - 0.007 * 40.0)


def test_mos_clamped_to_1_5():
    out = csig_cbak_covl(pesq_mos=5.0, llr_v=0.0, wss_v=0.0, segsnr_v=35.0)
    assert all(1.0 <= v <= 5.0 for v in out.values())
    out = csig_cbak_covl(pesq_mos=1.0, llr_v=3.0, wss_v=200.0, segsnr_v=-10.0)
    assert all(1.0 <= v <= 5.0 for v in out.values())


def test_composite_full_dict():
    x = _speechlike(2 * SR)
    rng = np.random.default_rng(4)
    y = x + 0.1 * rng.standard_normal(len(x))
    out = composite(x, y, SR, pesq_mos=2.5)
    assert set(out) == {"pesq", "segsnr", "llr", "wss", "csig", "cbak", "covl"}
    assert all(np.isfinite(v) for v in out.values())
    # cleaner signal scores better on every composite
    out2 = composite(x, x + 0.01 * rng.standard_normal(len(x)), SR,
                     pesq_mos=4.0)
    for k in ("csig", "cbak", "covl"):
        assert out2[k] > out[k]

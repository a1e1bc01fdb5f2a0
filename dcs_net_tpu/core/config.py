"""Typed configuration for the DCS-Net-TPU framework.

The reference spreads configuration over three global mechanisms: an ``hparams``
dict, a ``Config`` singleton, and raw ``sys.argv`` reads inside model/step code
(/root/reference/config.py:31-116, /root/reference/r_network.py:186). Here the
whole configuration is a serializable tree of frozen dataclasses, and the model
variant is two explicit orthogonal axes:

    variant     complex_valued   subtractive
    dr          False            False
    dc          True             False
    drs         False            True
    dcs         True             True

Reference-faithful "quirks" (behaviors of the reference that differ from the
obvious intent, enumerated in SURVEY.md §7) are individually flagged in
:class:`Quirks` so parity mode can reproduce them exactly while idiomatic mode
fixes them.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

VARIANTS = ("dr", "dc", "drs", "dcs")


def _axes_for_variant(variant: str) -> Tuple[bool, bool]:
    if variant not in VARIANTS:
        raise ValueError(f"unknown variant {variant!r}; expected one of {VARIANTS}")
    return ("c" in variant[1:], variant.endswith("s"))


@dataclass(frozen=True)
class STFTConfig:
    """Analysis/synthesis transform parameters.

    Matches torch.stft semantics used at /root/reference/data.py:112-134:
    512-point FFT, hop 32, Hann window, normalized, center (reflect) padding,
    and the DC bin dropped so the network sees 256 frequency bins.
    """

    n_fft: int = 512
    hop: int = 32
    win_length: int = 512
    window: str = "hann"
    normalized: bool = True
    center: bool = True
    pad_mode: str = "reflect"
    drop_dc: bool = True
    # operand dtype of the DFT/iDFT basis matmuls (f32 accumulation either
    # way). "bfloat16" halves the analysis/resynthesis HBM traffic (~4e-3
    # relative spectral error — the same class of rounding the bf16 model
    # path already accepts); parity tests pin float32. The bf16 train CLI /
    # bench set this alongside ModelConfig.compute_dtype.
    dft_dtype: str = "float32"

    @property
    def n_bins(self) -> int:
        """Frequency bins after the optional DC drop."""
        full = self.n_fft // 2 + 1
        return full - 1 if self.drop_dc else full

    def num_frames(self, n_samples: int) -> int:
        if not self.center:
            return 1 + (n_samples - self.n_fft) // self.hop
        return 1 + n_samples // self.hop


@dataclass(frozen=True)
class Quirks:
    """Reference-faithful behavior flags (all True == exact reference parity).

    istft_pad_top_bin: resynthesis appends one zero bin on top of the 256
        network bins instead of re-inserting the dropped DC bin at the bottom,
        shifting all content down one bin (/root/reference/network_functions.py:144).
    double_bound_mask: the complex network output is tanh-mag bounded inside
        the model forward AND re-bounded in the step fn
        (/root/reference/c_network.py:225 + network_functions.py:240).
    real_ca_max_only: RealChannelAttention computes avg+max branches but keeps
        only the max branch (/root/reference/r_network.py:23-24).
    complex_maxpool_is_avg: the complex "adaptive max pool" is implemented as
        an average pool (/root/reference/network_functions.py:135-138).
    loss_one_minus_alpha: noise loss combined as ``1 - alpha * L`` (literal
        parenthesization, /root/reference/network_functions.py:196) rather than
        ``(1 - alpha) * L``.
    polar_resynthesis: the reference resynthesizes EVERY audio stream
        through a mag/atan2(+eps) polar decomposition
        (network_functions.py:213-221) even where the complex spectrogram
        is already in hand; mag*e^{i*(atan2+eps)} == (re, im) up to the eps
        shift (~1e-6 relative), so False feeds the iSTFT directly and saves
        ~4 full-resolution f32 passes per stream each step (measured
        ~3 ms/step at batch 128; BASELINE.md round 4). True (the default,
        per the all-True convention above) restores the bit-faithful round
        trip; bench/perf configs flip it off
        (tests/test_steps.py::test_polar_resynthesis_quirk_step_parity pins
        the two paths to the eps-level bound at step level).
    nan_gate_loss_only: the reference's NaN-skip inspects only the LOSS
        (r_network.py:203-207); a NaN that appears first in the gradients
        would then poison the parameters. Default False == also gate on
        gradient finiteness — the ONE default that deviates from the
        all-True convention, deliberately: strictly safer, and a no-op
        whenever the reference's gate would fire. Set True for bit-faithful
        step-skip behavior.
    """

    istft_pad_top_bin: bool = True
    double_bound_mask: bool = True
    real_ca_max_only: bool = True
    complex_maxpool_is_avg: bool = True
    loss_one_minus_alpha: bool = True
    polar_resynthesis: bool = True
    nan_gate_loss_only: bool = False

    @classmethod
    def idiomatic(cls) -> "Quirks":
        return cls(
            istft_pad_top_bin=False,
            double_bound_mask=False,
            real_ca_max_only=False,
            complex_maxpool_is_avg=False,
            loss_one_minus_alpha=False,
            polar_resynthesis=False,
            nan_gate_loss_only=False,
        )

    def perf(self) -> "Quirks":
        """This quirk set with the semantics-preserving perf flips applied:
        identical math up to O(eps) — polar_resynthesis off. Used by the
        bench and enhance paths; faithful parity runs keep the default."""
        return dataclasses.replace(self, polar_resynthesis=False)


@dataclass(frozen=True)
class ModelConfig:
    """U-Net topology (/root/reference/r_network.py:43-173, c_network.py:87-226).

    ``channels`` are the *real-network* counts; the complex network halves every
    entry (each complex channel carries a (re, im) pair), matching
    /root/reference/c_network.py:101-151.
    """

    complex_valued: bool = True
    subtractive: bool = True
    n_layers: int = 7
    channels: Tuple[int, ...] = (1, 16, 32, 64, 128, 256, 256, 256)
    kernel_e: Tuple[int, ...] = (7, 7, 5, 5, 3, 3, 3)
    kernel_d: Tuple[int, ...] = (3, 3, 3, 3, 3, 3, 3)
    stride_e: Tuple[Tuple[int, int], ...] = (
        (2, 2), (2, 2), (2, 2), (2, 1), (2, 1), (2, 1), (2, 1))
    upsample: Tuple[Tuple[int, int], ...] = (
        (2, 1), (2, 1), (2, 1), (2, 1), (2, 2), (2, 2), (2, 2))
    lstm_layers: int = 2
    lstm_bidir: bool = True
    # Streaming mode: flatten the latent time-major (sequence runs over time,
    # not the reference's f-major flatten, r_network.py:149) so LSTM state
    # carried across chunks equals one continuous pass. Reference parity
    # requires False.
    lstm_time_major: bool = False
    dropout: bool = True
    dropout_conv: float = 0.1
    dropout_fc: float = 0.2
    # CBAM attention on skips + decoder outputs (always on in the reference,
    # r_network.py:106-116). False is for streaming deployments: channel
    # attention pools over the WHOLE time axis, which breaks chunk-local
    # causality — without it, chunked enhancement with LSTM carry is exact.
    attention: bool = True
    ca_reduction: int = 16
    sa_kernel: int = 7
    atan2_eps: float = 1e-6  # hparams['atan2_eps'] = 10e-7
    init: str = "xavier_uniform"
    compute_dtype: str = "float32"  # bfloat16 for the fast path
    param_dtype: str = "float32"

    @property
    def variant(self) -> str:
        return ("dc" if self.complex_valued else "dr") + ("s" if self.subtractive else "")

    def enc_channels(self, i: int) -> Tuple[int, int]:
        """(in, out) channel counts for encoder layer i, halved when complex."""
        cin = 1 if i == 0 else self._ch(self.channels[i])
        return cin, self._ch(self.channels[i + 1])

    def dec_channels(self, i: int) -> Tuple[int, int]:
        """(in-with-skip, out) channel counts for decoder stage i."""
        cin = self._ch(self.channels[self.n_layers - i])
        cout = max(self._ch(self.channels[self.n_layers - 1 - i]), 1)
        return 2 * cin, cout

    def _ch(self, c: int) -> int:
        return max(c // 2, 1) if self.complex_valued else c

    @property
    def latent_channels(self) -> int:
        return self._ch(self.channels[self.n_layers])

    @property
    def lstm_hidden(self) -> int:
        # real: channels[4]=128 (r_network.py:71); complex: channels[4]//2=64
        return self._ch(self.channels[4])

    @property
    def fc_features(self) -> int:
        return self._ch(self.channels[5])


@dataclass(frozen=True)
class LossConfig:
    """Loss menu (/root/reference/network_functions.py:168-208)."""

    # 0 L1(mask)  1 wSDR  2 L1(mask)+L1(wave)  3 wSDR+L1(wave)
    # 4 wSDR+L1(mask)  5 wSDR+MSE(mask)  6 -SiSNR(noise wave)
    noise_loss_type: int = 6
    speech_loss_type: int = 0  # 0: -SiSNR(clean wave)
    speech_alpha: float = 0.7
    sisnr_eps: float = 1e-8
    wsdr_eps: float = 2e-8
    crm_eps: float = 1e-8


@dataclass(frozen=True)
class OptimConfig:
    """torch Adam(amsgrad) + clip + plateau + SWA semantics
    (/root/reference/r_network.py:176-187, config.py:44-50, train.py:145-147)."""

    lr: float = 1e-4           # hparams['lr'] = 10e-5
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-6          # hparams['optim_eps'] = 10e-7
    weight_decay: float = 1e-4  # hparams['optim_weight_decay'] = 10e-5 (L2-into-grad)
    amsgrad: bool = True
    clip_norm: float = 100.0
    plateau_patience: int = 10
    plateau_factor: float = 0.1
    plateau_threshold: float = 1e-4
    plateau_min_lr: float = 0.0
    swa: bool = True
    swa_start_frac: float = 0.8  # Lightning SWA default swa_epoch_start
    nan_skip: bool = True        # skip batches whose loss is NaN


@dataclass(frozen=True)
class DataConfig:
    """VoiceBank-DEMAND pipeline (/root/reference/data.py, config.py:59-69)."""

    root: str = ""
    dataset_type: int = 28
    sr: int = 16000
    file_sr: int = 48000
    train_val_split: float = 0.8
    batch_size: int = 32
    crop_samples: int = 8160   # integer_win_size - hop (config.py:110-111)
    normalize_audio: bool = True
    load_into_ram: bool = False
    partition_json: str = "data_json/partition.json"
    prefetch: int = 2
    num_workers: int = 2


@dataclass(frozen=True)
class RunConfig:
    """Runtime/trainer settings (/root/reference/train.py:137-147)."""

    seed: int = 0
    max_epochs: int = 200
    log_every_n_steps: int = 25
    val_log_sample_size: int = 1
    num_sanity_val_steps: int = 1
    detect_anomaly: bool = True   # -> debug-NaN tripwires
    ckpt_dir: str = "checkpoints"
    log_dir: str = "logs"
    data_axis: str = "data"       # mesh axis name for DP
    donate_state: bool = True
    # train steps fused into one device dispatch (lax.scan); >1 amortizes
    # host->device launch latency (~6x throughput on network-attached chips)
    steps_per_dispatch: int = 1
    # eval: compute STOI/PESQ per utterance (same values feed the epoch means
    # and any CSV — each metric runs once per utterance either way)
    per_utterance_eval_metrics: bool = False


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    stft: STFTConfig = field(default_factory=STFTConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    data: DataConfig = field(default_factory=DataConfig)
    run: RunConfig = field(default_factory=RunConfig)
    quirks: Quirks = field(default_factory=Quirks)

    @property
    def variant(self) -> str:
        return self.model.variant

    # -- serialization ------------------------------------------------------

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self, **kw: Any) -> str:
        return json.dumps(self.to_dict(), indent=2, **kw)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        def _tupled(x: Any) -> Any:
            if isinstance(x, list):
                return tuple(_tupled(v) for v in x)
            return x

        kwargs = {}
        for f in dataclasses.fields(cls):
            sub = d.get(f.name)
            if sub is None:
                continue
            sub_cls = f.default_factory  # type: ignore[misc]
            kwargs[f.name] = sub_cls(**{k: _tupled(v) for k, v in sub.items()})
        return cls(**kwargs)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


def config_for_variant(variant: str, *, faithful: bool = True,
                       streaming: bool = False, **overrides: Any) -> Config:
    """Build the default config for one of {dr, dc, drs, dcs}.

    ``streaming=True`` applies the long-utterance streaming preset:
    unidirectional LSTM + time-major latent flatten, the combination under
    which chunked enhancement with LSTM state carry is EXACTLY equal to a
    full pass (models/enhance.py enhance_streaming; tests/test_streaming.py).
    A bidirectional model cannot carry state across chunks (the backward
    pass would need future frames), and the reference's f-major flatten
    breaks sequence continuity at chunk boundaries.
    """
    complex_valued, subtractive = _axes_for_variant(variant)
    model = ModelConfig(complex_valued=complex_valued, subtractive=subtractive)
    if streaming:
        model = dataclasses.replace(
            model, lstm_bidir=False, lstm_time_major=True)
    cfg = Config(
        model=model,
        quirks=Quirks() if faithful else Quirks.idiomatic(),
    )
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg

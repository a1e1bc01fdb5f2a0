"""dcs_net_tpu — a TPU-native (JAX / XLA / Pallas / pjit) speech-enhancement
framework with the capability surface of DCS-Net ("Deep Complex Subtractive
Neural Network for Monaural Speech Enhancement").

Reference capability map: see SURVEY.md. This is a ground-up TPU-first design,
not a port: complex tensors are (real, imag) pairs of real arrays packed for
the MXU/VPU, the STFT front-end runs on-device, the LSTM bottleneck is a
`lax.scan`, and distribution is `jax.sharding.Mesh` data-parallelism.

Layout:
    core/      typed config (variant axes ``complex_valued`` x ``subtractive``)
    dsp/       STFT / iSTFT (jnp reference + Pallas kernels)
    ops/       complex conv/BN/LSTM/attention/mask op library
    models/    the U-Net model family (DR / DC / DRS / DCS)
    data/      VoiceBank-DEMAND partition + loader
    train/     losses, optimizer, train/eval steps, loop, checkpointing
    parallel/  mesh construction + sharded step functions
    metrics/   PESQ (native) / STOI / SiSNR evaluation harness
    obs/       TensorBoard-compatible logging, profiling counters
    cli/       train / test / enhance / tune entry points
"""

from dcs_net_tpu.core.config import Config, VARIANTS, config_for_variant

__version__ = "0.1.0"

__all__ = ["Config", "VARIANTS", "config_for_variant", "__version__"]

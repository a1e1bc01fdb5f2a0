"""Enhance a wav file: ``python -m dcs_net_tpu.cli.enhance dcs --in noisy.wav
--out clean.wav [--stream]`` — the long-utterance path the reference lacks."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("variant", choices=("dr", "dc", "drs", "dcs"))
    p.add_argument("--in", dest="infile", required=True)
    p.add_argument("--out", dest="outfile", required=True)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--stream", action="store_true",
                   help="fixed-shape chunked streaming (constant compile)")
    p.add_argument("--chunk-frames", type=int, default=256)
    p.add_argument("--overlap", type=int, default=64)
    p.add_argument("--idiomatic", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dcs_net_tpu.core.config import config_for_variant
    from dcs_net_tpu.data.audio_io import read_wav, resample, write_wav
    from dcs_net_tpu.models.enhance import enhance_full, enhance_streaming
    from dcs_net_tpu.models.unet import DCSNet

    cfg = config_for_variant(args.variant, faithful=not args.idiomatic)
    if args.ckpt_dir:
        import os

        from dcs_net_tpu.core.config import Config

        cfg_path = os.path.join(args.ckpt_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = Config.from_json(f.read())
            print(f"using config saved with checkpoint ({cfg.variant})")
    wave, sr = read_wav(args.infile)
    if sr != cfg.data.sr:
        wave = resample(wave, sr, cfg.data.sr)
    model = DCSNet(cfg.model, cfg.quirks)

    x = jnp.asarray(wave)[None, :]
    if args.ckpt_dir:
        from dcs_net_tpu.dsp import stft as dsp
        from dcs_net_tpu.train.checkpoint import CheckpointManager, abstract_like
        from dcs_net_tpu.train.optim import make_optimizer
        from dcs_net_tpu.train.steps import init_state

        spec = jax.jit(lambda w: dsp.stft(w, cfg.stft))(
            jnp.zeros((cfg.data.batch_size, cfg.data.crop_samples)))
        sample = spec if cfg.model.complex_valued else spec.abs()
        state = init_state(model, cfg, make_optimizer(cfg.optim),
                           jax.random.PRNGKey(0), sample)
        state, _ = CheckpointManager(args.ckpt_dir).restore(abstract_like(state))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        print(f"restored checkpoint from {args.ckpt_dir}")
    else:
        print("WARNING: no --ckpt-dir; enhancing with untrained weights")
        from dcs_net_tpu.dsp import stft as dsp

        # init on a stride-aligned dummy (T % 8 == 0); enhancement itself
        # pads arbitrary utterance lengths.
        dummy = jnp.zeros((1, cfg.data.crop_samples), jnp.float32)
        variables = jax.jit(lambda r, w: model.init(
            {"params": r, "dropout": r}, dsp.stft(w, cfg.stft), train=False)
        )(jax.random.PRNGKey(0), dummy)

    if args.stream:
        out = enhance_streaming(model, variables, x, cfg,
                                chunk_frames=args.chunk_frames,
                                overlap=args.overlap)
    else:
        out = jax.jit(lambda v, w: enhance_full(model, v, w, cfg))(variables, x)
    out = np.asarray(out)[0]
    write_wav(args.outfile, out, cfg.data.sr)
    print(f"wrote {args.outfile}: {out.shape[0] / cfg.data.sr:.2f}s @ "
          f"{cfg.data.sr} Hz ({'stream' if args.stream else 'full'})")


if __name__ == "__main__":
    main()

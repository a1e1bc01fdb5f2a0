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
    p.add_argument("--carry", action="store_true",
                   help="thread LSTM (h, c) across chunks (implies --stream; "
                        "uses the streaming config preset: unidirectional "
                        "LSTM + time-major latent — exact chunked==full when "
                        "--overlap 0)")
    p.add_argument("--chunk-frames", type=int, default=256)
    p.add_argument("--chunk-batch", type=int, default=8,
                   help="without --carry, independent chunks run batched in "
                        "groups of this size (fills the chip instead of "
                        "serializing batch-1 chunk passes)")
    p.add_argument("--overlap", type=int, default=None,
                   help="chunk overlap frames (default 64, or 0 with --carry "
                        "where non-overlapping tiling keeps the carry exact)")
    p.add_argument("--idiomatic", action="store_true")
    p.add_argument("--config-json", default=None,
                   help="load a serialized Config (overrides variant flags; "
                        "a checkpoint dir's config.json still wins)")
    args = p.parse_args(argv)
    if args.carry:
        args.stream = True
    if args.carry and args.overlap:
        # the LSTM state carried out of chunk c has already consumed the
        # overlap frames chunk c+1 re-reads — carried state would be
        # time-misaligned at every boundary (advisor r4)
        p.error("--carry requires --overlap 0: the carried LSTM state is "
                "time-aligned only with non-overlapping chunk tiling "
                "(where chunked==full exactly). Drop --overlap, or drop "
                "--carry to stream with mask crossfade only.")
    if args.overlap is None:
        # default crossfade: 64 frames, clamped for small chunks (overlap
        # must stay below chunk_frames)
        args.overlap = 0 if args.carry else min(64, args.chunk_frames // 4)
    if not (0 <= args.overlap < args.chunk_frames):
        p.error(f"--overlap must be in [0, chunk_frames): got "
                f"{args.overlap} with --chunk-frames {args.chunk_frames}")

    import jax
    import jax.numpy as jnp

    from dcs_net_tpu.core.config import config_for_variant
    from dcs_net_tpu.data.audio_io import read_wav, resample, write_wav
    from dcs_net_tpu.models.enhance import enhance_full, enhance_streaming
    from dcs_net_tpu.models.unet import DCSNet

    cfg = config_for_variant(args.variant, faithful=not args.idiomatic,
                             streaming=args.carry)
    if args.config_json:
        from dcs_net_tpu.core.config import Config

        with open(args.config_json) as f:
            cfg = Config.from_json(f.read())
    if args.ckpt_dir:
        import os

        from dcs_net_tpu.core.config import Config

        cfg_path = os.path.join(args.ckpt_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = Config.from_json(f.read())
            print(f"using config saved with checkpoint ({cfg.variant})")
    if args.carry and cfg.model.lstm_bidir:
        p.error(
            "--carry needs a model trained with the streaming preset "
            "(lstm_bidir=False, lstm_time_major=True): a bidirectional "
            "LSTM cannot carry state across chunks. Train one with "
            "`python -m dcs_net_tpu.cli.train {variant} --streaming`, or "
            "drop --carry to stream this checkpoint with mask crossfade "
            "only.".format(variant=args.variant))
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
                                overlap=args.overlap,
                                carry_lstm_state=args.carry,
                                chunk_batch=args.chunk_batch)
    else:
        out = jax.jit(lambda v, w: enhance_full(model, v, w, cfg))(variables, x)
    out = np.asarray(out)[0]
    write_wav(args.outfile, out, cfg.data.sr)
    print(f"wrote {args.outfile}: {out.shape[0] / cfg.data.sr:.2f}s @ "
          f"{cfg.data.sr} Hz ({'stream' if args.stream else 'full'})")


if __name__ == "__main__":
    main()

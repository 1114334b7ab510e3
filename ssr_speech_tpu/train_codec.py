"""Watermark-codec training entry point.

Mirrors the reference flow ``dora run solver='compression/encodec_audiogen_16khz'``
(README.md:282, ``audiocraft/audiocraft/train.py:124`` +
``solvers/wmcompression.py``): load a trained (wm)encodec checkpoint, freeze
encoder/decoder/quantizer, bootstrap the watermark decoder from the plain
decoder/encoder weights (wmcompression.py:353-362), then run the GAN +
watermark-CE loop of ``training.codec_trainer``.

Example:
  python -m ssr_speech_tpu.train_codec --manifest egs/train/data.jsonl \
    --codec_path ckpt/encodec.th --exp_dir exp/wmcodec --updates 2000
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os


def bootstrap_wm_from_codec(params):
    """Initialize the watermark decoder from the trained plain codec
    (reference wmcompression.py:353-362): wmdecoder.model <- decoder,
    wm_encoder/skip_encoder <- encoder."""
    import jax

    copy_tree = lambda t: jax.tree.map(lambda x: x, t)
    wmd = params["wmdecoder"]
    wmd["decoder"] = copy_tree(params["decoder"])
    wmd["wm_encoder"] = copy_tree(params["encoder"])
    wmd["skip_encoder"] = copy_tree(params["encoder"])
    return params


def main(argv=None):
    p = argparse.ArgumentParser("ssr_speech_tpu.train_codec")
    p.add_argument("--manifest", required=True, help="jsonl of {path,duration}")
    p.add_argument("--codec_path", default=None,
                   help="pretrained (wm)encodec to start from (.th torch or .pkl)")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--segment_duration", type=float, default=2.0)
    # dataset sampling options (reference audio_dataset.py:272-303 defaults)
    p.add_argument("--sample_on_duration",
                   action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--sample_on_weight",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="weight files by the manifest 'weight' field")
    p.add_argument("--min_segment_ratio", type=float, default=0.5)
    p.add_argument("--max_read_retry", type=int, default=10)
    p.add_argument("--max_audio_duration", type=float, default=None)
    p.add_argument("--updates", type=int, default=2000)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--ema_decay", type=float, default=0.99)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--generate_every", type=int, default=0,
                   help="store watermark reconstructions every N steps "
                        "(0 = only at end of training)")
    p.add_argument("--samples_dir", default=None,
                   help="SampleManager root (default <exp_dir>/samples)")
    p.add_argument("--visqol_bin", default=None,
                   help="path to a google/visqol install for eval-stage "
                        "MOS-LQO (optional, like the reference)")
    p.add_argument("--loss_weights", default=None,
                   help="balancer weights, e.g. 'adv=4,feat=4,l1=0.1,"
                        "msspec=2' (+ optional mel/mstft/l2; reference "
                        "solver `losses:` config)")
    p.add_argument("--adv_loss_mode", default="hinge",
                   choices=["hinge", "mse"],
                   help="adversarial objective family (reference "
                        "adversarial.loss)")
    p.add_argument("--wm_ce_weight", type=float, default=1.0,
                   help="scale on the watermark CE losses (reference "
                        "wmcompression.py:102-106 uses 1.0; larger values "
                        "prioritize detector convergence, e.g. short "
                        "rehearsal runs)")
    p.add_argument("--wm_min_regions", type=int, default=0,
                   help="minimum watermark spans sampled per item (reference "
                        "wmencodec.py:206-235 allows zero-span items; >=1 "
                        "guarantees positive watermark examples every batch "
                        "— faster detector convergence on small corpora)")
    p.add_argument("--disc_scales", type=int, default=None,
                   help="number of MS-STFT discriminator scales (default 5, "
                        "the shipped n_ffts list; smaller = debug/rehearsal)")
    p.add_argument("--precision", default=None,
                   choices=["float32", "bfloat16"],
                   help="activation dtype of the trained subgraphs "
                        "(wm-decoder + discriminator passes; params/losses "
                        "stay f32). Default: bfloat16 on TPU — the step is "
                        "HBM-bound (tools/codec_trace_probe.py) — float32 "
                        "elsewhere")
    p.add_argument("--deadlock_timeout", type=float, default=0.0,
                   help=">0: stall watchdog — no loop beacon for this many "
                        "seconds dumps stacks and kills the process")
    p.add_argument("--profile_steps", type=int, default=0,
                   help=">0: jax.profiler-trace the first N steps to "
                        "exp_dir/profile")
    p.add_argument("--config_json", default=None,
                   help="codec geometry as a CodecConfig JSON file "
                        "(default: shipped encodec_large_nq4_s320)")
    p.add_argument("--loader_threads", type=int, default=8,
                   help="C++ threaded WAV batch loader threads (0 = python "
                        "loop); batches are also prefetched one step ahead")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each batch over all devices (SPMD; XLA "
                        "inserts the gradient collectives — the flashy/NCCL "
                        "sync of the reference, wmcompression.py:162)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    logger = logging.getLogger("train_codec")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .config import CodecConfig
    from .data.audio_dataset import AudioSegmentDataset
    from .models import convert as cvt
    from .models.codec import wmencodec as wm
    from .training import codec_trainer
    from .utils import checkpoint as ckpt

    if args.config_json:
        from .config import codec_config_from_json

        with open(args.config_json) as f:
            cfg = codec_config_from_json(f.read())
    else:
        cfg = CodecConfig()
    pretrained = None
    if args.codec_path:
        if args.codec_path.endswith((".th", ".pth", ".pt")):
            sd = cvt.load_torch_file(args.codec_path)
            for key in ("best_state", "model", "state_dict"):
                if isinstance(sd, dict) and key in sd:
                    sd = sd[key]
            pretrained = cvt.convert_wmencodec(sd, cfg)
        else:
            pretrained = ckpt.load_bundle(args.codec_path)["params"]
        pretrained = bootstrap_wm_from_codec(pretrained)

    bw = None
    if args.loss_weights:
        bw = {k: float(v) for k, v in
              (kv.split("=") for kv in args.loss_weights.split(","))}
    state, opts = codec_trainer.init_codec_train_state(
        jax.random.PRNGKey(args.seed), cfg, lr=args.lr, pretrained=pretrained,
        balance_weights=bw, disc_scales=args.disc_scales,
    )
    precision = args.precision
    if precision is None:
        precision = ("bfloat16"
                     if jax.default_backend() in ("tpu", "axon")
                     else "float32")
    logger.info("compute precision: %s", precision)
    step_fn = codec_trainer.make_codec_train_step(
        cfg, opts, args.ema_decay, balance_weights=bw,
        adv_loss_mode=args.adv_loss_mode, compute_dtype=precision,
        wm_ce_weight=args.wm_ce_weight)

    shard_batch = lambda x: x
    if args.data_parallel and jax.device_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        from .parallel import mesh as meshlib

        mesh = meshlib.make_mesh(tp=1)
        n_dev = mesh.devices.size
        if args.batch_size % n_dev:
            raise SystemExit(f"--batch_size must be divisible by {n_dev} devices")
        logger.info("data-parallel over %d devices", n_dev)

        def shard_batch(x):  # noqa: F811
            spec = PartitionSpec("dp", *([None] * (x.ndim - 1)))
            return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    ds = AudioSegmentDataset(args.manifest, cfg, args.segment_duration,
                             seed=args.seed,
                             loader_threads=args.loader_threads,
                             sample_on_duration=args.sample_on_duration,
                             sample_on_weight=args.sample_on_weight,
                             min_segment_ratio=args.min_segment_ratio,
                             max_read_retry=args.max_read_retry,
                             max_audio_duration=args.max_audio_duration)
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.exp_dir, exist_ok=True)
    # persist the RESOLVED geometry (reference: dora writes the composed
    # hydra config next to the xp) — --config_json of a later run can
    # consume it verbatim
    from .config import config_to_json

    with open(os.path.join(args.exp_dir, "config.json"), "w") as f:
        f.write(config_to_json(cfg))
    hop = cfg.hop_length
    frames = int(args.segment_duration * cfg.sample_rate) // hop

    from .utils.sample_manager import SampleManager

    samples = SampleManager(args.samples_dir
                            or os.path.join(args.exp_dir, "samples"))
    visqol = None
    if args.visqol_bin:
        from .utils.visqol import ViSQOL

        visqol = ViSQOL(args.visqol_bin, mode="speech")

    def generate_stage(epoch: int, step: int):
        # generate stage (reference solvers/base.py:478-487): store
        # watermark reconstructions of an eval batch with provenance
        wav_eval = np.asarray(next(ds.batches(args.batch_size, 1)))
        recon = np.asarray(codec_trainer.reconstruct(
            state, cfg, jnp.asarray(wav_eval)))
        for i in range(recon.shape[0]):
            samples.add_sample(recon[i], cfg.sample_rate, epoch=epoch,
                               conditioning=dict(step=step, index=i),
                               prompt_wav=wav_eval[i])
        if visqol is not None:
            score = visqol([w[:, 0] for w in wav_eval],
                           [r[:, 0] for r in recon], sr=cfg.sample_rate)
            logger.info("generate stage: %d samples, visqol %.3f",
                        recon.shape[0], score)
        else:
            logger.info("generate stage: %d samples stored", recon.shape[0])

    step = 0
    epoch = 0
    from .data.prefetch import PrefetchIterator
    from .utils.profiler import Profiler
    from .utils.watchdog import DeadlockDetect

    watchdog = DeadlockDetect(use=args.deadlock_timeout > 0,
                              timeout=args.deadlock_timeout)
    prof = Profiler(logdir=os.path.join(args.exp_dir, "profile"),
                    enabled=args.profile_steps > 0,
                    num_steps=args.profile_steps)
    # the GAN step / eval / generate each first-compile in minutes on a
    # cold cache (BENCHMARKS.md) — beacon those gaps with a longer grace
    grace = max(4 * args.deadlock_timeout, 2400.0)
    try:
        with watchdog:
            for epoch in range(args.epochs):
                for wav in PrefetchIterator(
                        ds.batches(args.batch_size, args.updates), depth=2):
                    labels, keep = wm.sample_watermark_mask(
                        rng, wav.shape[0], frames, hop,
                        min_regions=args.wm_min_regions)
                    watchdog.update("dispatch", next_timeout=grace)
                    state, metrics = step_fn(
                        state, shard_batch(jnp.asarray(wav)),
                        shard_batch(jnp.asarray(labels)),
                        shard_batch(jnp.asarray(keep)))
                    watchdog.update("step")
                    prof.step()
                    step += 1
                    if step % 50 == 0:
                        m = {k: float(v) for k, v in metrics.items()}
                        logger.info("epoch %d step %d %s", epoch, step,
                                    {k: round(v, 4) for k, v in m.items()})
                    if step % args.eval_every == 0:
                        watchdog.update("eval", next_timeout=grace)
                        wav_eval = jnp.asarray(
                            next(ds.batches(args.batch_size, 1)))
                        sisnr = float(codec_trainer.evaluate_sisnr(
                            state, cfg, wav_eval))
                        logger.info("eval si-snr %.2f dB", sisnr)
                    if args.generate_every and \
                            step % args.generate_every == 0:
                        watchdog.update("generate", next_timeout=grace)
                        generate_stage(epoch, step)
                    if step % args.save_every == 0:
                        # checkpoint pull: full state device->host (~120 s
                        # for the 1.6 GB state on the tunneled backend)
                        watchdog.update("save", next_timeout=grace)
                        full = dict(encoder=state.frozen["encoder"],
                                    decoder=state.frozen["decoder"],
                                    quantizer=state.frozen["quantizer"],
                                    wmdecoder=state.ema_params)
                        ckpt.save_bundle(
                            os.path.join(args.exp_dir, "codec_bundle.pkl"),
                            params=full,
                            config=dataclasses.asdict(cfg),
                            step=step,
                        )
    finally:
        prof.close()
    if step:
        generate_stage(epoch, step)
    logger.info("done: %d steps", step)


if __name__ == "__main__":
    main()

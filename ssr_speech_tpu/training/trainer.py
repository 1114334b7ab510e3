"""SSR LM trainer: jitted SPMD train step + host training loop.

Capability parity with the reference trainer (``steps/trainer.py``):
  - DDP -> data-parallel mesh axis; gradients all-reduced by XLA
    (trainer.py:48, main.py:47),
  - mixed precision: bf16 compute, fp32 master params — replaces the fp16
    GradScaler dance (trainer.py:36,92,141; fp16 loss scaling is unnecessary
    with bf16 on TPU),
  - gradient accumulation as a ``lax.scan`` over microbatches
    (trainer.py:89-91 slices the batch j::accum),
  - NaN-batch skip decided on device and applied with ``jnp.where`` so every
    replica takes the same branch (trainer.py:100-111),
  - ScaledAdam backward on the un-normalized weighted-sum loss, AdamW on
    loss/ntokens (trainer.py:141-144),
  - validation + best/last checkpoint bundles with config and phn2num
    (trainer.py:200-241), early stopping (trainer.py:206-215),
  - divergence abort when running train loss is NaN (trainer.py:183-185).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..config import SSRModelConfig, TrainConfig
from ..models import ssr as ssr_model
from ..parallel import mesh as meshlib
from ..utils import checkpoint as ckpt
from ..utils.logging_utils import MetricsWriter
from ..utils.metrics import AverageMeter
from ..utils.profiler import Profiler, annotate as profiler_annotate
from ..utils.watchdog import DeadlockDetect
from . import optim as optimlib

logger = logging.getLogger(__name__)


def make_train_step(
    cfg: SSRModelConfig,
    tcfg: TrainConfig,
    optimizer,
    mesh=None,
    sequence_parallel: bool = False,
    unroll: Optional[bool] = None,
):
    """Build the jitted train step. batch arrays: x [B,Sx], x_lens, y [B,Sy,K],
    y_lens; with grad accumulation the leading dim is [A, B/A, ...].

    sequence_parallel: additionally shard the residual stream's sequence axis
    over the tp group at every layer boundary (Megatron-SP; needs a mesh with
    a tp axis) — norms/dropouts/residuals run sequence-sharded and XLA places
    gather/scatter collectives around attention/ffn. Numerics are unchanged
    (tests/test_parallel.py::test_sequence_parallel_matches).

    unroll: python-unroll the layer loop — 1.58x faster training on TPU, at
    the cost of longer compiles (see ``transformer_forward``). Default
    (None): unroll exactly on TPU backends."""
    compute_dtype = jnp.bfloat16 if tcfg.precision == "bfloat16" else jnp.float32
    normalize = tcfg.optim.optimizer_name.lower() != "scaledadam"
    cw = tcfg.codebook_weight
    if unroll is None:
        unroll = jax.default_backend() in ("tpu", "axon")
    # fused attention never materializes [B,H,S,S], so the backward fits
    # with relaxed remat (ops/flash_attention.py); cfg.remat picks the policy
    remat = cfg.remat
    flash_sharding = None
    if cfg.attn_impl in ("flash", "splash") and mesh is not None:
        # the Pallas kernel has no GSPMD rule: run it shard_map'ed with batch
        # on dp and heads on tp (both communication-free for attention)
        flash_sharding = (mesh, P("dp", "tp", None, None))
    act_sharding = None
    if sequence_parallel:
        assert mesh is not None and "tp" in mesh.axis_names, mesh
        from jax.sharding import NamedSharding
        act_sharding = NamedSharding(mesh, P("dp", "tp", None))

    def loss_fn(params, batch, rng):
        out = ssr_model.ssr_forward(
            params, cfg, batch, deterministic=False, rng=rng,
            compute_dtype=compute_dtype,
            predict_mask_token=tcfg.masking.predict_mask_token,
            predict_all=tcfg.masking.predict_all,
            codebook_weight=cw,
            act_sharding=act_sharding,
            unroll=unroll,
            remat=remat,
            flash_sharding=flash_sharding,
        )
        loss = out["loss"]
        if normalize:
            loss = loss / jnp.maximum(out["effective_ntoken"], 1.0)
        return loss, out

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(params, opt_state, batch, rng):
        accum = tcfg.gradient_accumulation_steps

        if accum > 1:
            def micro(carry, mb):
                grads_acc, metrics_acc, key = carry
                key, sub = jax.random.split(key)
                (loss, out), grads = grad_fn(params, mb, sub)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                m = jnp.stack([out["loss"], out["top10acc"], out["effective_ntoken"]])
                return (grads_acc, metrics_acc + m, key), out["top10acc_by_codebook"]

            zero_grads = jax.tree.map(jnp.zeros_like, params)
            (grads, msum, _), acc_cb = jax.lax.scan(
                micro, (zero_grads, jnp.zeros(3), rng), batch
            )
            loss_sum, top10_sum, ntok = msum[0], msum[1], msum[2]
            acc_cb = jnp.sum(acc_cb, axis=0)
        else:
            (loss, out), grads = grad_fn(params, batch, rng)
            loss_sum, top10_sum, ntok = out["loss"], out["top10acc"], out["effective_ntoken"]
            acc_cb = out["top10acc_by_codebook"]

        # NaN/Inf skip, same decision on every replica (trainer.py:100-111)
        grads_finite = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
        )
        is_good = jnp.isfinite(loss_sum) & grads_finite

        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u.astype(p.dtype), params, updates)
        params_out = jax.tree.map(
            lambda n, o: jnp.where(is_good, n, o), new_params, params
        )
        opt_out = jax.tree.map(
            lambda n, o: jnp.where(is_good, n, o), new_opt_state, opt_state
        )
        metrics = dict(
            loss=loss_sum, top10acc=top10_sum, ntokens=ntok,
            top10acc_by_codebook=acc_cb, skipped=(~is_good).astype(jnp.float32),
        )
        return params_out, opt_out, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0, 1))

    pspec = meshlib.ssr_param_specs(None)
    bspec = meshlib.batch_specs()
    if tcfg.gradient_accumulation_steps > 1:
        bspec = {k: P(*((None,) + tuple(s))) for k, s in bspec.items()}
    return jax.jit(
        train_step,
        donate_argnums=(0, 1),
        in_shardings=(
            meshlib.named_sharding_tree(mesh, pspec),
            None,
            meshlib.named_sharding_tree(mesh, bspec),
            None,
        ),
    )


def make_eval_step(cfg: SSRModelConfig, tcfg: TrainConfig, mesh=None):
    compute_dtype = jnp.bfloat16 if tcfg.precision == "bfloat16" else jnp.float32
    # same shard_map wrapping as the train step: without it the Pallas flash
    # call has no GSPMD rule and the first validation on a mesh fails
    flash_sharding = None
    if cfg.attn_impl in ("flash", "splash") and mesh is not None:
        flash_sharding = (mesh, P("dp", "tp", None, None))

    @jax.jit
    def eval_step(params, batch):
        out = ssr_model.ssr_forward(
            params, cfg, batch, deterministic=True,
            compute_dtype=compute_dtype,
            predict_mask_token=tcfg.masking.predict_mask_token,
            predict_all=tcfg.masking.predict_all,
            codebook_weight=tcfg.codebook_weight,
            flash_sharding=flash_sharding,
        )
        return dict(loss=out["loss"], top10acc=out["top10acc"],
                    ntokens=out["effective_ntoken"],
                    top10acc_by_codebook=out["top10acc_by_codebook"])

    return eval_step


class Trainer:
    """Host-side training loop (reference ``steps/trainer.py:23-470``)."""

    def __init__(
        self,
        cfg: SSRModelConfig,
        tcfg: TrainConfig,
        train_loader: Callable[[int], Iterator[Dict[str, np.ndarray]]],
        valid_loader: Optional[Callable[[], Iterator[Dict[str, np.ndarray]]]] = None,
        phn2num: Optional[Dict[str, int]] = None,
        mesh=None,
        exp_dir: Optional[str] = None,
        pp: int = 1,
        n_micro: Optional[int] = None,
        sequence_parallel: bool = False,
        unroll: Optional[bool] = None,
    ):
        """pp > 1 selects the GPipe pipeline step (``parallel.pipeline``;
        mesh must then carry a ``pp`` axis, e.g. ``pipeline.make_pp_mesh``);
        sequence_parallel enables Megatron-SP activation sharding on the
        GSPMD step (needs a tp axis); unroll None = unrolled layer loop on
        TPU backends (1.58x), scan elsewhere."""
        self.cfg, self.tcfg = cfg, tcfg
        self.train_loader, self.valid_loader = train_loader, valid_loader
        self.phn2num = phn2num or {}
        self.mesh = mesh
        self.exp_dir = exp_dir or tcfg.data.exp_dir or "exp"
        os.makedirs(self.exp_dir, exist_ok=True)

        key = jax.random.PRNGKey(tcfg.seed)
        self.rng, init_key = jax.random.split(key)
        # init always draws from threefry (weights independent of rng_impl);
        # only the per-step dropout stream switches implementation (rbg =
        # TPU hardware RNG, 660 -> 605 ms/step at 830M/B=8 — BENCHMARKS.md)
        if tcfg.rng_impl != "threefry2x32":
            self.rng = jax.random.key(tcfg.seed, impl=tcfg.rng_impl)
        self.params = ssr_model.init_ssr(init_key, cfg)
        total = tcfg.num_steps or 100000
        self.optimizer, self.schedule = optimlib.build_optimizer(tcfg.optim, total)
        if pp > 1:
            if sequence_parallel:
                raise ValueError(
                    "sequence_parallel is not supported with pp > 1 (the "
                    "GPipe step shards activations by stage/microbatch; "
                    "drop --sequence_parallel or use the GSPMD step)")
            from ..parallel import pipeline as pl

            # init the optimizer AFTER sharding: a full unsharded state for
            # the 830M would transiently double optimizer memory
            self.params = pl.shard_params_pp(mesh, self.params)
            self.opt_state = self.optimizer.init(self.params)
            self.train_step = pl.make_pp_train_step(
                cfg, tcfg, self.optimizer, mesh, n_micro=n_micro,
                unroll=unroll)
        else:
            self.opt_state = self.optimizer.init(self.params)
            self.train_step = make_train_step(
                cfg, tcfg, self.optimizer, mesh,
                sequence_parallel=sequence_parallel, unroll=unroll)
        self.eval_step = make_eval_step(cfg, tcfg, mesh=mesh)
        self.progress = dict(step=0, epoch=0, cur_step=0, best_step=0,
                             best_score=float("inf"))
        self.meters = {k: AverageMeter() for k in
                       ("train_loss", "train_top10acc", "data_time", "train_time")}
        self.total_step = total
        self.writer = MetricsWriter(self.exp_dir)
        self._watchdog: Optional[DeadlockDetect] = None
        self._compile_grace = 1800.0

    # ------------------------------------------------------------- loop

    def train(self, benchmark_no_load: bool = False):
        """Main loop. ``benchmark_no_load`` repeats the first batch to
        benchmark the step loop without I/O (reference
        audiocraft/config/config.yaml:21, solvers/base.py:527-530)."""
        tcfg = self.tcfg
        # stall watchdog + first-steps profiler (reference DeadlockDetect
        # beacons + profiler wrapper, solvers/base.py:536-554) — both off by
        # default; armed via TrainConfig.deadlock_timeout / profile_steps
        watchdog = DeadlockDetect(use=tcfg.deadlock_timeout > 0,
                                  timeout=tcfg.deadlock_timeout)
        prof = Profiler(logdir=os.path.join(self.exp_dir, "profile"),
                        enabled=tcfg.profile_steps > 0,
                        num_steps=tcfg.profile_steps)
        self._watchdog = watchdog
        # any step/eval may hit a first-compile for its bucket shape
        # (minutes); grant those gaps a longer allowance than host gaps
        self._compile_grace = max(4 * tcfg.deadlock_timeout, 1800.0)
        try:
            with watchdog:
                self._train_loop(tcfg, benchmark_no_load, watchdog, prof)
        finally:
            prof.close()
            self._watchdog = None
        return self.progress

    def _train_loop(self, tcfg, benchmark_no_load, watchdog, prof):
        flag = True
        bench_batch = None
        data_start = time.time()
        while flag:
            for batch in self.train_loader(self.progress["epoch"]):
                if benchmark_no_load:
                    if bench_batch is None:
                        bench_batch = batch
                    batch = bench_batch
                if self.progress["step"] > self.total_step:
                    flag = False
                    self.validate_and_save()
                    break
                data_end = time.time()
                self.rng, step_key = jax.random.split(self.rng)
                watchdog.update("dispatch", next_timeout=self._compile_grace)
                with profiler_annotate("train_step"):
                    self.params, self.opt_state, metrics = self.train_step(
                        self.params, self.opt_state, batch, step_key
                    )
                watchdog.update("step")
                prof.step()
                step = self.progress["step"]
                if step % tcfg.print_every_n_steps == 0:
                    m = jax.device_get(metrics)
                    ntok = max(float(m["ntokens"]), 1.0)
                    self.meters["train_loss"].update(float(m["loss"]) / ntok)
                    self.meters["train_top10acc"].update(float(m["top10acc"]) / ntok)
                    self.meters["data_time"].update(data_end - data_start)
                    self.meters["train_time"].update(time.time() - data_end)
                    self.writer.add_scalars(step, dict(
                        lr=float(self.schedule(step)),
                        loss=self.meters["train_loss"].val,
                        top10acc=self.meters["train_top10acc"].val,
                        ntokens=ntok, skipped=float(m["skipped"]),
                        data_time=self.meters["data_time"].val,
                        train_time=self.meters["train_time"].val,
                    ), prefix="train/")
                    logger.info(
                        "step %d/%d lr %.6f loss %.4f (%.4f) top10acc %.4f skipped %.0f",
                        step, self.total_step, float(self.schedule(step)),
                        self.meters["train_loss"].val, self.meters["train_loss"].avg,
                        self.meters["train_top10acc"].val, float(m["skipped"]),
                    )
                    if np.isnan(self.meters["train_loss"].avg):
                        raise RuntimeError("training diverged...")
                if step > 0 and step % tcfg.val_every_n_steps == 0:
                    if not self.validate_and_save():
                        flag = False
                        break
                self.progress["step"] += 1
                self.progress["cur_step"] += 1
                data_start = time.time()
            else:
                self.progress["epoch"] += 1
                self.progress["cur_step"] = 0
                continue
            break
        return self.progress

    # ------------------------------------------------------- validation

    def validate(self) -> float:
        if self.valid_loader is None:
            return float("nan")
        tot = np.zeros(3)
        for batch in self.valid_loader():
            if self._watchdog is not None:
                # per-batch beacons (reference beacons every stage's batch);
                # eval compiles once per bucket shape too
                self._watchdog.update("valid_batch",
                                      next_timeout=self._compile_grace)
            m = jax.device_get(self.eval_step(self.params, batch))
            tot += np.array([float(m["loss"]), float(m["top10acc"]),
                             float(m["ntokens"])])
        loss = tot[0] / max(tot[2], 1.0)
        logger.info("val loss %.4f top10acc %.4f ntokens %d",
                    loss, tot[1] / max(tot[2], 1.0), int(tot[2]))
        self.writer.add_scalars(self.progress["step"], dict(
            loss=loss, top10acc=tot[1] / max(tot[2], 1.0)), prefix="val/")
        return float(loss)

    def validate_and_save(self) -> bool:
        """Returns False when early stopping triggers
        (reference trainer.py:200-244)."""
        score = self.validate()
        if self._watchdog is not None:
            # bundle saves pull the full train state device->host (~minutes
            # for GB-scale states on a tunneled backend)
            self._watchdog.update("save", next_timeout=self._compile_grace)
        step = self.progress["step"]
        if not np.isnan(score) and score < self.progress["best_score"] - max(
            self.tcfg.early_stop_threshold, 0.0
        ):
            self.progress["best_score"] = score
            self.progress["best_step"] = step
            self.save_bundle("best_bundle.pkl")
        self.save_bundle("bundle.pkl")
        if self.tcfg.keep_step_checkpoints > 0:
            # numbered history with keep-last-N flushing (reference
            # checkpoint.py:104-122)
            ckpt.save_step_checkpoint(
                os.path.join(self.exp_dir, "checkpoints"), step,
                keep_last=self.tcfg.keep_step_checkpoints,
                params=self.params, opt_state=self.opt_state,
                progress=self.progress,
                model_config=dataclasses.asdict(self.cfg),
                train_config=dataclasses.asdict(self.tcfg),
                phn2num=self.phn2num)
        if (
            self.tcfg.early_stop_step > 0
            and step - self.progress["best_step"] > self.tcfg.early_stop_step
        ):
            logger.info("early stop at step %d (best %d)", step,
                        self.progress["best_step"])
            return False
        return True

    # ------------------------------------------------------ checkpoints

    def save_bundle(self, name: str):
        ckpt.save_bundle(
            os.path.join(self.exp_dir, name),
            params=self.params,
            opt_state=self.opt_state,
            progress=self.progress,
            model_config=dataclasses.asdict(self.cfg),
            train_config=dataclasses.asdict(self.tcfg),
            phn2num=self.phn2num,
            # dropout stream state: resume continues the stream instead of
            # restarting it from the constructor seed (rng_impl recorded so
            # a mismatched --rng_impl at resume fails loudly, not silently).
            # threefry runs hold a raw uint32 key; typed keys unwrap first.
            rng_state=np.asarray(
                self.rng if self.rng.dtype == jnp.uint32
                else jax.random.key_data(self.rng)),
            rng_impl=self.tcfg.rng_impl,
        )

    def load_bundle(self, path: str, load_optimizer: bool = True):
        bundle = ckpt.load_bundle(path)
        if bundle.get("rng_state") is not None:
            saved_impl = bundle.get("rng_impl", "threefry2x32")
            if saved_impl != self.tcfg.rng_impl:
                raise ValueError(
                    f"bundle was trained with rng_impl={saved_impl!r} but "
                    f"this run uses {self.tcfg.rng_impl!r}; pass the same "
                    "--rng_impl to resume the dropout stream")
            data = jnp.asarray(bundle["rng_state"])
            self.rng = (data if saved_impl == "threefry2x32"
                        else jax.random.wrap_key_data(data, impl=saved_impl))
        self.params = jax.tree.map(jnp.asarray, bundle["params"])
        if load_optimizer and bundle.get("opt_state") is not None:
            self.opt_state = jax.tree.unflatten(
                jax.tree.structure(self.opt_state),
                jax.tree.leaves(jax.tree.map(jnp.asarray, bundle["opt_state"])),
            )
        self.progress.update(bundle.get("progress", {}))
        self.phn2num = bundle.get("phn2num", self.phn2num)
        # resume the batcher mid-epoch (reference trainer.py:347-348,
        # trainer_utils.py:96-99 StatefulSampler.set_epoch_resume)
        if hasattr(self.train_loader, "set_epoch_resume"):
            self.train_loader.set_epoch_resume(
                self.progress.get("epoch", 0), self.progress.get("cur_step", 0)
            )

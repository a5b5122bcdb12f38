"""Full training loop: curriculum, schedules, logging, checkpointing.

Parity target: reference `must3r/engine/train.py` --
  * `select_batch` curriculum (:132-216): with more dataset views than
    `memory_num_views`, the usable view count grows linearly with epoch
    progress; a random prefix is processed without gradient
    (`train_decoder_skip`); causal mode groups views into blocks of
    `memory_batch_views`, non-causal processes 1-by-1 after the init pair;
    rendered views = half unseen + half random seen (static count).
  * per-iteration cosine LR with warmup, AdamW(0.9, 0.95), grad
    accumulation, NaN kill-switch, smoothed metric logging, JSON-lines
    log.txt, checkpoint-last / periodic / final with auto-resume
    (:295-510, io.py).

TPU adaptations: each distinct (mem_batches, skip, n_render, n_views)
schedule compiles once and is cached; the curriculum draws from a bounded
schedule set so compile count stays small. Data parallelism = sharded batch
on the mesh 'dp' axis (see parallel/).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import sys
import time
from collections import defaultdict, deque
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from must3r_tpu.checkpoint import load_checkpoint, save_checkpoint
from must3r_tpu.engine.train import (
    TrainSettings,
    cosine_schedule,
    effective_lr,
    make_optimizer,
    make_train_step,
)


# ---------------------------------------------------------------------------
# Curriculum schedule selection (reference select_batch)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Schedule:
    n_views: int                  # views consumed from the sample
    mem_batches: Tuple[int, ...]  # grouping incl. skipped prefix
    skip_batches: int             # leading entries of mem_batches run no-grad
    render_ids: Tuple[int, ...]   # views to render (static count)


def select_schedule(rng: np.random.Generator, nimgs: int,
                    memory_num_views: int, min_memory_num_views: int,
                    progress: float, causal: bool,
                    memory_batch_views: Optional[int],
                    render_once: bool, sample_memory_num_views: int,
                    max_render_count: Optional[int] = None,
                    disable_render: bool = False,
                    random_blocks: bool = False) -> Schedule:
    """Pick this iteration's schedule (mirrors train.py:132-216).

    Structure of a sample: [no-grad memory prefix (to_skip)] +
    [grad memory views (mem_views)] + [unseen render-only views]. In the
    curriculum regime (more dataset views than memory_num_views) the usable
    view count grows with progress and the no-grad prefix is random; the
    reference shadows `memory_num_views` with the per-step grad view count.

    max_render_count caps the rendered-view count by random subsampling
    (reference train.py:445-448); disable_render drops the render pass
    entirely (train.py:449, loss over first-pass views only).
    random_blocks enables the reference's non-causal randomized grouping
    (train.py:177-186: random block sizes in [1, memory_batch_views]) --
    sampled sizes are quantized to powers of two so the distinct-schedule
    (and therefore compiled-program) alphabet stays bounded.
    """
    to_skip = 0
    if memory_num_views < nimgs:
        mem_views = 1
        max_views = math.ceil(memory_num_views
                              + progress * (nimgs - memory_num_views))
        max_views = min(max_views, nimgs)
        to_skip = int(rng.integers(max_views - min_memory_num_views + 1))
        if to_skip < min_memory_num_views:
            to_skip = 0
            mem_views = min_memory_num_views
        n_views = min(to_skip + mem_views + memory_num_views, max_views)
        mem_views = min(mem_views, n_views - to_skip)
    else:
        mem_views = min(sample_memory_num_views, nimgs)
        n_views = nimgs

    def blocks(count, lead_pair: bool):
        out = []
        if count <= 0:
            return out
        if causal and memory_batch_views:
            while sum(out) != count:
                out.append(min(memory_batch_views, count - sum(out)))
        elif causal:
            out = [count]
        elif random_blocks and memory_batch_views:
            # reference non-causal grouping: random sizes in
            # [1, memory_batch_views], quantized to powers of two
            while sum(out) != count:
                s = int(rng.integers(1, min(memory_batch_views,
                                            count - sum(out)) + 1))
                s = 1 << (s.bit_length() - 1)       # floor to power of two
                out.append(min(s, count - sum(out)))
        else:
            f = min(min_memory_num_views, count) if lead_pair else 1
            out = [f] + [1] * (count - f)
        return out

    skip_blocks = blocks(to_skip, lead_pair=True)
    mem_blocks = blocks(mem_views, lead_pair=(to_skip == 0))

    seen = to_skip + mem_views
    unseen = list(range(seen, n_views))
    if render_once:
        render = unseen if unseen else [n_views - 1]
        # pad to a fixed count for static shapes
        want = max(len(unseen), 1)
        render = (render + [render[-1]] * want)[:want]
    else:
        k = math.ceil(memory_num_views / 2)
        rng.shuffle(unseen)
        render = unseen[:k]
        pool = rng.permutation(seen)[:memory_num_views - len(render)]
        render = render + [int(v) for v in pool]
        if not render:
            render = [n_views - 1]
    if max_render_count is not None and len(render) > max_render_count:
        render = [int(v) for v in
                  rng.choice(render, size=max_render_count, replace=False)]
    if disable_render:
        render = []
    return Schedule(n_views=n_views,
                    mem_batches=tuple(skip_blocks + mem_blocks),
                    skip_batches=len(skip_blocks),
                    render_ids=tuple(int(v) for v in render))


# ---------------------------------------------------------------------------
# Metric logging
# ---------------------------------------------------------------------------

class MetricLogger:
    """Smoothed console meters + JSON-lines file (croco MetricLogger and
    the reference's per-epoch log.txt, train.py:322-330)."""

    def __init__(self, window: int = 50, log_path: Optional[str] = None):
        self.meters = defaultdict(lambda: deque(maxlen=window))
        self.log_path = log_path

    def update(self, **kv):
        for k, v in kv.items():
            self.meters[k].append(float(v))

    def smoothed(self) -> Dict[str, float]:
        return {k: float(np.mean(v)) for k, v in self.meters.items() if v}

    def line(self) -> str:
        return "  ".join(f"{k}={v:.4g}" for k, v in self.smoothed().items())

    def write_epoch(self, epoch: int, extra: Optional[Dict] = None):
        if not self.log_path:
            return
        rec = {"epoch": epoch, **self.smoothed(), **(extra or {})}
        with open(self.log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")


class TensorBoardWriter:
    """Optional tf.summary writer (reference rank-0 SummaryWriter,
    train.py:340-343,495-505); no-op when tensorflow is unavailable."""

    def __init__(self, logdir: Optional[str]):
        self._writer = None
        if logdir:
            try:
                import tensorflow as tf

                self._writer = tf.summary.create_file_writer(logdir)
            except Exception:
                self._writer = None

    def scalars(self, step: int, **kv):
        if self._writer is None:
            return
        import tensorflow as tf

        with self._writer.as_default():
            for k, v in kv.items():
                tf.summary.scalar(k, float(v), step=step)


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TrainLoopConfig:
    epochs: int = 10
    warmup_epochs: float = 1.0
    blr: float = 1.5e-4
    lr: Optional[float] = None
    min_lr: float = 0.0
    weight_decay: float = 0.05
    layer_decay: Optional[float] = None
    accum_iter: int = 1
    batch_size: int = 2
    memory_num_views: int = 10
    min_memory_num_views: int = 2
    memory_batch_views: Optional[int] = None
    causal: bool = True
    render_once: bool = False
    max_render_count: Optional[int] = None
    disable_render: bool = False
    random_blocks: bool = False
    keep_freq: int = 5
    print_freq: int = 20
    seed: int = 777
    output_dir: str = "./output"
    async_save: bool = True   # background checkpoint writes (single-process)


class Trainer:
    def __init__(self, enc_cfg, dec_cfg, params, loader, cfg: TrainLoopConfig,
                 ts: TrainSettings, n_devices: int = 1,
                 impl: Optional[str] = None, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'dp' axis. When given,
        params/opt_state are replicated over it and each batch is
        dp-sharded (multi-process: assembled from per-host local shards,
        parallel/distributed.py) -- the DDP replacement, SURVEY §5.8.
        Checkpoint/log writes are gated to process 0 either way."""
        from must3r_tpu.parallel import is_main_process

        self.enc_cfg, self.dec_cfg = enc_cfg, dec_cfg
        self.loader = loader
        self.cfg = cfg
        self.ts = ts
        self.impl = impl
        self.params = params
        self.mesh = mesh
        self.is_main = is_main_process()

        steps_per_epoch = max(len(loader) // cfg.accum_iter, 1)
        lr = cfg.lr or effective_lr(cfg.blr, cfg.batch_size, n_devices,
                                    cfg.accum_iter)
        sched = cosine_schedule(lr, int(cfg.warmup_epochs * steps_per_epoch),
                                cfg.epochs * steps_per_epoch, cfg.min_lr)
        self.lr_fn = sched
        opt = make_optimizer(sched, cfg.weight_decay,
                             layer_decay=cfg.layer_decay)
        if cfg.accum_iter > 1:
            opt = optax.MultiSteps(opt, every_k_schedule=cfg.accum_iter)
        self.optimizer = opt
        from must3r_tpu.engine.train import (cast_frozen_params,
                                             trainable_subset)
        self.opt_state = opt.init(trainable_subset(params, ts))
        # frozen towers live in the compute dtype on device (saves the
        # per-step fp32->bf16 param convert); checkpoints stay fp32 --
        # save() upcasts, try_resume() restores fp32 and re-casts
        self.params = cast_frozen_params(self.params, ts)
        if mesh is not None:
            from must3r_tpu.parallel import replicate
            self.params = replicate(mesh, self.params)
            self.opt_state = replicate(mesh, self.opt_state)
        self.start_epoch = 0
        self._steps = {}
        self._opt_updates = 0
        os.makedirs(cfg.output_dir, exist_ok=True)
        # rank-0-only writers (reference io.py save_on_master / rank-gated
        # loggers, train.py:322-343); non-main processes keep in-memory
        # metrics but write nothing
        self.logger = MetricLogger(
            log_path=os.path.join(cfg.output_dir, "log.txt")
            if self.is_main else None)
        self.tb = TensorBoardWriter(os.path.join(cfg.output_dir, "tb")
                                    if self.is_main else None)
        # seeded identically on every process: schedule draws (and thus
        # compiled shapes) stay in lockstep across hosts
        self.rng = np.random.default_rng(cfg.seed)
        self.key = jax.random.PRNGKey(cfg.seed)

    # -- schedule-shaped jitted steps ----------------------------------------

    def _get_step(self, sched: Schedule):
        key = (sched.mem_batches, sched.skip_batches, len(sched.render_ids))
        if key not in self._steps:
            ts = dataclasses.replace(self.ts,
                                     mem_batches=sched.mem_batches,
                                     train_decoder_skip=sched.skip_batches,
                                     n_render=len(sched.render_ids))
            self._steps[key] = make_train_step(
                self.enc_cfg, self.dec_cfg, ts, self.optimizer,
                impl=self.impl, donate=True)
        return self._steps[key]

    # -- checkpointing ---------------------------------------------------------

    def save(self, epoch: int, tag: str):
        import jax
        import numpy as np

        from must3r_tpu.engine.train import upcast_params_fp32
        from must3r_tpu.parallel import process_count

        params, opt = upcast_params_fp32(self.params), self.opt_state
        if process_count() > 1:
            # every process holds a full replica: fetch to host numpy
            # locally, then let EVERY rank enter the orbax save -- orbax
            # runs internal cross-host barriers even for host-local trees,
            # so a rank-0-only call leaves the other ranks' next
            # collective mismatched (gloo 'received data size doesn't
            # match'). With numpy trees orbax writes from the primary
            # host only; meta.json is rank-gated inside save_checkpoint.
            # Always synchronous: a background writer's barriers would
            # interleave with the training step's collectives.
            params = jax.tree.map(np.asarray, params)
            opt = jax.tree.map(np.asarray, opt)
        elif not self.is_main:   # rank-0-only write (reference io.py)
            return
        path = os.path.join(self.cfg.output_dir, f"checkpoint-{tag}")
        opt = opt if tag != "final" else None
        if process_count() > 1 or not self.cfg.async_save:
            save_checkpoint(path, params, self.enc_cfg, self.dec_cfg,
                            opt_state=opt, step=epoch + 1)
            return
        # Async write: snapshot to host numpy NOW (the step donates its
        # input buffers, so device params are invalid one step later),
        # then serialize on a background thread while training continues.
        params = jax.tree.map(np.asarray, params)
        if opt is not None:
            opt = jax.tree.map(np.asarray, opt)
        self.wait_for_save()

        def _write():
            try:
                save_checkpoint(path, params, self.enc_cfg, self.dec_cfg,
                                opt_state=opt, step=epoch + 1)
            except BaseException as e:   # surfaced at the next join
                self._save_exc = e

        import threading
        self._save_exc = None
        self._save_thread = threading.Thread(target=_write, daemon=True)
        self._save_thread.start()

    def wait_for_save(self):
        """Join any in-flight async checkpoint write; re-raise its error."""
        t = getattr(self, "_save_thread", None)
        if t is not None:
            t.join()
            self._save_thread = None
        exc = getattr(self, "_save_exc", None)
        if exc is not None:
            self._save_exc = None
            raise exc

    def try_resume(self) -> bool:
        last = os.path.join(self.cfg.output_dir, "checkpoint-last")
        if not os.path.isfile(os.path.join(last, "meta.json")):
            return False
        # refuse to resume a checkpoint of a different model (e.g. a stale
        # output_dir from another run)
        import json as _json

        from must3r_tpu.config import config_to_json

        with open(os.path.join(last, "meta.json")) as f:
            meta_probe = _json.load(f)
        if (meta_probe.get("encoder_config") != config_to_json(self.enc_cfg)
                or meta_probe.get("decoder_config")
                != config_to_json(self.dec_cfg)):
            print(f"WARNING: {last} holds a different model config; "
                  "not resuming")
            return False
        import jax
        import numpy as np

        from must3r_tpu.engine.train import (cast_frozen_params,
                                             upcast_params_fp32)

        # numpy template: every process restores host-locally (no orbax
        # cross-host coordination), then re-replicates over the mesh.
        # Checkpoint files always store fp32 params (save() upcasts), so
        # the template must be fp32 even when the live frozen tower is
        # held in bf16; re-cast after the load.
        template = jax.tree.map(np.asarray,
                                {"params": upcast_params_fp32(self.params),
                                 "opt_state": self.opt_state})
        try:
            params, _, _, opt_state, meta = load_checkpoint(last, template)
        except Exception as e:
            print(f"WARNING: cannot resume from {last} ({e}); "
                  "starting fresh")
            return False
        params = cast_frozen_params(params, self.ts)
        if self.mesh is not None:
            from must3r_tpu.parallel import replicate
            params = replicate(self.mesh, params)
            if opt_state is not None:
                opt_state = replicate(self.mesh, opt_state)
        self.params = params
        if opt_state is not None:
            self.opt_state = opt_state
        self.start_epoch = int(meta["step"])
        print(f"resumed from {last} at epoch {self.start_epoch}")
        return True

    # -- epochs -------------------------------------------------------------------

    def train_one_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        self.loader.set_epoch(epoch)
        t0 = time.time()
        for it, batch in enumerate(self.loader):
            progress = (epoch + it / max(len(self.loader), 1)) / cfg.epochs
            nimgs = batch["img"].shape[1]
            sched = select_schedule(
                self.rng, nimgs, cfg.memory_num_views,
                cfg.min_memory_num_views, progress, cfg.causal,
                cfg.memory_batch_views, cfg.render_once,
                batch.get("memory_num_views", nimgs),
                max_render_count=cfg.max_render_count,
                disable_render=cfg.disable_render,
                random_blocks=cfg.random_blocks)

            needed = ("img", "pos", "pts3d", "camera_pose", "valid_mask",
                      "sky_mask", "portrait", "is_metric_scale")
            cut = {k: (v[:, :sched.n_views]
                       if hasattr(v, "ndim") and v.ndim >= 2
                       and v.shape[1] == nimgs else v)
                   for k, v in batch.items() if k in needed}
            cut["render_ids"] = np.asarray(sched.render_ids, np.int32)
            if self.mesh is not None:
                from must3r_tpu.parallel import global_batch
                cut = global_batch(self.mesh, cut)
            else:
                cut = {k: jnp.asarray(v) if not isinstance(v, jnp.ndarray)
                       else v for k, v in cut.items()}

            self.key, sub = jax.random.split(self.key)
            step = self._get_step(sched)
            self.params, self.opt_state, loss, details = step(
                self.params, self.opt_state, cut, sub)

            loss_val = float(loss)
            if not math.isfinite(loss_val):
                print(f"Loss is {loss_val}, stopping training")
                sys.exit(1)
            self._opt_updates += 1
            lr_now = float(self.lr_fn(self._opt_updates // cfg.accum_iter))
            self.logger.update(loss=loss_val, lr=lr_now,
                               **{k: float(v) for k, v in details.items()})
            if (it + 1) % cfg.print_freq == 0 and self.is_main:
                # epoch_1000x axis calibrates across batch sizes
                # (reference train.py:498-505)
                step1000 = int((epoch + it / max(len(self.loader), 1))
                               * 1000)
                self.tb.scalars(step1000, train_loss=loss_val,
                                train_lr=lr_now)
                rate = (it + 1) / (time.time() - t0)
                print(f"epoch {epoch} [{it + 1}/{len(self.loader)}] "
                      f"{self.logger.line()}  it/s={rate:.2f}")
        stats = self.logger.smoothed()
        self.logger.write_epoch(epoch)
        return stats

    def train(self):
        cfg = self.cfg
        self.try_resume()
        try:
            for epoch in range(self.start_epoch, cfg.epochs):
                stats = self.train_one_epoch(epoch)
                self.save(epoch, "last")
                if cfg.keep_freq and (epoch + 1) % cfg.keep_freq == 0:
                    self.save(epoch, str(epoch + 1))
                print(f"epoch {epoch} done: {stats}")
            self.save(cfg.epochs - 1, "final")
        finally:
            # join the background writer even on SystemExit (NaN guard) or
            # KeyboardInterrupt: orbax save(force=True) deletes the OLD
            # checkpoint-last before writing, so killing a daemon writer
            # mid-flight would leave NO resumable checkpoint at all
            self.wait_for_save()
        return self.logger.smoothed()

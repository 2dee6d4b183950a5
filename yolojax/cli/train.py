"""``train`` command (SURVEY.md §3.1; BASELINE config 3).

The reference's hot loop is: DataLoader workers → .cuda() copy → DataParallel
forward → Python loss → backward → optimizer.step, with a transform-object
swap every N batches for multi-scale.  Here the loop body is two jitted
programs — the fused augmentation graph and the train step (forward + loss +
grads + update) — specialized per bucketed size {320..608}, prewarmed at
startup so recompilation never lands on the hot path; the mesh makes the same
loop data-parallel across every visible chip.

Preserved reference semantics: multi-scale redraw every ``[train]
multi_scale_interval`` batches; seconds-cadence checkpointing + save on
KeyboardInterrupt; resume via ``-r``; per-component loss scalars, LR,
histograms and box-image summaries at ``[summary]`` cadences; ``seen``-driven
loss warmup.

Self-healing: the loop watches its own RSS and, past ``[train]
rss_restart_fraction`` of host memory, checkpoints and exec-restarts itself
with ``-r`` (long runs through the axon TPU tunnel leak one host batch per
step inside the native client — measured 21.5 MB/step, unreachable from
Python, DEVNOTES.md; a 6 k-step run was OOM-killed at 130 GB without this).
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as _config
from ..data.cache import load_cache
from ..data.dataset import Dataset
from ..data.loader import Loader, overlap_device_puts
from ..data.transform import TrainAugment
from ..ops.loss import LossConfig
from ..parallel.mesh import (batch_sharding, loss_weights_from_config,
                             make_mesh_for_batch, make_train_step,
                             shard_host_batch)
from ..utils import checkpoint as ckpt
from ..utils.metrics import Meter, Summary
from ..utils.train import build_optimizer
from ..utils.visualize import draw_boxes
from . import make_parser, setup
from .common import build, load_weights_auto

_LOG = logging.getLogger(__name__)


def _rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024 / 1024
    except OSError:
        pass
    return 0.0


def _mem_total_gb() -> float:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal"):
                    return int(line.split()[1]) / 1024 / 1024
    except OSError:
        pass
    return 0.0


def multi_scale_sizes(config) -> list[int]:
    lo = config.getint("train", "multi_scale_min", fallback=320)
    hi = config.getint("train", "multi_scale_max", fallback=608)
    return list(range(lo, hi + 1, 32))


class Train:
    def __init__(self, args, config):
        self.args = args
        self.config = config
        self.category, self.anchors, self.model = build(config)

        records = load_cache(config, "train")
        decoded = None
        if config.getboolean("data", "decoded_cache", fallback=False):
            import os

            decoded = os.path.join(_config.get_cache_dir(config), "decoded", "train")
        dataset = Dataset(records,
                          canvas=_config.get_canvas(config),
                          max_boxes=config.getint("data", "max_boxes", fallback=60),
                          decoded_dir=decoded)
        self.batch_size = args.batch or config.getint("data", "batch_size", fallback=16)
        self.loader = Loader(dataset, self.batch_size,
                             workers=config.getint("data", "workers", fallback=3),
                             seed=config.getint("train", "seed", fallback=0),
                             shard=(jax.process_index(), jax.process_count()))
        self.steps_per_epoch = len(dataset) // self.batch_size

        self.params, self.state, meta = load_weights_auto(
            config, self.model, args.finetune, resume=args.resume,
            rng_seed=config.getint("train", "seed", fallback=0),
            reinit_head=True)  # finetune from mismatched-class darknet weights
        self.optimizer = build_optimizer(config)
        if args.freeze:
            from ..utils.train import with_frozen

            frozen = [n for pat in args.freeze.split(",") for n in self.params
                      if n == pat or n.startswith(pat.rstrip("*"))]
            self.optimizer = with_frozen(self.optimizer, self.params, frozen)
            _LOG.info("frozen layers: %s", sorted(set(frozen)))
        self.opt_state = self.optimizer.init(self.params)
        self.step = int(meta.get("step", 0))
        self.seen = int(meta.get("seen", 0))
        if args.resume and meta.get("step") is not None:
            path = ckpt.latest(_config.get_model_dir(config))
            if ckpt.contains(path, "opt"):
                try:
                    trees, _ = ckpt.load(path, {"opt": self.opt_state})
                    self.opt_state = trees["opt"]
                except (KeyError, ValueError) as e:
                    # e.g. --freeze differs from the saving run (multi_transform
                    # reshapes the opt pytree) — train on with a fresh opt state
                    _LOG.warning("checkpoint opt state incompatible (%s); "
                                 "reinitializing optimizer", e)
            else:
                # darknet-converted 0.npz carries only params/state
                _LOG.info("checkpoint has no optimizer state; starting fresh")

        self.mesh = make_mesh_for_batch(self.batch_size)
        # device-resident dataset (data/device_cache.py): upload every canvas
        # once, gather batches on-device — the hot loop ships indices, not
        # pixels.  Opt-in: only sound when the decoded set fits in HBM.
        self.device_data = None
        if config.getboolean("data", "device_dataset", fallback=False):
            from ..data.device_cache import DeviceDataset

            self.device_data = DeviceDataset(
                dataset, self.mesh, self.batch_size,
                seed=config.getint("train", "seed", fallback=0))
            _LOG.info("device-resident dataset: %d items, %.0f MB uploaded once",
                      len(dataset), self.device_data.nbytes / 1e6)
        loss_cfg = LossConfig(
            ignore_threshold=config.getfloat("loss", "threshold", fallback=0.6),
            rescore=config.getboolean("loss", "rescore", fallback=True),
            warmup_seen=config.getint("train", "warmup_seen", fallback=12800),
            class_grad=config.get("loss", "class_grad", fallback="darknet"))
        self.augment = TrainAugment.from_config(config)
        # augmentation is fused INTO the sharded step: one executable per
        # bucketed size, preprocessing data-parallel across the mesh
        self.train_step = make_train_step(
            self.model, self.optimizer, loss_weights_from_config(config),
            loss_cfg, mesh=self.mesh, augment=self.augment)
        self.sizes = multi_scale_sizes(config)
        self.interval = config.getint("train", "multi_scale_interval", fallback=10)
        self.rng = np.random.default_rng(config.getint("train", "seed", fallback=0))
        self.key = jax.random.PRNGKey(config.getint("train", "seed", fallback=0) + 1)

        # RSS watchdog: checkpoint + exec-restart past this many GB (see
        # module docstring).  0 disables; default 70% of host memory.
        frac = config.getfloat("train", "rss_restart_fraction", fallback=0.7)
        self.rss_limit_gb = frac * _mem_total_gb() if frac > 0 else 0.0
        self.restart_argv = None  # set by main() for real CLI invocations

        model_dir = _config.get_model_dir(config)
        self.saver = ckpt.Saver(model_dir,
                                interval=config.getfloat("save", "interval", fallback=600),
                                keep=config.getint("save", "keep", fallback=5))
        self.summary = Summary(model_dir, config)
        self.meter = Meter()
        self.profile_dir = None
        from ..config import parse_attr
        self.schedule = parse_attr(config.get(
            "train", "scheduler", fallback="yolojax.utils.train.step_schedule"))(config)

    # -- compilation warmup: trace every bucketed size before the hot loop --
    def prewarm(self):
        if not self.config.getboolean("train", "prewarm", fallback=True):
            return
        canvas = _config.get_canvas(self.config)
        g = self.config.getint("data", "max_boxes", fallback=60)
        b = self.batch_size
        dummy = {
            "canvas": np.full((b, canvas, canvas, 3), 127, np.uint8),
            "hw": np.full((b, 2), canvas, np.float32),
            "yx_min": np.zeros((b, g, 2), np.float32),
            "yx_max": np.zeros((b, g, 2), np.float32),
            "cls": np.zeros((b, g), np.int32),
            "valid": np.zeros((b, g), bool),
        }
        t0 = time.time()
        for size in self.sizes:
            # AOT-compile the fused augment+step without executing
            self.train_step.lower(self.params, self.state, self.opt_state,
                                  dummy, jnp.int32(0), jax.random.PRNGKey(0),
                                  size).compile()
            _LOG.info("prewarmed size %d (%.1fs)", size, time.time() - t0)

    def device_batches(self):
        """Device-resident batch stream for the hot loop.

        DeviceDataset: batches are assembled on-device already (the loop
        ships indices).  Loader path: host batches are double-buffered onto
        the mesh by a background put thread (``overlap_device_puts``) so
        batch k+1's host→device transfer overlaps step k's compute — the
        last SURVEY §7 line ("overlap with compute via prefetch;
        double-buffer", VERDICT r4 #4).  The batch is NOT donated by the
        step, so a prefetched buffer is never aliased by an in-flight
        update.
        """
        if self.device_data is not None:
            return iter(self.device_data)
        keys = ("canvas", "hw", "yx_min", "yx_max", "cls", "valid")
        if jax.process_count() == 1:
            sharding = batch_sharding(self.mesh)
            put = lambda b: jax.device_put({k: b[k] for k in keys}, sharding)
        else:
            # multi-process: global-array assembly, still off-thread
            put = lambda b: shard_host_batch(self.mesh,
                                             {k: b[k] for k in keys})
        return overlap_device_puts(iter(self.loader), put)

    def save(self, tag: str = ""):
        path = self.saver(time.time(), self.step,
                          {"params": self.params, "state": self.state,
                           "opt": self.opt_state},
                          {"step": self.step, "seen": self.seen})
        _LOG.info("saved %s %s", path, tag)

    def _maybe_restart(self):
        """Checkpoint + exec-restart when RSS crosses the watchdog limit."""
        if not self.rss_limit_gb or self.step % 50:
            return
        rss = _rss_gb()
        if rss < self.rss_limit_gb:
            return
        if self.restart_argv is None:  # in-process caller: can't exec safely
            if not getattr(self, "_rss_warned", False):
                self._rss_warned = True
                _LOG.warning("RSS %.1f GB exceeds the %.1f GB watchdog limit "
                             "but train was invoked in-process; cannot "
                             "exec-restart (run the CLI for self-healing)",
                             rss, self.rss_limit_gb)
            return
        import os
        import sys

        self.save("rss-restart")
        self.summary.close()
        argv = list(self.restart_argv)
        if "-r" not in argv and "--resume" not in argv:
            argv.append("-r")
        _LOG.warning("RSS %.1f GB > %.1f GB limit: exec-restarting to resume "
                     "from step %d", rss, self.rss_limit_gb, self.step)
        logging.shutdown()
        os.execv(sys.executable, [sys.executable] + argv)

    def __call__(self, max_steps: int | None = None):
        epochs = self.args.epochs or self.config.getint("train", "epochs", fallback=160)
        total = max_steps or epochs * self.steps_per_epoch
        size = self.sizes[-1] if len(self.sizes) == 1 else 416
        self.prewarm()
        _LOG.info("training %d steps (%d/epoch), %d devices, sizes %s",
                  total, self.steps_per_epoch, len(self.mesh.devices.ravel()), self.sizes)
        source = self.device_batches()
        try:
            for dev_batch in source:
                if self.step >= total:
                    break
                if self.step % self.interval == 0:
                    size = int(self.rng.choice(self.sizes))
                key = jax.random.fold_in(self.key, self.step)
                self.params, self.state, self.opt_state, metrics = self.train_step(
                    self.params, self.state, self.opt_state, dev_batch,
                    jnp.int32(min(self.seen, 2**31 - 1)), key, size)
                self.step += 1
                self.seen += self.batch_size * jax.process_count()

                if self.profile_dir is not None:  # trace a steady-state window
                    if self.step == 10:
                        jax.profiler.start_trace(self.profile_dir)
                    elif self.step == 20:
                        jax.block_until_ready(self.params)
                        jax.profiler.stop_trace()
                        _LOG.info("profiler trace written to %s", self.profile_dir)
                        self.profile_dir = None

                if self.summary.due("scalar", self.step):
                    vals = {k: float(v) for k, v in metrics.items() if k != "grads"}
                    jax.block_until_ready(self.params)
                    self.meter.mark(self.batch_size * self.summary.cadence["scalar"])
                    vals["lr"] = float(self.schedule(self.step))
                    vals["images_per_sec"] = self.meter.rate
                    vals["size"] = size
                    self.summary.scalar(self.step, **vals)
                    _LOG.info("step %d size %d total %.4f (%.1f img/s)",
                              self.step, size, vals["total"], self.meter.rate)
                if self.summary.due("histogram", self.step):
                    self.summary.histogram(self.step, self.params, "params/")
                    self.summary.histogram(self.step, metrics["grads"], "grads/")
                if self.summary.due("image", self.step):
                    # rerun the (cheap) standalone augment for visualization
                    # (dev_batch leaves are device arrays — fine as jit
                    # inputs, and np.asarray pulls just the sliced row)
                    images, bmin, bmax, bvalid = self.augment(
                        key, dev_batch["canvas"][:1], dev_batch["hw"][:1],
                        dev_batch["yx_min"][:1], dev_batch["yx_max"][:1],
                        dev_batch["valid"][:1], size)
                    v = np.asarray(bvalid[0])
                    drawn = draw_boxes(np.asarray(images[0], np.float32),
                                       np.asarray(bmin[0])[v],
                                       np.asarray(bmax[0])[v],
                                       np.asarray(dev_batch["cls"][0])[v],
                                       category=self.category)
                    self.summary.image(self.step, "train/augmented", drawn / 255.0)
                if self.saver.due(time.time()):
                    self.save()
                self._maybe_restart()
        except KeyboardInterrupt:
            _LOG.info("interrupted at step %d", self.step)
        finally:
            self.save("final")
            self.summary.close()
        return self.step


def main(argv=None):
    parser = make_parser("train the configured model on the cached dataset")
    parser.add_argument("-r", "--resume", action="store_true",
                        help="resume from the latest checkpoint in the model dir")
    parser.add_argument("-f", "--finetune", default=None,
                        help="initial weights: checkpoint .npz or darknet .weights")
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--freeze", default=None, metavar="LAYERS",
                        help="comma-separated layer names (c1,c2,... or "
                             "prefix*) to freeze during finetuning")
    parser.add_argument("--steps", type=int, default=None, help="hard step cap")
    parser.add_argument("--debug-nans", action="store_true",
                        help="jax_debug_nans dev flag (SURVEY.md §5 sanitizer analog)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of steps 10-20 into DIR")
    args = parser.parse_args(argv)
    config = setup(args)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    train = Train(args, config)
    if argv is None:
        import sys

        train.restart_argv = list(sys.argv)  # enables the RSS watchdog exec
    if args.profile:
        train.profile_dir = args.profile
    train(max_steps=args.steps)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""BaseTrainer / BaseValidator — the task-agnostic training engine.

TPU-native rebuild of the reference's ``BaseTrainer``/``BaseValidator``
(``yolov12/ultralytics/engine/trainer.py:58``, ``engine/validator.py:69``):
experiment dirs with config snapshot, epoch loop over a jitted sharded train
step, per-epoch validation with a fitness scalar, best/last checkpoints,
early stopping, resume, CSV metrics, callbacks. Subclasses supply the model,
data, loss, and validation logic.

Differences by design (SURVEY.md §5.8): no DDP subprocess relaunch — one
controller, a `Mesh`, and XLA collectives; no GradScaler — bf16 is native;
early-stop decisions are computed identically on every host from replicated
metrics instead of being broadcast.
"""

from __future__ import annotations

import json
import time
from datetime import datetime
from pathlib import Path
from typing import Any

import jax
import numpy as np

from kuzu.core.callbacks import (
    LOGGER,
    CallbackRegistry,
    CSVLogger,
    EarlyStopping,
)
from kuzu.core.checkpoint import CheckpointManager
from kuzu.core.config import Config
from kuzu.core.mesh import make_mesh, process_is_primary, shard_batch
from kuzu.core.train import TrainState, build_optimizer, init_state, make_train_step


def resolve_val_batches(cfg: Config, loader: Any, key: str = "val_batches") -> int:
    """Honest validation coverage: full split unless the user caps it.

    The reference validates the entire split (``engine/validator.py:69``); a
    silent default cap can select the wrong "best" checkpoint. ``None``/-1 =
    all batches; an explicit cap below the split size is logged visibly.
    """
    try:
        total = len(loader)
    except TypeError:
        total = None
    cap = cfg.get(key)
    if cap in (None, "", -1, "None"):
        return total if total is not None else 10**9
    cap = int(cap)
    if total is not None and cap < total:
        LOGGER.info(f"validate: capped at {cap}/{total} batches ({key}={cap})")
    return cap


def _host_rss_gb() -> float:
    """Current resident size of this process in GB (0.0 if unreadable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1e6  # kB -> GB
    except OSError:
        pass
    return 0.0


def _host_mem_total_gb() -> float:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


class BaseTrainer:
    # optimizer='auto' resolution for this task family (see train())
    auto_optimizer = "sgd"

    def __init__(self, cfg: Config):
        self.cfg = cfg
        # persistent XLA compile cache for EVERY trainer entry point (the
        # CLI enabled it, but `python -m kuzu.tools.production` and other
        # direct entries did not — each fresh process then re-autotuned
        # the train graph, which is also the prime suspect for round-3's
        # 228<->330 ms cross-process fusion-plan swing, PERFORMANCE.md)
        from kuzu.core.cache import enable_compilation_cache

        enable_compilation_cache()
        if str(cfg.get("optimizer", "auto")).lower() == "auto":
            # task-aware auto rule (the reference's optimizer='auto' also
            # resolves per-regime, ``engine/trainer.py`` build_optimizer):
            # SGD suits the BN conv nets; from-scratch transformers need
            # Adam — under SGD lr0=0.01 the production TrOCR stalled at
            # val CER ~0.9 while every adamw run converges. Resolved here
            # so args.yaml records the actual optimizer.
            cfg.optimizer = self.auto_optimizer
            if self.auto_optimizer == "adamw" and float(cfg.get("lr0", 0.01)) == 0.01:
                cfg.lr0 = 3e-4  # 0.01 is the SGD default, far too hot for Adam
        self.callbacks = CallbackRegistry()
        mesh_cfg = cfg.get("mesh", {})
        import jax as _jax

        from kuzu.core.mesh import auto_data_axis

        data_ax = int(mesh_cfg.get("data", -1))
        model_ax = int(mesh_cfg.get("model", 1))
        n_dev = len(_jax.devices()) // max(model_ax, 1)
        batch = int(cfg.get("batch", 16))
        fit = auto_data_axis(batch, n_dev)
        if data_ax == -1:
            data_ax = fit
        elif batch % data_ax != 0:
            LOGGER.warning(
                f"batch {batch} not divisible by mesh.data={data_ax}; using {fit}"
            )
            data_ax = fit
        self.mesh = make_mesh(data_ax, model_ax)
        self.save_dir = self._setup_dir()
        self.ckpt = CheckpointManager(self.save_dir / "weights")
        self.csv = CSVLogger(self.save_dir / "results.csv")
        self.stopper = EarlyStopping(int(cfg.get("patience", 100)))
        self.epoch = 0
        self.state: TrainState | None = None

    # ------------------------------------------------------------- plumbing
    def _setup_dir(self) -> Path:
        name = self.cfg.get("name") or datetime.now().strftime("%Y%m%d_%H%M%S")
        d = Path(self.cfg.get("project", "runs")) / str(self.cfg.get("task", "task")) / name
        if d.exists() and not self.cfg.get("exist_ok", False):
            stem = d
            i = 2
            while d.exists():
                d = stem.parent / f"{stem.name}{i}"
                i += 1
        d.mkdir(parents=True, exist_ok=True)
        self.cfg.to_yaml(d / "args.yaml")  # config snapshot (reference parity)
        return d

    # ------------------------------------------------------- subclass hooks
    def build_model(self) -> Any:
        """Return initial params pytree (and stash model refs on self)."""
        raise NotImplementedError

    def build_datasets(self) -> tuple[Any, Any]:
        """Return (train_loader, val_loader-or-None)."""
        raise NotImplementedError

    def loss_fn(self, params: Any, batch: Any, rng: jax.Array):
        """(loss, metrics-dict) for one global batch."""
        raise NotImplementedError

    def validate(self, state: TrainState) -> dict[str, float]:
        """Return metrics incl. ``fitness`` (higher better). Default: none."""
        return {}

    def preprocess_batch(self, batch: dict) -> dict:
        return batch

    def _val_view(self, state: TrainState) -> TrainState:
        """Plain-param view of the train state for validators: with LoRA
        active, fuses adapters into the base so subclass ``validate`` sees
        the same tree shape as full fine-tuning."""
        alpha = getattr(self, "_lora_alpha", 0.0)
        if not alpha:
            return state
        from kuzu.core import lora as lora_lib

        fuse = getattr(self, "_lora_fuse", None)
        if fuse is None:
            # one jitted fuse per trainer — re-wrapping every epoch would
            # retrace (fresh function identity each call)
            fuse = self._lora_fuse = jax.jit(
                lambda t: lora_lib.merge_lora(t["base"], t["lora"], alpha)
            )
        return state.replace(
            params=fuse(state.params),
            ema_params=None
            if state.ema_params is None
            else fuse(state.ema_params),
        )

    def _device_prefetch(self, loader: Any, depth: int = 2):
        """1-deep (default) device double-buffering: batch N+1 is device_put
        (async) while the jitted step for batch N runs, so host->device
        transfer overlaps compute instead of serializing with it — the
        reference gets this from CUDA-stream prefetch in its torch loader."""
        import collections

        buf: collections.deque = collections.deque()
        for batch in loader:
            batch = self.preprocess_batch(batch)
            buf.append(shard_batch(batch, self.mesh))
            if len(buf) >= depth:
                yield buf.popleft()
        while buf:
            yield buf.popleft()

    # ------------------------------------------------------------ the loop
    def train(self) -> dict:
        cfg = self.cfg
        if cfg.get("debug_nans"):
            import jax as _jax

            _jax.config.update("jax_debug_nans", True)
        if cfg.get("deterministic", True):
            import os as _os

            _os.environ.setdefault("TF_CUDNN_DETERMINISTIC", "1")
        t0 = time.perf_counter()
        train_loader, self.val_loader = self.build_datasets()
        steps_per_epoch = max(len(train_loader), 1)
        params = self.build_model()

        tx = build_optimizer(cfg, steps_per_epoch)
        # PEFT: lora_rank>0 freezes the base model and trains low-rank
        # adapters (reference VLM recipe scripts/qwen3_vl_cft_sft.py, here
        # as a generic parameter transform — see kuzu/core/lora.py)
        lora_rank = int(cfg.get("lora_rank", 0) or 0)
        self._lora_alpha = 0.0
        if lora_rank:
            import optax

            from kuzu.core import lora as lora_lib

            self._lora_alpha = lora_lib.resolve_alpha(cfg, lora_rank)
            adapters = lora_lib.init_lora(
                jax.random.key(int(cfg.get("seed", 0)) + 7),
                params,
                lora_rank,
                targets=cfg.get("lora_targets"),
            )
            params = lora_lib.combine(params, adapters)
            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()},
                lora_lib.label_tree(params),
            )
            n_tr, n_tot = lora_lib.trainable_count(params)
            LOGGER.info(
                f"lora: rank {lora_rank} alpha {self._lora_alpha:g} — "
                f"{n_tr / 1e6:.3f}M trainable / {n_tot / 1e6:.2f}M total "
                f"({len(adapters)} kernels)"
            )
        use_ema = bool(cfg.get("ema", True))
        model_state = (
            self._init_model_state() if hasattr(self, "_init_model_state") else None
        )
        self.state = init_state(
            params, tx, use_ema=use_ema, model_state=model_state
        )
        accumulate = max(int(cfg.get("accumulate", 1)), 1)
        # tensor parallelism: with mesh.model > 1 and a tp_rules preset the
        # state shards by path rules and XLA inserts the TP collectives
        state_sharding = None
        if dict(self.mesh.shape).get("model", 1) > 1 and cfg.get("tp_rules"):
            from kuzu.core.mesh import state_shardings, tp_preset

            rule_fn = tp_preset(str(cfg.get("tp_rules")))
            state_sharding = state_shardings(
                jax.eval_shape(lambda: self.state), self.mesh, rule_fn
            )
            self.state = jax.device_put(self.state, state_sharding)
            LOGGER.info(f"tensor parallel: preset '{cfg.get('tp_rules')}' over "
                        f"model axis {dict(self.mesh.shape)['model']}")
        loss_fn = self.loss_fn
        if lora_rank:
            from kuzu.core import lora as lora_lib

            inner_loss, alpha = self.loss_fn, self._lora_alpha

            def _merged(p):
                # stop_gradient on the base prunes its whole backward cone
                return lora_lib.merge_lora(
                    jax.lax.stop_gradient(p["base"]), p["lora"], alpha
                )

            if model_state is not None:

                def loss_fn(p, ms, batch, rng):
                    return inner_loss(_merged(p), ms, batch, rng)

            else:

                def loss_fn(p, batch, rng):
                    return inner_loss(_merged(p), batch, rng)

        self._step = make_train_step(
            loss_fn,
            tx,
            mesh=self.mesh,
            ema_decay=float(cfg.get("ema_decay", 0.9999)),
            ema_tau=float(cfg.get("ema_tau", 2000)),
            accumulate=accumulate,
            has_model_state=model_state is not None,
            state_sharding=state_sharding,
        )

        start_epoch = 0
        if cfg.get("resume") and self.ckpt.exists("last"):
            self.state = self.ckpt.restore("last", like=self.state)
            start_epoch = int(self.ckpt.metadata("last").get("epoch", -1)) + 1
            LOGGER.info(f"resumed from epoch {start_epoch}")

        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(self.state.params)
        )
        LOGGER.info(
            f"kuzu {cfg.get('task')} train: {n_params/1e6:.2f}M params, "
            f"{steps_per_epoch} steps/epoch, mesh {dict(self.mesh.shape)}, "
            f"save_dir {self.save_dir}"
        )
        from kuzu.core.loggers import attach_loggers

        attach_loggers(self)
        self.callbacks.run("on_train_start", self)

        epochs = int(cfg.get("epochs", 1))
        time_limit_h = cfg.get("time")
        final_metrics: dict = {}
        rng = jax.random.key(int(cfg.get("seed", 0)))
        for epoch in range(start_epoch, epochs):
            self.epoch = epoch
            train_loader.set_epoch(epoch)
            self.callbacks.run("on_epoch_start", self)
            agg: dict[str, float] = {}
            n_steps = 0
            te = time.perf_counter()
            for batch in self._device_prefetch(train_loader):
                rng, step_rng = jax.random.split(rng)
                self.state, metrics = self._step(self.state, batch, step_rng)
                n_steps += 1
                for k, v in metrics.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
                self.callbacks.run("on_step_end", self, metrics)
            train_metrics = {k: v / max(n_steps, 1) for k, v in agg.items()}

            self.callbacks.run("on_val_start", self)
            val_metrics = (
                self.validate(self._val_view(self.state))
                if cfg.get("val", True)
                else {}
            )
            self.callbacks.run("on_val_end", self, val_metrics)
            fitness = float(
                val_metrics.get("fitness", -train_metrics.get("loss", 0.0))
            )

            rss_gb = _host_rss_gb()
            row = {
                "epoch": epoch,
                **{f"train/{k}": v for k, v in train_metrics.items()},
                **{f"val/{k}": v for k, v in val_metrics.items()},
                "fitness": fitness,
                "time_s": time.perf_counter() - te,
                "rss_gb": rss_gb,
            }
            if process_is_primary():
                self.csv.log(row)
                if cfg.get("verbose", True):
                    msg = f"epoch {epoch}/{epochs - 1}: " + " ".join(
                        f"{k}={v:.4g}" for k, v in row.items() if k != "epoch"
                    )
                    LOGGER.info(msg)
                if cfg.get("save", True):
                    self.ckpt.save(
                        self.state, fitness=fitness, metadata={"epoch": epoch}
                    )
                    self.callbacks.run("on_checkpoint_save", self)
            final_metrics = {**train_metrics, **val_metrics, "fitness": fitness}

            if self.stopper(epoch, fitness):
                LOGGER.info(
                    f"early stop at epoch {epoch} "
                    f"(best {self.stopper.best_fitness:.4g} @ {self.stopper.best_epoch})"
                )
                break
            # Host-RSS watchdog: the tunneled-TPU client retains a host copy
            # of EVERY host->device transfer for the life of the process
            # (measured ~1:1 with bytes shipped), so any long run eventually
            # OOM-kills the host. Stop cleanly after the checkpoint instead —
            # relaunching with resume=1 continues from here in a fresh
            # process (self-chunking long trainings).
            rss_limit = float(cfg.get("max_rss_frac", 0.85)) * _host_mem_total_gb()
            if rss_limit and rss_gb > rss_limit:
                LOGGER.warning(
                    f"host RSS watchdog: {rss_gb:.1f} GB > {rss_limit:.1f} GB "
                    f"— stopping after epoch {epoch} (checkpoint saved); "
                    f"relaunch with resume=1 to continue"
                )
                final_metrics["stopped_rss"] = float(epoch)
                break
            if time_limit_h and (time.perf_counter() - t0) > float(time_limit_h) * 3600:
                LOGGER.info("time limit reached")
                break

        self.callbacks.run("on_train_end", self)
        final_metrics["train_time_s"] = time.perf_counter() - t0
        if process_is_primary():
            (self.save_dir / "final.json").write_text(
                json.dumps({k: float(v) for k, v in final_metrics.items()})
            )
        return final_metrics

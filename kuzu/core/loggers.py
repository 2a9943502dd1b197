"""Optional experiment-tracking integrations: W&B and TensorBoard.

Capability parity with the reference's callback integrations
(``yolov12/ultralytics/utils/callbacks/{wb,tensorboard}.py`` and the
project's ``WandbLogger`` usage in ``scripts/train_trocr.py:157-162``):
gated imports — each logger silently no-ops when its package is absent —
attached to the trainer's callback events.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any


class WandbLogger:
    def __init__(self, project: str = "kuzu", name: str | None = None, config: dict | None = None):
        try:
            import wandb

            self._wb = wandb
            self._run = wandb.init(project=project, name=name, config=config or {})
        except Exception:
            self._wb = None
            self._run = None

    @property
    def active(self) -> bool:
        return self._run is not None

    def log(self, metrics: dict[str, Any], step: int | None = None) -> None:
        if self._run is not None:
            self._run.log(metrics, step=step)

    def log_images(self, key: str, paths: list[str | Path]) -> None:
        if self._run is not None:
            self._run.log({key: [self._wb.Image(str(p)) for p in paths]})

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()


class TensorBoardLogger:
    """Minimal event writer; prefers tensorboardX/tf if present, else falls
    back to a newline-JSON scalars file TensorBoard can't read but tools can."""

    def __init__(self, log_dir: str | Path):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._writer = None
        for mod, attr in (("torch.utils.tensorboard", "SummaryWriter"),
                          ("tensorboardX", "SummaryWriter")):
            try:
                import importlib

                self._writer = getattr(importlib.import_module(mod), attr)(
                    str(self.log_dir)
                )
                break
            except Exception:
                continue
        self._fallback = (
            open(self.log_dir / "scalars.jsonl", "a") if self._writer is None else None
        )

    def log(self, metrics: dict[str, Any], step: int) -> None:
        if self._writer is not None:
            for k, v in metrics.items():
                try:
                    self._writer.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass
        elif self._fallback is not None:
            import json

            self._fallback.write(
                json.dumps({"step": step, **{k: float(v) for k, v in metrics.items()
                                             if isinstance(v, (int, float))}})
                + "\n"
            )
            self._fallback.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
        if self._fallback is not None:
            self._fallback.close()


def attach_loggers(trainer) -> None:
    """Wire configured loggers onto a BaseTrainer's callback events."""
    cfg = trainer.cfg
    loggers = []
    if cfg.get("wandb"):
        wb = WandbLogger(
            project=str(cfg.get("project", "kuzu")),
            name=cfg.get("name"),
            config=cfg.to_dict(),
        )
        if wb.active:
            loggers.append(("wandb", wb))
    if cfg.get("tensorboard"):
        loggers.append(("tb", TensorBoardLogger(trainer.save_dir / "tb")))

    if not loggers:
        return

    def on_epoch_end_metrics(trainer_, metrics):
        for kind, lg in loggers:
            if kind == "wandb":
                lg.log(metrics)
            else:
                lg.log(metrics, step=trainer_.epoch)

    def on_train_end(trainer_):
        for kind, lg in loggers:
            (lg.finish if kind == "wandb" else lg.close)()

    trainer.callbacks.add("on_val_end", on_epoch_end_metrics)
    trainer.callbacks.add("on_train_end", on_train_end)

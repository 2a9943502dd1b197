"""Persisted user settings (JSON).

Capability parity with the reference's ``SETTINGS`` store
(``yolov12/ultralytics/utils/__init__.py`` — persisted JSON of
datasets_dir/weights_dir/runs_dir + feature toggles): a versioned JSON at
``~/.config/kuzu/settings.json`` (or $KUZU_CONFIG_DIR) with defaults merge
and a reset.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

VERSION = "0.1"

DEFAULTS: dict[str, Any] = {
    "version": VERSION,
    "datasets_dir": "datasets",
    "weights_dir": "weights",
    "runs_dir": "runs",
    "sync_wandb": False,
    "tensorboard": False,
}


def settings_path() -> Path:
    base = os.environ.get("KUZU_CONFIG_DIR") or os.path.join(
        os.path.expanduser("~"), ".config", "kuzu"
    )
    return Path(base) / "settings.json"


class Settings(dict):
    def __init__(self) -> None:
        super().__init__(DEFAULTS)
        self.path = settings_path()
        if self.path.exists():
            try:
                stored = json.loads(self.path.read_text())
                if stored.get("version") == VERSION:
                    self.update(stored)
            except json.JSONDecodeError:
                pass
        else:
            self.save()

    def save(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(dict(self), indent=2))

    def update_and_save(self, **kw: Any) -> None:
        unknown = set(kw) - set(DEFAULTS)
        if unknown:
            raise KeyError(f"unknown settings keys: {sorted(unknown)}")
        self.update(kw)
        self.save()

    def reset(self) -> None:
        self.clear()
        self.update(DEFAULTS)
        self.save()

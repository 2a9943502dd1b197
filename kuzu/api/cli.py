"""kuzu CLI — ``python -m kuzu.api.cli <mode> <task> k=v ...``

Parity with the reference's ``yolo`` entrypoint
(``yolov12/ultralytics/cfg/__init__.py:817``): positional mode/task tokens
plus ``k=v`` overrides with typed coercion and fuzzy-key errors.
"""

from __future__ import annotations

import sys

from kuzu.api.model import Model
from kuzu.core.config import load_config

MODES = ("train", "val", "predict", "track", "tune", "export", "benchmark")
TASKS = ("detect", "segment", "pose", "obb", "recognize", "classify", "lm", "ctc")

HELP = f"""kuzu CLI
usage: python -m kuzu.api.cli <mode> [<task>] key=value ...
modes: {MODES}
tasks: {TASKS}
examples:
  python -m kuzu.api.cli train classify data=glyphs/ epochs=10 imgsz=128
  python -m kuzu.api.cli train detect model=yolov12n data=dataset.yaml
  python -m kuzu.api.cli predict detect model=runs/detect/x/weights source=page.jpg
  python -m kuzu.api.cli track detect model=runs/detect/x source=frames/ tracker=botsort
  python -m kuzu.api.cli tune detect data=dataset.yaml iterations=10 epochs=3
"""


def main(argv: list[str] | None = None) -> int:
    from kuzu.core.cache import enable_compilation_cache
    from kuzu.core.mesh import force_cpu_if_requested

    enable_compilation_cache()
    force_cpu_if_requested()
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(HELP)
        return 0
    mode = argv.pop(0)
    if mode not in MODES:
        print(f"unknown mode '{mode}'\n{HELP}")
        return 2
    task = None
    if argv and "=" not in argv[0]:
        task = argv.pop(0)
        if task not in TASKS:
            # registry-registered extras (nas/sam/fastsam/...) are valid too
            from kuzu.api.model import task_map

            if task not in task_map():
                print(f"unknown task '{task}'\n{HELP}")
                return 2
    cfg = load_config(overrides=argv)
    task = task or cfg.get("task", "detect")
    model = Model(str(cfg.get("model") or task), task=task)
    overrides = {
        k: v for k, v in cfg.items() if k not in ("mode", "task")
    }
    if mode == "train":
        result = model.train(**overrides)
    elif mode == "val":
        result = model.val(**overrides)
    elif mode == "predict":
        source = overrides.pop("source", None)
        result = model.predict(source, **overrides)
    elif mode == "track":
        source = overrides.pop("source", None)
        result = model.track(source, **overrides)
    elif mode == "tune":
        result = model.tune(**overrides)
    elif mode == "export":
        result = model.export(**overrides)
    else:
        result = model.benchmark(**overrides)
    if isinstance(result, dict):
        print(
            " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in result.items()
            )
        )
    elif isinstance(result, list):
        for i, r in enumerate(result):
            if isinstance(r, str):  # recognize/lm: predicted text
                print(f"[{i}] {r}")
            elif isinstance(r, dict):  # classify: {name, conf, ...}
                print(
                    f"[{i}] "
                    + " ".join(
                        f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                        for k, v in r.items()
                    )
                )
            else:
                boxes = getattr(r, "boxes", None)
                n = len(boxes) if boxes is not None else 0
                ids = getattr(boxes, "id", None) if boxes is not None else None
                tag = (
                    f" ids={ids.tolist()}"
                    if ids is not None and len(ids)
                    else ""
                )
                print(f"[{i}] {getattr(r, 'path', '')}: {n} boxes{tag}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

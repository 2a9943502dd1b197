"""Measure the REFERENCE pipeline's CPU latency per stage (BASELINE.md:
"must be measured by running the reference"; north star is >=20x the
CPU-reference end-to-end pages/s). Weights are random-initialized — latency
does not depend on weight values — and every stage runs the reference's own
code/shape conventions:

- char detection: the vendored ultralytics fork's YOLO("yolov12x.yaml")
  `.predict(..., max_det=2000)` at 640 (`yolo_inference_app.py:103`), once
  per column CROP (`inference.py:94-118` loops columns sequentially).
- column detection: same fork, yolov12s at 1280 (the kuzu production
  config's mapping of `line_extraction`; favors the reference — their
  ColumnDetectionModel is heavier).
- recognition: ViT-base encoder at (1024, 64) + char-level causal-LM
  decoder with KV cache, greedy to the val columns' mean length
  (`src/models/trocr_model.py` shapes; decoder sized as roberta-small-char,
  4L/256h — charitably small), once per column.

Per-page cost follows the reference's sequential structure:
    col_det + n_cols * (char_det + trocr)
with n_cols = 42 (the production val pages average 334/8 columns) and
17 chars/column (their mean text length). Run on an otherwise idle host;
prints one JSON line per stage plus the derived pages/s.
"""
import json
import os
import sys
import time
from pathlib import Path

_STUBS = Path("/tmp/fake_pkgs")  # torchvision.ops.nms + thop stand-ins:
# neither is installed here and neither is on the measured path's critical
# cost (nms on a handful of boxes; thop only profiles FLOPs)


def _write_stubs():
    tv = _STUBS / "torchvision"
    tv.mkdir(parents=True, exist_ok=True)
    (_STUBS / "torchvision-0.19.0.dist-info").mkdir(exist_ok=True)
    (_STUBS / "torchvision-0.19.0.dist-info" / "METADATA").write_text(
        "Metadata-Version: 2.1\nName: torchvision\nVersion: 0.19.0\n"
    )
    (tv / "__init__.py").write_text(
        '__version__ = "0.19.0"\nfrom . import ops  # noqa: F401\n'
    )
    (tv / "ops.py").write_text(
        "import torch\n\n\n"
        "def nms(boxes, scores, iou_threshold):\n"
        "    order = scores.argsort(descending=True)\n"
        "    keep = []\n"
        "    while order.numel():\n"
        "        i = order[0]\n"
        "        keep.append(i.item())\n"
        "        if order.numel() == 1:\n"
        "            break\n"
        "        b, a = boxes[order[1:]], boxes[i]\n"
        "        x1 = torch.maximum(a[0], b[:, 0])\n"
        "        y1 = torch.maximum(a[1], b[:, 1])\n"
        "        x2 = torch.minimum(a[2], b[:, 2])\n"
        "        y2 = torch.minimum(a[3], b[:, 3])\n"
        "        inter = (x2 - x1).clamp(0) * (y2 - y1).clamp(0)\n"
        "        aa = (a[2] - a[0]) * (a[3] - a[1])\n"
        "        ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])\n"
        "        iou = inter / (aa + ab - inter + 1e-9)\n"
        "        order = order[1:][iou <= iou_threshold]\n"
        "    return torch.tensor(keep, dtype=torch.long)\n"
    )
    # transformers sees the stub as "vision available" and imports
    # torchvision.transforms.InterpolationMode at roberta import time.
    tr = tv / "transforms"
    tr.mkdir(exist_ok=True)
    (tr / "__init__.py").write_text(
        "import enum\n\n\n"
        "class InterpolationMode(str, enum.Enum):\n"
        '    NEAREST = "nearest"\n'
        '    NEAREST_EXACT = "nearest-exact"\n'
        '    BILINEAR = "bilinear"\n'
        '    BICUBIC = "bicubic"\n'
        '    BOX = "box"\n'
        '    HAMMING = "hamming"\n'
        '    LANCZOS = "lanczos"\n'
        "\n\nfrom . import functional  # noqa: E402,F401\n"
    )
    (tr / "functional.py").write_text("def resize(*a, **k):\n    raise NotImplementedError\n")
    (tv / "io.py").write_text("# transformers video_utils imports torchvision.io at module load\n")
    th = _STUBS / "thop"
    th.mkdir(exist_ok=True)
    (th / "__init__.py").write_text(
        '__version__ = "0.1.1"\n\n\n'
        "def profile(model, inputs=None, verbose=False):\n"
        "    return 0.0, 0.0\n"
    )


_write_stubs()
os.environ.setdefault("YOLO_CONFIG_DIR", "/tmp/ultra_cfg")
sys.path.insert(0, str(_STUBS))
sys.path.insert(0, "/root/reference/yolov12")

import numpy as np
import torch

N_COLS = 42  # production val pages: 334 GT columns / 8 pages
COL_LEN = 17  # mean chars per column on the same pages
REPS = 3


def timeit(fn, reps=REPS):
    fn()  # warmup (build caches, first-call allocs)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def yolo_stage(yaml_name: str, imgsz: int):
    from ultralytics import YOLO

    m = YOLO(yaml_name)
    img = np.random.default_rng(0).integers(
        0, 255, (imgsz, imgsz, 3), np.uint8
    )
    return timeit(
        lambda: m.predict(
            img, imgsz=imgsz, conf=0.25, verbose=False, max_det=2000,
            device="cpu",
        )
    )


def trocr_stage():
    from transformers import RobertaConfig, RobertaForCausalLM, ViTConfig, ViTModel

    enc_cfg = ViTConfig(
        image_size=(1024, 64), patch_size=16, hidden_size=768,
        num_hidden_layers=12, num_attention_heads=12, intermediate_size=3072,
    )
    enc = ViTModel(enc_cfg).eval()
    dec_cfg = RobertaConfig(
        vocab_size=4787, hidden_size=256, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=1024, is_decoder=True,
        add_cross_attention=True, max_position_embeddings=130,
    )
    dec = RobertaForCausalLM(dec_cfg).eval()
    proj = torch.nn.Linear(768, 256).eval()
    px = torch.rand(1, 3, 1024, 64)

    @torch.no_grad()
    def run():
        hid = proj(enc(px).last_hidden_state)
        ids = torch.zeros(1, 1, dtype=torch.long)
        past = None
        for _ in range(COL_LEN):
            out = dec(
                input_ids=ids, encoder_hidden_states=hid,
                past_key_values=past, use_cache=True,
            )
            ids = out.logits[:, -1:].argmax(-1)
            past = out.past_key_values

    return timeit(run)


def main():
    torch.set_num_threads(os.cpu_count() or 1)
    out = {"host_cpus": os.cpu_count(), "torch": torch.__version__}
    out["char_det_640_s"] = yolo_stage("yolov12x.yaml", 640)
    print(json.dumps({"char_det_640_s": out["char_det_640_s"]}))
    out["col_det_1280_s"] = yolo_stage("yolov12s.yaml", 1280)
    print(json.dumps({"col_det_1280_s": out["col_det_1280_s"]}))
    out["trocr_col_s"] = trocr_stage()
    print(json.dumps({"trocr_col_s": out["trocr_col_s"]}))
    page_s = out["col_det_1280_s"] + N_COLS * (
        out["char_det_640_s"] + out["trocr_col_s"]
    )
    out["page_s"] = page_s
    out["pages_per_s"] = 1.0 / page_s
    print(json.dumps(out))


if __name__ == "__main__":
    main()

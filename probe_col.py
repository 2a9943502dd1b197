import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
import numpy as np, jax.numpy as jnp
from kuzu.core.config import load_config
from kuzu.tasks.detect import DetectPredictor

p = DetectPredictor(load_config(overrides={"model": "runs/production/runs/detect/col", "conf": 0.01, "max_det": 32}))
r = p(["runs/production/col/images/val/p0.jpg"])[0]
print("n preds:", len(r.boxes.xyxy))
print("top boxes:", np.round(r.boxes.xyxy[:5], 1))
print("scores:", np.round(r.boxes.conf[:5], 3))
import numpy as np
lab = np.loadtxt("runs/production/col/labels/val/p0.txt", ndmin=2)
print("gt cols:", len(lab), "first gt (cx cy w h, px):", np.round(lab[0, 1:] * 1280, 1))

"""Space-to-depth rewrites of strided convolutions (TPU layout work).

A k3/s2 conv computes y[i,j] = sum_{di,dj in {-1,0,1}} w[di,dj] @
x[2i+di, 2j+dj]. Packing 2x2 pixel blocks into channels
(X[p,q,(u,v,c)] = x[2p+u, 2q+v, c]) turns it into a DENSE k2/s1 conv
over X — identical math up to float re-association, with two TPU wins:

- forward: the im2col contraction deepens (K: 9*cin strided -> 16*cin
  dense at a quarter of the positions — same FLOPs, fuller MXU tiles for
  small cin), and
- backward: the grad-input pass of a stride-2 conv is an INPUT-DILATED
  conv (XLA pads a zero between every pixel — poor MXU tiling); after the
  rewrite grad-input is a plain dense k2 conv plus a free depth-to-space
  reshape.

The tap mapping (shared by the inference stem rewrite
``models/yolo/infer.py::stem_conv_s2d`` and the training-path
``modules.Conv`` option): W2[P,Q,(u,v,c),o] = w[2P+u-1, 2Q+v-1, c, o]
where the index is in range, else zero (P,Q,u,v in {0,1}), consumed with
padding [(1,0),(1,0)].

Reference context: the well-known TPU ResNet space-to-depth stem trick,
applied here to every downsample conv of the v12 graph (the reference's
CUDA path has no analogue — cuDNN handles strided backward natively).
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel order (u, v, c)."""
    b, h, w, c = x.shape
    return (
        x.reshape(b, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, w // 2, 4 * c)
    )


def s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a (3, 3, cin, cout) kernel to the (2, 2, 4*cin, cout)
    dense-conv kernel matching ``space_to_depth``'s channel order.

    Pure gather on the weight tensor — traced, differentiable (gradients
    flow back to the original layout), negligible next to the conv.
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), w.shape
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # tap -2 -> zero row
    P, Q, u, v = jnp.meshgrid(
        jnp.arange(2), jnp.arange(2), jnp.arange(2), jnp.arange(2),
        indexing="ij",
    )
    di = 2 * P + u - 2  # in {-2,-1,0,1}; -2 lands on the zero pad
    dj = 2 * Q + v - 2
    return wp[di + 2, dj + 2].reshape(2, 2, 4 * cin, cout)

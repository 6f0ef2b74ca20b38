"""SwapAlign2Nat (TensorMask, Chen et al. 2019) as one XLA gather.

TPU equivalent of the reference's CUDA op (/root/reference/preprocess/
humanparsing/mhp_extension/detectron2/projects/TensorMask/tensormask/layers/
csrc/SwapAlign2Nat/): given sliding-window mask logits in the ALIGNED
representation — channels enumerate a V x U window per spatial cell — swap
the unit lengths of window and spatial axes by the integer ratio `lambda_val`
and resample into the NATURAL representation:

  in  (N, H, W, V*U)   with V == U == sqrt(C)
  out (N, ceil(H/l), ceil(W/l), (l*V)*(l*U))

Each output element quadrilinearly interpolates 16 input points over
(y, x, v, u); points outside the tensor contribute `pad_val` (default -6,
sigmoid(-6) ~ 0 = "no mask"). The whole op is weights + gathers, so XLA
fuses it and autodiff provides the backward (the reference hand-writes an
atomic-add CUDA backward).

Layout note: the reference is NCHW with C = V*U; this implementation is
channels-last (N, H, W, V*U) — the TPU-native layout used across this
package — with identical per-element semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("lambda_val", "pad_val"))
def swap_align2nat(
    x: jnp.ndarray,  # (N, H, W, V*U)
    lambda_val: int = 1,
    pad_val: float = -6.0,
) -> jnp.ndarray:
    assert lambda_val >= 1
    n, h, w, c = x.shape
    v_in = int(np.sqrt(c))
    u_in = c // v_in
    assert v_in == u_in and v_in * u_in == c, "channels must be a square"
    lam = float(lambda_val)
    v_out, u_out = lambda_val * v_in, lambda_val * u_in
    h_out = int(np.ceil(h / lam))
    w_out = int(np.ceil(w / lam))
    h_vout, h_uout = v_out / 2.0, u_out / 2.0

    x5 = x.reshape(n, h, w, v_in, u_in)

    # continuous source coordinates (matching the CUDA index math)
    vv = jnp.arange(v_out, dtype=jnp.float32)
    uu = jnp.arange(u_out, dtype=jnp.float32)
    yy = jnp.arange(h_out, dtype=jnp.float32)
    xx = jnp.arange(w_out, dtype=jnp.float32)

    oy = yy[None, :] * lam + vv[:, None] - h_vout + 0.5  # (Vout, Hout)
    ox = xx[None, :] * lam + uu[:, None] - h_uout + 0.5  # (Uout, Wout)
    ov = (vv + 0.5) / lam - 0.5  # (Vout,)
    ou = (uu + 0.5) / lam - 0.5  # (Uout,)

    def fc(o):
        f = jnp.floor(o)
        return f.astype(jnp.int32), (f + 1).astype(jnp.int32), o - f

    yf, yc, yw = fc(oy)
    xf, xc, xw = fc(ox)
    vf, vc, vw = fc(ov)
    uf, uc, uw = fc(ou)

    def term(yi, ywt, xi, xwt, vi, vwt, ui, uwt):
        # broadcast index grids to (Vout, Uout, Hout, Wout)
        y_ = yi[:, None, :, None]
        x_ = xi[None, :, None, :]
        v_ = vi[:, None, None, None]
        u_ = ui[None, :, None, None]
        valid = (
            (y_ >= 0) & (y_ < h) & (x_ >= 0) & (x_ < w)
            & (v_ >= 0) & (v_ < v_in) & (u_ >= 0) & (u_ < u_in)
        )
        g = x5[
            :,
            jnp.clip(y_, 0, h - 1),
            jnp.clip(x_, 0, w - 1),
            jnp.clip(v_, 0, v_in - 1),
            jnp.clip(u_, 0, u_in - 1),
        ]  # (N, Vout, Uout, Hout, Wout)
        g = jnp.where(valid[None], g, jnp.asarray(pad_val, g.dtype))
        wgt = (
            ywt[:, None, :, None] * xwt[None, :, None, :]
            * vwt[:, None, None, None] * uwt[None, :, None, None]
        )
        return g * wgt[None].astype(g.dtype)

    out = 0.0
    for yi, ywt in ((yf, 1.0 - yw), (yc, yw)):
        for xi, xwt in ((xf, 1.0 - xw), (xc, xw)):
            for vi, vwt in ((vf, 1.0 - vw), (vc, vw)):
                for ui, uwt in ((uf, 1.0 - uw), (uc, uw)):
                    out = out + term(yi, ywt, xi, xwt, vi, vwt, ui, uwt)

    # (N, Vout, Uout, Hout, Wout) -> (N, Hout, Wout, Vout*Uout)
    return jnp.transpose(out, (0, 3, 4, 1, 2)).reshape(
        n, h_out, w_out, v_out * u_out
    )

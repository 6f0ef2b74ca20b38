"""SwapAlign2Nat vs an independent numpy transcription of the reference CUDA
semantics (SwapAlign2Nat_cuda.cu: quadrilinear sample with pad outside)."""

import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.ops.swap_align2nat import swap_align2nat


def _numpy_oracle(x_nchw, lambda_val, pad_val):
    n, c, h, w = x_nchw.shape
    v_in = int(np.sqrt(c))
    u_in = c // v_in
    lam = float(lambda_val)
    v_out, u_out = lambda_val * v_in, lambda_val * u_in
    h_out, w_out = int(np.ceil(h / lam)), int(np.ceil(w / lam))
    h_vout, h_uout = v_out / 2.0, u_out / 2.0
    x5 = x_nchw.reshape(n, v_in, u_in, h, w)

    def get(ni, yi, xi, vi, ui):
        if (yi < 0 or yi >= h or xi < 0 or xi >= w
                or vi < 0 or vi >= v_in or ui < 0 or ui >= u_in):
            return pad_val
        return x5[ni, vi, ui, yi, xi]

    out = np.zeros((n, v_out, u_out, h_out, w_out), np.float64)
    for ni in range(n):
        for v in range(v_out):
            for u in range(u_out):
                for y in range(h_out):
                    for x in range(w_out):
                        ox = x * lam + u - h_uout + 0.5
                        oy = y * lam + v - h_vout + 0.5
                        ou = (u + 0.5) / lam - 0.5
                        ov = (v + 0.5) / lam - 0.5
                        xf, yf = int(np.floor(ox)), int(np.floor(oy))
                        uf, vf = int(np.floor(ou)), int(np.floor(ov))
                        xwc, ywc = ox - xf, oy - yf
                        uwc, vwc = ou - uf, ov - vf
                        acc = 0.0
                        for yi, yw in ((yf, 1 - ywc), (yf + 1, ywc)):
                            for xi, xw in ((xf, 1 - xwc), (xf + 1, xwc)):
                                for vi, vw in ((vf, 1 - vwc), (vf + 1, vwc)):
                                    for ui, uw in ((uf, 1 - uwc),
                                                   (uf + 1, uwc)):
                                        acc += (yw * xw * vw * uw
                                                * get(ni, yi, xi, vi, ui))
                        out[ni, v, u, y, x] = acc
    return out.reshape(n, v_out * u_out, h_out, w_out)


def test_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    for lam, v, h, w in ((2, 3, 6, 8), (1, 2, 4, 4), (3, 2, 7, 5)):
        c = v * v
        x_nchw = rng.standard_normal((2, c, h, w)).astype(np.float32)
        want = _numpy_oracle(x_nchw, lam, -6.0)
        x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
        got = np.asarray(swap_align2nat(jnp.asarray(x_nhwc), lam))
        got_nchw = np.transpose(got, (0, 3, 1, 2))
        np.testing.assert_allclose(got_nchw, want, atol=1e-5)
        assert got.shape == (
            2, int(np.ceil(h / lam)), int(np.ceil(w / lam)), (lam * v) ** 2
        )


def test_gradients_flow():
    import jax

    x = jnp.ones((1, 4, 4, 4))
    g = jax.grad(lambda a: swap_align2nat(a, 2).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

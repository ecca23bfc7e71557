"""ms_deformable_attention vs a direct numpy transcription of the
original CUDA op's semantics (grid_sample align_corners=False, zero
padding)."""

import jax.numpy as jnp
import numpy as np

from comat_tpu.ops.deformable_attention import ms_deformable_attention


def _numpy_reference(value, shapes, locs, weights):
    B, S, Hn, Dh = value.shape
    _, Nq, _, L, P, _ = locs.shape
    out = np.zeros((B, Nq, Hn, Dh))
    offs = np.cumsum([0] + [h * w for h, w in shapes])
    for b in range(B):
        for q in range(Nq):
            for hd in range(Hn):
                acc = np.zeros(Dh)
                for l, (h, w) in enumerate(shapes):
                    grid = value[b, offs[l] : offs[l + 1], hd].reshape(h, w, Dh)
                    for p in range(P):
                        x = locs[b, q, hd, l, p, 0] * w - 0.5
                        y = locs[b, q, hd, l, p, 1] * h - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        dx, dy = x - x0, y - y0
                        v = np.zeros(Dh)
                        for (xi, yi, wt) in [
                            (x0, y0, (1 - dx) * (1 - dy)),
                            (x0 + 1, y0, dx * (1 - dy)),
                            (x0, y0 + 1, (1 - dx) * dy),
                            (x0 + 1, y0 + 1, dx * dy),
                        ]:
                            if 0 <= xi < w and 0 <= yi < h:
                                v += wt * grid[yi, xi]
                        acc += weights[b, q, hd, l, p] * v
                out[b, q, hd] = acc
    return out.reshape(B, Nq, Hn * Dh)


def test_matches_numpy_reference():
    rng = np.random.RandomState(0)
    shapes = [(8, 8), (4, 4)]
    S = sum(h * w for h, w in shapes)
    B, Nq, Hn, Dh, P = 2, 5, 2, 4, 3
    value = rng.randn(B, S, Hn, Dh).astype(np.float32)
    locs = rng.rand(B, Nq, Hn, len(shapes), P, 2).astype(np.float32)
    # include out-of-bounds samples (zero padding path)
    locs[0, 0] = 1.2
    w = rng.rand(B, Nq, Hn, len(shapes), P).astype(np.float32)
    w /= w.sum(axis=(-2, -1), keepdims=True)

    got = ms_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
    )
    want = _numpy_reference(value, shapes, locs, w)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

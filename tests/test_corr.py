"""Correlation ops vs a per-pixel NumPy oracle.

Mirrors the reference's oracle pattern: the CPU kernel
(/root/reference/src/correlation_kernels_cpu.cc:8-84) is re-derived here as a
tiny NumPy loop and the XLA implementations must match to <1e-4 (the
reference's own CPU-vs-CUDA tolerance, tests/test_droid_backends.py:8).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from droid_slam_tpu.ops import corr as corr_ops

rng = np.random.default_rng(5432)
TOL = 1e-4


def numpy_corr_index(volume, coords, radius):
    """Direct transcription of the window-sampling semantics: tap (i, j) is a
    zero-padded bilinear sample at (x0 − r + i, y0 − r + j)."""
    n, h1, w1, h2, w2 = volume.shape
    rd = 2 * radius + 1
    out = np.zeros((n, h1, w1, rd * rd), np.float32)
    for b in range(n):
        for y in range(h1):
            for x in range(w1):
                x0, y0 = coords[b, y, x]
                for i in range(rd):
                    for j in range(rd):
                        xs = x0 - radius + i
                        ys = y0 - radius + j
                        xf, yf = int(np.floor(xs)), int(np.floor(ys))
                        dx, dy = xs - xf, ys - yf
                        acc = 0.0
                        for (yy, xx, wgt) in [
                            (yf, xf, (1 - dx) * (1 - dy)),
                            (yf, xf + 1, dx * (1 - dy)),
                            (yf + 1, xf, (1 - dx) * dy),
                            (yf + 1, xf + 1, dx * dy),
                        ]:
                            if 0 <= yy < h2 and 0 <= xx < w2:
                                acc += wgt * volume[b, y, x, yy, xx]
                        out[b, y, x, i * rd + j] = acc
    return out


def make_fmaps(n=2, h=6, w=8, c=16):
    f1 = rng.standard_normal((n, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((n, h, w, c)).astype(np.float32)
    return f1, f2


def test_corr_volume_matches_dot():
    f1, f2 = make_fmaps()
    vol = np.asarray(corr_ops.corr_volume(jnp.asarray(f1), jnp.asarray(f2)))
    want = np.einsum("nyxc,nvuc->nyxvu", f1 / 4.0, f2 / 4.0)
    assert np.abs(vol - want).max() < TOL


def test_corr_index_matches_numpy_oracle():
    f1, f2 = make_fmaps()
    vol = np.asarray(corr_ops.corr_volume(jnp.asarray(f1), jnp.asarray(f2)))
    coords = np.stack(
        [
            rng.uniform(-2, 9, (2, 6, 8)).astype(np.float32),  # x (deliberately OOB too)
            rng.uniform(-2, 7, (2, 6, 8)).astype(np.float32),  # y
        ],
        axis=-1,
    )
    got = np.asarray(corr_ops.corr_index(jnp.asarray(vol), jnp.asarray(coords), 3))
    want = numpy_corr_index(vol, coords, 3)
    assert np.abs(got - want).max() < TOL


def test_pyramid_lookup_shapes_and_level0():
    f1, f2 = make_fmaps(n=2, h=8, w=8)
    pyr = corr_ops.CorrPyramid.build(jnp.asarray(f1), jnp.asarray(f2))
    coords = jnp.asarray(
        np.stack(np.meshgrid(np.arange(8.0), np.arange(8.0), indexing="xy"), -1)[None]
        .repeat(2, 0)
        .astype(np.float32)
    )
    feat = np.asarray(pyr(coords))
    assert feat.shape == (2, 8, 8, 4 * 49)
    # level 0 block must equal a direct corr_index on the unpooled volume
    lvl0 = np.asarray(corr_ops.corr_index(pyr.levels[0], coords, 3))
    assert np.abs(feat[..., :49] - lvl0).max() < TOL


def test_altcorr_matches_volume_mode():
    """On-the-fly correlation must reproduce the volume path exactly
    (the reference never verifies this cross-mode consistency; it matters
    because both feed the same trained corr encoder)."""
    F, h, w, c = 4, 8, 8, 16
    fmaps = rng.standard_normal((F, h, w, c)).astype(np.float32)
    ii = np.array([0, 1, 2], np.int32)
    jj = np.array([1, 3, 0], np.int32)
    coords = np.stack(
        [
            rng.uniform(0, w - 1, (3, h, w)).astype(np.float32),
            rng.uniform(0, h - 1, (3, h, w)).astype(np.float32),
        ],
        axis=-1,
    )

    alt = corr_ops.AltCorr.build(jnp.asarray(fmaps))
    got = np.asarray(alt(jnp.asarray(coords), jnp.asarray(ii), jnp.asarray(jj)))

    pyr = corr_ops.CorrPyramid.build(
        jnp.asarray(fmaps[ii]), jnp.asarray(fmaps[jj])
    )
    want = np.asarray(pyr(jnp.asarray(coords)))
    assert got.shape == want.shape == (3, h, w, 4 * 49)
    assert np.abs(got - want).max() < TOL


if __name__ == "__main__":
    pytest.main(["-x", __file__, "-q"])

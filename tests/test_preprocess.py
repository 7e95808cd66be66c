"""Preprocessing kernels vs independent numpy references (golden tests,
SURVEY.md §4: kernel golden tests vs a NumPy reference implementation)."""

import jax
import jax.numpy as jnp
import numpy as np

from xslam_tpu.ops import preprocess as pp
from tests.helpers import SMALL_INTR, small_dataset


def _bilateral_np(depth):
    """Direct nested-loop reference of bilateralKernel (Map.cu:155-199)."""
    H, W = depth.shape
    out = np.zeros((H, W), np.float32)
    R = 6
    inv_ss = 0.5 / (pp.SIGMA_SPACE**2)
    inv_sc = 0.5 / (pp.SIGMA_COLOR**2)
    d = depth.astype(np.float64)
    for y in range(H):
        for x in range(W):
            val = d[y, x]
            s1 = s2 = 0.0
            for cy in range(max(y - R, 0), min(y + R + 1, H - 1)):
                for cx in range(max(x - R, 0), min(x + R + 1, W - 1)):
                    tmp = d[cy, cx]
                    w = np.exp(
                        -(((x - cx) ** 2 + (y - cy) ** 2) * inv_ss + (val - tmp) ** 2 * inv_sc)
                    )
                    s1 += tmp * w
                    s2 += w
            r = np.round(s1 / s2)
            if r > 5000 or r < 200:
                r = 0
            out[y, x] = min(max(r, 0), 32767)
    return out


def test_bilateral_matches_reference_loop():
    rng = np.random.default_rng(0)
    depth = (1500 + 300 * rng.random((24, 32))).astype(np.uint16)
    depth[5:9, 5:9] = 3000  # an edge
    depth[0, 0] = 0
    ours = np.asarray(jax.jit(pp.bilateral_filter)(jnp.asarray(depth)))
    ref = _bilateral_np(depth)
    # rounding at the .5 boundary may differ by 1 mm on a few pixels
    assert np.mean(np.abs(ours - ref) <= 1.0) > 0.999
    np.testing.assert_allclose(ours, ref, atol=2.0)


def test_pyrdown_rejects_cross_edge():
    depth = np.full((40, 40), 1000.0, np.float32)
    depth[:, 20:] = 3000.0  # step edge > 3*sigma_color
    out = np.asarray(jax.jit(pp.pyr_down)(jnp.asarray(depth)))
    assert out.shape == (20, 20)
    # away from the edge the average is exact
    np.testing.assert_allclose(out[:, :8], 1000.0)
    np.testing.assert_allclose(out[:, 12:], 3000.0)
    # at the edge, rejection keeps each side pure (no blended values)
    assert np.all((out > 999) & (out < 3001))
    assert not np.any((out > 1100) & (out < 2900))


def test_vmap_roundtrip_projection():
    ds = small_dataset(1)
    depth = jnp.asarray(ds.get_depth(0).astype(np.float32))
    vmap = np.asarray(jax.jit(lambda d: pp.create_vmap(SMALL_INTR, d))(depth))
    valid = ~np.isnan(vmap[0])
    assert valid.mean() > 0.9
    # re-project: u = fx*x/z + cx must give back the pixel grid
    u = SMALL_INTR.fx * vmap[0][valid] / vmap[2][valid] + SMALL_INTR.cx
    v = SMALL_INTR.fy * vmap[1][valid] / vmap[2][valid] + SMALL_INTR.cy
    uu, vv = np.meshgrid(np.arange(160), np.arange(120))
    np.testing.assert_allclose(u, uu[valid], atol=1e-3)
    np.testing.assert_allclose(v, vv[valid], atol=1e-3)


def test_nmap_on_plane():
    """Normals of a rendered wall must be unit length and consistent with the
    analytic plane normal."""
    ds = small_dataset(1)
    depth = jnp.asarray(ds.get_depth(0).astype(np.float32))
    vmap = pp.create_vmap(SMALL_INTR, depth)
    nmap = np.asarray(jax.jit(pp.create_nmap)(vmap))
    valid = ~np.isnan(nmap[0])
    assert valid.mean() > 0.8
    norms = np.sqrt((nmap**2).sum(0))[valid]
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_resize_pyramid():
    ds = small_dataset(1)
    depth = jnp.asarray(ds.get_depth(0).astype(np.float32))
    vmap = pp.create_vmap(SMALL_INTR, depth)
    v1 = np.asarray(jax.jit(pp.resize_vmap)(vmap))
    assert v1.shape == (3, 60, 80)
    # where all 4 children are valid, parent is their mean
    nm1 = np.asarray(jax.jit(pp.resize_nmap)(pp.create_nmap(vmap)))
    valid = ~np.isnan(nm1[0])
    norms = np.sqrt((nm1**2).sum(0))[valid]
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)

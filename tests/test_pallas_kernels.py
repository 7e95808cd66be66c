"""Pallas kernels vs jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from xslam_tpu.ops.pallas_kernels import bilateral_filter_pallas
from xslam_tpu.ops.preprocess import bilateral_filter


def test_bilateral_pallas_matches_reference():
    rng = np.random.default_rng(0)
    depth = (1500 + 400 * rng.random((80, 128))).astype(np.uint16)
    depth[20:30, 40:60] = 3200
    depth[0, :5] = 0
    ref = np.asarray(bilateral_filter(jnp.asarray(depth)))
    out = np.asarray(bilateral_filter_pallas(jnp.asarray(depth), interpret=True))
    np.testing.assert_allclose(out, ref, atol=1.0)
    assert np.mean(out == ref) > 0.999

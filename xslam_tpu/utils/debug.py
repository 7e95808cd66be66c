"""Debug instrumentation.

The reference debugs with printf probes and ``_debug`` kernel variants
(SURVEY.md §4.4); the JAX-native equivalents are ``jax.debug.print`` inside
jitted code, ``jax_debug_nans``, and this state health-checker.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def state_health(state) -> Dict[str, dict]:
    """Per-leaf NaN/Inf/range diagnostics of any engine state pytree."""
    out = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        name = jax.tree_util.keystr(path)
        finite = np.isfinite(arr)
        out[name] = {
            "shape": arr.shape,
            "nan_frac": float(np.isnan(arr).mean()),
            "inf_frac": float((~finite & ~np.isnan(arr)).mean()),
            "min": float(arr[finite].min()) if finite.any() else None,
            "max": float(arr[finite].max()) if finite.any() else None,
        }
    return out


def assert_state_sane(
    state, allow_nan_keys=("vmaps_prev", "nmaps_prev", "t_prev")
):
    """Raise if unexpected NaN/Inf appear (model maps legitimately carry NaN
    miss sentinels)."""
    for name, h in state_health(state).items():
        if any(k in name for k in allow_nan_keys):
            continue
        if h["nan_frac"] > 0 or h["inf_frac"] > 0:
            raise AssertionError(f"non-finite values in {name}: {h}")

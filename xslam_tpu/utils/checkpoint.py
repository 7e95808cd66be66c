"""Checkpoint / resume of the full SLAM state.

The reference only has write-only TSDF dumps (``saveTSDFVolume``,
KinectFusionReconstruction.cpp:438-447 — which also carries a latent
``res[0]*res[2]*res[2]`` size bug for anisotropic volumes) and per-frame pose
text files, with **no load path**. Here: full round-trip of the engine state
(volume value/grad/weight, dual pose, model-map pyramid, frame index, pose
log), so a run can resume mid-sequence.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..csfd.single import CSFD
from ..models.kinfu import SlamState
from ..ops.fusion import VolumeState


def save_state(path: str, state: SlamState, pose_log: List[np.ndarray] | None = None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "value": np.asarray(state.volume.value),
        "grad": np.asarray(state.volume.grad),
        "weight": np.asarray(state.volume.weight),
        "w2c_v": np.asarray(state.world2camera.v),
        "w2c_g": np.asarray(state.world2camera.g),
        "frame_idx": np.asarray(state.frame_idx),
        "last_align_ok": np.asarray(state.last_align_ok),
        "n_levels": np.int32(len(state.vmaps_prev)),
        "t_prev": np.asarray(state.t_prev),
        "pose_log": np.stack(pose_log) if pose_log else np.zeros((0, 4, 4), np.float32),
    }
    for i, (vm, nm) in enumerate(zip(state.vmaps_prev, state.nmaps_prev)):
        payload[f"vm{i}_v"] = np.asarray(vm.v)
        payload[f"vm{i}_g"] = np.asarray(vm.g)
        payload[f"nm{i}_v"] = np.asarray(nm.v)
        payload[f"nm{i}_g"] = np.asarray(nm.g)
    np.savez(path, **payload)


def load_state(path: str) -> Tuple[SlamState, List[np.ndarray]]:
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    levels = int(z["n_levels"])
    vmaps = tuple(
        CSFD(jnp.asarray(z[f"vm{i}_v"]), jnp.asarray(z[f"vm{i}_g"])) for i in range(levels)
    )
    nmaps = tuple(
        CSFD(jnp.asarray(z[f"nm{i}_v"]), jnp.asarray(z[f"nm{i}_g"])) for i in range(levels)
    )
    # brick-major states store (NB, 512) rows; dense states (X, Y, Z)
    if z["value"].ndim == 2:
        from ..ops.bricks import BrickVolume

        vol = BrickVolume(
            value=jnp.asarray(z["value"]),
            grad=jnp.asarray(z["grad"]),
            weight=jnp.asarray(z["weight"]),
        )
    else:
        vol = VolumeState(
            value=jnp.asarray(z["value"]),
            grad=jnp.asarray(z["grad"]),
            weight=jnp.asarray(z["weight"]),
        )
    state = SlamState(
        volume=vol,
        world2camera=CSFD(jnp.asarray(z["w2c_v"]), jnp.asarray(z["w2c_g"])),
        vmaps_prev=vmaps,
        nmaps_prev=nmaps,
        frame_idx=jnp.int32(z["frame_idx"]),
        last_align_ok=jnp.bool_(z["last_align_ok"]),
        # temporal-march anchors; pre-round-4 checkpoints lack them — an
        # all-INF map is the safe cold anchor (forces a refresh march)
        t_prev=jnp.asarray(z["t_prev"]) if "t_prev" in z.files
        else jnp.full(vmaps[0].v.shape[-2:], jnp.inf, jnp.float32),
    )
    pose_log = [p for p in z["pose_log"]]
    return state, pose_log


def save_tsdf_volume(path: str, state: SlamState):
    """Raw float TSDF dump, same payload as the reference's
    ``saveTSDFVolume`` (value plane only) but with the correct size."""
    np.asarray(state.volume.value).astype(np.float32).tofile(path)

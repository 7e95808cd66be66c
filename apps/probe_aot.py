"""Probe: AOT executable serialization on the axon TPU backend.

VERDICT r4 #9: cold compiles through the remote_compile service cost
20-35 min; a deployment image that ships PRE-COMPILED executables would
skip them entirely. Two mechanisms exist on this toolchain (jax 0.9.0):

* the persistent compilation cache (``utils/cache.py`` — already
  load-bearing: warm starts are 2-4 min, BASELINE round 4). It stores
  backend executables keyed by program fingerprint; shipping
  ``<repo>/.jax_cache`` in the image IS an AOT deployment story.
* ``jax.experimental.serialize_executable`` — explicit
  serialize/deserialize_and_load of a ``Compiled`` object (verified
  working on CPU). This probe checks whether the axon TPU backend's
  executables survive the round-trip, and times load vs compile.

Run serialized with all other TPU work:  python -u apps/probe_aot.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{getattr(dev, 'device_kind', '?')}", flush=True)

    # a representative small program (gather + elementwise, static shapes)
    def step(vol, idx):
        rows = jnp.take(vol, idx, axis=0)
        return jnp.sum(rows * 1.5 + 0.5, axis=1)

    vol = jnp.zeros((4096, 512), jnp.float32)
    idx = jnp.arange(256, dtype=jnp.int32) * 7 % 4096

    t0 = time.perf_counter()
    compiled = jax.jit(step).lower(vol, idx).compile()
    t_compile = time.perf_counter() - t0
    out_ref = np.asarray(compiled(vol, idx))
    print(json.dumps({"compile_s": round(t_compile, 2)}), flush=True)

    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize,
        )

        t0 = time.perf_counter()
        blob, in_tree, out_tree = serialize(compiled)
        t_ser = time.perf_counter() - t0
        t0 = time.perf_counter()
        reloaded = deserialize_and_load(blob, in_tree, out_tree)
        t_load = time.perf_counter() - t0
        out_new = np.asarray(reloaded(vol, idx))
        print(json.dumps({
            "aot": "serialize_executable",
            "ok": bool(np.array_equal(out_ref, out_new)),
            "blob_mb": round(len(blob) / 1e6, 3),
            "serialize_s": round(t_ser, 2),
            "load_s": round(t_load, 2),
            "compile_s": round(t_compile, 2),
        }))
    except Exception as e:  # noqa: BLE001 — record the failure class
        print(json.dumps({
            "aot": "serialize_executable",
            "ok": False,
            "error": f"{type(e).__name__}: {e}",
        }))


if __name__ == "__main__":
    main()

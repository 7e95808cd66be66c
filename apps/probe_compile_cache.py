"""Probe: does jax's persistent compilation cache work through the axon
PJRT backend (remote_compile relay)?

Run twice; if the second process's compile time collapses, the cache works
(VERDICT round-1 weak #7 / ROADMAP #6). Usage:
    python -u apps/probe_compile_cache.py [tag]
"""

import sys
import time

import jax

t_init0 = time.time()
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

tag = sys.argv[1] if len(sys.argv) > 1 else "?"


def f(x):
    # enough structure to take measurable compile time
    for i in range(8):
        x = jnp.sin(x) @ x.T + jnp.cos(x * (i + 1))
        x = jax.nn.softmax(x, axis=-1) + x
    return x


_ = jax.devices()
print(f"[{tag}] backend init: {time.time() - t_init0:.2f}s", flush=True)

x = jnp.ones((256, 256), jnp.float32)
t0 = time.perf_counter()
g = jax.jit(f)
y = g(x)
np.asarray(y[0, 0])
t1 = time.perf_counter()
print(f"[{tag}] first-call (compile+run): {t1 - t0:.2f}s", flush=True)
t0 = time.perf_counter()
y = g(x)
np.asarray(y[0, 0])
t1 = time.perf_counter()
print(f"[{tag}] steady-state run: {t1 - t0:.3f}s", flush=True)
print(f"[{tag}] device: {jax.devices()[0]}", flush=True)

"""CSFD numerics demo + microbenchmark.

The L5 parity app for ``Experiments/test_CSFD/main.cpp``:

Part 1 — microbenchmark raw vs accelerated complex rules (here: the h-scaled
complex op pairs from :mod:`xslam_tpu.csfd.rawcomplex` AND the exact dual
rules that are this framework's default), with value agreement printed
side-by-side (main.cpp:90-191).

Part 2 — DCSFD second-order chain-rule check: ``f1(x,y)=(x+y)^2, x=t*t,
y=sin(t)``; gradient and second derivative via hyper-dual lanes vs the
manual chain-rule composition (main.cpp:194-219).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honour CPU-forcing for tests/CI (sitecustomize pins the TPU otherwise)
if os.environ.get("XSLAM_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from xslam_tpu.csfd import double as dc
from xslam_tpu.csfd import rawcomplex as rc
from xslam_tpu.csfd import single as cs


def bench(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])  # force
        ts.append(time.perf_counter() - t0)
    print(f"  {name}: {1000 * min(ts):.3f} ms")
    return out


def main():
    N = 1_000_000
    print(f"1. complex-op microbenchmark over {N} lanes ({jax.devices()[0].platform})")
    h = 1e-6
    a = rc.C(jnp.full((N,), 0.5), jnp.full((N,), h))
    b = rc.C(jnp.full((N,), -1.5), jnp.full((N,), h))
    da = cs.CSFD(jnp.full((N,), 0.5), jnp.full((N,), 1.0))
    db = cs.CSFD(jnp.full((N,), -1.5), jnp.full((N,), 1.0))

    pairs = [
        ("mul", lambda: rc.mul_raw(a, b), lambda: rc.mul_our(a, b), lambda: da * db),
        ("div", lambda: rc.div_raw(a, b), lambda: rc.div_our(a, b), lambda: da / db),
        ("exp", lambda: rc.exp_raw(rc.C(a.re + b.re, a.im + b.im)),
         lambda: rc.exp_our(rc.C(a.re + b.re, a.im + b.im)), lambda: cs.exp(da + db)),
        ("sin", lambda: rc.sin_raw(rc.C(a.re + b.re, a.im + b.im)),
         lambda: rc.sin_our(rc.C(a.re + b.re, a.im + b.im)), lambda: cs.sin(da + db)),
        ("pow3", lambda: rc.pow_raw(rc.C(a.re + b.re, a.im + b.im), 3),
         lambda: rc.pow_our(rc.C(a.re + b.re, a.im + b.im), 3),
         lambda: cs.powi(da + db, 3)),
    ]
    for name, raw, our, dual in pairs:
        print(f" {name}:")
        r = bench("raw complex", jax.jit(raw))
        o = bench("accelerated", jax.jit(our))
        d = bench("exact dual ", jax.jit(dual))
        print(
            f"  value: raw={float(r.re[0]):.6f}  accel={float(o.re[0]):.6f}"
            f"  dual={float(d.v[0]):.6f} | grad: raw={float(r.im[0]) / h:.6f}"
            f"  accel={float(o.im[0]) / h:.6f}  dual={float(d.g[0]):.6f}"
        )

    print("2. DCSFD second-order chain rule: f1(x,y)=(x+y)^2, x=t*t, y=sin(t)")
    t = dc.seed(jnp.float32(0.5))
    x = t * t
    y = dc.sin(t)
    loss = (x + y) * (x + y)
    print("a. by DCSFD:")
    print(f"  gradient = {float(loss.grad()):.6f}")
    print(f"  second order differentiation = {float(loss.hessian()):.6f}")

    # manual chain-rule composition (main.cpp:206-216)
    x_, y_ = float(x.value()), float(y.value())
    dx, dxx = float(x.grad()), float(x.hessian())
    dy, dyy = float(y.grad()), float(y.hessian())
    f1 = lambda xx, yy: (xx + yy) * (xx + yy)
    fx = dc.DCSFD(jnp.float32(x_), jnp.float32(1.0), jnp.float32(1.0), jnp.float32(0.0))
    fy = dc.lift(jnp.float32(y_))
    df_dx = float(f1(fx, fy).grad())
    dff_dxx = float(f1(fx, fy).hessian())
    fx2 = dc.lift(jnp.float32(x_))
    fy2 = dc.DCSFD(jnp.float32(y_), jnp.float32(1.0), jnp.float32(1.0), jnp.float32(0.0))
    df_dy = float(f1(fx2, fy2).grad())
    dff_dyy = float(f1(fx2, fy2).hessian())
    fxc = dc.DCSFD(jnp.float32(x_), jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0))
    fyc = dc.DCSFD(jnp.float32(y_), jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0))
    dff_dxy = float(f1(fxc, fyc).hessian())

    grad = df_dx * dx + df_dy * dy
    hess = df_dx * dxx + df_dy * dyy + dx * dx * dff_dxx + dy * dy * dff_dyy + 2 * dx * dy * dff_dxy
    print("b. by chain rule:")
    print(f"  gradient = {grad:.6f}")
    print(f"  second order differentiation = {hess:.6f}")


if __name__ == "__main__":
    main()

"""Probe: does Mosaic lower an in-kernel dynamic lane gather
(take_along_axis / jnp.take on the minor axis) on this TPU, and how fast
is it vs the one-hot MXU matmul? Informs the permutation-stage design.

Run on the real TPU to natural completion.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _take_kernel(x_ref, p_ref, o_ref):
    d = x_ref.shape[0]
    rows = x_ref.shape[1]
    for r in range(rows):
        idx = jnp.broadcast_to(p_ref[r, :].reshape(1, -1),
                               (d, p_ref.shape[1]))
        o_ref[:, r, :] = jnp.take_along_axis(x_ref[:, r, :], idx, axis=1)


def _onehot_kernel(x_ref, p_ref, o_ref):
    rows, c = p_ref.shape
    for r in range(rows):
        x = x_ref[:, r, :]
        xhi = x.astype(jnp.bfloat16)
        xlo = (x - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
        for j in range(c // 128):
            p = p_ref[r, j * 128:(j + 1) * 128].reshape(1, 128)
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (c, 128), 0)
                      == p).astype(jnp.bfloat16)
            acc = jnp.dot(xhi, onehot, preferred_element_type=jnp.float32)
            acc += jnp.dot(xlo, onehot, preferred_element_type=jnp.float32)
            o_ref[:, r, j * 128:(j + 1) * 128] = acc


@functools.partial(jax.jit, static_argnames=("which",))
def run(x, p, which):
    d, r, c = x.shape
    rows = 8
    kern = _take_kernel if which == "take" else _onehot_kernel
    return pl.pallas_call(
        kern,
        grid=(r // rows,),
        in_specs=[pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, rows, c), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, r, c), jnp.float32),
    )(x, p)


def bench(x, p, which, iters=10):
    s = jnp.zeros((), jnp.float32)

    @jax.jit
    def f(x, s):
        out = run(x + s * 0, p, which)
        return out, jnp.sum(out[:, 0, :8])

    y, s = f(x, s)
    _ = float(s)
    t0 = time.time()
    for _ in range(iters):
        y, s = f(x, s)
    _ = float(s)
    return (time.time() - t0) / iters * 1e3, y


def main():
    d, r, c = 32, 2048, 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((d, r, c)).astype(np.float32))
    p = np.stack([rng.permutation(c) for _ in range(r)]).astype(np.int32)
    pj = jnp.asarray(p)
    ref = np.take_along_axis(np.asarray(x), p[None], axis=2)

    for which in ("take", "onehot"):
        try:
            ms, y = bench(x, pj, which)
            err = float(np.abs(np.asarray(y) - ref).max())
            print(f"{which}: {ms:.3f} ms  max_err={err:.2e} "
                  f"ok={err < 1e-3}")
        except Exception as exc:  # noqa: BLE001 — probe reports and moves on
            print(f"{which}: FAILED — {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:200]}")


if __name__ == "__main__":
    sys.exit(main())

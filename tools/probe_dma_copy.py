"""Probe: can manual DMA pipelining beat the ~130 GB/s Pallas block
pipeline? (docs/PALLAS_COPY_PROBE.json vs the 219 GB/s XLA copy.)

Variants on [32, 2M] bf16 (256 MB r+w):
  hbm2hbm      grid of make_async_copy HBM->HBM, no VMEM bounce, nbuf
               copies in flight
  vmem_nbuf4   manual in-DMA -> out-DMA through VMEM slots, 4 deep
  single_dma   ONE whole-array async copy HBM->HBM (1 program)
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hbm2hbm_kernel(x_hbm, o_hbm, sems, *, cols: int, nbuf: int):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(k):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(k * cols, cols)],
            o_hbm.at[:, pl.ds(k * cols, cols)],
            sems.at[jax.lax.rem(k, nbuf)])

    @pl.when(i == 0)
    def _():
        def start(k, _):
            dma(k).start()
            return 0
        jax.lax.fori_loop(0, jnp.minimum(nbuf, n), start, 0)

    dma(i).wait()

    @pl.when(i + nbuf < n)
    def _():
        dma(i + nbuf).start()


def make_hbm2hbm(d, e, cols, nbuf, dtype):
    return pl.pallas_call(
        functools.partial(_hbm2hbm_kernel, cols=cols, nbuf=nbuf),
        grid=(e // cols,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((d, e), dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nbuf,))],
    )


def _single_kernel(x_hbm, o_hbm, sem):
    cp = pltpu.make_async_copy(x_hbm, o_hbm, sem)
    cp.start()
    cp.wait()


def make_single(d, e, dtype):
    return pl.pallas_call(
        _single_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((d, e), dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )


def _vmem_kernel(x_hbm, o_hbm, buf, isem, osem, *, cols: int, nbuf: int):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def idma(k):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(k * cols, cols)],
            buf.at[jax.lax.rem(k, nbuf)], isem.at[jax.lax.rem(k, nbuf)])

    def odma(k):
        return pltpu.make_async_copy(
            buf.at[jax.lax.rem(k, nbuf)],
            o_hbm.at[:, pl.ds(k * cols, cols)], osem.at[jax.lax.rem(k, nbuf)])

    @pl.when(i == 0)
    def _():
        def start(k, _):
            idma(k).start()
            return 0
        jax.lax.fori_loop(0, jnp.minimum(nbuf, n), start, 0)

    idma(i).wait()
    # slot is free for reuse only after ITS out-dma completes; with nbuf
    # slots we wait for the out-dma issued nbuf programs ago
    @pl.when(i >= nbuf)
    def _():
        odma(i - nbuf).wait()
    odma(i).start()

    @pl.when(i + nbuf < n)
    def _():
        idma(i + nbuf).start()

    @pl.when(i == n - 1)
    def _():
        def drain(k, _):
            odma(k).wait()
            return 0
        jax.lax.fori_loop(jnp.maximum(0, n - nbuf), n, drain, 0)


def make_vmem(d, e, cols, nbuf, dtype):
    return pl.pallas_call(
        functools.partial(_vmem_kernel, cols=cols, nbuf=nbuf),
        grid=(e // cols,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((d, e), dtype),
        scratch_shapes=[pltpu.VMEM((nbuf, d, cols), dtype),
                        pltpu.SemaphoreType.DMA((nbuf,)),
                        pltpu.SemaphoreType.DMA((nbuf,))],
    )


def timed(fn, x, iters=20):
    @jax.jit
    def loop(x):
        def body(c, _):
            y = fn(x + c.astype(x.dtype))
            return c + y.reshape(-1)[0].astype(jnp.float32) * 0, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c
    _ = float(loop(x))
    t0 = time.time()
    _ = float(loop(x))
    return (time.time() - t0) / iters * 1e3


def main():
    d, e = 32, 2_097_152
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((d, e)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    nbytes = x.size * 2 * 2
    out = {}

    cases = [
        ("single_dma", lambda: make_single(d, e, x.dtype)),
        ("hbm2hbm_c16k_n4", lambda: make_hbm2hbm(d, e, 16384, 4, x.dtype)),
        ("hbm2hbm_c65k_n4", lambda: make_hbm2hbm(d, e, 65536, 4, x.dtype)),
        ("vmem_c8k_n4", lambda: make_vmem(d, e, 8192, 4, x.dtype)),
        ("vmem_c16k_n4", lambda: make_vmem(d, e, 16384, 4, x.dtype)),
        ("vmem_c32k_n6", lambda: make_vmem(d, e, 32768, 6, x.dtype)),
    ]
    ref = None
    for name, mk in cases:
        try:
            f = mk()
            y = f(x)
            ok = bool(jnp.all(y == x))
            ms = timed(f, x)
            out[name] = {"ms": round(ms, 3),
                         "gbps": round(nbytes / ms / 1e6, 1), "exact": ok}
        except Exception as ex:  # noqa: BLE001
            out[name] = {"err": str(ex).split("\n")[0][:160]}
        print(name, out[name], flush=True)

    with open("docs/DMA_COPY_PROBE.json", "w") as f:
        json.dump({"shape": [d, e], "dtype": "bf16", **out}, f, indent=1)


if __name__ == "__main__":
    main()

"""Pallas stage kernels for Beneš-routed static permutations (prototype).

Executes ``out = x[:, perm]`` for feature-major [d, E] arrays via the
three-stage Clos factorization from ops/benes.py:

  row_local_permute  — out[:, r, c] = x[:, r, p[r, c]]; one [d, S]·[S, S]
                       one-hot MXU matmul per row block (no gathers).
  block_transpose    — out[:, a, b] = x[:, b, a]; tiled [T, T] transposes.

Status: correctness-complete prototype (round-2 integration pending);
benchmarked standalone against XLA's direct gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_local_permute(x: jnp.ndarray, p: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """x: [d, S, S]; p: [S, S] int32 row permutations → [d, S, S] with
    out[:, r, c] = x[:, r, p[r, c]]."""
    d, s, s2 = x.shape
    assert s == s2 and p.shape == (s, s)
    rows = min(8, s)           # Mosaic block constraint: sublane dim >= 8
    assert s % rows == 0
    return pl.pallas_call(
        _permute_kernel3,
        grid=(s // rows,),
        in_specs=[
            pl.BlockSpec((d, rows, s), lambda r: (0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, s), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, rows, s), lambda r: (0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, s, s), jnp.float32),
        interpret=interpret,
    )(x, p)


def _permute_kernel3(x_ref, p_ref, o_ref):
    # blocks arrive as [d, rows, S]: one one-hot matmul per grid row
    rows, s = p_ref.shape
    for j in range(rows):
        p = p_ref[j, :].reshape(1, s)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
                  == p).astype(jnp.bfloat16)
        x = x_ref[:, j, :]
        xhi = x.astype(jnp.bfloat16)
        xlo = (x - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.dot(xhi, onehot, preferred_element_type=jnp.float32)
        acc += jnp.dot(xlo, onehot, preferred_element_type=jnp.float32)
        o_ref[:, j, :] = acc


def _transpose_kernel(x_ref, o_ref):
    # x block: [d, T, T] at (i, j); out block at (j, i) = swap of minor dims
    o_ref[...] = jnp.swapaxes(x_ref[...], 1, 2)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def block_transpose(x: jnp.ndarray, tile: int = 128,
                    interpret: bool = False) -> jnp.ndarray:
    """x: [d, S, S] → out[:, a, b] = x[:, b, a] via [tile, tile] tiles."""
    d, s, s2 = x.shape
    assert s == s2 and s % tile == 0
    nt = s // tile
    return pl.pallas_call(
        _transpose_kernel,
        grid=(nt, nt),
        in_specs=[pl.BlockSpec((d, tile, tile), lambda i, j: (0, j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((d, tile, tile), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, s, s), jnp.float32),
        interpret=interpret,
    )(x)


def benes_permute(x: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray,
                  p2: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Full factored permutation of feature-major x [d, E] (E = S*S):
    equals x[:, perm] for the routed perm (ops/benes.py)."""
    d, e = x.shape
    s = p0.shape[0]
    assert e == s * s
    tile = min(128, s)
    g = x.reshape(d, s, s)
    a0 = row_local_permute(g, p0, interpret=interpret)
    t0 = block_transpose(a0, tile=tile, interpret=interpret)
    a1 = row_local_permute(t0, p1, interpret=interpret)
    t1 = block_transpose(a1, tile=tile, interpret=interpret)
    out = row_local_permute(t1, p2, interpret=interpret)
    return out.reshape(d, e)

"""Pallas row scatter-accumulate: the embedding-gradient wall killer.

The mapping step's dominant cost is accumulating per-(ray, hit-slot)
embedding gradients into the vertex table: an XLA ``scatter-add`` of
~74k rows x 128 lanes with a measured ~5-6 ms per-call floor on TPU
(BENCH_NOTES round 3) — XLA lowers scatter to a serialized
one-row-per-step loop in HBM. Replaces the reference's CUDA atomicAdd
accumulation inside its fused backward (`render_helpers.py:104-156`
feature gather whose autograd backward is `F.embedding`'s scatter).

Two TPU-native designs, both keeping the full accumulator table resident
in VMEM across the whole operation (it is only flushed to HBM once):

* ``scatter_add_rows_serial`` — sequential grid over row chunks; per row,
  a dynamic-slice read-modify-write of the VMEM accumulator. O(N) tiny
  VPU ops, V-independent.
* ``scatter_add_rows_matmul`` — builds one-hot blocks on the fly and runs
  them through the MXU: ``acc[v0:v0+VT] += onehot(ids)^T @ G`` per
  (V-tile, N-chunk) grid cell. f32 gradients are carried exactly enough
  via a bf16 hi+lo split (two MXU passes). O(N*V) compares + MACs, but
  at MXU rates.

Which wins depends on N and V; `scripts/bench_scatter.py` measures both
at bench shapes against the XLA scatter baseline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# serial design
# ---------------------------------------------------------------------------


def _serial_kernel(ids_ref, g_ref, out_ref, *, chunk: int, unroll: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(j, _):
        for u in range(unroll):
            r = j * unroll + u
            e = ids_ref[r]
            out_ref[pl.ds(e, 1), :] = (out_ref[pl.ds(e, 1), :]
                                       + g_ref[pl.ds(r, 1), :])
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


@functools.partial(jax.jit, static_argnames=("table_rows", "chunk", "unroll"))
def scatter_add_rows_serial(ids: jnp.ndarray, g: jnp.ndarray,
                            table_rows: int, chunk: int = 4096,
                            unroll: int = 8) -> jnp.ndarray:
    """sum-scatter ``g`` rows into a fresh (table_rows, L) table.

    Args:
      ids: (N,) int32 row targets in [0, table_rows). Out-of-range ids are
        the CALLER's bug (no masking; clamp or route to a trash row first).
      g: (N, L) float32, L a multiple of 128.
    """
    N, L = g.shape
    npad = _round_up(max(N, chunk), chunk)
    if npad != N:
        # route padding rows to row 0 with zero payload (harmless add)
        ids = jnp.concatenate(
            [ids, jnp.zeros((npad - N,), jnp.int32)])
        g = jnp.concatenate([g, jnp.zeros((npad - N, L), g.dtype)])
    grid = (npad // chunk,)
    return pl.pallas_call(
        functools.partial(_serial_kernel, chunk=chunk, unroll=unroll),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((table_rows, L), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((table_rows, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ids, g)


# ---------------------------------------------------------------------------
# matmul (one-hot MXU) design
# ---------------------------------------------------------------------------


def _matmul_kernel(ids_ref, ghi_ref, glo_ref, out_ref, *, vt: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v0 = pl.program_id(0) * vt
    chunk = ids_ref.shape[1]
    # one-hot built pre-transposed: Mosaic rejects bf16 lhs-transposed
    # contractions ("Bad lhs type"), so contract standard (1),(0) form
    rows = jax.lax.broadcasted_iota(jnp.int32, (vt, chunk), 0) + v0
    onehot = (ids_ref[:] == rows).astype(jnp.bfloat16)    # (vt, chunk)
    # DEFAULT precision: the package-global highest would make Mosaic
    # emulate the bf16 dot multi-pass, which it rejects ("Bad lhs type")
    prec = jax.lax.Precision.DEFAULT
    acc = jnp.dot(onehot, ghi_ref[:], preferred_element_type=jnp.float32,
                  precision=prec)
    acc += jnp.dot(onehot, glo_ref[:], preferred_element_type=jnp.float32,
                   precision=prec)
    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("table_rows", "chunk", "vt"))
def scatter_add_rows_matmul(ids: jnp.ndarray, g: jnp.ndarray,
                            table_rows: int, chunk: int = 2048,
                            vt: int = 2048) -> jnp.ndarray:
    """Same contract as :func:`scatter_add_rows_serial`, MXU one-hot form.

    f32 payload is split hi/lo into two bf16 operands (exact to ~2^-16
    relative), each contracted against the same one-hot block.
    """
    N, L = g.shape
    assert table_rows % vt == 0, (table_rows, vt)
    npad = _round_up(max(N, chunk), chunk)
    if npad != N:
        ids = jnp.concatenate(
            [ids, jnp.full((npad - N,), -1, jnp.int32)])  # matches no column
        g = jnp.concatenate([g, jnp.zeros((npad - N, L), g.dtype)])
    ghi = g.astype(jnp.bfloat16)
    glo = (g - ghi.astype(jnp.float32)).astype(jnp.bfloat16)
    ids2 = ids[None, :]                                   # 2D for VMEM
    grid = (table_rows // vt, npad // chunk)
    return pl.pallas_call(
        functools.partial(_matmul_kernel, vt=vt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, L), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, L), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((vt, L), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((table_rows, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ids2, ghi, glo)


def scatter_add_rows_xla(ids: jnp.ndarray, g: jnp.ndarray,
                         table_rows: int) -> jnp.ndarray:
    """XLA scatter-add baseline (the ~5-6 ms floor being replaced)."""
    return jnp.zeros((table_rows, g.shape[1]), g.dtype).at[ids].add(g)

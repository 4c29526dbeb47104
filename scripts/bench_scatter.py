#!/usr/bin/env python
"""Standalone chip benchmark of the embedding-gradient scatter designs.

Shapes mirror one bench-scale BA iteration: N = Wsel*n_rays*max_hits
(ray, hit-slot) rows of 8*D=128 lanes accumulated into the (V, 128)
corner-embedding view, then folded (V,8,D) -> (E,D). Compares the XLA
scatter baseline against the Pallas serial and MXU one-hot kernels, plus
the gather-based fold against the XLA fold scatter.

Usage: python scripts/bench_scatter.py [N] [V] [E]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, n=30, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from proudslam_tpu.utils import compile_cache
    compile_cache.enable()
    import threading
    th = threading.Thread(target=lambda: np.asarray(jnp.ones((8,))),
                          daemon=True)
    th.start()

    from proudslam_tpu.ops.pallas.scatter_kernel import (
        scatter_add_rows_matmul, scatter_add_rows_serial,
        scatter_add_rows_xla)

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 6 * 1024 * 12
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 20480
    E = int(sys.argv[3]) if len(sys.argv) > 3 else 40960
    D = 16
    L = 8 * D
    rng = np.random.default_rng(0)
    # realistic id distribution: clustered (rays hit nearby voxels)
    ids = jnp.asarray(
        np.minimum((rng.random(N) ** 2 * V).astype(np.int32), V - 1))
    g = jnp.asarray(rng.standard_normal((N, L)).astype(np.float32))
    # fold structures: inverse vertex map (E, 8) flat indices into V*8
    vv = (rng.random((V, 8)) * E).astype(np.int32)  # voxel_vertex_ids
    inv = np.full((E, 8), -1, np.int64)
    cnt = np.zeros(E, np.int64)
    flat_e = vv.reshape(-1)
    for fi, e in enumerate(flat_e):
        if cnt[e] < 8:
            inv[e, cnt[e]] = fi
            cnt[e] += 1
    inv = jnp.asarray(inv.astype(np.int32))
    vv_j = jnp.asarray(vv)
    th.join()

    res = {}
    xla = jax.jit(lambda i, g: scatter_add_rows_xla(i, g, V))
    res["xla_scatter"] = bench(xla, ids, g)

    ser = jax.jit(lambda i, g: scatter_add_rows_serial(i, g, V))
    res["pallas_serial"] = bench(ser, ids, g)

    mm = jax.jit(lambda i, g: scatter_add_rows_matmul(i, g, V))
    res["pallas_matmul"] = bench(mm, ids, g)

    # correctness vs XLA
    ref = np.asarray(xla(ids, g))
    for name, fn in (("serial", ser), ("matmul", mm)):
        got = np.asarray(fn(ids, g))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"check {name}: rel err {err:.2e}", file=sys.stderr)

    # fold designs: dEV (V, 128) -> dW (E, 16)
    dEV = xla(ids, g)

    def fold_scatter(dEV):
        return jnp.zeros((E, D), jnp.float32).at[vv_j.reshape(-1)].add(
            dEV.reshape(V * 8, D))

    def fold_gather(dEV):
        flat = dEV.reshape(V * 8, D)
        rows = flat[jnp.maximum(inv, 0)]              # (E, 8, D)
        return jnp.sum(jnp.where((inv >= 0)[..., None], rows, 0.0), axis=1)

    fs = jax.jit(fold_scatter)
    fg = jax.jit(fold_gather)
    res["fold_xla_scatter"] = bench(fs, dEV)
    res["fold_inv_gather"] = bench(fg, dEV)
    err = np.abs(np.asarray(fs(dEV)) - np.asarray(fg(dEV))).max()
    print(f"check fold: abs err {err:.2e}", file=sys.stderr)

    for k, v in res.items():
        print(f"{k:>18}: {v:8.2f} ms")


if __name__ == "__main__":
    main()

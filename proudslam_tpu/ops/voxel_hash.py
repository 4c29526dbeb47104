"""Flat sparse voxel map: TPU-native replacement for the C++ sparse octree.

The reference maintains a Morton-coded pointer octree (`sparse_octree/src/
octree.cpp:104-294`) whose only live jobs are (a) dedup/allocate voxels from
depth point clouds, (b) assign stable vertex-embedding indices to voxel
corners shared between adjacent voxels, and (c) provide a structure for ray
DFS traversal. All three map better onto static-shape device arrays:

* **cell table** — append-only map from integer grid coordinate to a stable
  *embedding id* (== row in the vertex embedding table). This plays the role
  of the reference's global octant index (`octree.cpp:561-687`,
  ``all_features``): corner i of voxel v gets the id of the cell at
  ``v + corner_offset[i]``. Cells are kept as parallel sorted arrays so
  membership tests are a ``searchsorted`` (O(log C) gather) instead of
  pointer chasing.
* **voxel table** — append-only slots for SURFACE voxels (voxels actually
  containing depth points, reference `octree.cpp:175`), with precomputed
  per-voxel 8 corner embedding ids.
* ray traversal needs no hierarchy: intersection is brute-force/tiled AABB
  over voxel centers (see `ops/intersect.py`), which on TPU is
  vector-unit-friendly and avoids divergent DFS.

Everything is capacity-bounded and jittable: insertion of a frame's point
cloud is a single jitted call of sort/unique/searchsorted/scatter ops.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from proudslam_tpu.config import MapSettings

# packed-key sentinel: larger than any valid packed coordinate.
# NOTE: module-level constants must be NUMPY, not jnp — a module-level jnp
# array lives on the default device, and embedding it as a jit constant
# fetches it device->host at lowering time (minutes through a cold
# remote-TPU tunnel).
import numpy as _np

SENTINEL = _np.int32(2**31 - 1)

# corner offset tables, identical ordering to the reference
# (incr_x/y/z, `octree.cpp:11-13`): z fastest, then y, then x.
CORNER_OFFSETS = _np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], dtype=_np.int32)


class MapState(NamedTuple):
    """Capacity-bounded sparse voxel map (a pytree of device arrays)."""

    # --- cell table (sorted by packed key; SENTINEL-padded) ---
    cell_keys: jnp.ndarray    # (C,) int32 packed coords, ascending
    cell_ids: jnp.ndarray     # (C,) int32 embedding row for each key
    cell_vslot: jnp.ndarray   # (C,) int32 voxel slot if SURFACE else -1
    num_cells: jnp.ndarray    # () int32

    # --- voxel table (allocation order; stable slots) ---
    voxel_keys: jnp.ndarray        # (V,) int32 packed coords, SENTINEL pad
    voxel_vertex_ids: jnp.ndarray  # (V, 8) int32 embedding ids (0 pad)
    num_voxels: jnp.ndarray        # () int32

    # --- vertex embeddings (optimized by the mapper) ---
    embeddings: jnp.ndarray   # (E, D) float32

    # --- inverse vertex map: embedding row -> adjacent (voxel, corner) ---
    # (E, 8) int32 flat indices (voxel_slot * 8 + corner), -1 padded. A
    # vertex is a corner of <= 8 voxels, so 8 slots suffice. Lets the
    # embedding-gradient fold be a gather instead of a fine-grained
    # scatter (`ops/interp.py`); None in renderer-facing views that lack
    # it (they fall back to the scatter fold).
    inv_map: jnp.ndarray = None


def init_map_state(settings: MapSettings, key: jax.Array) -> MapState:
    """Fresh empty map. Embeddings ~ N(0, 0.01) (reference `mapping.py:71-80`)."""
    C = settings.num_embeddings
    V = settings.voxel_capacity
    emb = 0.01 * jax.random.normal(
        key, (settings.num_embeddings, settings.embed_dim), dtype=jnp.float32)
    return MapState(
        cell_keys=jnp.full((C,), SENTINEL, dtype=jnp.int32),
        cell_ids=jnp.zeros((C,), dtype=jnp.int32),
        cell_vslot=jnp.full((C,), -1, dtype=jnp.int32),
        num_cells=jnp.zeros((), dtype=jnp.int32),
        voxel_keys=jnp.full((V,), SENTINEL, dtype=jnp.int32),
        voxel_vertex_ids=jnp.zeros((V, 8), dtype=jnp.int32),
        num_voxels=jnp.zeros((), dtype=jnp.int32),
        embeddings=emb,
        inv_map=jnp.full((C, 8), -1, dtype=jnp.int32),
    )


def build_map_state_numpy(coords, settings: MapSettings,
                          seed: int = 0) -> MapState:
    """Construct a MapState for given integer voxel coords in pure numpy.

    Semantically equivalent to ``init_map_state`` + ``insert_points`` but
    with zero device compute — used by tests, probes and the driver entry
    point, where triggering device compiles (or D2H constant fetches) for
    setup is wasteful. Cell-id assignment order may differ from the
    incremental path (ids are stable but arbitrary, which is all the
    renderer requires).
    """
    import numpy as np

    coords = np.unique(np.asarray(coords, np.int64), axis=0)
    n = len(coords)
    assert n <= settings.voxel_capacity
    bits = settings.coord_bits
    bias = 1 << (bits - 1)

    def pack(c):
        b = c + bias
        return ((b[..., 0] << (2 * bits)) | (b[..., 1] << bits)
                | b[..., 2]).astype(np.int64)

    corner = (coords[:, None, :]
              + np.asarray(CORNER_OFFSETS, np.int64)).reshape(-1, 3)
    cell_coords = np.unique(corner, axis=0)
    m = len(cell_coords)
    assert m <= settings.num_embeddings
    cell_keys = pack(cell_coords).astype(np.int32)   # unique() output sorted
    cell_ids = np.arange(m, dtype=np.int32)

    vox_keys = pack(coords).astype(np.int32)
    corner_keys = pack(corner).reshape(n, 8).astype(np.int32)
    pos = np.searchsorted(cell_keys, corner_keys.reshape(-1))
    vvids = cell_ids[pos].reshape(n, 8)

    C = settings.num_embeddings
    V = settings.voxel_capacity
    ck = np.full((C,), np.int32(2**31 - 1), np.int32)
    ck[:m] = cell_keys
    ci = np.zeros((C,), np.int32)
    ci[:m] = cell_ids
    cv = np.full((C,), -1, np.int32)
    vpos = np.searchsorted(cell_keys, vox_keys)
    cv[vpos] = np.arange(n, dtype=np.int32)
    vk = np.full((V,), np.int32(2**31 - 1), np.int32)
    vk[:n] = vox_keys
    vv = np.zeros((V, 8), np.int32)
    vv[:n] = vvids
    rng = np.random.default_rng(seed)
    emb = (0.01 * rng.standard_normal(
        (C, settings.embed_dim))).astype(np.float32)
    inv = np.full((C, 8), -1, np.int32)
    flat_e = vvids.reshape(-1)
    flat_i = np.arange(n * 8, dtype=np.int32)
    order = np.argsort(flat_e, kind="stable")
    se, si = flat_e[order], flat_i[order]
    first = np.searchsorted(se, se, side="left")
    rank = np.arange(n * 8) - first
    inv[se, rank] = si
    return MapState(
        cell_keys=jnp.asarray(ck), cell_ids=jnp.asarray(ci),
        cell_vslot=jnp.asarray(cv), num_cells=jnp.int32(m),
        voxel_keys=jnp.asarray(vk), voxel_vertex_ids=jnp.asarray(vv),
        num_voxels=jnp.int32(n), embeddings=jnp.asarray(emb),
        inv_map=jnp.asarray(inv))


# ---------------------------------------------------------------------------
# coordinate packing
# ---------------------------------------------------------------------------


def pack_coords(coords: jnp.ndarray, bits: int = 10) -> jnp.ndarray:
    """Pack (..., 3) int32 grid coords into sortable int32 keys.

    Coordinates are biased by +2^(bits-1) so moderately negative coords are
    representable; out-of-range coords map to SENTINEL (invalid). The
    reference instead shifts all poses by +10 m (`frame.py:24`) to force
    positivity on a [0, 256)^3 grid — we support that range and more.
    """
    bias = 1 << (bits - 1)
    limit = (1 << bits) - 1
    b = coords + bias
    in_range = jnp.all((b >= 0) & (b <= limit), axis=-1)
    key = (b[..., 0] << (2 * bits)) | (b[..., 1] << bits) | b[..., 2]
    return jnp.where(in_range, key.astype(jnp.int32), SENTINEL)


def unpack_key(keys: jnp.ndarray, bits: int = 10) -> jnp.ndarray:
    """Inverse of :func:`pack_coords` -> (..., 3) int32 (SENTINEL -> garbage)."""
    bias = 1 << (bits - 1)
    mask = (1 << bits) - 1
    x = (keys >> (2 * bits)) & mask
    y = (keys >> bits) & mask
    z = keys & mask
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32) - bias


# ---------------------------------------------------------------------------
# lookups
# ---------------------------------------------------------------------------


def lookup_cells(state: MapState, query_keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (found, embedding_id) for packed keys of any shape."""
    flat = query_keys.reshape(-1)
    pos = jnp.searchsorted(state.cell_keys, flat)
    pos = jnp.clip(pos, 0, state.cell_keys.shape[0] - 1)
    found = state.cell_keys[pos] == flat
    found &= flat != SENTINEL
    ids = jnp.where(found, state.cell_ids[pos], -1)
    return found.reshape(query_keys.shape), ids.reshape(query_keys.shape)


def lookup_voxel_slots(state: MapState, query_keys: jnp.ndarray) -> jnp.ndarray:
    """Voxel slot for each packed key, or -1 if not a SURFACE voxel."""
    flat = query_keys.reshape(-1)
    pos = jnp.searchsorted(state.cell_keys, flat)
    pos = jnp.clip(pos, 0, state.cell_keys.shape[0] - 1)
    found = (state.cell_keys[pos] == flat) & (flat != SENTINEL)
    slots = jnp.where(found, state.cell_vslot[pos], -1)
    return slots.reshape(query_keys.shape)


def voxel_centers(state: MapState, settings: MapSettings) -> jnp.ndarray:
    """(V, 3) float world-space voxel centers: (coord + 0.5) * voxel_size.

    Mirrors `mapping.py:328` (reference): centres = (xyz + side/2)*voxel_size
    with side == 1 for leaves. Padding slots give garbage coords — mask with
    ``jnp.arange(V) < state.num_voxels``.
    """
    coords = unpack_key(state.voxel_keys)
    return (coords.astype(jnp.float32) + 0.5) * settings.voxel_size


def voxel_valid_mask(state: MapState) -> jnp.ndarray:
    V = state.voxel_keys.shape[0]
    return jnp.arange(V, dtype=jnp.int32) < state.num_voxels


# ---------------------------------------------------------------------------
# insertion
# ---------------------------------------------------------------------------


def insert_points(state: MapState, points: jnp.ndarray, valid: jnp.ndarray,
                  settings: MapSettings,
                  frame_capacity: int = None) -> MapState:
    """Insert a world-space point cloud; allocate voxels + corner cells.

    Replaces `Octree::insert` (`octree.cpp:104-294`): every valid point's
    voxel becomes SURFACE; all 8 corner cells of each such voxel get stable
    embedding ids (the reference creates corner-shifted FEATURE leaves for
    this, `octree.cpp:140-175`). Fully jittable, static shapes.

    Args:
      points: (N, 3) float world coordinates.
      valid:  (N,) bool.
      frame_capacity: budget for NEW voxels this call (default: the full
        ``settings.frame_voxel_capacity``). The touched-voxel unique
        always runs at full capacity (a frame touches thousands of
        existing voxels); when the budget is smaller, the NEW voxels are
        compacted to it and the (dominant) corner-cell sort/scatter work
        shrinks with it. New voxels beyond the budget are dropped and
        re-allocated when re-observed (self-healing, ~1-frame delay).
    """
    F = settings.frame_voxel_capacity
    C = state.cell_keys.shape[0]
    V = state.voxel_keys.shape[0]
    bits = settings.coord_bits

    coords = jnp.floor(points / settings.voxel_size).astype(jnp.int32)
    keys = jnp.where(valid, pack_coords(coords, bits), SENTINEL)

    # unique voxels touched this frame (sorted ascending, SENTINEL pad)
    frame_keys = jnp.unique(keys, size=F, fill_value=SENTINEL)
    frame_valid = frame_keys != SENTINEL

    if frame_capacity and frame_capacity < F:
        # steady-state: keep only NEW voxels, compacted to the small
        # budget — every downstream sort/unique/scatter shrinks to it
        slot0 = lookup_voxel_slots(state, frame_keys)
        sel = jnp.where(frame_valid & (slot0 < 0), frame_keys, SENTINEL)
        order0 = jnp.argsort(sel)[:frame_capacity]
        frame_keys = sel[order0]           # sorted (SENTINEL sorts last)
        frame_valid = frame_keys != SENTINEL
        F = frame_capacity

    # 8 corner cells of every frame voxel
    fcoords = unpack_key(frame_keys, bits)                       # (F, 3)
    corner_coords = fcoords[:, None, :] + CORNER_OFFSETS[None]   # (F, 8, 3)
    corner_keys = jnp.where(
        frame_valid[:, None], pack_coords(corner_coords, bits), SENTINEL)

    # ---- cell allocation -------------------------------------------------
    cand = jnp.unique(corner_keys.reshape(-1), size=8 * F, fill_value=SENTINEL)
    cand_found, _ = lookup_cells(state, cand)
    new_cell = (~cand_found) & (cand != SENTINEL)
    # capacity guard: silently drop allocations beyond capacity (monitored
    # host-side via num_cells; reference would index OOB past 20000 instead)
    order = jnp.cumsum(new_cell.astype(jnp.int32)) - 1
    new_ids = state.num_cells + order
    fits = new_cell & (new_ids < C)
    new_keys_arr = jnp.where(fits, cand, SENTINEL)
    new_ids_arr = jnp.where(fits, new_ids, 0).astype(jnp.int32)

    # Merge-by-rank instead of a full argsort over capacity + candidates:
    # the cell table is sorted by invariant; re-sort only the (small)
    # candidate array (dropped candidates became mid-array SENTINELs), then
    # each element's merged position is its own index plus its searchsorted
    # rank in the other array. Tie-breaking is collision-free: a candidate
    # equal to a live table key is never `new_cell`, and the side choices
    # order table-SENTINELs strictly before candidate-SENTINELs.
    order2 = jnp.argsort(new_keys_arr)
    new_keys_sorted = new_keys_arr[order2]
    new_ids_sorted = new_ids_arr[order2]
    M = 8 * F
    pos_a = jnp.arange(C, dtype=jnp.int32) + jnp.searchsorted(
        new_keys_sorted, state.cell_keys, side="left").astype(jnp.int32)
    pos_b = jnp.arange(M, dtype=jnp.int32) + jnp.searchsorted(
        state.cell_keys, new_keys_sorted, side="right").astype(jnp.int32)
    total = C + M
    # TPU scatters have a ~2-5 ms per-CALL floor at these sizes, so the
    # three parallel cell arrays merge through TWO multi-column row
    # scatters instead of six scalar ones (insert measured 26 -> ~14 ms,
    # probe_r5/BENCH_NOTES r5). Every merged position is written (the
    # merge is a permutation of 0..total), so the zeros init is dead.
    rows_a = jnp.stack([state.cell_keys, state.cell_ids,
                        state.cell_vslot], axis=1)               # (C, 3)
    rows_b = jnp.stack([new_keys_sorted, new_ids_sorted,
                        jnp.full((M,), -1, jnp.int32)], axis=1)  # (M, 3)
    merged = jnp.zeros((total, 3), jnp.int32).at[pos_a].set(
        rows_a).at[pos_b].set(rows_b)[:C]
    cell_keys, cell_ids, cell_vslot = merged[:, 0], merged[:, 1], merged[:, 2]
    num_cells = jnp.minimum(
        state.num_cells + jnp.sum(fits.astype(jnp.int32)), C).astype(jnp.int32)

    state = state._replace(
        cell_keys=cell_keys, cell_ids=cell_ids, cell_vslot=cell_vslot,
        num_cells=num_cells)

    # ---- voxel allocation ------------------------------------------------
    existing_slot = lookup_voxel_slots(state, frame_keys)
    is_new_voxel = frame_valid & (existing_slot < 0)
    vorder = jnp.cumsum(is_new_voxel.astype(jnp.int32)) - 1
    new_slots = state.num_voxels + vorder
    vfits = is_new_voxel & (new_slots < V)
    slot_for = jnp.where(vfits, new_slots, V)  # V == dropped (OOB-safe w/ mode)

    # corner embedding ids (all corners of a kept voxel exist now);
    # keys + vertex ids land in ONE 9-column row scatter (per-call floor)
    _, corner_ids = lookup_cells(state, corner_keys)             # (F, 8)
    vtable = jnp.concatenate(
        [state.voxel_keys[:, None], state.voxel_vertex_ids], axis=1)
    vrows = jnp.concatenate(
        [frame_keys[:, None], jnp.maximum(corner_ids, 0)], axis=1)
    vtable = vtable.at[slot_for].set(vrows, mode="drop")
    voxel_keys = vtable[:, 0]
    voxel_vertex_ids = vtable[:, 1:]

    num_voxels = jnp.minimum(
        state.num_voxels + jnp.sum(vfits.astype(jnp.int32)), V).astype(jnp.int32)

    # record voxel slots in the cell table (FEATURE -> SURFACE upgrade,
    # reference `octree.cpp:251-252`)
    pos = jnp.searchsorted(state.cell_keys, frame_keys)
    pos = jnp.clip(pos, 0, C - 1)
    hit = (state.cell_keys[pos] == frame_keys) & vfits
    cell_vslot = state.cell_vslot.at[jnp.where(hit, pos, C)].set(
        jnp.where(vfits, slot_for, -1), mode="drop")

    # ---- inverse vertex map ---------------------------------------------
    # each kept voxel contributes its 8 (slot*8 + corner) flat indices to
    # the rows of its 8 corner cells; a (voxel, corner) pair is inserted
    # exactly once ever (new-voxel guard above), and a cell has <= 8
    # adjacent voxels, so the 8 slots never overflow. Per-row slot
    # assignment = current occupancy + rank among this batch's duplicates
    # (sorted-run rank via searchsorted on the sorted candidate ids).
    # Known divergence AT CELL CAPACITY (ADVICE r4 #4): corners whose cell
    # failed to allocate are clamped to embedding row 0 in the forward
    # (voxel_vertex_ids above) but get no inv_map entry here, so row 0
    # receives no gradient from them — the scatter-fold fallback would
    # give row 0 their (meaningless) gradient instead. Acceptable: the
    # 90%-capacity warning fires well before (engine/slam.py), and the
    # clamped-corner contribution is garbage either way.
    E = state.inv_map.shape[0]
    ecand = jnp.where(vfits[:, None] & (corner_ids >= 0), corner_ids, E)
    flat_e = ecand.reshape(-1)                                   # (8F,)
    vals = (slot_for[:, None] * 8
            + jnp.arange(8, dtype=jnp.int32)[None, :]).reshape(-1)
    order_e = jnp.argsort(flat_e)
    se = flat_e[order_e]
    sv = vals[order_e]
    first = jnp.searchsorted(se, se, side="left").astype(jnp.int32)
    rank = jnp.arange(8 * F, dtype=jnp.int32) - first
    cnt = jnp.sum(
        (state.inv_map[jnp.minimum(se, E - 1)] >= 0).astype(jnp.int32),
        axis=1)
    off = cnt + rank
    dest = jnp.where((se < E) & (off < 8), se * 8 + off, E * 8)
    inv_map = state.inv_map.reshape(-1).at[dest].set(
        sv, mode="drop").reshape(E, 8)

    return state._replace(
        voxel_keys=voxel_keys, voxel_vertex_ids=voxel_vertex_ids,
        num_voxels=num_voxels, cell_vslot=cell_vslot, inv_map=inv_map)

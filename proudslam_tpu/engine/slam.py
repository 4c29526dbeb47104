"""The SLAM system: deterministic track/map interleave in one program.

Re-design of the reference's process architecture (`src/voxslam.py:16-74`):
instead of tracker and mapper processes exchanging pickled snapshots
through a manager socket (`share.py`, `tracking.py:116-126`,
`mapping.py:236-248`), both stages are jitted functions over shared
device-resident state, interleaved deterministically:

  per frame:  track (30 Adam iters on pose)
              -> write frame to provisional keyframe slot
              -> map round (10 BA iters over window + provisional slot)
              -> insert frame's depth cloud into the voxel map
              -> commit keyframe if stamp gap > keyframe_gap

This matches the reference's effective post-initialization schedule (its
mapper performs exactly one ``do_mapping`` per tracked frame,
`mapping.py:96-156`) while removing the per-frame pickle + D2H/H2D
snapshot cost and making runs reproducible.

The trajectory is stored as (reference-keyframe, relative-pose) pairs and
re-composed with the *final optimized* keyframe poses at the end, exactly
like `Mapping.get_updated_poses` (`mapping.py:410-419`).

Note: the reference shifts all poses by +10 m to force positive octree
coordinates (`frame.py:24`); our hash packs signed coordinates, so no
offset is applied.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from proudslam_tpu.config import SystemSettings
from proudslam_tpu.engine import state as kfstate
from proudslam_tpu.engine.mapper import MapOptState, init_map_opt, map_step
from proudslam_tpu.engine.tracker import TrackResult, track_frame
from proudslam_tpu.geometry import camera, se3
from proudslam_tpu.models.decoder import init_decoder
from proudslam_tpu.ops import voxel_hash as vh


# sentinel recorded by _HostFetcher when a fetch raises; consumers reset
# their in-flight state and resubmit
FETCH_FAILED = object()


class _HostFetcher:
    """Background device->host fetches of tiny scalars.

    Through the remote-TPU tunnel, ANY device->host transfer on the main
    thread — blocking ``int(x)`` or even ``copy_to_host_async`` — stalls
    the dispatch loop for a full round trip (measured ~25-40 ms), and the
    first transfer permanently switches the backend into a mode where
    every fence costs ~25 ms. The SLAM loop therefore never fetches on
    the critical path: device scalars it wants to *observe* (map
    occupancy counters, rotation-since-keyframe) are handed to this
    daemon thread, whose blocking fetches overlap with the main thread's
    dispatches; consumers poll the latest completed value (one-or-few
    frames stale — the reference's tracker reads a stale map snapshot by
    design, `share.py`, SURVEY §5)."""

    def __init__(self):
        self._q: "queue.Queue" = queue.Queue()
        self._results = {}
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._th = threading.Thread(target=self._run, daemon=True)
        self._th.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            name, arr = item
            try:
                val = np.asarray(arr)
            except Exception:   # pragma: no cover — fetch is best-effort
                # record the failure: consumers must see *something* or
                # their in-flight flags stay set forever (e.g. the
                # rotation keyframe trigger would silently disarm)
                val = FETCH_FAILED
            with self._cv:
                self._results[name] = val
                self._cv.notify_all()
            self._q.task_done()

    def submit(self, name: str, arr) -> None:
        self._q.put((name, arr))

    def poll(self, name: str):
        """Latest completed value for ``name`` (or None); consumes it."""
        with self._lock:
            return self._results.pop(name, None)

    def wait(self, name: str, timeout: float = 120.0):
        """Block until ``name``'s fetch completes; consume and return it.

        The consumer submits with a fixed lag of a few frames, so in
        steady state the result is already present and this returns
        immediately — the wait only materializes when dispatch runs ahead
        of the fetch thread, bounding staleness DETERMINISTICALLY (the
        value consumed at frame i is always the one submitted at frame
        i - lag, independent of thread timing — keyframe/bucket control
        decisions replay identically across runs)."""
        deadline = time.monotonic() + timeout
        with self._cv:
            while name not in self._results:
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self._cv.wait(remaining):
                    return FETCH_FAILED
            return self._results.pop(name)

    def drain(self) -> None:
        """Block until every submitted fetch has completed."""
        self._q.join()


class SlamSystem:
    """Host-side driver owning device state and jitted step functions."""

    def __init__(self, settings: SystemSettings,
                 intrinsics: Tuple[float, float, float, float],
                 image_hw: Tuple[int, int], seed: int = 0,
                 point_stride: int = 1, mesh=None):
        """``mesh``: optional ("dp", "mp") `jax.sharding.Mesh` — runs the
        full engine SPMD: ray batches data-parallel over dp, the vertex
        embedding table row-sharded over mp (`parallel/engine.py`). The
        program text is identical to single-device; XLA GSPMD inserts the
        collectives. The fused Pallas decoder kernel is single-device and
        is swapped for the XLA path under a mesh."""
        if mesh is not None and mesh.size > 1:
            import dataclasses
            settings = dataclasses.replace(
                settings, decoder=dataclasses.replace(
                    settings.decoder, use_fused_mlp=False))
        self.mesh = mesh
        self.settings = settings
        # the render stack's packed-key unpacking (ops/interp.py,
        # ops/intersect.py, the fused Pallas render kernel) uses the
        # 10-bit default; a different coord_bits would silently compute
        # wrong voxel centers there (ADVICE r4 #2) — fail loudly instead
        assert settings.map.coord_bits == 10, (
            "render stack assumes coord_bits == 10; got "
            f"{settings.map.coord_bits}")
        self.height, self.width = image_hw
        fx, fy, cx, cy = intrinsics
        self.rays_dir = camera.pixel_ray_directions(
            self.width, self.height, fx, fy, cx, cy)
        self.point_stride = point_stride

        key = jax.random.PRNGKey(seed)
        k_map, k_dec, self._key = jax.random.split(key, 3)
        self.map_state = vh.init_map_state(settings.map, k_map)
        self.decoder_params = init_decoder(k_dec, settings.decoder)

        # optional point-feature branch (reference's disabled pcd path,
        # `render_helpers.py:168-238`): per-voxel point store + PointNet
        # whose params ride in the decoder pytree so the mapper's existing
        # joint Adam trains them (the reference's dedicated resnet_optim,
        # `mapping.py:83`)
        self._use_pcd = (settings.render.feature_mode == "pcd"
                         or settings.map.store_points)
        self.point_store = None
        if self._use_pcd:
            from proudslam_tpu.models.pointnet import init_pointnet
            from proudslam_tpu.render.pcd_features import init_point_store
            self._key, k_pn = jax.random.split(self._key)
            if settings.render.feature_mode == "pcd":
                self.decoder_params["pointnet"] = init_pointnet(
                    k_pn, settings.decoder.in_dim)
            self.point_store = init_point_store(
                settings.map, settings.map.points_per_voxel)
        self.opt: MapOptState = init_map_opt(
            self.map_state.embeddings, self.decoder_params)
        self.store = kfstate.init_keyframe_store(
            settings.mapper.max_keyframes, self.height, self.width)

        if mesh is not None:
            # initial state must live on the mesh's devices — jit rejects
            # computations mixing arrays committed to different device sets.
            # With an mp extent the map is STORED spatially sharded: all
            # its tables row-shard over mp (per-device map memory
            # O(V/mp + E/mp), `parallel/engine.py::map_state_shardings`);
            # everything else replicates (in-step constraints shard the
            # ray batches over dp).
            from jax.sharding import NamedSharding, PartitionSpec as P
            from proudslam_tpu.parallel.engine import map_state_shardings
            rep = NamedSharding(mesh, P())
            if mesh.shape.get("mp", 1) > 1:
                self.map_state = jax.tree.map(
                    jax.device_put, self.map_state,
                    map_state_shardings(mesh, self.map_state))
            else:
                self.map_state = jax.device_put(self.map_state, rep)
            self.decoder_params = jax.device_put(self.decoder_params, rep)
            if mesh.shape.get("mp", 1) > 1:
                # the embedding Adam moments shard with their parameter
                row2 = NamedSharding(mesh, P("mp", None))
                self.opt = self.opt._replace(
                    embed=self.opt.embed._replace(
                        m=jax.device_put(self.opt.embed.m, row2),
                        v=jax.device_put(self.opt.embed.v, row2),
                        t=jax.device_put(self.opt.embed.t, rep)),
                    decoder=jax.device_put(self.opt.decoder, rep))
            else:
                self.opt = jax.device_put(self.opt, rep)
            self.store = jax.device_put(self.store, rep)
            self.rays_dir = jax.device_put(self.rays_dir, rep)
            self._key = jax.device_put(self._key, rep)

        # host-side bookkeeping
        self.num_kf = 0                      # committed keyframes
        self.kf_stamps: List[int] = []
        self.frame_poses: List[Tuple[int, np.ndarray]] = []  # (ref_kf, rel 4x4)
        self.last_pose6: Optional[jnp.ndarray] = None
        self.prev_pose6: Optional[jnp.ndarray] = None  # frame t-2 (velocity)
        self.rng = np.random.default_rng(seed)

        # settings structs are captured by closure (static), not traced
        def _track_fn(map_state, decoder_params, prev_pose, rays_dir,
                      rgb, depth, key, point_store, fresh_thresh):
            return track_frame(map_state, decoder_params, prev_pose,
                               rays_dir, rgb, depth, key, settings,
                               mesh=mesh, point_store=point_store,
                               fresh_thresh=fresh_thresh)

        def _map_fn(map_state, decoder_params, store, opt, rays_dir,
                    sel, valid, key, point_store,
                    update_pose=True, update_decoder=True):
            return map_step(map_state, decoder_params, store, opt, rays_dir,
                            sel, valid, key, settings,
                            update_pose=update_pose,
                            update_decoder=update_decoder, mesh=mesh,
                            point_store=point_store)

        # NOTE: no jitted function may close over a device array — jax
        # embeds captured arrays as constants by fetching them to host,
        # which is pathologically slow through a remote-TPU tunnel. All
        # device state is passed as arguments.
        def _rel_pose_fn(poses, ref, slot):
            ref_mat = se3.matrix_from_tangent(poses[ref])
            mat = se3.matrix_from_tangent(poses[slot])
            return se3.inverse_matrix(ref_mat) @ mat

        def _kf_angle_fn(poses, kf, slot):
            """Rotation angle (deg) between two keyframe-store poses."""
            Ra = se3.exp_rotation(poses[kf, 3:6])
            Rb = se3.exp_rotation(poses[slot, 3:6])
            c = (jnp.trace(Ra.T @ Rb) - 1.0) * 0.5
            return jnp.degrees(jnp.arccos(jnp.clip(c, -1.0, 1.0)))

        def _covis_fn(poses, slot):
            """(K,) rotation angle (deg) of every keyframe-store pose to
            the pose at ``slot`` — the covisibility proxy for window
            selection (view direction dominates overlap on room scans)."""
            R = jax.vmap(se3.exp_rotation)(poses[:, 3:6])   # (K, 3, 3)
            Rb = se3.exp_rotation(poses[slot, 3:6])
            c = (jnp.einsum("kij,ij->k", R, Rb) - 1.0) * 0.5
            return jnp.degrees(jnp.arccos(jnp.clip(c, -1.0, 1.0)))

        def _predict_fn(last6, prev6):
            """Constant-velocity pose prediction:
            M_pred = M_last @ (M_prev^-1 @ M_last)."""
            m_last = se3.matrix_from_tangent(last6)
            m_prev = se3.matrix_from_tangent(prev6)
            vel = se3.inverse_matrix(m_prev) @ m_last
            return se3.tangent_from_matrix(m_last @ vel)

        use_pcd = self._use_pcd

        def _insert_fn(map_state, point_store, rgb, depth, pose6, rays_dir,
                       frame_capacity=None):
            st = point_stride
            d = depth[::st, ::st]
            dirs = rays_dir[::st, ::st]
            pts_cam = camera.backproject(dirs, d).reshape(-1, 3)
            valid = (d > 0).reshape(-1)
            R = se3.exp_rotation(pose6[3:6])
            pts_world = camera.transform_points(pts_cam, R, pose6[0:3])
            new_state = vh.insert_points(map_state, pts_world, valid,
                                         settings.map,
                                         frame_capacity=frame_capacity)
            if use_pcd:
                from proudslam_tpu.render.pcd_features import (
                    insert_frame_points)
                colors = rgb[::st, ::st].reshape(-1, 3)
                point_store = insert_frame_points(
                    point_store, new_state, pts_world, colors, valid,
                    settings.map)
            # counters returned as FRESH buffers: the map_state output is
            # donated by the NEXT insert, which would invalidate its
            # buffers while the background fetch thread still holds them —
            # every fetch then fails and the host voxel gauge freezes
            # (catastrophic: the bucketed render view stops growing with
            # the map). The uint32 cast guarantees a distinct buffer ("+0"
            # would be folded and output-deduplicated back to the alias);
            # the maximum() for the int32 copy likewise survives folding
            # (XLA cannot prove num_voxels >= 0). The int32 copy feeds the
            # freshness-threshold history (`_fresh_thresh`) with zero H2D.
            return (new_state, point_store,
                    new_state.num_voxels.astype(jnp.uint32),
                    new_state.num_cells.astype(jnp.uint32),
                    jnp.maximum(new_state.num_voxels, 0))

        # Donation: every state pytree that a step consumes-and-returns is
        # donated so XLA updates buffers in place (the keyframe store alone
        # is ~80 MB; copying it per write/map call costs ~25 ms/frame).
        # quantized frame upload: H2D through a remote-TPU tunnel is slow
        # (~20 ms for a f32 frame), so frames travel as uint8 rgb + uint16
        # depth (the native precision of the RGB-D datasets — the uint16
        # scale at max_distance 10 m is exactly Replica's 6553.5) and are
        # decoded to f32 on device.
        self._depth_quant = 65535.0 / settings.render.max_distance

        def _decode_fn(rgb_q, depth_q):
            return (rgb_q.astype(jnp.float32) * (1.0 / 255.0),
                    depth_q.astype(jnp.float32) * (1.0 / self._depth_quant))

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            _rep = NamedSharding(mesh, P())
            self._decode_frame = jax.jit(_decode_fn,
                                         out_shardings=(_rep, _rep))
        else:
            self._decode_frame = jax.jit(_decode_fn)

        self._track = jax.jit(_track_fn)
        # (map_state itself is NOT donated: the bucketed view shares its
        # cell/voxel buffers with the retained full state; the only array
        # it updates — embeddings, ~1 MB — is cheap to copy)
        self._map = jax.jit(
            _map_fn, static_argnames=("update_pose", "update_decoder"),
            donate_argnums=(1, 2, 3))
        # point_store (argnum 1) is consumed-and-returned each insert —
        # donating it avoids copying the V*K point arrays per frame with
        # the pcd branch on (ADVICE r3 #5)
        if mesh is not None and mesh.shape.get("mp", 1) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from proudslam_tpu.parallel.engine import map_state_shardings
            rep = NamedSharding(mesh, P())
            pstore_sh = (None if self.point_store is None
                         else jax.tree.map(lambda _: rep, self.point_store))
            self._insert_jit = jax.jit(
                _insert_fn, donate_argnums=(0, 1),
                static_argnames=("frame_capacity",),
                out_shardings=(map_state_shardings(mesh, self.map_state),
                               pstore_sh, rep, rep, rep))
        else:
            self._insert_jit = jax.jit(_insert_fn, donate_argnums=(0, 1),
                                       static_argnames=("frame_capacity",))
        # steady-state frames use the smaller per-insert capacity (first
        # frame / big inserts use the full one) — see MapSettings
        self._steady_cap = (settings.map.frame_voxel_capacity_steady
                            or None)
        self._predict = jax.jit(_predict_fn)
        self._kf_angle = jax.jit(_kf_angle_fn)
        self._covis = jax.jit(_covis_fn)
        self._covis_host: Optional[np.ndarray] = None  # lagged (K,) angles
        self._covis_pending: deque = deque()
        # background-thread D2H of observability scalars (see _HostFetcher)
        self._fetcher = _HostFetcher()
        self._last_angle = 0.0
        # Every insert submits its counters and every frame submits its
        # rotation angle; consumers wait for the value submitted a fixed
        # number of frames ago. Unlike free-running polls, the lag makes
        # keyframe commits and bucket growth DETERMINISTIC across runs
        # (measured ATE varied 4.5-9 cm run-to-run purely from fetch
        # timing), while still keeping all D2H off the dispatch thread.
        self._counter_lag = 3
        self._ang_lag = 2
        self._nv_pending: deque = deque()   # (nv_tag, nc_tag)
        self._ang_pending: deque = deque()  # (tag, ref_kf)
        self._inserts = 0
        self._write = jax.jit(kfstate.write_frame, donate_argnums=(0,))
        self._rel_pose = jax.jit(_rel_pose_fn)

        # per-frame tracking telemetry (device scalars, fetched in one
        # batch by get_track_stats — never on the critical path)
        self._track_losses: List[jnp.ndarray] = []
        self._hit_ratios: List[jnp.ndarray] = []
        self._map_losses: List[jnp.ndarray] = []
        self._tracked_pose6: List[jnp.ndarray] = []   # pre-BA tracker output
        self._refined_pose6: List[jnp.ndarray] = []   # post-BA pose

        # Host-tracked live-voxel count: render-path calls (track/map) see a
        # bucketed *view* of the voxel table (next power-of-2 >= count), so
        # the brute-force intersection scales with the live map, not the
        # 20k capacity. Bucket growth compiles new step executables — a
        # background thread prewarms the next bucket's compiles (with dummy
        # inputs, populating the jit cache) before the live count reaches
        # it, so growth never stalls the frame loop.
        self._nv = 0
        self._nc = 0
        # per-insert history of the DEVICE voxel-count scalar — drives the
        # scale-free freshness threshold (render.fresh_window_frames): the
        # count from N inserts ago separates "allocated in the last N
        # frames" from settled voxels at any allocation rate. Device
        # scalars are used directly (the insert step already returns them)
        # — a host-created jnp scalar costs a ~2-4 ms H2D through the
        # remote tunnel (probe_r5.py round 5).
        self._nv_hist: deque = deque(
            maxlen=max(settings.render.fresh_window_frames + 1, 2))
        self._nv_dev = None
        self._nc_dev = None
        # device-resident constants for per-frame step arguments: uploading
        # fresh jnp.int32 scalars per call measured 8.4 ms/frame through
        # the tunnel (probe_r5.py: write 10.6 -> 2.2 ms with staged
        # scalars). Stamps/slots are staged via these caches.
        self._dev_i32: dict = {}
        self._zero_i32 = None
        self._capacity_warned = False
        self._prewarmed: set = set()
        self._prewarm_lock = threading.Lock()
        self._prewarm_threads: List[threading.Thread] = []

    # ------------------------------------------------------------------

    def _i32(self, v: int) -> jnp.ndarray:
        """Cached device int32 scalar.

        Per-frame ``jnp.int32(x)`` uploads cost ~2-3 ms each through the
        remote tunnel (probe_r5.py); slots/keyframe indices draw from a
        bounded set, so each value is uploaded exactly once. The cache also
        holds the keyframe-store *gauge flags*: the device-side ``stamps``
        array is consumed only as ``!= 0`` (the slot-0 pose anchor,
        `engine/mapper.py:92`) — true integer stamps live host-side
        (``kf_stamps``; checkpointed separately), so writes pass the cached
        0/1 flag instead of a fresh per-frame stamp upload."""
        s = self._dev_i32.get(v)
        if s is None:
            s = self._dev_i32[v] = jnp.int32(v)
        return s

    def _insert(self, map_state: vh.MapState, rgb: jnp.ndarray,
                depth: jnp.ndarray, pose6: jnp.ndarray,
                big: bool = False) -> vh.MapState:
        """Backproject a depth map at the (refined) pose and allocate voxels
        (reference `create_voxels_pointcloud`, `mapping.py:258-295`); with
        the pcd branch on, also store the frame's points per voxel.
        ``big``: use the full frame capacity (first-frame seeding)."""
        cap = None if big else self._steady_cap
        (new_state, self.point_store, nv_fresh, nc_fresh,
         nv_i32) = self._insert_jit(
            map_state, self.point_store, rgb, depth, pose6, self.rays_dir,
            frame_capacity=cap)
        self._nv_hist.append(nv_i32)
        # the host's bucket bound / capacity warning follow the device
        # counts via periodic background fetches — any main-thread D2H
        # (even copy_to_host_async) stalls the tunnel for a ~40 ms round
        # trip per frame. Staleness of a few frames means at most a few
        # frames render without the very newest voxels, which is the
        # reference's stale-snapshot tracking semantics anyway
        # (`share.py`, SURVEY §5).
        self._nv_dev = nv_fresh
        self._nc_dev = nc_fresh
        self._inserts += 1
        tags = (f"nv@{self._inserts}", f"nc@{self._inserts}")
        self._fetcher.submit(tags[0], nv_fresh)
        self._fetcher.submit(tags[1], nc_fresh)
        self._nv_pending.append(tags)
        # consume the counters submitted _counter_lag inserts ago: the
        # bounded lag keeps bucket growth well inside the 3/4 prewarm
        # margin (~50 voxels/frame growth), closing ADVICE r3 #1
        while len(self._nv_pending) > self._counter_lag:
            nv_tag, nc_tag = self._nv_pending.popleft()
            nv = self._fetcher.wait(nv_tag)
            nc = self._fetcher.wait(nc_tag)
            if nv is not FETCH_FAILED:
                self._nv = int(nv)
                self._maybe_prewarm()
            if nc is not FETCH_FAILED:
                self._nc = int(nc)
                self._check_capacity()
        return new_state

    def _drain_nv(self, block: bool = False):
        """Refresh host counters from completed background fetches.

        ``block=True`` forces a blocking fetch of the latest device counts
        (init / end-of-run only — a blocking D2H stalls the frame loop).
        """
        if block and self._nv_dev is not None:
            self._nv = int(np.asarray(self._nv_dev))
            self._nc = int(np.asarray(self._nc_dev))
            self._maybe_prewarm()
            self._check_capacity()
            return
        # non-blocking refresh is handled by the fixed-lag consumption in
        # _insert; nothing to do here

    def _check_capacity(self):
        """Warn (once) when the map nears its static capacities.

        Beyond capacity, ``insert_points`` silently drops new allocations
        (`ops/voxel_hash.py` capacity guard) — the map stops growing and
        tracking quality degrades in unexplored space, so surfacing this is
        load-bearing (the reference would instead index out of bounds past
        its 20000 embeddings)."""
        if self._capacity_warned:
            return
        V = self.settings.map.voxel_capacity
        C = self.settings.map.num_embeddings
        if self._nv >= 0.9 * V or self._nc >= 0.9 * C:
            self._capacity_warned = True
            import sys
            print(
                f"proudslam_tpu WARNING: map at >=90% capacity "
                f"(voxels {self._nv}/{V}, cells {self._nc}/{C}); new "
                f"allocations will be dropped at capacity — raise "
                f"tpu_specs.voxel_capacity / mapper_specs.num_embeddings",
                file=sys.stderr, flush=True)

    def counters(self, exact: bool = False) -> dict:
        """Host-visible map occupancy counters.

        Default: the fixed-lag host values (non-invasive — safe to call
        mid-run for logging; a blocking refresh here used to perturb the
        bucket schedule, making results depend on the LOGGING cadence).
        ``exact=True`` performs a blocking fetch of the live device counts
        (init / end-of-run)."""
        if exact:
            self._drain_nv(block=True)
        return {
            "num_voxels": self._nv,
            "num_cells": self._nc,
            "voxel_capacity": self.settings.map.voxel_capacity,
            "cell_capacity": self.settings.map.num_embeddings,
        }

    # The host voxel count lags the device by _counter_lag inserts; the
    # render-view bucket adds this margin so the newest (frontier) voxels
    # are NEVER truncated by staleness — losing even ~100 frontier voxels
    # during a pan into unmapped territory collapses the tracker's hit
    # ratio (measured 0.87 -> 0.19 and ATE 2.9 -> 9.8 cm from a 3-frame
    # -stale count crossing a bucket boundary). 256 = ~3x the actual
    # staleness (lag 3 x ~30 voxels/frame); the old 512 pushed the bench
    # run over the 8192 bucket for its last ~25 frames, paying a
    # trace+compile stall for nothing (BENCH_NOTES r5).
    _NV_MARGIN = 256

    def _render_view(self) -> vh.MapState:
        """Voxel-table view sliced to the current power-of-2 bucket.

        Only the renderer-facing arrays (voxel_keys, voxel_vertex_ids) are
        sliced; num_voxels stays exact so validity masks are unchanged."""
        self._drain_nv()
        b = self._bucket_for(self._nv + self._NV_MARGIN)
        ms = self.map_state
        if b >= ms.voxel_keys.shape[0]:
            return ms
        return ms._replace(voxel_keys=ms.voxel_keys[:b],
                           voxel_vertex_ids=ms.voxel_vertex_ids[:b])

    def _bucket_for(self, nv: int) -> int:
        # The DDA intersection path is V-independent (O(path length) per
        # ray), so no bucketing is needed: one executable serves the whole
        # run, and the bucket prewarm machinery short-circuits. Spatially
        # -sharded maps (mp > 1) also render the full view: slicing a
        # row-sharded table would reshard it every frame.
        if self.settings.render.intersect_mode == "dda":
            return self.settings.map.voxel_capacity
        if self.mesh is not None and self.mesh.shape.get("mp", 1) > 1:
            return self.settings.map.voxel_capacity
        # floor at 8192: each bucket transition stalls the frame loop for
        # a main-thread re-trace (compiles hit the persistent cache, the
        # trace does not — several seconds each for track+map+insert).
        # Below 8k voxels the brute intersect saving (~1.5 ms/iteration)
        # never repays those stalls over a run (BENCH_NOTES r5).
        b = min(8192, self.settings.map.voxel_capacity)
        while b < nv:
            b *= 2
        return min(b, self.settings.map.voxel_capacity)

    def _fresh_thresh(self) -> jnp.ndarray:
        """Freshness threshold for the tracker (scale-free mode): the live
        voxel count ``fresh_window_frames`` inserts ago — slots above it
        were allocated within the window, at whatever rate the scene
        produces. The value is the DEVICE counter the insert step already
        returned (zero H2D, exact, deterministic). 0 until enough history
        exists (everything fresh — the uniform down-weight rescales the
        loss without biasing the pose, matching the absolute-margin mode's
        early-run behavior)."""
        W = self.settings.render.fresh_window_frames
        if W <= 0 or len(self._nv_hist) <= W:
            return self._i32(0)          # statically ignored when W <= 0
        return self._nv_hist[0]

    def _current_wsel(self) -> int:
        # production map shape: always window_size+1 (padded, see
        # _select_window)
        return self.settings.mapper.window_size + 1

    def _maybe_prewarm(self):
        """Compile the next bucket's track/map executables in the background
        once the live voxel count passes 3/4 of the current bucket."""
        b = self._bucket_for(self._nv + self._NV_MARGIN)
        V = self.settings.map.voxel_capacity
        if b >= V or self._nv < (3 * b) // 4:
            return
        self._spawn_prewarm(min(b * 2, V), self._current_wsel(),
                            do_track=True)

    def _maybe_prewarm_window(self, stamp: int):
        """The production window shape is fixed (padded, _select_window),
        so there is nothing to prewarm per keyframe commit anymore."""
        return

    def _spawn_prewarm(self, bucket: int, wsel: int, do_track: bool):
        if self.mesh is not None:
            # mesh runs compile against sharded avals; the plain-aval
            # prewarm would populate the cache with unused variants
            return
        key = (bucket, wsel, do_track)
        with self._prewarm_lock:
            if key in self._prewarmed:
                return
            self._prewarmed.add(key)
        th = threading.Thread(
            target=self._prewarm, args=(bucket, wsel, do_track), daemon=True)
        th.start()
        self._prewarm_threads.append(th)

    def _prewarm(self, bucket: int, wsel: int, do_track: bool):
        """Compile (without executing) the track/map executables for the
        given shapes: ``jit(...).lower(avals).compile()`` populates the
        persistent compilation cache, so the first real call at these
        shapes re-traces but skips the multi-second XLA compile.

        Prewarm must NOT run dummy executions: concurrent executions from
        a second thread perturb the *real* step results on the remote
        axon backend (measured: bit-exact runs with prewarm disabled,
        ~1.5 cm trajectory divergence between identical runs with
        executing prewarm). Abstract lowering touches the device not at
        all, keeping the engine deterministic."""
        try:
            s = self.settings
            E, D = s.map.num_embeddings, s.map.embed_dim
            C = s.map.num_embeddings
            K = s.mapper.max_keyframes
            H, W = self.height, self.width

            def aval(shape, dtype=jnp.float32):
                return jax.ShapeDtypeStruct(shape, dtype)

            ms = vh.MapState(
                cell_keys=aval((C,), jnp.int32),
                cell_ids=aval((C,), jnp.int32),
                cell_vslot=aval((C,), jnp.int32),
                num_cells=aval((), jnp.int32),
                voxel_keys=aval((bucket,), jnp.int32),
                voxel_vertex_ids=aval((bucket, 8), jnp.int32),
                num_voxels=aval((), jnp.int32),
                embeddings=aval((E, D)),
                inv_map=aval((E, 8), jnp.int32))
            as_aval = lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            dec = jax.tree.map(as_aval, self.decoder_params)
            # eval_shape: abstract state construction, zero device work
            store = jax.eval_shape(
                lambda: kfstate.init_keyframe_store(K, H, W))
            opt = jax.eval_shape(init_map_opt, aval((E, D)), dec)
            key = aval((2,), jnp.uint32)
            rays = aval((H, W, 3))
            pstore = (None if self.point_store is None
                      else jax.tree.map(as_aval, self.point_store))
            sel = aval((wsel,), jnp.int32)
            valid = aval((wsel,), jnp.bool_)
            if do_track:
                self._track.lower(ms, dec, aval((6,)), rays,
                                  aval((H, W, 3)), aval((H, W)),
                                  key, pstore,
                                  aval((), jnp.int32)).compile()
            self._map.lower(ms, dec, store, opt, rays, sel, valid,
                            key, pstore).compile()
        except Exception:  # pragma: no cover — prewarm is best-effort
            pass

    def _next_key(self) -> jax.Array:
        self._key, k = jax.random.split(self._key)
        return k

    def upload_frame(self, rgb, depth) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Start the (async) device upload of one RGB-D frame.

        Host float arrays are quantized to uint8 rgb / uint16 depth (4x less
        tunnel traffic; quantization matches the datasets' native encoding)
        and decoded to f32 on device. Call this one frame ahead of
        ``process_frame`` to overlap the transfer with compute; passing the
        returned device arrays back into ``process_frame`` is a no-op."""
        if isinstance(rgb, jax.Array) and rgb.dtype == jnp.float32:
            return rgb, depth
        rgb = np.asarray(rgb)
        depth = np.asarray(depth)
        if rgb.dtype != np.uint8:
            rgb = np.clip(rgb * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
        if depth.dtype != np.uint16:
            depth = np.clip(depth * self._depth_quant + 0.5, 0.0,
                            65535.0).astype(np.uint16)
        return self._decode_frame(jnp.asarray(rgb), jnp.asarray(depth))

    def _merge_map_result(self, res):
        """Fold a MapStepResult (computed on a bucketed view) back into the
        full-capacity map state. Only embeddings change during mapping; the
        view's (donated) sliced voxel arrays are discarded. When the view
        was the full table (bucket == capacity) every buffer was donated, so
        the whole state must be taken from the result."""
        ms = res.map_state
        if ms.voxel_keys.shape == self.map_state.voxel_keys.shape:
            self.map_state = ms
        else:
            self.map_state = self.map_state._replace(embeddings=ms.embeddings)
        self.decoder_params = res.decoder_params
        self.store, self.opt = res.store, res.opt

    def _select_window(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Random keyframe window + provisional slot (reference
        `select_optimize_targets`, `mapping.py:220-234`).

        The window is PADDED to window_size so map_step compiles exactly
        one production shape: early-run padded slots render dummy (zero-
        hit, zero-loss) ray batches for the ~60 frames before the window
        saturates, which costs ~4 s of extra compute but avoids a several-
        second main-thread re-trace per window growth (round 3 made the
        opposite call when traces were cheaper than compute; the r5 fast
        path flipped the balance — BENCH_NOTES r5).

        The latest committed keyframe is always included: it is the one
        covisible with the current frame, anchoring the map frontier where
        tracking is happening (uniform random selection over a long run's
        keyframes rarely picks it, letting the frontier drift with the
        provisional frame alone — the reference's pure-random rule,
        `mapping.py:220-234`, is tuned for its ~10-keyframe runs)."""
        w = self.settings.mapper.window_size
        committed = list(range(self.num_kf))
        if len(committed) <= w:
            window = committed
        else:
            last = self.num_kf - 1
            fixed = [last]
            pool = committed[:-1]
            if self.settings.mapper.window_include_anchor:
                fixed = [0, last]
                pool = committed[1:-1]
            n_rand = w - len(fixed)
            ang = self.settings.mapper.covis_angle_deg
            cv = self._covis_host
            if ang > 0 and cv is not None and len(cv) >= last:
                # covisibility-weighted: keyframes looking the same way as
                # the current frame enter the window preferentially — the
                # loop-closure pressure uniform selection lacks
                weights = np.exp(
                    -np.asarray(cv, np.float64)[pool] / ang)
                weights /= weights.sum()
                rest = self.rng.choice(pool, size=n_rand,
                                       replace=False, p=weights)
            else:
                rest = self.rng.choice(pool, size=n_rand, replace=False)
            window = sorted(set(list(rest) + fixed))
        slot = min(self.num_kf, self.settings.mapper.max_keyframes - 1)
        pad = w - len(window)
        sel = window + [0] * pad + [slot]     # provisional slot last
        valid = [True] * len(window) + [False] * pad + [True]
        return (jnp.asarray(sel, dtype=jnp.int32),
                jnp.asarray(valid, dtype=bool))

    def _append_trajectory(self, slot: int):
        """Record (ref keyframe, relative pose) — the relative transform is
        computed on device and fetched lazily (device->host transfers per
        frame are expensive through a remote-TPU tunnel)."""
        ref = max(self.num_kf - 1, 0)
        rel = self._rel_pose(self.store.poses, self._i32(ref),
                             self._i32(slot))
        self.frame_poses.append((ref, rel))

    # ------------------------------------------------------------------

    def initialize(self, rgb: np.ndarray, depth: np.ndarray,
                   init_pose: np.ndarray, stamp: int = 0):
        """Seed the map from the first frame at the given pose
        (reference `process_first_frame` + mapper init branch,
        `tracking.py:56-66`, `mapping.py:105-121`)."""
        pose6 = se3.tangent_from_matrix(jnp.asarray(init_pose, jnp.float32))
        zeros6 = jnp.zeros((6,))
        # device stamp = gauge flag 0: slot 0 is ALWAYS the pose anchor,
        # even for runs whose start_frame (host stamp) is nonzero (the old
        # code passed the raw stamp, silently un-anchoring such runs)
        self.store = self._write(
            self.store, self._i32(0), jnp.asarray(rgb, jnp.float32),
            jnp.asarray(depth, jnp.float32), self._i32(0), pose6,
            zeros6, zeros6, self._i32(0))
        self.num_kf = 1
        self.kf_stamps = [stamp]
        self.map_state = self._insert(
            self.map_state, jnp.asarray(rgb, jnp.float32),
            jnp.asarray(depth, jnp.float32), pose6, big=True)
        # overlap the first tracked frame's compiles with the init rounds
        self._drain_nv(block=True)
        self._spawn_prewarm(
            self._bucket_for(self._nv + self._NV_MARGIN), 2, do_track=True)

        # padded to the production window shape so the init rounds compile
        # (and warm) the same map executable the frame loop uses
        wsel = self._current_wsel()
        sel = jnp.zeros((wsel,), jnp.int32)
        valid = jnp.zeros((wsel,), dtype=bool).at[0].set(True)
        n_rounds = max(
            1, self.settings.mapper.init_iterations
            // self.settings.mapper.num_iterations)
        for _ in range(n_rounds):
            res = self._map(self._render_view(), self.decoder_params,
                            self.store, self.opt, self.rays_dir, sel, valid,
                            self._next_key(), self.point_store)
            self._merge_map_result(res)
        self.last_pose6 = pose6
        self._append_trajectory(0)

    def process_frame(self, stamp: int, rgb: np.ndarray, depth: np.ndarray,
                      return_pose: bool = False):
        """Track + map one frame.

        Returns the refined 4x4 world pose (numpy) if ``return_pose`` —
        otherwise None, avoiding a per-frame device->host transfer."""
        rgb_d, depth_d = self.upload_frame(rgb, depth)
        self._maybe_prewarm_window(stamp)

        if (self.settings.tracker.motion_model == "velocity"
                and self.prev_pose6 is not None):
            prior = self._predict(self.last_pose6, self.prev_pose6)
        else:
            prior = self.last_pose6

        view = self._render_view()
        result: TrackResult = self._track(
            view, self.decoder_params, prior,
            self.rays_dir, rgb_d, depth_d, self._next_key(),
            self.point_store, self._fresh_thresh())
        # the signals needed to debug tracking live on device already;
        # keep the (tiny) scalars and fetch them in bulk at the end
        self._track_losses.append(result.loss)
        self._hit_ratios.append(result.hit_ratio)

        slot = min(self.num_kf, self.settings.mapper.max_keyframes - 1)
        # device stamp = gauge flag (0 freezes the pose in BA); the first
        # anchor_keyframes slots stay anchored. True stamps are host-side.
        flag = 0 if slot < self.settings.mapper.anchor_keyframes else 1
        self.store = self._write(
            self.store, self._i32(slot), rgb_d, depth_d, self._i32(flag),
            result.pose, result.adam_m, result.adam_v, result.adam_t)

        if self.settings.mapper.covis_angle_deg > 0:
            # keyframe covisibility angles: submitted every frame,
            # consumed at a fixed 2-frame lag (deterministic, off the
            # dispatch thread — same pattern as the rotation trigger)
            tag = f"covis@{stamp}"
            self._fetcher.submit(
                tag, self._covis(self.store.poses, self._i32(slot)))
            self._covis_pending.append(tag)
            while len(self._covis_pending) > 2:
                t_ = self._covis_pending.popleft()
                val = self._fetcher.wait(t_)
                if val is not FETCH_FAILED:
                    self._covis_host = val

        sel, valid = self._select_window()
        res = self._map(view, self.decoder_params, self.store,
                        self.opt, self.rays_dir, sel, valid,
                        self._next_key(), self.point_store)
        self._merge_map_result(res)
        self._map_losses.append(res.loss)

        refined = self.store.poses[slot]
        self._tracked_pose6.append(result.pose)
        self._refined_pose6.append(refined)
        stride = self.settings.mapper.insert_stride
        if stride <= 1 or stamp % stride == 0:
            self.map_state = self._insert(self.map_state, rgb_d, depth_d,
                                          refined)

        # keyframe commit rule (reference `mapping.py:136-139`), with a
        # denser early phase while the map gauge is still settling and a
        # rotation trigger for fast pans into unmapped territory
        gap = self.settings.mapper.keyframe_gap
        if self.num_kf <= self.settings.mapper.early_keyframes:
            gap = min(gap, self.settings.mapper.early_keyframe_gap)
        rot_deg = self.settings.mapper.keyframe_rotation_deg
        if rot_deg > 0:
            # consume the angle measured _ang_lag frames ago (fixed lag =
            # deterministic trigger); measurements against a superseded
            # keyframe reference are dropped
            while len(self._ang_pending) > self._ang_lag:
                tag, ref = self._ang_pending.popleft()
                val = self._fetcher.wait(tag)
                if val is not FETCH_FAILED and ref == self.num_kf - 1:
                    self._last_angle = float(val)
        rotated = rot_deg > 0 and self._last_angle > rot_deg
        if (stamp - self.kf_stamps[self.num_kf - 1] > gap or rotated) \
                and self.num_kf < self.settings.mapper.max_keyframes - 1:
            self.num_kf += 1
            self.kf_stamps.append(stamp)
            self._last_angle = 0.0
        if rot_deg > 0:
            tag = f"ang@{stamp}"
            self._fetcher.submit(
                tag, self._kf_angle(self.store.poses,
                                    self._i32(self.num_kf - 1),
                                    self._i32(slot)))
            self._ang_pending.append((tag, self.num_kf - 1))

        self._append_trajectory(slot)
        # the tracker continues from the BA-refined pose (reference keeps
        # last_frame whose pose object was refined in-place by BA only for
        # the mapper's copy; the tracker uses its own — we pick the refined
        # one, which is strictly fresher)
        self.prev_pose6 = self.last_pose6
        self.last_pose6 = refined
        if return_pose:
            return np.asarray(se3.matrix_from_tangent(refined))
        return None

    @staticmethod
    def validate_frame(rgb: np.ndarray, depth: np.ndarray) -> None:
        """Reject corrupt sensor frames before they poison the map.

        Mirrors the reference's per-frame guards: the ARKit loader raises
        on all-zero depth (`arkit.py:44-45`) and the tracker skips frames
        whose processing throws (`tracking.py:76-102`). NaN/Inf inputs
        would otherwise propagate through the losses silently.
        """
        rgb = np.asarray(rgb)
        depth = np.asarray(depth)
        if not np.isfinite(rgb).all():
            raise ValueError("rgb contains non-finite values")
        if not np.isfinite(depth).all():
            raise ValueError("depth contains non-finite values")
        if float(np.abs(depth).sum()) == 0.0:
            raise ValueError("all-zero depth frame")

    def skip_frame(self, stamp: int) -> None:
        """Record a skipped (corrupt) frame: repeat the last trajectory
        entry so the estimated trajectory stays index-aligned with the
        input sequence (the reference simply drops the frame, silently
        desynchronizing its trajectory from ground truth). Leading corrupt
        frames (before any tracked pose exists) record the init pose —
        without this the trajectory would desync exactly in the case the
        guard exists for (VERDICT r3 weak #7)."""
        if self.frame_poses:
            self.frame_poses.append(self.frame_poses[-1])
        else:
            self.frame_poses.append((0, np.eye(4, dtype=np.float32)))

    def finalize(self, final_rounds: int = 0):
        """Optional final refinement with frozen poses/decoder
        (reference `mapping.py:158-163`)."""
        for _ in range(final_rounds):
            sel, valid = self._select_window()
            res = self._map(self._render_view(), self.decoder_params,
                            self.store, self.opt, self.rays_dir, sel, valid,
                            self._next_key(), self.point_store,
                            update_pose=False, update_decoder=False)
            self._merge_map_result(res)

    def global_refine(self, rounds: int = 2, anchored: bool = False):
        """Pose-updating global bundle adjustment over ALL keyframes.

        The reference's final refinement freezes poses and refines the map
        only (`mapping.py:158-163`), so accumulated keyframe drift is
        never corrected. This instead sweeps overlapping sliding windows
        across every committed keyframe with pose updates ON (slot-0 stays
        the gauge anchor — `map_step` masks stamp-0 rows), re-running the
        production BA step. Because the per-frame trajectory is stored as
        (reference keyframe, relative pose) pairs and recomposed with the
        *final* keyframe poses (`get_trajectory`), refining the keyframes
        retroactively corrects every frame — a pose-graph-style drift
        correction the reference cannot perform.

        Window width matches the production BA window so the sweep reuses
        the already-compiled map executable.
        """
        w0 = min(self.num_kf + 1,
                 self.settings.mapper.window_size + 1)
        if self.num_kf < 2 or w0 < 2:
            return
        # anchored: every window leads with slot 0 (the frozen gauge
        # anchor) followed by w0-1 consecutive keyframes — each sweep
        # window then couples directly to the anchored map sector instead
        # of propagating the gauge correction O(N) hops through
        # overlapping windows
        width = w0 - 1 if anchored else w0
        stride = max(width - 1, 1)   # consecutive windows overlap by one
        for _ in range(rounds):
            for start in range(1 if anchored else 0, self.num_kf, stride):
                # windows cover slots 0..num_kf inclusive — the provisional
                # slot (num_kf) holds the last tracked frame, matching the
                # online BA window (ADVICE r4 #1: the old `num_kf - w0`
                # clamp went negative for num_kf <= window_size and the
                # sweep silently no-oped)
                start = min(start, self.num_kf + 1 - width)
                if start < (1 if anchored else 0):
                    break
                run = jnp.arange(start, start + width, dtype=jnp.int32)
                if anchored:
                    sel = jnp.concatenate(
                        [jnp.zeros((1,), jnp.int32), run])
                else:
                    sel = run
                valid = jnp.ones((w0,), dtype=bool)
                res = self._map(self._render_view(), self.decoder_params,
                                self.store, self.opt, self.rays_dir, sel,
                                valid, self._next_key(), self.point_store)
                self._merge_map_result(res)

    def rebake_map(self, iterations: int = 200):
        """Re-train the vertex embeddings from the stored keyframes at the
        CURRENT (refined) keyframe poses, poses frozen.

        Keyframes that drifted during exploration wrote ghosted geometry
        into the map; pose refinement against a ghosted map plateaus.
        Re-baking clears the embeddings (decoder is kept) and re-optimizes
        them against all keyframes — alternate with :meth:`global_refine`
        for a coordinate-descent pose/map refinement. Voxel allocation is
        kept (drift is cm-scale vs 20 cm voxels, so the allocated set
        still covers the corrected surfaces)."""
        if self.num_kf < 1:
            return
        from proudslam_tpu.engine.adam import init_adam
        self._key, k = jax.random.split(self._key)
        E, D = self.map_state.embeddings.shape
        emb = 0.01 * jax.random.normal(k, (E, D), dtype=jnp.float32)
        self.map_state = self.map_state._replace(embeddings=emb)
        self.opt = self.opt._replace(embed=init_adam(emb))
        w0 = min(self.num_kf + 1, self.settings.mapper.window_size + 1)
        stride = max(w0 - 1, 1)
        rounds = max(1, iterations // self.settings.mapper.num_iterations)
        for _ in range(rounds):
            for start in range(0, self.num_kf, stride):
                # slots 0..num_kf inclusive (see global_refine; ADVICE r4
                # #1 — the old clamp could no-op the sweep AFTER the
                # embeddings were already reset, destroying the map)
                start = min(start, self.num_kf + 1 - w0)
                if start < 0:
                    break
                sel = jnp.arange(start, start + w0, dtype=jnp.int32)
                valid = jnp.ones((w0,), dtype=bool)
                res = self._map(self._render_view(), self.decoder_params,
                                self.store, self.opt, self.rays_dir, sel,
                                valid, self._next_key(), self.point_store,
                                update_pose=False)
                self._merge_map_result(res)

    def get_track_stats(self) -> dict:
        """Per-frame tracking telemetry as host arrays (one batched fetch).

        Keys: track_loss, hit_ratio, map_loss — one entry per processed
        frame (the final-iteration values of each jitted step)."""
        out = {}
        for name, buf in (("track_loss", self._track_losses),
                          ("hit_ratio", self._hit_ratios),
                          ("map_loss", self._map_losses),
                          ("tracked_pose6", self._tracked_pose6),
                          ("refined_pose6", self._refined_pose6)):
            out[name] = (np.asarray(jnp.stack(buf)) if buf
                         else np.zeros((0,), np.float32))
        return out

    def get_trajectory(self) -> np.ndarray:
        """(N, 4, 4) world poses recomposed with final keyframe poses
        (reference `get_updated_poses`, `mapping.py:410-419`).

        Relative poses live on device during the run; this performs one
        batched device->host fetch."""
        kf_mats = np.asarray(jax.vmap(se3.matrix_from_tangent)(
            self.store.poses))
        rels = np.asarray(jnp.stack(
            [jnp.asarray(rel) for _, rel in self.frame_poses]))
        refs = np.asarray([ref for ref, _ in self.frame_poses])
        return np.einsum("nij,njk->nik", kf_mats[refs], rels)

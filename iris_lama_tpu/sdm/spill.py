"""Host spill tier: unbounded maps on a bounded device patch pool.

reference: the sparse-dense map's LRU compress-on-evict machinery —
``Map::get`` decompresses through an LRU cache and evicted patches live
LZ4/ZSTD-compressed in RAM (src/sdm/map.cpp:375-398 cached access,
:593-623 evict+compress; Options use_compression/cache_size,
include/lama/slam2d.h:115-120).

TPU-native restatement: HBM is the cache. The device patch pool (capacity
P) is the uncompressed working set; patches the robot has moved away from
are *spilled* — pulled to the host in one batched transfer, LZ4-compressed
(native codec, utils/codec.py), and their pool slots freed. When the robot
approaches spilled territory again, the driver *refills* the patches the
next update window could touch (decompress + one upload + masked inject).
The device programs never know: a spilled-and-refilled patch is
indistinguishable from one that never left.

Division of labor:

* device (jitted, static shapes): ``extract_patches`` (gather blocks,
  remove keys, clear cells), ``inject_patches`` (insert-if-missing, write
  blocks, keep the trash slot clean), ``snapshot_keys`` (active key list
  for one pull).
* host (:class:`HostSpillStore`): compressed dict, victim selection by
  distance from the synced pose, hit/miss counters (parity with the
  reference's cacheHit/cacheMiss, sdm/map.h:264-268).

Correctness contract: every patch the fused scan step can read or write
lies inside its pose-centered window; the driver refills all stored keys
within the window of the *predicted* pose plus ``margin`` patches before
stepping, so the device never sees a stale hole. Refill never overwrites a
patch that is already live on device (the device copy is newer by
construction). Spill victims are restricted to patches strictly outside
``keep_radius``, which exceeds the window reach.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.codec import BufferCompressor
from . import mapping as mapping_mod
from . import pool as pool_mod
from . import window as win_mod

OCC_DTYPE = mapping_mod.OCC_DTYPE


def _occ_dtype(cfg):
    return OCC_DTYPE if cfg.occ_model == "frequency" else jnp.float32


def _extract_impl(state, cfg, keys):
    """Un-jitted body of :func:`extract_patches` (vmap-able over a particle
    axis — see extract_patches_batch)."""
    slots = pool_mod.table_lookup(state.table, keys)
    present = slots >= 0
    trash = state.dist.shape[0] - 1
    safe = jnp.where(present, slots, trash)
    occ = state.occupied[safe]
    vis = state.visited[safe]
    dist = state.dist[safe]

    table, freed = pool_mod.table_remove(state.table, keys)
    m = keys.shape[0]
    # distinct out-of-range rows for non-freed entries: unique scatter
    # indices keep XLA's scatter lowering parallel (see scatter_window)
    oob = state.dist.shape[0] + jnp.arange(m, dtype=jnp.int32)
    safe_freed = jnp.where(freed >= 0, freed, oob)
    length = state.dist.shape[-1]
    zero_occ = jnp.zeros((m, length, length), state.occupied.dtype)
    zero_vis = jnp.zeros((m, length, length), OCC_DTYPE)
    max_d = jnp.full((m, length, length), cfg.distance.max_dist, jnp.float32)
    new_state = state._replace(
        table=table,
        occupied=state.occupied.at[safe_freed].set(zero_occ, mode="drop",
                                                   unique_indices=True),
        visited=state.visited.at[safe_freed].set(zero_vis, mode="drop",
                                                 unique_indices=True),
        dist=state.dist.at[safe_freed].set(max_d, mode="drop",
                                           unique_indices=True),
    )
    return new_state, occ, vis, dist, present


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
def extract_patches(state, cfg, keys):
    """Pull ``keys`` (int32[M], -1 padded) out of the pool.

    Returns (new_state, occ[M, L, L], vis[M, L, L], dist[M, L, L],
    present bool[M]). Extracted slots are freed and their cells reset;
    missing keys return zero/max-dist blocks with present=False.
    """
    return _extract_impl(state, cfg, keys)


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
def extract_patches_batch(maps, cfg, keys):
    """Vmapped :func:`extract_patches` over a leading particle axis:
    ``maps`` arrays are [N, ...], ``keys`` int32[M] is one shared victim
    list (keys a particle lacks come back present=False). Returns
    (new_maps, occ[N, M, L, L], vis, dist, present[N, M])."""
    return jax.vmap(lambda m: _extract_impl(m, cfg, keys))(maps)


def _inject_impl(state, cfg, keys, occ, vis, dist):
    """Un-jitted body of :func:`inject_patches` (vmap-able)."""
    pre = pool_mod.table_lookup(state.table, keys)
    cand = jnp.where(pre == pool_mod.EMPTY, keys, jnp.int32(-1))
    table, _ = pool_mod.table_insert(state.table, cand)
    post = pool_mod.table_lookup(table, keys)
    injected = jnp.logical_and(pre == pool_mod.EMPTY, post >= 0)
    # a blob may be dropped from the host store iff its content now lives on
    # device: freshly injected, or the device already had a (newer) copy
    droppable = jnp.logical_or(injected, pre >= 0)

    # distinct out-of-range rows for skipped entries: dropped by XLA,
    # unique indices keep the scatter parallel, trash stays clean
    oob = state.dist.shape[0] + jnp.arange(keys.shape[0], dtype=jnp.int32)
    target = jnp.where(injected, post, oob)
    occupied = state.occupied.at[target].set(
        occ.astype(state.occupied.dtype), mode="drop", unique_indices=True)
    visited = state.visited.at[target].set(vis.astype(OCC_DTYPE),
                                           mode="drop", unique_indices=True)
    dist_arr = state.dist.at[target].set(dist.astype(jnp.float32),
                                         mode="drop", unique_indices=True)
    return state._replace(table=table, occupied=occupied, visited=visited,
                          dist=dist_arr), droppable


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
def inject_patches(state, cfg, keys, occ, vis, dist):
    """Insert ``keys`` (int32[M], -1 padded) with the given cell blocks.

    Keys already live on device are left untouched (their content is newer
    than the spilled copy). Returns (new_state, droppable bool[M]) where
    droppable marks blobs now represented on device (safe to delete).
    """
    return _inject_impl(state, cfg, keys, occ, vis, dist)


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
def inject_patches_batch(maps, cfg, keys, occ, vis, dist):
    """Vmapped :func:`inject_patches`: per-particle key lists [N, M] (-1
    where that particle has nothing to inject) and blocks [N, M, L, L]."""
    return jax.vmap(lambda m, k, o, v, d: _inject_impl(m, cfg, k, o, v, d))(
        maps, keys, occ, vis, dist)


@jax.jit
def snapshot_keys(table):
    """int32[P]: active patch key per slot, -1 where free (one host pull)."""
    keys, mask = pool_mod.active_keys(table)
    return jnp.where(mask, keys, jnp.int32(-1))


def _pad_to_bucket(arr, fill, buckets=(64, 256, 1024, 4096)):
    n = len(arr)
    for b in buckets:
        if n <= b:
            out = np.full(b, fill, np.int32)
            out[:n] = arr
            return out
    raise ValueError(f"spill batch of {n} exceeds the largest bucket")


class HostSpillStore:
    """Compressed host store + spill/refill policy for one SLAM map."""

    def __init__(self, cfg, geo, codec: str = "lz4",
                 high_water: float = 0.85, low_water: float = 0.60,
                 margin_patches: int = 2):
        self.cfg = cfg
        self.geo = geo
        self.bc = BufferCompressor(codec)
        self.store: Dict[int, bytes] = {}
        self.high = int(high_water * cfg.capacity)
        self.low = int(low_water * cfg.capacity)
        self.margin = margin_patches
        self.cache_hit = 0     # refill found in store (reference cacheHit)
        self.cache_miss = 0    # window key neither on device nor stored
        self.spills = 0
        self.refills = 0
        # refill-window side in patches (subclasses widen it; PF must cover
        # the RESIDENT window — re-orgs regather from the pool inside jit)
        self._wp_refill = cfg.window_patches + 2 * margin_patches
        length = geo.patch_length
        occ_np = np.dtype(np.uint16 if cfg.occ_model == "frequency"
                          else np.float32)
        self._occ_nbytes = length * length * occ_np.itemsize
        self._vis_nbytes = length * length * 2
        self._dist_nbytes = length * length * 4
        self._occ_np = occ_np

    # -- codec ---------------------------------------------------------------
    def _pack(self, occ_b, vis_b, dist_b) -> bytes:
        return self.bc.compress(occ_b + vis_b + dist_b)

    def _unpack(self, blob: bytes):
        raw = self.bc.decompress(
            blob, self._occ_nbytes + self._vis_nbytes + self._dist_nbytes)
        o = self._occ_nbytes
        v = o + self._vis_nbytes
        length = self.geo.patch_length
        occ = np.frombuffer(raw[:o], self._occ_np).reshape(length, length)
        vis = np.frombuffer(raw[o:v], np.uint16).reshape(length, length)
        dist = np.frombuffer(raw[v:], np.float32).reshape(length, length)
        return occ, vis, dist

    # -- key geometry (host mirrors sdm/geometry.py packing) ------------------
    def _key_centers(self, keys: np.ndarray) -> np.ndarray:
        """World xy centers of patch keys [M] -> [M, 2]."""
        from .geometry import PKEY_BITS
        px = (keys >> PKEY_BITS).astype(np.int64)
        py = (keys & ((1 << PKEY_BITS) - 1)).astype(np.int64)
        l2 = self.geo.log2dim
        half = self.geo.patch_length // 2
        cells = np.stack([(px << l2) + half, (py << l2) + half], -1)
        return self.geo.np_m2w(cells)

    def window_keys_np(self, pose_xy: np.ndarray) -> np.ndarray:
        """Patch keys of the update window at ``pose_xy`` + margin (host
        mirror of window_org/window_patch_keys, sdm/window.py)."""
        from .geometry import PKEY_BITS
        cell = self.geo.np_w2m(np.asarray(pose_xy, np.float64))
        l2 = self.geo.log2dim
        wp = self._wp_refill
        cp = cell >> l2
        org = cp - wp // 2
        px = (org[0] + np.arange(wp)).astype(np.int64)
        py = (org[1] + np.arange(wp)).astype(np.int64)
        return ((px[:, None] << PKEY_BITS) | py[None, :]).astype(
            np.int32).reshape(-1)

    # -- policy --------------------------------------------------------------
    def keep_radius_m(self) -> float:
        """Patches whose center is within this range of the pose are never
        spilled: the refill window half-extent plus one patch of snap/pose
        slack. Anything farther is provably outside the next update's
        window (which gets refilled anyway before each step)."""
        geo = self.geo
        half_cells = (self._wp_refill // 2 + 1) * geo.patch_length
        return half_cells * geo.resolution

    def select_victims(self, active_keys: np.ndarray,
                       pose_xy: np.ndarray) -> np.ndarray:
        """Farthest-first victims to bring the pool down to low water."""
        keys = active_keys[active_keys >= 0]
        n_active = len(keys)
        n_spill = n_active - self.low
        if n_spill <= 0:
            return np.zeros(0, np.int32)
        centers = self._key_centers(keys)
        d = np.linalg.norm(centers - np.asarray(pose_xy)[None, :], axis=1)
        keep = self.keep_radius_m()
        order = np.argsort(-d)
        victims = [k for k in order[:n_spill] if d[k] > keep]
        return keys[victims].astype(np.int32)

    # -- events ---------------------------------------------------------------
    def spill(self, state, pose_xy: np.ndarray):
        """Spill far patches to the host store. Returns new device state."""
        active = np.asarray(snapshot_keys(state.table))
        victims = self.select_victims(active, pose_xy)
        if len(victims) == 0:
            return state
        keys_pad = _pad_to_bucket(victims, -1)
        state, occ, vis, dist, present = extract_patches(
            state, self.cfg, jnp.asarray(keys_pad))
        occ_h = np.asarray(occ)
        vis_h = np.asarray(vis)
        dist_h = np.asarray(dist)
        pres_h = np.asarray(present)
        for i, k in enumerate(keys_pad):
            if k >= 0 and pres_h[i]:
                self.store[int(k)] = self._pack(
                    occ_h[i].astype(self._occ_np).tobytes(),
                    vis_h[i].astype(np.uint16).tobytes(),
                    dist_h[i].astype(np.float32).tobytes())
        self.spills += 1
        return state

    def refill(self, state, pose_xy: np.ndarray):
        """Re-inject stored patches the next window could touch."""
        need = self.window_keys_np(pose_xy)
        hits = [int(k) for k in need if int(k) in self.store]
        if not hits:
            return state
        self.cache_hit += len(hits)
        length = self.geo.patch_length
        keys_pad = _pad_to_bucket(np.asarray(hits, np.int32), -1)
        m = len(keys_pad)
        occ = np.zeros((m, length, length), self._occ_np)
        vis = np.zeros((m, length, length), np.uint16)
        dist = np.zeros((m, length, length), np.float32)
        for i, k in enumerate(keys_pad[:len(hits)]):
            occ[i], vis[i], dist[i] = self._unpack(self.store[int(k)])
        state, droppable = inject_patches(
            state, self.cfg, jnp.asarray(keys_pad), jnp.asarray(occ),
            jnp.asarray(vis), jnp.asarray(dist))
        # drop blobs whose content now lives on device (fresh inject, or a
        # newer device copy already existed); keep any that failed to insert
        # (pool momentarily full) for a later attempt
        drop_h = np.asarray(droppable)
        for i, k in enumerate(hits):
            if drop_h[i]:
                del self.store[k]
        self.refills += 1
        return state

    def memory_usage(self) -> int:
        return sum(len(b) for b in self.store.values())

    def merged_map(self, state):
        """Full map (device + stored patches) in a fresh, larger pool.

        Use before map IO/export: the ``.smd`` writers walk the device pool
        only, so saving while patches are spilled would silently drop them
        (reference behavior: Map::write decompresses through the cache,
        src/sdm/map.cpp:497-516). Rare path — O(map) host work.
        """
        if not self.store:
            return state, self.cfg
        import dataclasses as _dc

        dev_keys = np.asarray(snapshot_keys(state.table))
        dev_keys = dev_keys[dev_keys >= 0]
        slots = np.asarray(pool_mod.table_lookup(
            state.table, jnp.asarray(dev_keys)))
        occ_all = np.asarray(state.occupied)
        vis_all = np.asarray(state.visited)
        dist_all = np.asarray(state.dist)

        store_keys = np.asarray(sorted(self.store), np.int32)
        total = len(dev_keys) + len(store_keys)
        cap = 64
        while cap < total + 1:
            cap <<= 1
        big_cfg = _dc.replace(self.cfg, capacity=cap)
        big = mapping_mod.slam_map_init(big_cfg)

        length = self.geo.patch_length
        m = total
        keys = np.concatenate([dev_keys, store_keys]).astype(np.int32)
        occ = np.zeros((m, length, length), occ_all.dtype)
        vis = np.zeros((m, length, length), np.uint16)
        dist = np.zeros((m, length, length), np.float32)
        occ[:len(dev_keys)] = occ_all[slots]
        vis[:len(dev_keys)] = vis_all[slots]
        dist[:len(dev_keys)] = dist_all[slots]
        for i, k in enumerate(store_keys):
            occ[len(dev_keys) + i], vis[len(dev_keys) + i], \
                dist[len(dev_keys) + i] = self._unpack(self.store[int(k)])

        table, islots = pool_mod.table_insert(big.table, jnp.asarray(keys))
        merged = big._replace(
            table=table,
            occupied=big.occupied.at[islots].set(jnp.asarray(occ)),
            visited=big.visited.at[islots].set(jnp.asarray(vis)),
            dist=big.dist.at[islots].set(jnp.asarray(dist)),
        )
        return merged, big_cfg


@jax.jit
def snapshot_keys_batch(tables):
    """int32[N, P] active patch keys per particle (one host pull)."""
    return jax.vmap(snapshot_keys)(tables)


class PFSpillStore(HostSpillStore):
    """Per-particle compressed host stores for PFSlam2D.

    reference parity: use_compression wires the compressor into EVERY
    particle's occupancy+distance maps (src/pf_slam2d.cpp:201-204), and the
    COW map clones share compressed patches between particles until they
    diverge. Here: one compressed dict per particle; resampling shares
    ancestral blobs via shallow-copied dicts. The driver keeps the composed
    resample permutation on device (ParticleSet.spill_lineage) and calls
    :meth:`permute` with it immediately before every settle (the stores
    must be re-keyed with the same permutation the pool arrays realize).

    The refill window covers the RESIDENT window (not just the update
    window): re-orgs regather window patches from the pool inside the
    jitted step, so every stored patch a re-org could touch must already be
    back on device. Consequently the keep radius (never-spill zone) is the
    resident half-extent + margin.
    """

    def __init__(self, cfg, geo, n_particles: int, codec: str = "lz4",
                 high_water: float = 0.8, low_water: float = 0.55,
                 margin_patches: int = 3):
        super().__init__(cfg, geo, codec, high_water, low_water,
                         margin_patches)
        self.stores = [dict() for _ in range(n_particles)]
        self._wp_refill = cfg.resident_window_patches + 2 * margin_patches

    # -- store bookkeeping ----------------------------------------------------
    def any_stored(self) -> bool:
        return any(self.stores)

    def stored_floor(self) -> int:
        """min over particles of stored-key count: a safe lower bound on
        how many potential keys are NOT live in any particle's pool."""
        return min((len(st) for st in self.stores), default=0)

    def permute(self, perm: np.ndarray) -> None:
        """stores[i] <- copy(stores[perm[i]]) — apply the resample lineage
        the pool settle is about to realize. Shallow copies share blobs
        (the COW property)."""
        old = self.stores
        self.stores = [dict(old[int(j)]) for j in perm]

    def need_refill(self, pose_xy: np.ndarray) -> bool:
        need = self.window_keys_np(pose_xy)
        needset = set(int(k) for k in need)
        return any(needset.intersection(st) for st in self.stores)

    # -- events ---------------------------------------------------------------
    def spill_batch(self, maps, pose_xy: np.ndarray):
        """Spill far patches of every particle (pools must be settled).
        Returns (new_maps, spilled_any)."""
        active = np.asarray(snapshot_keys_batch(maps.table))     # one pull
        counts = (active >= 0).sum(1)
        n_over = int(counts.max()) - self.low
        if n_over <= 0:
            return maps, False
        union = np.unique(active[active >= 0]).astype(np.int32)
        centers = self._key_centers(union)
        d = np.linalg.norm(centers - np.asarray(pose_xy)[None, :], axis=1)
        keep = self.keep_radius_m()
        far = union[d > keep]
        if len(far) == 0:
            return maps, False
        far = far[np.argsort(-d[d > keep])]          # farthest first
        # smallest farthest-first prefix that brings every particle to low;
        # per-particle np.isin keeps this O(N*(capacity+F)) memory — the
        # one-shot broadcast ([N, capacity, F] bools) was ~0.5 GB at
        # N=30/capacity=4096 and multi-GB for larger pools (ADVICE r3)
        member = np.stack([np.isin(far, row[row >= 0]) for row in active])
        cum = member.cumsum(axis=1)                  # [N, F]
        after = counts[:, None] - cum
        ok = (after <= self.low).all(axis=0)
        n_take = int(np.argmax(ok)) + 1 if ok.any() else len(far)
        victims = np.sort(far[:n_take])
        keys_pad = _pad_to_bucket(victims, -1)
        maps, occ, vis, dist, present = extract_patches_batch(
            maps, self.cfg, jnp.asarray(keys_pad))
        occ_h = np.asarray(occ)
        vis_h = np.asarray(vis)
        dist_h = np.asarray(dist)
        pres_h = np.asarray(present)
        for i, st in enumerate(self.stores):
            for m, k in enumerate(keys_pad):
                if k >= 0 and pres_h[i, m]:
                    st[int(k)] = self._pack(
                        occ_h[i, m].astype(self._occ_np).tobytes(),
                        vis_h[i, m].astype(np.uint16).tobytes(),
                        dist_h[i, m].astype(np.float32).tobytes())
        self.spills += 1
        return maps, True

    def refill_batch(self, maps, pose_xy: np.ndarray):
        """Re-inject every stored patch the resident window could touch,
        per particle (pools must be settled). Returns new maps."""
        need = set(int(k) for k in self.window_keys_np(pose_xy))
        hits_per = [sorted(need.intersection(st)) for st in self.stores]
        union_hits = sorted(set().union(*map(set, hits_per)))
        if not union_hits:
            return maps
        self.cache_hit += sum(len(h) for h in hits_per)
        length = self.geo.patch_length
        n = len(self.stores)
        keys_pad = _pad_to_bucket(np.asarray(union_hits, np.int32), -1)
        m = len(keys_pad)
        keys = np.full((n, m), -1, np.int32)
        occ = np.zeros((n, m, length, length), self._occ_np)
        vis = np.zeros((n, m, length, length), np.uint16)
        dist = np.zeros((n, m, length, length), np.float32)
        for i, st in enumerate(self.stores):
            for j, k in enumerate(union_hits):
                if int(k) in st:
                    keys[i, j] = k
                    occ[i, j], vis[i, j], dist[i, j] = self._unpack(
                        st[int(k)])
        maps, droppable = inject_patches_batch(
            maps, self.cfg, jnp.asarray(keys), jnp.asarray(occ),
            jnp.asarray(vis), jnp.asarray(dist))
        drop_h = np.asarray(droppable)
        for i, st in enumerate(self.stores):
            for j, k in enumerate(union_hits):
                if keys[i, j] >= 0 and drop_h[i, j]:
                    del st[int(k)]
        self.refills += 1
        return maps

    def memory_usage(self) -> int:
        """Compressed bytes, shared blobs counted once (COW sharing)."""
        seen = set()
        total = 0
        for st in self.stores:
            for b in st.values():
                if id(b) not in seen:
                    seen.add(id(b))
                    total += len(b)
        return total

    def merged_map_particle(self, state_one, store_idx: int):
        """Full single-particle map (device + that particle's stored
        patches) for IO/export — see HostSpillStore.merged_map."""
        saved = self.store
        try:
            self.store = self.stores[store_idx]
            return self.merged_map(state_one)
        finally:
            self.store = saved

"""Patch pool: a device-side open-addressing table mapping patch keys to slots.

TPU-native replacement for the reference's
``std::unordered_map<uint64_t, COWPtr<Container>>`` (reference:
include/lama/sdm/map.h:109) plus the ``Container`` dense block
(include/lama/sdm/container.h:47-162). Instead of pointer-chasing, a map is:

* a fixed-capacity ``PatchTable`` (this module): int32 ``keys``/``slots``
  arrays probed with bounded linear probing — all lookups are vectorized
  gathers, all inserts run in a (rare, usually skipped) sequential loop;
* one or more cell arrays of shape ``[P + 1, L, L]`` owned by the concrete
  map type (occupancy / distance / TSDF). Slot ``P`` is the *trash* slot:
  reads from missing patches are redirected there (and masked), writes to
  missing patches land there harmlessly.

Copy-on-write (cow_ptr.h:43) is unnecessary — functional updates give
structural sharing for free, and per-particle maps are just a leading batch
axis (``vmap``/``shard_map``).

Everything is a pure function over a NamedTuple pytree so that ``jit``,
``vmap`` and donation work.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EMPTY = jnp.int32(-1)
TOMBSTONE = jnp.int32(-2)

# All entries must be reachable within this probe window; insertion flags
# overflow instead of exceeding it, so lookups are exact with a fixed-size
# vectorized probe.
PROBE_WINDOW = 8


class PatchTable(NamedTuple):
    """Open-addressing hash table + slot free-list. All fields are arrays."""

    keys: jax.Array        # int32[H]; EMPTY / TOMBSTONE / patch key
    slots: jax.Array       # int32[H]; pool slot for the key
    free_slots: jax.Array  # int32[P]; stack of free slots
    n_free: jax.Array      # int32[]; number of entries in free_slots
    overflow: jax.Array    # int32[]; sticky count of failed inserts

    @property
    def capacity(self) -> int:
        return self.free_slots.shape[-1]

    @property
    def table_size(self) -> int:
        return self.keys.shape[-1]

    def num_patches(self):
        """Allocated patch count (reference: map.h:210 ``numOfPatches``)."""
        return self.free_slots.shape[-1] - self.n_free


def table_init(capacity: int, table_factor: int = 4) -> PatchTable:
    """Create an empty table for ``capacity`` patches.

    ``table_factor * capacity`` (rounded up to a power of two) hash entries
    keep the load factor low enough that PROBE_WINDOW linear probes always
    suffice in practice.
    """
    h = 1
    while h < table_factor * capacity:
        h <<= 1
    return PatchTable(
        keys=jnp.full((h,), EMPTY, jnp.int32),
        slots=jnp.full((h,), EMPTY, jnp.int32),
        # Stack of free slots; pop order 0, 1, 2, ... for determinism.
        free_slots=jnp.arange(capacity - 1, -1, -1, dtype=jnp.int32),
        n_free=jnp.int32(capacity),
        overflow=jnp.int32(0),
    )


def _hash(keys, table_size: int):
    """murmur3 finalizer into [0, table_size) (table_size is a power of two).

    Patch keys are 2D-grid structured (two packed arithmetic progressions);
    a full-avalanche mix is required to avoid linear-probe clustering.
    """
    h = keys.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def _select_rows_2level(arr2d, idx, m1: int = 256):
    """arr2d[idx] for [M, K] tables with small K, via two one-hot stages.

    TPU has no hardware gather; XLA serializes ``arr2d[idx]`` into per-row
    dynamic-slices. Two chained one-hot selections (block row on the MXU,
    then in-block row on the VPU) pull N rows in O(N*M1 + N*M2*K) vector
    work. Requires M % m1 == 0.
    """
    m, k = arr2d.shape
    m2 = m // m1
    arr3 = arr2d.reshape(m1, m2 * k).astype(jnp.float32)
    q = idx // m2
    r = idx % m2
    oh1 = (q[:, None] == jnp.arange(m1, dtype=jnp.int32)).astype(jnp.float32)
    block = jax.lax.dot_general(oh1, arr3, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    block = block.reshape(idx.shape[0], m2, k)
    oh2 = (r[:, None] == jnp.arange(m2, dtype=jnp.int32)).astype(jnp.float32)
    return jnp.sum(block * oh2[:, :, None], axis=1)


# Matmulized probing is kept for reference but DISABLED: measured on
# TPU v5e, XLA's gather lowering for the [N, 8]-probe pattern runs at
# ~0.14 us/probe — faster than the one-hot pipeline at every relevant size.
_MM_LOOKUP_MAX = 0


# Batch size at which lookups switch from probe gathers to the dense
# equality scan. XLA's per-element gather runs ~0.14 us/probe SERIALIZED
# (fine for a handful of keys, 39 ms for a 30-particle window lookup —
# measured r4, prof_r4_reorg/prof_r4_gather: the "49 ms resident_gather"
# was ~80% table probes); the dense scan is lane-parallel VPU work that
# XLA fuses into one streaming reduction (~0.7 ms at the same shape).
import os as _os

_SCAN_LOOKUP_MIN = int(_os.environ.get("IRIS_SCAN_LOOKUP_MIN", "8"))


def table_lookup(table: PatchTable, keys):
    """Vectorized lookup. keys int32[...] -> slots int32[...] (-1 = missing).

    Large batches use a dense equality scan over the whole key table: the
    table holds at most one live entry per key (inserts check existence
    first), so ``max(where(keys_equal, slot, -1))`` IS the open-addressing
    lookup — without the serialized probe gathers. Small batches keep the
    PROBE_WINDOW probe (an EMPTY entry before a match means absent;
    tombstones do not stop the probe).
    """
    hsize = table.table_size
    shape = keys.shape
    flat = keys.reshape(-1)

    # the [N, H] compare must stay fusion-sized: a TSDF insert looks up
    # ~1e5 ray-sample keys, and N*H in the hundreds of millions made
    # XLA's CPU constant-folder attempt a >100 GB buffer (r4 segfault);
    # big-N lookups keep the probe path, whose cost is O(N), not O(N*H)
    if _SCAN_LOOKUP_MIN <= flat.shape[0] and \
            flat.shape[0] * hsize <= 32 * 1024 * 1024:
        # at most one live entry per key -> the slot SUM over matches is
        # the lookup; ride the MXU as two s8 byte-plane dots of slot+1
        # (no match -> 0 -> -1 after the shift; sign-extension undone by
        # the & 0xFF). The where+max formulation materialized the [N, H]
        # select in i32 — 4x the traffic of the i8 equality matrix.
        # IRIS_POOL_CHECK=1 switches to that slower max formulation, which
        # degrades gracefully (returns A valid matching slot) if the
        # one-live-entry-per-key invariant is ever violated by a caller —
        # the sum would silently produce a garbage slot index. Use it when
        # debugging pool corruption.
        if _os.environ.get("IRIS_POOL_CHECK") == "1":
            eq = flat[:, None] == table.keys[None, :]
            sp1 = (table.slots + 1).astype(jnp.int32)
            return (jnp.max(jnp.where(eq, sp1[None, :], 0), axis=-1)
                    .reshape(shape) - 1)
        eq8 = (flat[:, None] == table.keys[None, :]).astype(jnp.int8)
        sp1 = (table.slots + 1).astype(jnp.int32)
        n_planes = 2 if table.capacity < 0xFFFF else 3
        pl_ = jnp.stack([(sp1 >> (8 * i)) & 0xFF
                         for i in range(n_planes)],
                        axis=1).astype(jnp.int8)              # [H, planes]
        r = jax.lax.dot_general(eq8, pl_, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        slots = (r[:, 0] & 0xFF) | ((r[:, 1] & 0xFF) << 8)
        if n_planes == 3:
            slots = slots | ((r[:, 2] & 0xFF) << 16)
        return slots.reshape(shape) - 1

    base = _hash(flat, hsize)
    offs = jnp.arange(PROBE_WINDOW, dtype=jnp.int32)

    if flat.shape[0] <= _MM_LOOKUP_MAX and hsize >= 1024:
        # windowed views: TK[i, j] = keys[(i + j) % H]. Keys are split into
        # 15-bit halves so every value is exact in the f32 matmul pipeline
        # (arithmetic-shift halves recombine correctly for the negative
        # EMPTY/TOMBSTONE sentinels too).
        tk = jnp.stack([jnp.roll(table.keys, -j) for j in range(PROBE_WINDOW)],
                       axis=1)
        ts = jnp.stack([jnp.roll(table.slots, -j) for j in range(PROBE_WINDOW)],
                       axis=1)
        both = jnp.concatenate([tk >> 15, tk & 0x7FFF, ts], axis=1)  # [H, 3W]
        sel = _select_rows_2level(both, base)                 # f32 [n, 3W]
        hi = sel[:, :PROBE_WINDOW].astype(jnp.int32)
        lo = sel[:, PROBE_WINDOW:2 * PROBE_WINDOW].astype(jnp.int32)
        probed = hi * 32768 + lo
        slotsw = sel[:, 2 * PROBE_WINDOW:].astype(jnp.int32)
        is_match = probed == flat[:, None]
        is_empty = probed == EMPTY
        big = jnp.int32(PROBE_WINDOW)
        first_match = jnp.min(jnp.where(is_match, offs, big), axis=-1)
        first_empty = jnp.min(jnp.where(is_empty, offs, big), axis=-1)
        found = first_match < first_empty
        pick = jnp.sum(jnp.where(is_match, slotsw, 0)
                       * (offs == first_match[:, None]), axis=-1)
        return jnp.where(found, pick, EMPTY).reshape(shape)

    idx = (base[..., None] + offs) % hsize                    # [..., W]
    probed = table.keys[idx]                                  # [..., W]
    is_match = probed == flat[..., None]
    is_empty = probed == EMPTY
    big = jnp.int32(PROBE_WINDOW)
    first_match = jnp.min(jnp.where(is_match, offs, big), axis=-1)
    first_empty = jnp.min(jnp.where(is_empty, offs, big), axis=-1)
    found = first_match < first_empty
    slot_idx = (base + jnp.minimum(first_match, big - 1)) % hsize
    return jnp.where(found, table.slots[slot_idx], EMPTY).reshape(shape)


def table_insert(table: PatchTable, keys):
    """Insert unique candidate ``keys`` (int32[K]; negative entries skipped).

    Returns (table, slots int32[K]) where slots are the final locations
    (existing or freshly allocated; -1 on pool-full/probe overflow, with the
    sticky ``overflow`` counter bumped).

    The sequential insert loop only runs when at least one key is actually
    missing (usually a handful of times over a whole SLAM run), guarded by
    ``lax.cond`` so the common case is a pure vectorized lookup.
    """
    keys = jnp.asarray(keys, jnp.int32)
    pre_slots = table_lookup(table, keys)
    valid = keys >= 0
    missing = jnp.logical_and(valid, pre_slots == EMPTY)

    def no_insert(tab):
        return tab, pre_slots

    def do_insert(tab):
        hsize = tab.table_size
        offs = jnp.arange(PROBE_WINDOW, dtype=jnp.int32)
        big = jnp.int32(PROBE_WINDOW)

        # Flat, branch-free loop body (masked commits); sequential because
        # each insert must see the previous ones' writes.
        def body(i, carry):
            tkeys, tslots, free, n_free, ovf, out = carry
            key = keys[i]
            base = _hash(key, hsize)
            idx = (base + offs) % hsize
            probed = tkeys[idx]
            is_match = probed == key
            is_free = jnp.logical_or(probed == EMPTY, probed == TOMBSTONE)
            first_match = jnp.min(jnp.where(is_match, offs, big))
            first_free = jnp.min(jnp.where(is_free, offs, big))

            need = jnp.logical_and(key >= 0, out[i] == EMPTY)
            already = first_match < big
            pos_match = (base + jnp.minimum(first_match, big - 1)) % hsize
            slot_existing = tslots[pos_match]

            can_place = need & ~already & (first_free < big) & (n_free > 0)
            pos_place = (base + jnp.minimum(first_free, big - 1)) % hsize
            new_slot = free[jnp.maximum(n_free - 1, 0)]

            tkeys = tkeys.at[pos_place].set(
                jnp.where(can_place, key, tkeys[pos_place]))
            tslots = tslots.at[pos_place].set(
                jnp.where(can_place, new_slot, tslots[pos_place]))
            n_free = jnp.where(can_place, n_free - 1, n_free)
            failed = need & ~already & ~can_place
            ovf = ovf + failed.astype(jnp.int32)
            out_val = jnp.where(need & already, slot_existing,
                                jnp.where(can_place, new_slot, out[i]))
            out = out.at[i].set(out_val)
            return tkeys, tslots, free, n_free, ovf, out

        init = (tab.keys, tab.slots, tab.free_slots, tab.n_free,
                tab.overflow, pre_slots)
        tkeys, tslots, free, n_free, ovf, out = jax.lax.fori_loop(
            0, keys.shape[0], body, init)
        return PatchTable(tkeys, tslots, free, n_free, ovf), out

    return jax.lax.cond(jnp.any(missing), do_insert, no_insert, table)


def table_insert_unique(table: PatchTable, keys):
    """Parallel batch insert for keys that are UNIQUE among non-negative
    entries (window patch keys are, by construction).

    Same contract as :func:`table_insert`, but instead of a sequential
    per-key loop (K iterations — latency-poison inside a vmapped particle
    update) it runs PROBE_WINDOW vectorized *claim rounds*: at round j every
    still-pending key tries entry ``hash(k)+j``; contenders for the same
    entry are resolved by a scatter-min (smallest key wins, losers advance
    to the next round). A claimed entry is permanent, so the linear-probe
    invariant (no EMPTY entry between a key's base and its position) holds
    exactly as in the sequential version. Slot ids are assigned by
    prefix-sum rank off the free stack — identical slots to the sequential
    pop order. Claims that exceed the free pool are rolled back to
    TOMBSTONE (lookups skip tombstones, so keys placed beyond them in the
    same batch stay reachable).
    """
    keys = jnp.asarray(keys, jnp.int32)
    pre = table_lookup(table, keys)
    pending = jnp.logical_and(keys >= 0, pre == EMPTY)

    def no_insert(tab):
        return tab, pre

    def do_insert(tab):
        hsize = tab.table_size
        k = keys.shape[0]
        base = _hash(keys, hsize)
        big = jnp.int32(jnp.iinfo(jnp.int32).max)
        tkeys = tab.keys
        placed_pos = jnp.full((k,), -1, jnp.int32)
        pend = pending
        for j in range(PROBE_WINDOW):
            pos = (base + j) % hsize
            entry = tkeys[pos]
            free_entry = jnp.logical_or(entry == EMPTY, entry == TOMBSTONE)
            want = jnp.logical_and(pend, free_entry)
            scatter_pos = jnp.where(want, pos, hsize)
            claims = jnp.full((hsize,), big, jnp.int32).at[scatter_pos].min(
                keys, mode="drop")
            won = jnp.logical_and(want, claims[pos] == keys)
            placed_pos = jnp.where(won, pos, placed_pos)
            tkeys = tkeys.at[jnp.where(won, pos, hsize)].set(keys,
                                                             mode="drop")
            pend = jnp.logical_and(pend, jnp.logical_not(won))

        placed = placed_pos >= 0
        rank = jnp.cumsum(placed.astype(jnp.int32)) - 1
        can = jnp.logical_and(placed, rank < tab.n_free)
        cap = tab.free_slots.shape[0]
        slot_idx = jnp.clip(tab.n_free - 1 - rank, 0, cap - 1)
        new_slot = tab.free_slots[slot_idx]
        tslots = tab.slots.at[jnp.where(can, placed_pos, hsize)].set(
            new_slot, mode="drop")
        # roll back claims that exceeded the free pool
        rollback = jnp.logical_and(placed, jnp.logical_not(can))
        tkeys = tkeys.at[jnp.where(rollback, placed_pos, hsize)].set(
            TOMBSTONE, mode="drop")
        n_placed = jnp.sum(can.astype(jnp.int32))
        n_fail = jnp.sum(pend.astype(jnp.int32)) \
            + jnp.sum(rollback.astype(jnp.int32))
        out = jnp.where(pre >= 0, pre, jnp.where(can, new_slot,
                                                 jnp.int32(-1)))
        new_tab = PatchTable(tkeys, tslots, tab.free_slots,
                             tab.n_free - n_placed, tab.overflow + n_fail)
        return new_tab, out

    return jax.lax.cond(jnp.any(pending), do_insert, no_insert, table)


def table_remove(table: PatchTable, keys):
    """Remove ``keys`` (int32[K]; negative entries skipped); tombstones the
    hash entries and returns freed slots (for cell-array clearing).

    reference analogue: map.cpp:465 ``deletePatchAt`` — used by transient
    maps (src/slam2d.cpp:323-373).
    """
    keys = jnp.asarray(keys, jnp.int32)
    offs = jnp.arange(PROBE_WINDOW, dtype=jnp.int32)
    big = jnp.int32(PROBE_WINDOW)

    def body(i, carry):
        tkeys, tslots, free, n_free, freed = carry
        key = keys[i]
        hsize = tkeys.shape[0]
        base = _hash(key, hsize)
        idx = (base + offs) % hsize
        probed = tkeys[idx]
        is_match = jnp.logical_and(probed == key, key >= 0)
        first_match = jnp.min(jnp.where(is_match, offs, big))
        present = first_match < big

        pos = (base + jnp.minimum(first_match, big - 1)) % hsize
        slot = tslots[pos]
        tkeys = tkeys.at[pos].set(jnp.where(present, TOMBSTONE, tkeys[pos]))
        tslots = tslots.at[pos].set(jnp.where(present, EMPTY, tslots[pos]))
        push_at = jnp.minimum(n_free, free.shape[0] - 1)
        free = free.at[push_at].set(jnp.where(present, slot, free[push_at]))
        n_free = n_free + present.astype(jnp.int32)
        freed = freed.at[i].set(jnp.where(present, slot, freed[i]))
        return tkeys, tslots, free, n_free, freed

    freed0 = jnp.full(keys.shape, EMPTY, jnp.int32)
    init = (table.keys, table.slots, table.free_slots, table.n_free, freed0)
    tkeys, tslots, free, n_free, freed = jax.lax.fori_loop(
        0, keys.shape[0], body, init)
    return table._replace(keys=tkeys, slots=tslots, free_slots=free,
                          n_free=n_free), freed


def table_remove_vec(table: PatchTable, keys):
    """Vectorized exact equivalent of :func:`table_remove` for UNIQUE keys
    (every caller passes unique patch keys): one probe gather + three
    unique-index scatters instead of a K-step sequential loop. Built for
    the per-scan transient prune, where the loop's latency (and its
    enclosing lax.cond staging the pool arrays) dominated the step.

    Equivalence argument: distinct present keys occupy distinct table
    positions (open-addressing invariant), so the tombstone/slot scatters
    are order-independent; the free-list push order is key order in both
    versions (prefix-sum ranks here, sequential pushes there).
    """
    keys = jnp.asarray(keys, jnp.int32)
    k = keys.shape[0]
    hsize = table.keys.shape[0]
    offs = jnp.arange(PROBE_WINDOW, dtype=jnp.int32)
    base = _hash(keys, hsize)                            # [K]
    idx = (base[:, None] + offs[None, :]) % hsize        # [K, PW]
    probed = table.keys[idx]
    is_match = jnp.logical_and(probed == keys[:, None], keys[:, None] >= 0)
    first = jnp.min(jnp.where(is_match, offs[None, :],
                              jnp.int32(PROBE_WINDOW)), axis=1)
    present = first < PROBE_WINDOW
    pos = (base + jnp.minimum(first, PROBE_WINDOW - 1)) % hsize
    slot = table.slots[pos]

    oob = hsize + jnp.arange(k, dtype=jnp.int32)
    target = jnp.where(present, pos, oob)
    tkeys = table.keys.at[target].set(TOMBSTONE, mode="drop",
                                      unique_indices=True)
    tslots = table.slots.at[target].set(EMPTY, mode="drop",
                                        unique_indices=True)

    rank = jnp.cumsum(present.astype(jnp.int32)) - 1     # [K]
    push_at = table.n_free + rank                        # < capacity always
    foob = table.free_slots.shape[0] + jnp.arange(k, dtype=jnp.int32)
    ftarget = jnp.where(present, push_at, foob)
    free = table.free_slots.at[ftarget].set(
        jnp.where(present, slot, jnp.int32(0)), mode="drop",
        unique_indices=True)
    freed = jnp.where(present, slot, EMPTY)
    n_free = table.n_free + jnp.sum(present.astype(jnp.int32))
    return table._replace(keys=tkeys, slots=tslots, free_slots=free,
                          n_free=n_free), freed


def active_slot_mask(table: PatchTable):
    """bool[P]: which pool slots are currently allocated."""
    p = table.capacity
    in_free = jnp.zeros((p,), jnp.bool_)
    order = jnp.arange(p, dtype=jnp.int32)
    # free_slots[0:n_free] are free
    is_free_entry = order < table.n_free
    safe = jnp.where(is_free_entry, table.free_slots, 0)
    in_free = in_free.at[safe].max(is_free_entry)
    return jnp.logical_not(in_free)


def active_keys(table: PatchTable):
    """(keys int32[P], mask bool[P]): patch key for every allocated slot."""
    p = table.capacity
    slot_keys = jnp.full((p,), EMPTY, jnp.int32)
    valid_entry = table.slots >= 0
    safe_slot = jnp.where(valid_entry, table.slots, 0)
    contrib = jnp.where(valid_entry, table.keys, EMPTY)
    slot_keys = slot_keys.at[safe_slot].max(contrib)
    mask = active_slot_mask(table)
    return jnp.where(mask, slot_keys, EMPTY), mask

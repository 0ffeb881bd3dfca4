"""Graph SLAM with loop closure (the reference's GraphSlam2D).

reference: include/lama/graph_slam2d.h, src/graph_slam2d.cpp. A transient-map
Slam2D front end (:104-111) + key-pose chain (1 m / 0.5*pi gates, :199-207)
+ loop-closure search and verification (:284-392) + pose-graph optimization
(:394-430) with the correction transform rebased onto the live SLAM pose.

TPU mapping of the pieces:
* the front end is the full resident-window Slam2D step (transient pruning
  runs inside the fused per-scan program since r3) and accepts prepadded
  scans / chunked replay like every other driver;
* key-pose gate (:199-207) — gates on the *matched slam pose* delta like the
  reference, WITHOUT a per-scan device sync: matched poses land in the
  device trajectory ring anyway, so a tiny jitted program replays the gate
  over the ring once per sync window (``sync_updates`` accepted scans) and
  returns all fired key events in ONE packed pull. The last-key-pose
  register stays on device between syncs.
* nanoflann k-d radius search -> masked pairwise distances on host numpy
  (key-pose counts are ~10^3; brute force beats tree-building);
* dual-hypothesis candidate verification (:315-355) -> ONE jitted program
  for every candidate of every key pose in the sync window (vmapped): two
  1-iteration GN solves, winner refined with a full solve, nearest-cell
  RMSE — packed into a single device->host pull;
* coarse fallback (:357-392) -> a throwaway dense 0.25 m grid + exact EDT
  (no patch pool needed for a scan-sized scratch field);
* minisam LM -> the batched SE(2) factor graph (nlls/factor_graph.py).

Freshness contract: key-pose creation, loop-closure factors, and the
correction transform lag the front end by at most ``sync_updates`` accepted
scans (the correction only ever changes at a pose-graph optimize, so the
estimated pose stream is unaffected between optimizes). Reads of
``key_poses``/``links`` and the map/optimize entry points sync first.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.pose import Pose2D
from ..match import match_surface_2d as match
from ..nlls import factor_graph as fg
from ..nlls.robust import RobustCost
from ..nlls.solver import SolverOptions
from ..sdm import distance as dist_mod
from ..sdm import mapping, window as win_mod
from ..sdm.geometry import MapGeometry
from ..utils.cloud import PointCloudXYZ, pad_scan, beam_bucket
from .slam2d import Slam2D, Slam2DOptions

HUBER_MATCH = RobustCost("huber", 0.15)   # graph_slam2d.cpp:327, 363

KEY_SCAN_S = 64   # trajectory entries examined per key-gate dispatch


@dataclasses.dataclass(frozen=True)
class GraphSlam2DOptions:
    """reference: GraphSlam2D::Options (graph_slam2d.h:59-87) — inherits the
    Slam2D options and adds loop-closure knobs."""

    slam: Slam2DOptions = Slam2DOptions(transient_map=True)
    key_pose_distance: float = 1.0
    key_pose_angular_distance: float = 0.5 * math.pi
    key_pose_head_delay: int = 5
    loop_search_max_distance: float = 10.0
    loop_search_min_distance: float = 2.0
    loop_max_candidates: int = 5
    loop_closure_scan_rmse: float = 0.05
    loop_closure_max_candidates: int = 10   # graph_slam2d.h:82
    ignore_n_chain_poses: int = 20
    # --- TPU batching knobs (see module docstring freshness contract) ---
    sync_updates: int = int(os.environ.get("IRIS_GRAPH_SYNC", "8"))  # per-scan mode: accepted scans between syncs
    sync_scans: int = 32     # chunked replay: raw scans per front-end slice
    # Live micro-chunk (r5, VERDICT r4 #5): the per-scan (ROS-style) path
    # can buffer this many ACCEPTED scans and dispatch them as ONE
    # straight-line Slam2D unroll program at <= live_chunk-1 scans of
    # added latency. The motion gate stays host-side (odometry only), so
    # acceptance is decided immediately; public reads flush the buffer.
    # MEASURED NEGATIVE, default stays 1: same-session A/B on the live
    # bench gave 231.2 scans/s (chunk 1, reps 221-235) vs 201.5 (chunk 2,
    # reps 179-204) — after r4's zero-blocking-pull pipelining the live
    # wall is not dispatch count, and the flush path's per-pair staging
    # (host stacks + the chunk-driver entry) costs more than the saved
    # dispatch. Kept as an opt-in for slower-dispatch environments.
    live_chunk: int = int(os.environ.get("IRIS_GRAPH_LIVE_CHUNK", "1"))


class KeyPose(NamedTuple):
    """graph_slam2d.h:97-104 (cloud kept as padded host arrays)."""

    id: int
    pose: Pose2D        # corrected/global frame
    raw_pose: Pose2D    # live slam frame at creation
    points: np.ndarray  # f32[B, 3] base-frame points
    mask: np.ndarray    # bool[B]
    origin: np.ndarray  # f32[3]
    timestamp: float


def _se2(p: Pose2D):
    return jnp.asarray(p.se2_array())


class GraphSlam2D:
    """Host driver; mirrors the reference public API (graph_slam2d.h:106-160)."""

    def __init__(self, options: GraphSlam2DOptions = GraphSlam2DOptions()):
        self.options = options
        slam_opts = dataclasses.replace(options.slam, transient_map=True)
        self.slam = Slam2D(slam_opts)
        self._key_poses: List[KeyPose] = []
        self._links: List[tuple] = []
        self.correction = Pose2D()
        self.accdist = 0.0
        self.factordist = 0.0
        self._builder = fg.GraphBuilder()
        self._factor_queue = 0   # factors queued since last optimize
        self._jit_correlate_batch = None
        self._jit_coarse = None
        self._jit_key_scan = None
        self._prior = Pose2D()
        # deferred key-pose machinery (see module docstring)
        self._scan_buf: dict = {}       # update index -> (pts, msk, org, t)
        self._k_synced = 0              # updates consumed by the key gate
        self._k_harvested = 0           # updates whose key events landed
        self._since_sync = 0
        self._last_key_dev = None       # device register: last key raw pose
        self._keyscan_pending: List[tuple] = []   # (dev packed, k_lo, take)
        # in-flight async verification batches + coarse retry queue
        self._pending: List[dict] = []
        self._coarse_jobs: List[tuple] = []
        self._jit_coarse_batch = None
        # lightweight phase counters (host wall seconds / call counts)
        self.stats: dict = {}
        # live micro-chunk buffer (Options.live_chunk): accepted scans
        # awaiting their paired unroll dispatch + the shadow gate odometry
        # (slam.odom_ lags while scans sit in the buffer)
        self._live_pend: List[tuple] = []
        self._gate_odom = None

    # -- public API ----------------------------------------------------------
    def set_prior(self, prior: Pose2D) -> None:
        self.slam.set_prior(prior)
        self._prior = prior

    def pose(self) -> Pose2D:
        """corrected global pose = correction + slam pose (the correction
        lags by at most sync_updates accepted scans after an optimize)."""
        self._live_flush()
        return self.correction + self.slam.pose()

    def enough_motion(self, odometry: Pose2D) -> bool:
        if self._gate_odom is not None:
            odelta = self._gate_odom - odometry
            return not (
                np.linalg.norm(odelta.xy()) <= self.slam.options.trans_thresh
                and abs(odelta.rotation()) <= self.slam.options.rot_thresh)
        return self.slam.enough_motion(odometry)

    @property
    def key_poses(self) -> List[KeyPose]:
        self._live_flush()
        self._sync(drain=True)
        return self._key_poses

    @property
    def links(self) -> List[tuple]:
        self._live_flush()
        self._sync(drain=True)
        return self._links

    # -- loop-closure kernels ------------------------------------------------
    def _build_kernels(self):
        (self._jit_correlate_batch, self._jit_key_scan,
         self._jit_coarse_batch) = _make_graph_kernels(
            self.slam.cfg, self.options.key_pose_distance,
            self.options.key_pose_angular_distance)

    # -- main update (graph_slam2d.cpp:188-283) ------------------------------
    def update(self, cloud: PointCloudXYZ, odometry: Pose2D,
               timestamp: float = 0.0) -> bool:
        if self.slam._max_beams == 0:
            self.slam._max_beams = beam_bucket(len(cloud.points))
        points, mask, origin = pad_scan(cloud, self.slam._max_beams)
        return self.update_prepadded(points, mask, origin, odometry,
                                     timestamp)

    def update_prepadded(self, points, mask, origin, odometry: Pose2D,
                         timestamp: float = 0.0) -> bool:
        """Per-scan path on pre-padded arrays (host numpy preferred — the
        key-pose machinery keeps the padded cloud on host).

        With ``live_chunk > 1``, accepted scans are buffered and their
        device updates dispatched as one Slam2D unroll program per
        ``live_chunk`` scans (VERDICT r4 #5): the motion gate is pure
        host odometry logic, so acceptance is decided here; only the
        device work is deferred by at most live_chunk-1 scans, and every
        public read flushes the buffer first."""
        lc = self.options.live_chunk
        if lc <= 1 or not self.slam.has_first_scan:
            did = self.slam.update_prepadded(points, mask, origin,
                                             odometry, timestamp)
            if not did:
                return False
            self._gate_odom = odometry
            self._scan_buf[self.slam._n_updates - 1] = (points, mask,
                                                        origin, timestamp)
            self._since_sync += 1
            if self._since_sync >= self.options.sync_updates:
                self._sync()
            return True
        # host-side motion gate against the last ACCEPTED odometry
        # (slam.odom_ lags while scans sit in the buffer) — identical
        # logic to Slam2D.update_prepadded / slam2d.cpp:167-170
        odelta = self._gate_odom - odometry
        if (np.linalg.norm(odelta.xy()) <= self.slam.options.trans_thresh
                and abs(odelta.rotation())
                <= self.slam.options.rot_thresh):
            return False
        self._gate_odom = odometry
        self._live_pend.append((points, mask, origin, odometry, timestamp))
        if len(self._live_pend) >= lc:
            self._live_flush()
        return True

    def _live_flush(self) -> None:
        """Dispatch the buffered accepted scans as one unroll program
        (remainders ride the per-scan program inside Slam2D's chunk
        driver) and run the key-pose bookkeeping they owe."""
        if not self._live_pend:
            return
        pend, self._live_pend = self._live_pend, []
        staged = [(p, m, o) for p, m, o, _, _ in pend]
        odoms = [od for _, _, _, od, _ in pend]
        u0 = self.slam._n_updates
        acc = self.slam.update_many_prepadded(staged, odoms,
                                              chunk=len(pend))
        assert len(acc) == len(pend), \
            "live gate diverged from Slam2D's motion gate"
        for j, (_, _, _, _, t) in enumerate(pend):
            self._scan_buf[u0 + j] = staged[j] + (t,)
            self._since_sync += 1
            if self._since_sync >= self.options.sync_updates:
                self._sync()

    def update_many_prepadded(self, staged, odoms, timestamps=None) -> list:
        """Chunked offline replay: the front end rides Slam2D's
        straight-line unroll programs in slices of ``sync_scans`` raw
        scans, with one key-gate sync (and its loop-closure batch) per
        slice. ``staged`` holds (points, mask, origin) padded arrays (host
        numpy preferred). Returns accepted scan indices."""
        S = self.options.sync_scans
        accepted = []
        for i in range(0, len(staged), S):
            sl = staged[i:i + S]
            od = list(odoms[i:i + S])
            u0 = self.slam._n_updates
            acc = self.slam.update_many_prepadded(sl, od)
            for j, a in enumerate(acc):
                t = timestamps[i + a] if timestamps is not None else 0.0
                self._scan_buf[u0 + j] = sl[a] + (t,)
                accepted.append(i + a)
            self._sync(keys_now=True)
        return accepted

    def _timed(self, name):
        import contextlib, time as _t
        st = self.stats

        @contextlib.contextmanager
        def cm():
            t0 = _t.perf_counter()
            try:
                yield
            finally:
                st[name] = st.get(name, 0.0) + (_t.perf_counter() - t0)
                st[name + "_n"] = st.get(name + "_n", 0) + 1
        return cm()

    # -- deferred key-pose sync ---------------------------------------------
    def _sync(self, drain: bool = False, keys_now: bool = False) -> None:
        """One sync round: harvest last round's verification results AND
        key-gate replays (both dispatched a round ago with async d2h
        copies — their device compute and transfers overlapped the
        front-end slice, so neither pull stalls), create the fired key
        poses, dispatch their loop-closure verification batch (async),
        dispatch this round's key-gate replay (async), and optimize when
        thresholds are met. A steady-state live sync therefore costs ZERO
        blocking round trips. ``drain=True`` additionally blocks until
        every in-flight key scan and verification is resolved (public
        reads / optimize entry points)."""
        self._since_sync = 0
        if self._jit_key_scan is None:
            self._build_kernels()
        with self._timed("process_pending"):
            self._process_pending()
        # 1. harvest key scans dispatched at the PREVIOUS sync
        new_queries = self._harvest_keyscans()
        # 2. dispatch this window's key-gate replay (async copy, no pull)
        n_new = self.slam._n_updates - self._k_synced
        if n_new > 0:
            if self._last_key_dev is None:
                # key pose 0: the first update's matched pose IS the prior
                # (graph_slam2d.cpp:196-198 first-key special case)
                self._last_key_dev = jnp.asarray(self._prior.se2_array(),
                                                 jnp.float32)
                q = self._create_key(0, self._prior)
                if q is not None:
                    new_queries.append(q)
            while n_new > 0:
                take = min(n_new, KEY_SCAN_S)
                with self._timed("key_scan"):
                    packed, self._last_key_dev = self._jit_key_scan(
                        self.slam._traj, jnp.int32(self._k_synced),
                        jnp.int32(take), self._last_key_dev)
                    if hasattr(packed, "copy_to_host_async"):
                        packed.copy_to_host_async()
                self._keyscan_pending.append((packed, self._k_synced, take))
                self._k_synced += take
                n_new -= take
        if drain or keys_now:
            # chunked replay: a pipelined harvest would delay key poses by
            # a WHOLE sync_scans slice — the transient front-end map moves
            # on and loop verification degrades to the coarse fallback
            # (measured: 11 -> 3 accepted loops). One blocking pull per
            # 32-scan slice is cheap; only the live path pipelines.
            new_queries += self._harvest_keyscans()
        if new_queries:
            with self._timed("close_loops"):
                self._dispatch_verification(new_queries)
        if drain:
            with self._timed("process_pending"):
                self._process_pending(drain=True)
        # optimize cadence (cpp:275-279)
        if self._factor_queue > 0 and (self._factor_queue > 5 or
                                       self.factordist > 15.0):
            with self._timed("optimize"):
                self._optimize()

    def _harvest_keyscans(self) -> list:
        """Pull every in-flight key-gate replay (dispatched a sync ago —
        async copies are done) and create its fired key poses. Returns
        the query ids due for loop-closure verification."""
        new_queries = []
        while self._keyscan_pending:
            packed, k_lo, take = self._keyscan_pending.pop(0)
            with self._timed("key_scan"):
                data = np.asarray(packed)
            for row in data[:int(data[-1, 0])]:
                q = self._create_key(int(row[0]),
                                     Pose2D.from_se2_array(row[1:5]))
                if q is not None:
                    new_queries.append(q)
            self._k_harvested = k_lo + take
            self._scan_buf = {k: v for k, v in self._scan_buf.items()
                              if k >= self._k_harvested}
        return new_queries

    def _create_key(self, k_idx: int, raw: Pose2D) -> Optional[int]:
        """Create a key pose for accepted update ``k_idx`` (matched pose
        ``raw`` in the slam frame). Returns the query id whose candidates
        are due for verification (cpp:209-232 + head-delay), or None."""
        opts = self.options
        corrected = self.correction + raw
        points, mask, origin, t = self._scan_buf[k_idx]
        keyid = len(self._key_poses)
        if keyid == 0:
            self._builder.add_prior(0, corrected.se2_array(),
                                    (0.01, 0.01, 0.01))
        else:
            prev = self._key_poses[-1]
            step = float(np.linalg.norm((prev.raw_pose - raw).xy()))
            self.accdist += step
            self.factordist += step
            between = prev.pose - corrected
            self._builder.add_between(keyid - 1, keyid, between.se2_array(),
                                      (0.25, 0.25, 0.15))
        self._key_poses.append(KeyPose(keyid, corrected, raw,
                                       np.asarray(points), np.asarray(mask),
                                       np.asarray(origin), t))
        if (keyid < opts.key_pose_head_delay or
                keyid < opts.ignore_n_chain_poses):
            return None
        return keyid - opts.key_pose_head_delay

    def _dispatch_verification(self, query_ids) -> None:
        """Candidate search + ONE async batched dual-hypothesis dispatch
        for all (query, candidate) pairs of this sync window. Inputs are
        snapshotted in the slam (raw) frame at dispatch time; results are
        harvested at the next sync (or drain), after their device compute
        overlapped the next front-end slice."""
        opts = self.options
        inv_corr = self.correction.inverse()
        rows = []   # (qid, cid, ref_pose_raw, cand_pose_raw), rank order
        for qid in query_ids:
            # adaptive radius (cpp:236-237)
            r = min(self.accdist, 100.0) / 100.0
            radius = (opts.loop_search_max_distance ** r *
                      opts.loop_search_min_distance ** (1.0 - r))
            cands = self._find_candidates(self._key_poses[qid].pose.xy(),
                                          radius, qid)
            ref_pose = inv_corr + self._key_poses[qid].pose
            for cid in cands:
                cand_pose = inv_corr + self._key_poses[cid].pose
                rows.append((qid, cid, ref_pose, cand_pose))
        if not rows:
            return
        for off in range(0, len(rows), 32):
            chunk = rows[off:off + 32]
            k = next(b for b in (8, 16, 32) if len(chunk) <= b)
            padded = (chunk + [chunk[0]] * k)[:k]
            cand_poses = np.stack([c[3].se2_array() for c in padded])
            hypos = np.stack([Pose2D(c[2].x(), c[2].y(),
                                     c[3].rotation()).se2_array()
                              for c in padded])
            pts = np.stack([self._key_poses[c[1]].points[:, :2]
                            for c in padded])
            msks = np.stack([self._key_poses[c[1]].mask for c in padded])
            packed_dev = self._jit_correlate_batch(
                self.slam.map,
                jnp.asarray(cand_poses, jnp.float32),
                jnp.asarray(hypos, jnp.float32),
                jnp.asarray(pts), jnp.asarray(msks))   # ASYNC — no pull
            if hasattr(packed_dev, "copy_to_host_async"):
                packed_dev.copy_to_host_async()
            self._pending.append({"kind": "verify", "dev": packed_dev,
                                  "rows": chunk})

    def _process_pending(self, drain: bool = False) -> None:
        """Harvest in-flight verification batches. Acceptance order per
        query is the reference's: fine(0), coarse(0) if fine(0) failed,
        fine(1), fine(2), ... (graph_slam2d.cpp:248-273 with the
        rank-0-only coarse fallback); at most one accepted factor per
        query (cpp:273). Rank-0 failures queue a batched coarse dispatch
        whose results resolve on the next harvest (immediately under
        ``drain``)."""
        n0 = len(self._pending)   # non-drain: only items dispatched BEFORE
        processed = 0             # this round (fresh coarse waits a round)
        while self._pending and (drain or processed < n0):
            item = self._pending.pop(0)
            processed += 1
            packed = np.asarray(item["dev"])         # one pull per batch
            if item["kind"] == "verify":
                per_q: dict = {}
                for i, row in enumerate(item["rows"]):
                    per_q.setdefault(row[0], []).append((i, row))
                for qid, entries in per_q.items():
                    results = [(row[1], packed[i, :4], float(packed[i, 4]),
                                row[2], row[3]) for i, row in entries]
                    self._resolve_query(qid, results)
                self._flush_coarse_jobs()
            else:   # coarse results
                for j, (qid, cid, refp, candp, remaining) in enumerate(
                        item["jobs"]):
                    state, err = packed[j, :4], float(packed[j, 4])
                    if err <= (self.options.loop_closure_scan_rmse * 2.0):
                        self._accept(qid, cid, state, refp)
                        continue
                    for cid2, st2, err2, refp2, _ in remaining:
                        if err2 <= self.options.loop_closure_scan_rmse:
                            self._accept(qid, cid2, st2, refp2)
                            break
        if drain and self._coarse_jobs:
            self._flush_coarse_jobs()
            self._process_pending(drain=True)

    def _resolve_query(self, qid, results) -> None:
        """results: [(cid, state, err, ref_raw, cand_raw)] in rank order."""
        if not results:
            return
        cid, state, err, refp, candp = results[0]
        if err <= self.options.loop_closure_scan_rmse:
            self._accept(qid, cid, state, refp)
            return
        # one more chance, closest candidate only (cpp:255-259): coarse
        # registration; ranks 1+ wait on its outcome (reference order)
        self._coarse_jobs.append((qid, cid, refp, candp, results[1:]))

    def _flush_coarse_jobs(self) -> None:
        if not self._coarse_jobs:
            return
        jobs = self._coarse_jobs
        self._coarse_jobs = []
        for off in range(0, len(jobs), 4):
            chunk = jobs[off:off + 4]
            padded = (chunk + [chunk[0]] * 4)[:4]
            ref_poses = np.stack([j[2].se2_array() for j in padded])
            ref_pts = np.stack([self._key_poses[j[0]].points[:, :2]
                                for j in padded])
            ref_msks = np.stack([self._key_poses[j[0]].mask
                                 for j in padded])
            cand_poses = np.stack([j[3].se2_array() for j in padded])
            pts = np.stack([self._key_poses[j[1]].points[:, :2]
                            for j in padded])
            msks = np.stack([self._key_poses[j[1]].mask for j in padded])
            packed_dev = self._jit_coarse_batch(
                self.slam.map, jnp.asarray(ref_poses, jnp.float32),
                jnp.asarray(ref_pts), jnp.asarray(ref_msks),
                jnp.asarray(cand_poses, jnp.float32), jnp.asarray(pts),
                jnp.asarray(msks))                   # ASYNC — no pull
            if hasattr(packed_dev, "copy_to_host_async"):
                packed_dev.copy_to_host_async()
            self._pending.append({"kind": "coarse", "dev": packed_dev,
                                  "jobs": chunk})

    def _accept(self, qid, cand_id, state, ref_pose) -> None:
        """Add the accepted loop factor (cpp:266-272).

        ``between = matched^-1 * ref`` (cpp:353 with Pose2D operator-):
        both poses live in the snapshot's slam (raw) frame, so the relative
        factor is correction-independent."""
        matched = Pose2D.from_se2_array(np.asarray(state))
        between = matched - ref_pose
        self._builder.add_between(cand_id, qid, between.se2_array(),
                                  (0.5, 0.5, 0.1), huber_k=0.1)
        self._links.append((cand_id, qid))
        self._factor_queue += 1
        self.factordist = 0.0

    # -- helpers -------------------------------------------------------------
    def _find_candidates(self, query_xy, radius, query_id):
        """nanoflann radius query equivalent (cpp:284-313): brute-force
        distances, excluding the most recent chain poses."""
        n_ignore = self.options.ignore_n_chain_poses
        limit = len(self._key_poses) - n_ignore
        if limit <= 0:
            return []
        xy = np.array([kp.pose.xy() for kp in self._key_poses[:limit]])
        d = np.linalg.norm(xy - np.asarray(query_xy), axis=1)
        order = np.argsort(d)
        sel = [int(i) for i in order if d[i] <= radius and i != query_id]
        return sel[:self.options.loop_max_candidates]

    def optimize_pose_graph(self) -> None:
        """Public optimize entry (cpp:394-430): flush pending key events
        and in-flight verifications, then solve unconditionally."""
        self._live_flush()
        self._sync(drain=True)
        self._optimize()

    def _optimize(self) -> None:
        n = len(self._key_poses)
        if n == 0:
            return
        graph = self._builder.finalize()
        n_pad = fg.GraphBuilder._bucket(n)
        nodes = np.tile(np.array([0, 0, 1, 0], np.float32), (n_pad, 1))
        for i, kp in enumerate(self._key_poses):
            nodes[i] = kp.pose.se2_array()
        active = np.zeros(n_pad, bool)
        active[:n] = True
        # _JIT_PGO: one compiled program per node bucket — fg.optimize
        # called eagerly pays a tunnel dispatch per op (~seconds per solve)
        out, info = _JIT_PGO(jnp.asarray(nodes), graph, jnp.asarray(active))
        out = np.asarray(out)
        if not np.isfinite(out[:n]).all():
            return
        for i in range(n):
            self._key_poses[i] = self._key_poses[i]._replace(
                pose=Pose2D.from_se2_array(out[i]))
        # correction rebase (cpp:416-425): C = B * A^-1; correction = C^-1.
        # The reference uses the LIVE slam pose as B, but it only ever
        # optimizes immediately after creating a key pose — where the live
        # pose IS the last key's raw pose. Ours may optimize a few scans
        # later (deferred sync), so the key's own raw pose is the faithful
        # anchor.
        A = self._key_poses[-1].pose
        B = self._key_poses[-1].raw_pose
        self.correction = A + B.inverse()   # A * B^-1
        self._factor_queue = 0
        self.accdist = 0.0
        self.factordist = 0.0

    # -- map regeneration (cpp:131-186) --------------------------------------
    def generate_occupancy_map(self, mesh=None) -> mapping.SlamMapState:
        """Re-rasterize all key-pose clouds at their optimized poses.

        Batch job, not a sequential loop: counts are order-independent, so
        all scans deposit at once (parallel/map_rebuild.py); pass a
        ``jax.sharding.Mesh`` to shard scans across devices (rasterize)
        and grid rows (EDT) — results are identical either way.
        """
        from ..parallel import map_rebuild

        self._live_flush()
        self._sync(drain=True)
        cfg = dataclasses.replace(self.slam.cfg,
                                  capacity=4 * self.slam.cfg.capacity)
        if not self._key_poses:
            return mapping.slam_map_init(cfg)
        poses = np.asarray([np.asarray(_se2(kp.pose)) for kp in
                            self._key_poses], np.float32)
        points = jnp.asarray(np.stack([kp.points for kp in
                                       self._key_poses]))
        masks = jnp.asarray(np.stack([kp.mask for kp in self._key_poses]))
        origins = jnp.asarray(np.stack([kp.origin for kp in
                                        self._key_poses]))
        org, h, w = map_rebuild.grid_bounds(cfg, cfg.geometry, poses)
        dense = map_rebuild.rebuild_dense(cfg, jnp.asarray(poses), points,
                                          masks, origins, org, h, w,
                                          mesh=mesh)
        return map_rebuild.dense_to_state(cfg, dense)

    def generate_coarse_distance_map(self, resolution: float = 0.1,
                                     l2_max: float = 5.0
                                     ) -> "tuple[dist_mod.DistanceMapState, dist_mod.DistanceConfig]":
        """Coarse DDM over all key-pose clouds (cpp:166-186).

        Rasterizes every key-pose cloud as obstacles on a dense grid, runs
        the exact EDT, and packs the result into a standalone pool-backed
        DistanceMapState (ready for Loc2D-style queries).
        """
        import jax.numpy as jnp
        from ..sdm import pool as pool_mod

        self._live_flush()
        self._sync(drain=True)
        geo = MapGeometry(resolution, 4, False)
        dcfg = dist_mod.DistanceConfig(geo, l2_max)
        all_pts = []
        for kp in self._key_poses:
            c, s = np.cos(kp.pose.rotation()), np.sin(kp.pose.rotation())
            R = np.array([[c, -s], [s, c]])
            pts = kp.points[kp.mask][:, :2] @ R.T + kp.pose.xy()
            all_pts.append(pts)
        state = dist_mod.distance_map_init(dcfg, capacity=4096)
        if not all_pts:
            return state, dcfg
        pts = np.concatenate(all_pts)
        cells = geo.np_w2m(pts)
        length = geo.patch_length
        r = dcfg.radius_cells
        lo = cells.min(0) - r - length
        hi = cells.max(0) + r + length
        lo = (lo >> geo.log2dim) << geo.log2dim          # patch align
        nx = int(np.ceil((hi[0] - lo[0]) / length)) + 1
        ny = int(np.ceil((hi[1] - lo[1]) / length)) + 1
        obst = np.zeros((ny * length, nx * length), bool)
        obst[cells[:, 1] - lo[1], cells[:, 0] - lo[0]] = True
        d2 = np.asarray(dist_mod.edt2d(jnp.asarray(obst), dcfg.max_sqdist, r))
        dist = np.sqrt(d2).astype(np.float32) * resolution
        # pack non-trivial patches into the pool
        keys, blocks_d, blocks_o = [], [], []
        for py in range(ny):
            for px in range(nx):
                sl = np.s_[py * length:(py + 1) * length,
                           px * length:(px + 1) * length]
                if (d2[sl] < dcfg.max_sqdist).any():
                    cell = lo + np.array([px * length, py * length])
                    keys.append(int(np.asarray(geo.m2p(jnp.asarray(cell)))))
                    blocks_d.append(dist[sl])
                    blocks_o.append(obst[sl])
        if keys:
            table, slots = pool_mod.table_insert(
                state.table, jnp.asarray(np.asarray(keys, np.int32)))
            darr = np.asarray(state.dist).copy()
            oarr = np.asarray(state.obstacle).copy()
            for s_, bd, bo in zip(np.asarray(slots), blocks_d, blocks_o):
                darr[int(s_)] = bd
                oarr[int(s_)] = bo
            state = dist_mod.DistanceMapState(table, jnp.asarray(oarr),
                                              jnp.asarray(darr))
        return state, dcfg


# One jitted program set per (mapping config, gate) — shared across driver
# instances. Fresh per-instance jax.jit wrappers re-trace and re-LOAD a
# byte-identical executable per instance: seconds each on the remote-TPU
# runtime (the same gotcha Loc2D/PF hit in r2), measured as part of the
# difference between the bare front end (~180-430 scans/s) and the full
# r3 pipeline before this fix (~12) in prof_graph.
@functools.lru_cache(maxsize=None)
def _make_graph_kernels(cfg, kd: float, ka: float):
        geo = cfg.geometry
        wp = cfg.window_patches
        max_dist = cfg.distance.max_dist

        def window_for(state, pose):
            org = win_mod.window_org(geo, geo.w2m(pose[:2]), wp)
            keys = win_mod.window_patch_keys(geo, org, wp)
            grid, _ = win_mod.gather_window(state.table, state.dist, keys,
                                            max_dist)
            return grid, org

        def rmse_window(grid, org, pts, msk, state):
            hits = lie.se2_apply(state, pts)
            cells = geo.w2m(hits)
            loc = cells - org
            h = grid.shape[0]
            ok = ((loc[:, 0] >= 0) & (loc[:, 0] < h) &
                  (loc[:, 1] >= 0) & (loc[:, 1] < h))
            d = jnp.where(ok, grid[jnp.clip(loc[:, 1], 0, h - 1),
                                   jnp.clip(loc[:, 0], 0, h - 1)],
                          jnp.float32(max_dist))
            d = d * msk.astype(jnp.float32)
            n = jnp.maximum(jnp.sum(msk), 1)
            return jnp.sqrt(jnp.sum(d * d) / n)

        one_iter = SolverOptions(max_iterations=1, strategy="gn",
                                 robust=HUBER_MATCH)
        full = SolverOptions(max_iterations=100, strategy="gn",
                             robust=HUBER_MATCH)

        def correlate(map_state, cand_pose, ref_xy_cand_rot, pts, msk):
            """graph_slam2d.cpp:315-355 dual-hypothesis verification."""
            g0, o0 = window_for(map_state, cand_pose)
            r0 = match.solve_window(g0, o0, geo, max_dist, pts, msk,
                                    cand_pose, one_iter)
            e0 = rmse_window(g0, o0, pts, msk, r0.state)
            g1, o1 = window_for(map_state, ref_xy_cand_rot)
            r1 = match.solve_window(g1, o1, geo, max_dist, pts, msk,
                                    ref_xy_cand_rot, one_iter)
            e1 = rmse_window(g1, o1, pts, msk, r1.state)

            take0 = e0 < e1
            init = jnp.where(take0, r0.state, r1.state)
            grid = jnp.where(take0, g0, g1)
            org = jnp.where(take0, o0, o1)
            res = match.solve_window(grid, org, geo, max_dist, pts, msk,
                                     init, full)
            err = rmse_window(grid, org, pts, msk, res.state)
            return res.state, err

        # All candidates of all sync-window key poses verify in ONE device
        # program (the reference loops host-side, graph_slam2d.cpp:248-273;
        # on the tunnel every dispatch + result pull costs ms — vmapping
        # the dual-hypothesis correlation over the candidate axis turns
        # up-to-K dispatches and K host syncs into one of each). Padded to
        # a fixed K so the program compiles once; states and errors come
        # back PACKED in one [K, 5] array (each device->host pull pays the
        # full ~30 ms tunnel round trip).
        def correlate_packed(map_state, cand_poses, hypos, pts, msks):
            states, errs = jax.vmap(correlate, in_axes=(None, 0, 0, 0, 0))(
                map_state, cand_poses, hypos, pts, msks)
            return jnp.concatenate([states, errs[:, None]], axis=1)

        jit_correlate_batch = jax.jit(correlate_packed)

        # ---- key-pose gate over the trajectory ring (cpp:199-207) ---------
        # The matched poses of the last `n` accepted scans are already in
        # the device trajectory ring; this program replays the reference's
        # slam-pose gate over them (sequential scan: the last-key register
        # evolves as keys fire) and packs all fired events + count into one
        # [S+1, 5] array: rows i<n_events = [update_idx, x, y, cos, sin],
        # last row [0] = n_events. The register round-trips on device.
        def key_scan(traj, k0, n, last_key):
            block = jax.lax.dynamic_slice(traj, (k0, jnp.int32(0)),
                                          (KEY_SCAN_S, 4))
            valid = jnp.arange(KEY_SCAN_S) < n

            def body(last, inp):
                pose, ok = inp
                rel = lie.se2_compose(lie.se2_inverse(last), pose)
                d2 = rel[0] * rel[0] + rel[1] * rel[1]
                ang = jnp.abs(jnp.arctan2(rel[3], rel[2]))
                fire = ok & ((d2 >= kd * kd) | (ang >= ka))
                last = jnp.where(fire, pose, last)
                return last, fire

            last_key, fires = jax.lax.scan(body, last_key, (block, valid))
            idx = jnp.nonzero(fires, size=KEY_SCAN_S,
                              fill_value=KEY_SCAN_S)[0]
            safe = jnp.minimum(idx, KEY_SCAN_S - 1)
            rows = jnp.concatenate(
                [(k0 + idx).astype(jnp.float32)[:, None],
                 block[safe]], axis=1)
            count = jnp.zeros((1, 5), jnp.float32).at[0, 0].set(
                jnp.sum(fires).astype(jnp.float32))
            return jnp.concatenate([rows, count], axis=0), last_key

        jit_key_scan = jax.jit(key_scan)

        # ---- coarse fallback: throwaway 0.25 m field (cpp:357-392) --------
        coarse_res = 0.25
        coarse_geo = MapGeometry(coarse_res, 5, False)
        coarse_l2 = 2.5
        coarse_r = int(math.ceil(coarse_l2 / coarse_res))
        side = 2 * int(math.ceil(
            (cfg.max_range + coarse_l2 + 2.0) / coarse_res))

        def coarse(map_state, ref_pose, ref_pts, ref_msk, cand_pose,
                   pts, msk):
            # rasterize ref cloud (world frame via ref_pose) as obstacles
            hits = lie.se2_apply(ref_pose, ref_pts)
            center = coarse_geo.w2m(ref_pose[:2])
            org = center - side // 2
            loc = coarse_geo.w2m(hits) - org
            ok = (ref_msk & (loc[:, 0] >= 0) & (loc[:, 0] < side) &
                  (loc[:, 1] >= 0) & (loc[:, 1] < side))
            obst = jnp.zeros((side, side), bool)
            obst = obst.at[jnp.clip(loc[:, 1], 0, side - 1),
                           jnp.clip(loc[:, 0], 0, side - 1)].max(ok)
            d2 = dist_mod.edt2d(obst, coarse_r * coarse_r, coarse_r)
            cgrid = jnp.sqrt(d2.astype(jnp.float32)) * coarse_res
            cmax = float(coarse_r * coarse_res)
            r0 = match.solve_window(cgrid, org, coarse_geo, cmax, pts, msk,
                                    cand_pose, full)
            # refine on the live map
            g1, o1 = window_for(map_state, r0.state)
            res = match.solve_window(g1, o1, geo, max_dist, pts, msk,
                                     r0.state, full)
            err = rmse_window(g1, o1, pts, msk, res.state)
            # packed [5] = state + err: one device->host pull (see above)
            return jnp.concatenate([res.state, err[None]])

        def coarse_packed(map_state, ref_poses, ref_pts, ref_msks,
                          cand_poses, ptss, msks):
            return jax.vmap(coarse,
                            in_axes=(None, 0, 0, 0, 0, 0, 0))(
                map_state, ref_poses, ref_pts, ref_msks, cand_poses,
                ptss, msks)

        return jit_correlate_batch, jit_key_scan, jax.jit(coarse_packed)


# fg.optimize is plain (un-jitted) JAX so bench_pgo can wrap it with its
# own sharding; called eagerly from the pipeline it pays a ~1-3 ms tunnel
# dispatch per op. ONE shared jit wrapper serves every GraphSlam2D (the
# bucketed node counts keep the compile-cache key set small).
_JIT_PGO = jax.jit(lambda nodes, graph, active: fg.optimize(nodes, graph,
                                                            active))

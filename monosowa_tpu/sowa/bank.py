"""Device-resident window aggregation: fit cars straight from the
per-mask point BANK that candidate extraction leaves on device.

The host path moves every candidate's points host-side (bitmap download +
unpack + per-mask gathers), tracks, concatenates clouds per car, and
re-uploads a padded batch — at full KITTI sizes that host work is the
pipeline's bottleneck (SURVEY.md §5.7).  Bank mode keeps per-point data on
the TPU end to end:

  device: extraction -> (F_rows, M, cap, 3) camera-frame point bank
  host:   tracking / moving classification / frame selection on candidate
          CENTERS only (tiny arrays; counts + truncation flags ride the
          extraction metadata)
  device: ONE jitted gather-from-bank -> ref-frame CarBatch -> conv fit

Per car the fit consumes ``n_slots`` observation slots of ``quota`` points
each, selected evenly over each observation's compacted points; a moving
car's single reference observation is spread across all slots with
disjoint offsets (slot j covers stride positions j*quota..(j+1)*quota of
the full range).  This replaces the host path's cap-10000-then-subsample
with a deterministic even subsample — the fit downsamples to ~2k points
either way.

Behavioral contracts mirrored from the reference:
* clever frame selection = standing_concatenate_lidar_clever
  (loader.py:783-810): keep_k closest untruncated-penalized frames;
* moving cars keep only reference-frame points (loader.py:756-771);
* standing cars below lidar_threshold_during_optim points are dropped
  (filtering.py:21-22); moving cars seen < 3 times are dropped
  (filtering.py:62-65).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.sowa.fitting import (CarBatch, FitConfig,
                                       estimate_angle_from_track,
                                       fit_cars_conv)
from monosowa_tpu.sowa.lomm import Track


class BankRef(NamedTuple):
    """A candidate's point payload in bank mode: WHERE its points live."""
    row: int        # bank row (frame dispatch order)
    mi: int         # mask slot within the row
    count: int      # compacted point count (<= cap)
    trunc: bool     # full mask touches the left/right image border


@partial(jax.jit, static_argnames=("mask_cap",))
def _arena_write(buf, chunk, row0, mask_cap):
    """Copy an extraction chunk (g, m<=mask_cap, cap, 3) into the arena at
    row ``row0`` (device scalar).  One program per distinct chunk shape."""
    m = chunk.shape[1]
    if m < mask_cap:
        chunk = jnp.pad(chunk, ((0, 0), (0, mask_cap - m), (0, 0), (0, 0)))
    return jax.lax.dynamic_update_slice(buf, chunk, (row0, 0, 0, 0))


class BankArena:
    """Fixed-capacity device-resident pool of extraction-chunk banks.

    label_frames_stream shares per-frame extractions across overlapping
    window groups; rebuilding each group's bank by concatenating whatever
    chunk set it happens to reference gives a DIFFERENT bank row count per
    group — and every distinct row count is a fresh jit signature for the
    fused fit+NMS program (multi-second lowering + compile per group even
    with a warm persistent cache; measured as the dominant steady-state
    cost on the remote tunnel).  The arena keeps ONE device buffer of
    ``n_blocks`` g-row blocks: chunks are copied in with a single
    dynamic_update_slice, BankRef rows are global arena rows (stable for
    a frame's whole lifetime), and the fit program always gathers from
    the same (R, M, cap, 3) shape.

    Blocks are freed when every frame id they carry has been evicted
    from the extraction cache; the buffer doubles (rows preserved) on
    overflow, so the fit signature changes at most O(log groups) times.
    """

    def __init__(self, block_rows: int, mask_cap: int, point_cap: int,
                 n_blocks: int):
        self.g = int(block_rows)
        self.mask_cap = int(mask_cap)
        self.cap = int(point_cap)
        self.n_blocks = max(1, int(n_blocks))
        self.buf = jnp.zeros(
            (self.n_blocks * self.g, self.mask_cap, self.cap, 3),
            jnp.float32)
        self.free = list(range(self.n_blocks))
        self.live: dict = {}        # block -> set of fids
        self.fid_block: dict = {}   # fid -> block

    def _grow(self) -> None:
        old_rows = self.n_blocks * self.g
        self.free.extend(range(self.n_blocks, 2 * self.n_blocks))
        self.n_blocks *= 2
        buf = jnp.zeros((self.n_blocks * self.g, self.mask_cap, self.cap, 3),
                        jnp.float32)
        self.buf = jax.lax.dynamic_update_slice(buf, self.buf, (0, 0, 0, 0))
        del old_rows

    def write(self, chunk_bank, fids: Sequence) -> int:
        """Copy one chunk into a free block; returns the block's row0.
        ``fids`` are the frame ids whose rows live in this chunk (row
        row0+k belongs to fids[k])."""
        if not self.free:
            self._grow()
        blk = min(self.free)
        self.free.remove(blk)
        row0 = blk * self.g
        self.buf = _arena_write(self.buf, chunk_bank,
                                jnp.int32(row0), self.mask_cap)
        self.live[blk] = set(fids)
        for f in fids:
            self.fid_block[f] = blk
        return row0

    def release(self, fid) -> None:
        """Mark ``fid``'s arena row dead; frees its block when the whole
        chunk is dead."""
        blk = self.fid_block.pop(fid, None)
        if blk is None:
            return
        s = self.live[blk]
        s.discard(fid)
        if not s:
            del self.live[blk]
            self.free.append(blk)


def transform_candidates_bank(cand: dict, t_cur_to_ref: np.ndarray,
                              thr: int) -> Optional[dict]:
    """Window transform for bank candidates: centers move, BankRefs don't.
    Applies the ref-frame gates (center in front; enough points)."""
    if cand is None:
        return None
    rot = np.asarray(t_cur_to_ref[:3, :3], np.float32)
    tr = np.asarray(t_cur_to_ref[:3, 3], np.float32)
    locs, refs, masks = [], [], []
    for center, ref, mask in zip(cand["locations"], cand["points"],
                                 cand["masks"]):
        c = rot @ np.asarray(center) + tr
        if c[2] <= 0.0 or ref.count < thr:
            continue
        locs.append(c)
        refs.append(ref)
        masks.append(mask)
    if not locs:
        return {"locations": np.zeros((0, 3), np.float32), "points": [],
                "masks": []}
    return {"locations": np.stack(locs), "points": refs, "masks": masks}


@dataclasses.dataclass
class CarSlots:
    """Per-car slot spec feeding fit_from_bank."""
    fm: np.ndarray        # (S, 2) int32 bank (row, mask)
    rt: np.ndarray        # (S, 3, 4) per-slot cur->ref rotation|translation
    off: np.ndarray       # (S,) int32 position offset
    denom: np.ndarray     # (S,) int32 stride denominator
    cnt: np.ndarray       # (S,) int32 obs point count
    valid: np.ndarray     # (S,) bool
    npts: int             # aggregated point count (for NMS priority)


def select_car_slots(tracks: Sequence[Track], transforms: np.ndarray,
                     window: Sequence[int], keep_k: int, min_points: int,
                     n_slots: int, quota: int,
                     use_pseudo_lidar: bool = True,
                     max_distance: float = 75.0):
    """Aggregation selection on centers/counts only.  Returns
    (kept_tracks, ref_masks, [CarSlots]).

    The pseudo-lidar distant-car filter (loader.py:3944-3954) is applied
    on the median of the selected observations' ref-frame centers (the
    aggregated cloud itself never reaches the host in bank mode)."""
    base = window[0]
    inv = np.linalg.inv(np.asarray(transforms))
    kept, masks_out, slots_out = [], [], []
    for t in tracks:
        ref_mask = None
        for fr, mk in zip(t.frames, t.masks):
            if fr == 0:
                ref_mask = mk
                break
        if t.moving:
            if 0 not in t.frames or len(t.frames) < 3:
                continue
        elif ref_mask is None:      # hidden standing (pseudo-lidar branch)
            continue

        fm = np.zeros((n_slots, 2), np.int32)
        rt = np.zeros((n_slots, 3, 4), np.float32)
        off = np.zeros(n_slots, np.int32)
        denom = np.full(n_slots, max(quota, 1), np.int32)
        cnt = np.zeros(n_slots, np.int32)
        valid = np.zeros(n_slots, bool)

        if t.moving:
            k = t.frames.index(0)
            ref: BankRef = t.points[k]
            for j in range(n_slots):
                fm[j] = (ref.row, ref.mi)
                rt[j] = np.asarray(transforms[0 - base][:3, :4], np.float32)
                off[j] = j * quota
                denom[j] = n_slots * quota
                cnt[j] = ref.count
                valid[j] = True
            npts = min(ref.count, n_slots * quota)
        else:
            dists = []
            for fr, loc, ref in zip(t.frames, t.locations, t.points):
                ti = inv[fr - base]
                local = ti[:3, :3] @ np.asarray(loc[:3]) + ti[:3, 3]
                d = float(np.hypot(local[0], local[2]))
                if ref.trunc:
                    d += 5.0
                dists.append(d)
            order = np.argsort(np.asarray(dists))[:min(keep_k, n_slots)]
            total = 0
            for j, oi in enumerate(order):
                ref = t.points[oi]
                fm[j] = (ref.row, ref.mi)
                rt[j] = np.asarray(
                    transforms[t.frames[oi] - base][:3, :4], np.float32)
                cnt[j] = ref.count
                valid[j] = True
                total += ref.count
            if total < min_points:
                continue
            npts = total
        if use_pseudo_lidar:
            loc = np.median(np.stack([np.asarray(v[:3])
                                      for v in t.locations]), axis=0)
            if np.linalg.norm(loc) >= max_distance:
                continue
        kept.append(t)
        masks_out.append(ref_mask)
        slots_out.append(CarSlots(fm, rt, off, denom, cnt, valid, npts))
    return kept, masks_out, slots_out


def merge_slots(a: CarSlots, b: CarSlots) -> CarSlots:
    """NMS-merge: the union of two cars' observation slots, truncated to
    the slot budget by keeping the highest-count observations (the
    reference concatenates both full clouds before the re-fit,
    loader.py:2785-2789 — the fit consumes a ~2k subsample either way)."""
    n_slots = a.fm.shape[0]
    rows = []
    for s in (a, b):
        for j in range(n_slots):
            if s.valid[j]:
                rows.append((int(s.cnt[j]), s.fm[j], s.rt[j], s.off[j],
                             s.denom[j], s.cnt[j]))
    rows.sort(key=lambda r: -r[0])
    fm = np.zeros((n_slots, 2), np.int32)
    rt = np.zeros((n_slots, 3, 4), np.float32)
    off = np.zeros(n_slots, np.int32)
    denom = np.ones(n_slots, np.int32)
    cnt = np.zeros(n_slots, np.int32)
    valid = np.zeros(n_slots, bool)
    for j, (_, f, r, o, d, c) in enumerate(rows[:n_slots]):
        fm[j], rt[j], off[j], denom[j], cnt[j] = f, r, o, d, c
        valid[j] = True
    return CarSlots(fm, rt, off, denom, cnt, valid, a.npts + b.npts)


@partial(jax.jit, static_argnames=("quota", "cfg", "spec"))
def _fit_from_bank(bank, slot_fm, slot_rt, slot_off, slot_denom, slot_cnt,
                   slot_valid, moving, theta_est, theta_valid, car_valid,
                   template, occ_k, memb_k, spec, cfg: FitConfig,
                   quota: int):
    """bank (F, M, cap, 3); slot_* (B, S, ...) -> BatchFitResult.

    Per (car, slot): select ``quota`` evenly-spaced compacted points
    (strided when the observation has >= denom points, prefix otherwise),
    transform cur->ref, and feed the (B, S*quota) padded batch to the
    conv-grid fitter."""
    cap = bank.shape[2]

    def gather_car(fm, rt, off, denom, cnt, valid):
        i = jax.lax.broadcasted_iota(jnp.int32, (fm.shape[0], quota), 1)
        pos = off[:, None] + i
        strided = (cnt >= denom)[:, None]
        idx = jnp.where(strided, (pos * cnt[:, None]) //
                        jnp.maximum(denom, 1)[:, None], pos)
        pvalid = valid[:, None] & (pos < cnt[:, None])
        obs = bank[fm[:, 0], fm[:, 1]]                     # (S, cap, 3)
        sel = jnp.take_along_axis(
            obs, jnp.clip(idx, 0, cap - 1)[..., None], axis=1)  # (S, q, 3)
        ref = jnp.einsum("sij,sqj->sqi", rt[:, :, :3], sel) + \
            rt[:, None, :, 3]
        return (ref.reshape(-1, 3).astype(jnp.float32),
                pvalid.reshape(-1))

    pts, mask = jax.vmap(gather_car)(slot_fm, slot_rt, slot_off,
                                     slot_denom, slot_cnt, slot_valid)
    batch = CarBatch(points=pts, mask=mask & car_valid[:, None],
                     moving=moving, theta_est=theta_est,
                     theta_valid=theta_valid, car_valid=car_valid)
    return fit_cars_conv(batch, template, occ_k, memb_k, spec, cfg)


@partial(jax.jit, static_argnames=("quota", "cfg", "spec", "n_frames",
                                   "max_cars", "refit_cap"))
def _fit_nms_from_bank(bank, slot_fm, slot_rt, slot_off, slot_denom,
                       slot_cnt, slot_valid, moving, theta_est, theta_valid,
                       car_valid, car_frame, car_slot, npts, lwh, nms_iou,
                       template, occ_k, memb_k, spec, cfg: FitConfig,
                       quota: int, n_frames: int, max_cars: int,
                       refit_cap: int = 0):
    """Fused fit + per-frame 3D NMS (+ optional NMS-merge re-fit): ONE
    device program, ONE flat f32 result
    [fit (4, B) | keep/merged (2, n_frames, max_cars)
     | n_targets (1) | refit sel/x/y/z/theta (5, refit_cap)] —
    each blocking host pull costs a full tunnel round trip, so the
    pipeline pays exactly one for the whole window group.

    With ``refit_cap > 0`` the NMS-merge re-optimization (the reference's
    merge-losers-then-reoptimize loop, loader.py:2785-2789 +
    main_class.py:227-235) also runs in-program: for each kept car that
    suppressed at least one other, the union of the group's observation
    slots is rebuilt exactly as ``merge_slots`` does (count-desc order,
    winner's slots first on ties, truncated to the slot budget) and the
    first ``refit_cap`` such targets (batch order) are re-fit.  The
    emitted ``n_targets`` lets the host fall back to a separate re-fit
    call for the overflow (rare)."""
    from monosowa_tpu.ops import box3d

    res = _fit_from_bank(bank, slot_fm, slot_rt, slot_off, slot_denom,
                         slot_cnt, slot_valid, moving, theta_est,
                         theta_valid, car_valid, template, occ_k, memb_k,
                         spec, cfg, quota)
    centers = jnp.stack([res.x, res.y, res.z], -1)          # (B, 3)
    # padded batch rows scatter out of bounds -> dropped (jnp .at default)
    slot_scatter = jnp.where(car_valid, car_slot, max_cars)
    c_f = jnp.zeros((n_frames, max_cars, 3), jnp.float32) \
        .at[car_frame, slot_scatter].set(centers)
    t_f = jnp.zeros((n_frames, max_cars), jnp.float32) \
        .at[car_frame, slot_scatter].set(res.theta)
    np_f = jnp.zeros((n_frames, max_cars), jnp.float32) \
        .at[car_frame, slot_scatter].set(npts)
    v_f = jnp.zeros((n_frames, max_cars), bool) \
        .at[car_frame, slot_scatter].set(car_valid)
    lwh_f = jnp.broadcast_to(lwh, (n_frames, max_cars, 3))
    keep_f, merged_f = jax.vmap(box3d.nms_3d,
                                in_axes=(0, 0, 0, 0, 0, None))(
        c_f, lwh_f, t_f, np_f, v_f, nms_iou)
    fit_pack = jnp.stack([res.x, res.y, res.z, res.theta]).reshape(-1)
    nms_pack = jnp.stack([keep_f.astype(jnp.float32),
                          merged_f.astype(jnp.float32)]).reshape(-1)
    if not refit_cap:
        return jnp.concatenate([fit_pack, nms_pack])

    b, s = slot_fm.shape[0], slot_fm.shape[1]
    bidx = jnp.arange(b, dtype=jnp.int32)
    slot_clip = jnp.minimum(car_slot, max_cars - 1)
    # frame-slot -> batch index (padded rows scatter out of bounds)
    idx_f = jnp.full((n_frames, max_cars), b, jnp.int32) \
        .at[car_frame, slot_scatter].set(bidx)
    keep_b = keep_f[car_frame, slot_clip] & car_valid
    win_b = idx_f[car_frame, merged_f[car_frame, slot_clip]]   # may be b
    keep_pad = jnp.concatenate([keep_b, jnp.zeros(1, bool)])
    # a loser contributes iff its winner survived (pipeline's
    # keep_i[merged_i[i]] gate)
    contrib = car_valid & ~keep_b & (win_b < b) & keep_pad[win_b]
    owns = (win_b[None, :] == bidx[:, None]) & contrib[None, :]  # (B, B)
    target = car_valid & keep_b & jnp.any(owns, axis=1)

    # merged slot union per target, exactly merge_slots' stable
    # count-descending order: winner's own slots first, then losers in
    # ascending batch order
    member = owns | (bidx[None, :] == bidx[:, None])
    i_idx = jnp.repeat(bidx, s)                  # (B*S,) owning car
    j_idx = jnp.tile(jnp.arange(s, dtype=jnp.int32), b)
    rank = jnp.where(i_idx[None, :] == bidx[:, None], j_idx[None, :],
                     s * (i_idx[None, :] + 1) + j_idx[None, :])
    kk = b * s + s + 2
    m_flat = member[:, i_idx] & slot_valid.reshape(-1)[None, :]
    score = jnp.where(m_flat,
                      slot_cnt.reshape(-1)[None, :] * kk - rank, -1)
    top_score, top_idx = jax.lax.top_k(score, s)         # (B, S)
    m_valid = top_score >= 0
    m_fm = slot_fm.reshape(-1, 2)[top_idx]
    m_rt = slot_rt.reshape(-1, 3, 4)[top_idx]
    m_off = slot_off.reshape(-1)[top_idx]
    m_denom = slot_denom.reshape(-1)[top_idx]
    m_cnt = slot_cnt.reshape(-1)[top_idx]

    # first refit_cap targets in batch (= frame-major) order
    tsel = jnp.sort(jnp.where(target, bidx, b))[:refit_cap]
    rvalid = tsel < b
    rg = jnp.clip(tsel, 0, b - 1)
    rres = _fit_from_bank(
        bank, m_fm[rg], m_rt[rg], m_off[rg], m_denom[rg], m_cnt[rg],
        m_valid[rg] & rvalid[:, None], moving[rg], theta_est[rg],
        theta_valid[rg], rvalid, template, occ_k, memb_k, spec, cfg, quota)
    refit_pack = jnp.stack([
        jnp.where(rvalid, tsel, -1).astype(jnp.float32),
        rres.x, rres.y, rres.z, rres.theta]).reshape(-1)
    n_targets = jnp.sum(target).astype(jnp.float32)[None]
    return jnp.concatenate([fit_pack, nms_pack, n_targets, refit_pack])


def fit_and_nms_slots(bank, slots, tracks, windows, owners, n_frames,
                      max_cars, lwh, nms_iou, template, occ_k, memb_k,
                      spec, cfg: FitConfig, n_slots: int, quota: int,
                      bucket: int = 8, angle_min_dist: float = 3.0,
                      refit_cap: int = 0):
    """Host wrapper: stack slot specs + frame ownership, run the fused
    program, split the single pulled array.

    Returns (centers (B,3), thetas (B,), {frame: (keep, merged)},
    n_targets, {batch idx: (center, theta)}): the last two report the
    in-program NMS-merge re-fits when ``refit_cap > 0`` (n_targets >
    refit_cap means the overflow targets still need a host-side re-fit;
    with refit_cap == 0 they are (0, {}) and the host re-fits all)."""
    b = len(slots)
    bb = -(-max(b, 1) // bucket) * bucket
    fm = np.zeros((bb, n_slots, 2), np.int32)
    rt = np.zeros((bb, n_slots, 3, 4), np.float32)
    off = np.zeros((bb, n_slots), np.int32)
    denom = np.ones((bb, n_slots), np.int32)
    cnt = np.zeros((bb, n_slots), np.int32)
    valid = np.zeros((bb, n_slots), bool)
    moving = np.zeros(bb, bool)
    theta_est = np.zeros(bb, np.float32)
    theta_valid = np.zeros(bb, bool)
    car_valid = np.zeros(bb, bool)
    car_frame = np.zeros(bb, np.int32)
    car_slot = np.zeros(bb, np.int32)
    npts = np.zeros(bb, np.float32)
    slot_counter: dict = {}
    for i, (s, t, win, fi) in enumerate(zip(slots, tracks, windows, owners)):
        fm[i], rt[i], off[i], denom[i], cnt[i], valid[i] = \
            s.fm, s.rt, s.off, s.denom, s.cnt, s.valid
        car_valid[i] = True
        car_frame[i] = fi
        car_slot[i] = slot_counter.get(fi, 0)
        slot_counter[fi] = car_slot[i] + 1
        npts[i] = s.npts
        moving[i] = t.moving
        if t.moving:
            locs, lvalid = t.location_array(win)
            try:
                ref_idx = list(win).index(0)
            except ValueError:
                ref_idx = 0
            ang = estimate_angle_from_track(locs, lvalid, ref_idx,
                                            min_dist=angle_min_dist)
            if ang is not None:
                theta_est[i] = ang
                theta_valid[i] = True
    fp = -(-max(n_frames, 1) // 8) * 8      # frame-count compile bucket
    out = np.asarray(_fit_nms_from_bank(
        bank, jnp.asarray(fm), jnp.asarray(rt), jnp.asarray(off),
        jnp.asarray(denom), jnp.asarray(cnt), jnp.asarray(valid),
        jnp.asarray(moving), jnp.asarray(theta_est),
        jnp.asarray(theta_valid), jnp.asarray(car_valid),
        jnp.asarray(car_frame), jnp.asarray(car_slot), jnp.asarray(npts),
        jnp.asarray(lwh, jnp.float32), jnp.float32(nms_iou),
        template, occ_k, memb_k, spec, cfg, quota, fp, max_cars,
        refit_cap))
    fit = out[:4 * bb].reshape(4, bb)
    nms_end = 4 * bb + 2 * fp * max_cars
    nms = out[4 * bb:nms_end].reshape(2, fp, max_cars)
    nms_by_frame = {fi: (nms[0, fi] > 0.5, nms[1, fi].astype(np.int64))
                    for fi in range(fp)}
    if not refit_cap:
        return fit[:3].T, fit[3], nms_by_frame, 0, {}
    n_targets = int(out[nms_end])
    rp = out[nms_end + 1:].reshape(5, refit_cap)
    refits = {int(rp[0, r]): (rp[1:4, r], float(rp[4, r]))
              for r in range(refit_cap) if rp[0, r] >= 0}
    return fit[:3].T, fit[3], nms_by_frame, n_targets, refits


def fit_slots(bank, slots: Sequence[CarSlots],
              tracks: Sequence[Track],
              windows: Sequence[Sequence[int]],
              template, occ_k, memb_k, spec, cfg: FitConfig,
              n_slots: int, quota: int, bucket: int = 8,
              angle_min_dist: float = 3.0):
    """Stack per-car slot specs (bucketed batch), compute trajectory
    angles, and run the device gather+fit.  Returns BatchFitResult."""
    b = len(slots)
    bb = -(-max(b, 1) // bucket) * bucket
    fm = np.zeros((bb, n_slots, 2), np.int32)
    rt = np.zeros((bb, n_slots, 3, 4), np.float32)
    off = np.zeros((bb, n_slots), np.int32)
    denom = np.ones((bb, n_slots), np.int32)
    cnt = np.zeros((bb, n_slots), np.int32)
    valid = np.zeros((bb, n_slots), bool)
    moving = np.zeros(bb, bool)
    theta_est = np.zeros(bb, np.float32)
    theta_valid = np.zeros(bb, bool)
    car_valid = np.zeros(bb, bool)
    for i, (s, t, win) in enumerate(zip(slots, tracks, windows)):
        fm[i], rt[i], off[i], denom[i], cnt[i], valid[i] = \
            s.fm, s.rt, s.off, s.denom, s.cnt, s.valid
        car_valid[i] = True
        moving[i] = t.moving
        if t.moving:
            locs, lvalid = t.location_array(win)
            try:
                ref_idx = list(win).index(0)
            except ValueError:
                ref_idx = 0
            ang = estimate_angle_from_track(locs, lvalid, ref_idx,
                                            min_dist=angle_min_dist)
            if ang is not None:
                theta_est[i] = ang
                theta_valid[i] = True
    return _fit_from_bank(
        bank, jnp.asarray(fm), jnp.asarray(rt), jnp.asarray(off),
        jnp.asarray(denom), jnp.asarray(cnt), jnp.asarray(valid),
        jnp.asarray(moving), jnp.asarray(theta_est),
        jnp.asarray(theta_valid), jnp.asarray(car_valid),
        template, occ_k, memb_k, spec, cfg, quota)

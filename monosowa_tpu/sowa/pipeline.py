"""Per-frame pseudo-label driver: candidates -> tracking -> classification
-> aggregation -> batched TPU fitting -> 3D NMS + merge/re-fit -> writer.

Behavioral contract (pseudo_label_generator/3d/scripts/main_class.py:152-270,
``main_kitti`` optimization path): per reference frame, aggregate the
+-nscans window, fit every car with the TFL grid search, run 3D NMS with
IoU > 0.1 merging the loser's points into the winner and re-optimizing the
winner (:227-235), then write the KITTI label txt (output.py:12-91), with
skip-if-output-exists resumability (:180-184).

TPU design: all cars of a frame are fitted in ONE vmapped fit_cars call;
the merge/re-fit pass is a second (smaller) batched call.  The host side
only does data marshaling (arrays-not-objects, SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.kittiio.labels import write_pseudo_label_file
from monosowa_tpu.ops import box3d, tfl
from monosowa_tpu.sowa import aggregation, candidates, lomm
from monosowa_tpu.sowa import pedestrians as pedestrians_mod
from monosowa_tpu.sowa.fitting import (CarBatch, FitConfig, fit_cars_conv,
                                       make_conv_kernels)
from monosowa_tpu.sowa.templates import TemplateBank


@dataclasses.dataclass
class PipelineConfig:
    nscans_before: int = 30
    nscans_after: int = 30
    max_cars: int = 32
    max_points: int = 2048
    # batched-fit padding granularity: car batches are padded UP to a
    # multiple of this so repeated label_frames calls reuse compiled
    # programs; every padded row does full grid-fit work, so CPU-bound
    # tests shrink it while TPU production keeps 8+
    fit_bucket: int = 8
    min_standing_points: int = 1000
    keep_k_frames: int = 10
    nms_iou: float = 0.1
    dist_threshold_tracking: float = 10.0
    moving_method: str = "both5"
    fit: FitConfig = dataclasses.field(default_factory=FitConfig)
    candidate: candidates.CandidateConfig = dataclasses.field(
        default_factory=candidates.CandidateConfig)
    template_dims_lwh: tuple = (3.88, 1.63, 1.526)
    skip_non_visible: bool = True
    # real-LiDAR branch (frames_creation.use_pseudo_lidar: False): points
    # come from velodyne scans (kittiio.velodyne), the 75 m pseudo-lidar
    # gates are off, and hidden standing cars are filtered against the
    # live reference scan (aggregation.hidden_standing_keep_real; the
    # reference's shipped filter is a no-op — strict_hidden_standing=True
    # enables the evidently intended range check)
    use_pseudo_lidar: bool = True
    strict_hidden_standing: bool = False
    # frames_creation.use_clever_aggregation: keep-k-closest frame
    # selection (True, shipped default) vs concat-every-observation
    use_clever_aggregation: bool = True
    # frames_creation.extract_pedestrians (output.py:141): person-class
    # masks -> Pedestrian label rows (sowa/pedestrians.py)
    extract_pedestrians: bool = False
    pedestrian: "pedestrians_mod.PedestrianConfig" = dataclasses.field(
        default_factory=lambda: pedestrians_mod.PedestrianConfig())
    # device-resident window aggregation (sowa/bank.py): when jobs supply
    # per-frame depth maps, keep every candidate's points ON DEVICE as a
    # compacted bank and fit straight from it — the host only tracks
    # candidate centers.  Slot geometry: n_slots observations x
    # (max_points // n_slots) evenly-subsampled points each.
    device_bank: bool = True
    bank_slots: int = 10
    # NMS-merge re-fit slots carried INSIDE the fused bank program (one
    # round trip for fit+NMS+re-fit); windows with more merge targets than
    # this fall back to one extra device call for the overflow
    bank_refit_cap: int = 8
    # optional stages (reference flags in parentheses)
    use_ensemble_filter: bool = False   # frames_creation.use_hdbscan
    use_scale_detector: bool = False    # scale_detector.use_scale_detector
    use_bbox_reducer: bool = True       # scale_detector.use_bbox_reducer
    scale_bbox_scale: float = 1.5       # scale_detector.bbox_scale
    use_dimensions_estimation: bool = False
    # optimization.use_dimensions_estimation_during_optim
    # optimization.robust_optimization (config.yaml:68, default False):
    # dims-estimator yaw first, then translation-only grid
    # (optimize_car_robust / optimize_loc_only, optimizer.py:27-44,114-155)
    use_robust_optimization: bool = False
    # persist fitted cars for use_add_data detector training (the
    # reference's optimized_cars/ blobs, main_class.py:780-816)
    cars_cache_dir: Optional[str] = None
    # directory with the 4 car CAD meshes (fiat2/passat2/suv/minivan.gltf);
    # when set the template bank is built from them exactly like the
    # reference (loader.py:3465-3840) instead of the procedural profiles
    template_mesh_dir: Optional[str] = None


# sentinel marking a frame whose device extraction is dispatched but not
# yet collected (see _label_frames_staged / label_frames_stream)
_EXT_PENDING = object()


class PseudoLabeler:
    """Holds the template bank + fields; labels one reference frame at a
    time from per-frame point/mask/transform accessors."""

    def __init__(self, cfg: PipelineConfig = PipelineConfig(),
                 bank: Optional[TemplateBank] = None):
        if cfg.candidate.use_pseudo_lidar != cfg.use_pseudo_lidar:
            cfg = dataclasses.replace(cfg, candidate=dataclasses.replace(
                cfg.candidate, use_pseudo_lidar=cfg.use_pseudo_lidar))
        self.cfg = cfg
        if bank is None:
            bank = (TemplateBank.from_gltf(cfg.template_mesh_dir)
                    if cfg.template_mesh_dir else TemplateBank.default())
        self.bank = bank
        self.template = jnp.asarray(self.bank.points[0])
        # conv-grid kernels: the MXU fitting path (ops/tfl.py ConvGridSpec)
        self.conv_spec, self.occ_kernels, self.memb_kernels = \
            make_conv_kernels(self.bank.points[0], cfg.fit)
        # cross-group device-extraction cache (bank mode): fid -> chunk
        # refs + metadata; label_frames_stream evicts finished fids, plain
        # label_frames clears it per call
        self._ext_cache = None

    def evict_extractions(self, keep_fids=None) -> None:
        """Drop cached per-frame extractions and release their arena rows
        (a block frees once its whole chunk is dead).  keep_fids=None
        clears every entry but KEEPS the arena buffer, so repeated
        label_frames calls reuse the same fit-program signature."""
        if self._ext_cache is None:
            return
        cands = self._ext_cache["cands"]
        arena = self._ext_cache.get("arena")
        drop = (list(cands) if keep_fids is None
                else [f for f in cands if f not in keep_fids])
        for fid in drop:
            del cands[fid]
            if arena is not None:
                arena.release(fid)

    # ------------------------------------------------------------------
    def label_frame(self, window_frames: Sequence[int], ref_offset_index: int,
                    get_points: Callable[[int], Optional[np.ndarray]],
                    get_masks: Callable[[int], Optional[list]],
                    transforms: np.ndarray, p2: np.ndarray,
                    img_hw, ped_masks: Optional[list] = None) -> List[dict]:
        """window_frames: window-relative offsets (0 = reference);
        get_points/get_masks take the window index; transforms: (W, 4, 4)
        T_cur_to_ref.  Returns car dicts ready for the label writer;
        ``ped_masks`` (person-class reference-frame masks) append
        Pedestrian rows when extract_pedestrians is on."""
        cfg = self.cfg

        # the real-LiDAR scale branch re-gathers from the live scans
        # (scale_detector.py:14-104) — keep them only when that path is on
        keep_scans = cfg.use_scale_detector and not cfg.use_pseudo_lidar
        window_scans = [] if keep_scans else None

        cands = []
        for k in range(len(window_frames)):
            pts = get_points(k)
            masks = get_masks(k)
            if keep_scans:
                window_scans.append(pts)
            if pts is None or masks is None or len(masks) == 0:
                cands.append(None)
                continue
            cands.append(candidates.extract_candidates(
                pts, p2, img_hw, masks, transforms[k], cfg.candidate))

        tracks = lomm.greedy_track(cands, window_frames,
                                   cfg.dist_threshold_tracking)
        lomm.classify_all(tracks, method=cfg.moving_method)
        kept, points, ref_masks = aggregation.aggregate_tracks(
            tracks, transforms, window_frames, cfg.keep_k_frames,
            cfg.min_standing_points,
            use_pseudo_lidar=cfg.use_pseudo_lidar,
            max_distance=cfg.candidate.max_distance_pseudo_lidar,
            ref_scan=self._ref_scan(window_frames, get_points),
            strict_hidden=cfg.strict_hidden_standing,
            clever=cfg.use_clever_aggregation)
        peds = self.pedestrian_labels(window_frames, get_points, p2, img_hw,
                                      ped_masks)
        if not kept:
            return peds

        return self.label_from_cars(
            kept, points, ref_masks, window_frames,
            scale_scan_source=((window_scans, transforms)
                               if keep_scans else None)) + peds

    def pedestrian_labels(self, window_frames, get_points, p2, img_hw,
                          ped_masks) -> List[dict]:
        """Pedestrian rows from the reference frame's points + person masks
        (extract_pedestrians branch, sowa/pedestrians.py)."""
        if not self.cfg.extract_pedestrians or not ped_masks:
            return []
        try:
            k = list(window_frames).index(0)
        except ValueError:
            return []
        pts = get_points(k)
        if pts is None:
            return []
        return pedestrians_mod.extract_pedestrian_labels(
            pts, p2, img_hw, ped_masks, self.cfg.pedestrian)

    def _ref_scan(self, window_frames, get_points):
        """The reference frame's cam-frame scan, only when the real-lidar
        strict hidden filter needs it (one extra accessor call)."""
        if self.cfg.use_pseudo_lidar or not self.cfg.strict_hidden_standing:
            return None
        try:
            k = list(window_frames).index(0)
        except ValueError:
            return None
        return get_points(k)

    # ------------------------------------------------------------------
    def label_from_cars(self, kept, points, ref_masks,
                        window_frames, precomputed=None,
                        precomputed_nms=None,
                        precomputed_refit=None,
                        npts_override=None,
                        scale_scan_source=None) -> List[dict]:
        """Fit + NMS + assemble from aggregated per-car point clouds —
        the `optimization` stage when the `frames_aggregation` cache is
        already on disk (cache.load_merged_cars).

        ``precomputed``: optional (center (N,3), theta (N,)) from an
        external batched fit (label_frames) — skips the per-frame fit.
        ``precomputed_nms``: optional (keep (max_cars,), merged (max_cars,))
        from a cross-frame vmapped NMS — skips the per-frame NMS dispatch.
        ``precomputed_refit``: optional {target_index: (center (3,), theta)}
        from a cross-frame batched merge re-fit — skips the per-frame
        re-fit dispatch (may be an empty dict).
        """
        cfg = self.cfg
        if not kept:
            return []
        if ref_masks is None:
            ref_masks = [aggregation.choose_ref_mask(t) for t in kept]

        if cfg.use_ensemble_filter:
            from monosowa_tpu.sowa.filtering import ensemble_inlier_mask_host
            points = [p[ensemble_inlier_mask_host(p)] for p in points]

        # the padded device batch is only needed for an actual fit or the
        # optional per-car refinement; skip its host->device transfers when
        # everything is precomputed (the label_frames batched path)
        need_batch = (precomputed is None or cfg.use_scale_detector
                      or cfg.use_dimensions_estimation)
        batch = (aggregation.build_car_batch(
            kept, points, window_frames, cfg.max_cars, cfg.max_points)
            if need_batch else None)
        n = min(len(kept), cfg.max_cars)
        l, w, h = cfg.template_dims_lwh
        if precomputed is not None:
            center, theta = precomputed
            center = np.asarray(center)[:n].copy()
            theta = np.asarray(theta)[:n].copy()
        elif cfg.use_robust_optimization:
            # optimize_car_robust (optimizer.py:27-44): dims-estimator yaw
            # first, then a translation-only grid; NaN estimates fall back
            # to the standard coarse+fine inside fit_cars_robust
            from monosowa_tpu.sowa import dimensions as dims_mod
            from monosowa_tpu.sowa.fitting import fit_cars_robust
            th_rob = np.zeros(cfg.max_cars, np.float32)
            rob_valid = np.zeros(cfg.max_cars, bool)
            for i in range(n):
                if kept[i].moving:
                    continue
                pts_i = np.asarray(batch.points[i])
                mask_i = np.asarray(batch.mask[i])
                c = np.median(pts_i[mask_i], axis=0) if mask_i.any() else \
                    np.zeros(3)
                _, th = dims_mod.estimate_car_dimensions(
                    (pts_i - c)[None], mask_i[None], c)
                if np.isfinite(th):
                    th_rob[i] = th
                    rob_valid[i] = True
            res = fit_cars_robust(batch, self.template, self.occ_kernels,
                                  self.memb_kernels, self.conv_spec,
                                  cfg.fit, jnp.asarray(th_rob),
                                  jnp.asarray(rob_valid))
            center = np.stack([np.asarray(res.x)[:n], np.asarray(res.y)[:n],
                               np.asarray(res.z)[:n]], 1)
            theta = np.asarray(res.theta)[:n].copy()
        else:
            res = fit_cars_conv(batch, self.template, self.occ_kernels,
                                self.memb_kernels, self.conv_spec, cfg.fit)
            center = np.stack([np.asarray(res.x)[:n], np.asarray(res.y)[:n],
                               np.asarray(res.z)[:n]], 1)
            # .copy(): np.asarray of a jax array is a read-only view and the
            # re-fit path below writes into theta in place
            theta = np.asarray(res.theta)[:n].copy()
        lwh = np.tile(np.array([l, w, h], np.float32), (n, 1))
        npts = (np.asarray(npts_override[:n], np.float32)
                if npts_override is not None else
                np.array([p.shape[0] for p in points[:n]], np.float32))

        # ---- 3D NMS + merge/re-fit (loader.py:2727-2800) --------------
        # pad device calls to the fixed max_cars shape: per-frame car counts
        # vary and every distinct n would otherwise compile its own NMS
        mc = cfg.max_cars
        center_p = np.zeros((mc, 3), np.float32)
        center_p[:n] = center
        theta_p = np.zeros(mc, np.float32)
        theta_p[:n] = theta
        lwh_p = np.tile(np.array([l, w, h], np.float32), (mc, 1))
        npts_p = np.zeros(mc, np.float32)
        npts_p[:n] = npts
        valid_p = np.zeros(mc, bool)
        valid_p[:n] = True
        if precomputed_nms is not None:
            keep, merged = precomputed_nms
        else:
            keep, merged = box3d.nms_3d(
                jnp.asarray(center_p), jnp.asarray(lwh_p),
                jnp.asarray(theta_p), jnp.asarray(npts_p),
                jnp.asarray(valid_p), jnp.float32(cfg.nms_iou))
        keep = np.asarray(keep)[:n]
        merged = np.asarray(merged)[:n]

        refit_targets = sorted({int(merged[i]) for i in range(n)
                                if not keep[i] and keep[merged[i]]})
        if precomputed_refit is not None:
            for t, (c_t, th_t) in precomputed_refit.items():
                center[t] = c_t
                theta[t] = th_t
        elif refit_targets:
            merged_points = []
            for t in refit_targets:
                parts = [points[t]] + [points[i] for i in range(n)
                                       if not keep[i] and merged[i] == t]
                merged_points.append(
                    aggregation.cap_points(np.concatenate(parts, 0)))
            sub_tracks = [kept[t] for t in refit_targets]
            # fixed max_cars padding: stable compiled shape for the re-fit
            sub_batch = aggregation.build_car_batch(
                sub_tracks, merged_points, window_frames,
                max_cars=cfg.max_cars, max_points=cfg.max_points)
            sub_res = fit_cars_conv(sub_batch, self.template,
                                    self.occ_kernels, self.memb_kernels,
                                    self.conv_spec, cfg.fit)
            # one host pull per array, not one per scalar (each float() is
            # a full device round-trip)
            sx, sy, sz, st = (np.asarray(sub_res.x), np.asarray(sub_res.y),
                              np.asarray(sub_res.z),
                              np.asarray(sub_res.theta))
            for j, t in enumerate(refit_targets):
                center[t] = [sx[j], sy[j], sz[j]]
                theta[t] = st[j]

        # ---- optional per-car refinement (scale detector / reducer /
        # dimension estimation — main_class.py dimensions_output path) ----
        per_car_lwh = lwh.copy()
        if cfg.use_scale_detector or cfg.use_dimensions_estimation:
            from monosowa_tpu.sowa import dimensions as dims_mod
            from monosowa_tpu.sowa import scale as scale_mod
            bank_pts = jnp.asarray(self.bank.points)
            for i in range(n):
                if not keep[i] or kept[i].moving:
                    continue
                pts_i = np.asarray(batch.points[i])
                mask_i = np.asarray(batch.mask[i])
                # scale_lidar feeds ONLY optimize_scale (optimizer.py:186-188);
                # the bbox reducer always gathers from the AGGREGATED cloud
                # cars[i].lidar (bbox_reducer_tracked, scale_detector.py:161,204)
                scale_pts_i, scale_mask_i = pts_i, mask_i
                if cfg.use_scale_detector and scale_scan_source is not None:
                    # real-LiDAR branch: re-gather the standing car's
                    # points from the live window scans inside the
                    # bbox_scale-bloated fitted box
                    # (extract_lidar_data_from_bbox_tracker,
                    # scale_detector.py:14-104; pseudo-lidar short-circuits
                    # to the aggregated cloud, :17-21)
                    scans, tmats = scale_scan_source
                    sl = scale_mod.extract_scale_lidar_scans(
                        center[i], per_car_lwh[i], theta[i], scans, tmats,
                        bbox_scale=cfg.scale_bbox_scale)
                    if len(sl) == 0:
                        # empty scale_lidar: the reference skips both the
                        # scale optimizer and the reducer for this car
                        # (optimizer.py:47, scale_detector.py:139 gate on a
                        # non-empty gather) — keep the grid-fit pose/dims
                        continue
                    scale_pts_i = np.zeros((cfg.max_points, 3), np.float32)
                    scale_mask_i = np.zeros(cfg.max_points, bool)
                    if len(sl) > cfg.max_points:
                        idx = np.linspace(0, len(sl) - 1,
                                          cfg.max_points).astype(int)
                        sl = sl[idx]
                    scale_pts_i[:len(sl)] = sl
                    scale_mask_i[:len(sl)] = True
                if cfg.use_scale_detector:
                    sres = scale_mod.optimize_scale(
                        jnp.asarray(scale_pts_i), jnp.asarray(scale_mask_i),
                        bank_pts,
                        jnp.asarray([center[i, 0], center[i, 1],
                                     center[i, 2], theta[i]], jnp.float32))
                    center[i] = [float(sres.x), float(sres.y), float(sres.z)]
                    per_car_lwh[i] = [float(sres.length), float(sres.width),
                                      float(sres.height)]
                    if cfg.use_bbox_reducer:
                        c2, lwh2, _ = scale_mod.bbox_reduce(
                            jnp.asarray(pts_i), jnp.asarray(mask_i),
                            jnp.asarray(center[i], jnp.float32),
                            jnp.asarray(per_car_lwh[i], jnp.float32),
                            jnp.float32(theta[i]))
                        center[i] = np.asarray(c2)
                        per_car_lwh[i] = np.asarray(lwh2)
                elif cfg.use_dimensions_estimation:
                    d, _ = dims_mod.estimate_car_dimensions(
                        (pts_i - center[i])[None], mask_i[None], center[i])
                    per_car_lwh[i] = d

        # ---- assemble output cars -------------------------------------
        cars = []
        for i in range(n):
            if not keep[i]:
                continue
            mask = ref_masks[i]
            if mask is None and cfg.skip_non_visible:
                continue
            li, wi, hi = (float(per_car_lwh[i, 0]), float(per_car_lwh[i, 1]),
                          float(per_car_lwh[i, 2]))
            cars.append({
                "cls": "Car",
                "box2d": mask_bbox(mask) if mask is not None else None,
                "h": hi, "w": wi, "l": li,
                "x": float(center[i, 0]), "y": float(center[i, 1]),
                "z": float(center[i, 2]), "theta": float(theta[i]),
                "moving": bool(kept[i].moving),
                "num_points": int(npts[i]),
                # use_add_data payload (cars_cache_dir); None in bank mode
                # (per-point data never leaves the device)
                "points": points[i] if points is not None else None,
                "mask": mask,
            })
        return cars

    # ------------------------------------------------------------------
    def _save_cars_cache(self, out_path: str, cars: List[dict]) -> None:
        if self.cfg.cars_cache_dir is None:
            return
        from monosowa_tpu.sowa import cache
        frame = os.path.splitext(os.path.basename(out_path))[0]
        cache.save_optimized_cars(self.cfg.cars_cache_dir, frame, cars)

    # ------------------------------------------------------------------
    def label_and_write(self, out_path: str, *args, overwrite: bool = False,
                        **kwargs) -> Optional[List[dict]]:
        """Skip-if-exists wrapper (main_class.py:180-184)."""
        if os.path.exists(out_path) and not overwrite:
            return None
        cars = self.label_frame(*args, **kwargs)
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        write_pseudo_label_file(out_path, cars)
        self._save_cars_cache(out_path, cars)
        return cars


    # ------------------------------------------------------------------
    def label_frames(self, frame_jobs: Sequence[dict],
                     overwrite: bool = False) -> int:
        """Whole-sequence batched labelling (SURVEY.md §5.7): aggregate all
        frames' cars on host, fit them in ONE fit_cars_conv call, then run
        per-frame NMS/refit/writing.  Each job dict needs the label_frame
        arguments plus ``out_path``; an optional ``frame_ids`` list (one
        global id per window index) lets overlapping windows SHARE each
        frame's camera-space candidate extraction — the dominant host cost
        — instead of recomputing it per window (~window-size x).

        Returns the number of frames written.  Designed so the TPU sees one
        large batch per group of frames instead of per-frame dispatches.
        """
        todo = [j for j in frame_jobs
                if overwrite or not os.path.exists(j["out_path"])]
        gen = self._label_frames_staged(todo)
        next(gen)
        try:
            return next(gen)
        finally:
            self.evict_extractions()

    def label_frames_stream(self, frame_jobs: Sequence[dict],
                            group_size: int = 8,
                            overwrite: bool = False) -> int:
        """Pipelined labelling of a long job list: groups of ``group_size``
        frames run as a 2-deep software pipeline — group k+1's device
        extraction is DISPATCHED before group k's fit results are pulled,
        so each blocking host pull (a full tunnel round trip under remote
        execution) overlaps useful device work instead of idling the chip.
        Output is identical to per-group :meth:`label_frames` calls; only
        the dispatch order changes."""
        todo = [j for j in frame_jobs
                if overwrite or not os.path.exists(j["out_path"])]
        groups = [todo[g0:g0 + group_size]
                  for g0 in range(0, len(todo), group_size)]
        # fids still needed AFTER group gi finishes (groups > gi + the one
        # already dispatched) — everything else is evicted as we go
        needed_after = [set() for _ in groups]
        for gi in range(len(groups) - 2, -1, -1):
            needed_after[gi] = set(needed_after[gi + 1])
            for j in groups[gi + 1]:
                needed_after[gi].update(j.get("frame_ids", ()))
        n = 0
        prev = None
        try:
            for gi, group in enumerate(groups):
                cur = self._label_frames_staged(group)
                next(cur)                   # stage A: dispatch extraction
                if prev is not None:
                    n += next(prev)         # stages B+C of the previous
                    # keep = the dispatched group + everything later
                    self.evict_extractions(needed_after[gi - 1])
                prev = cur
            if prev is not None:
                n += next(prev)
        finally:
            self.evict_extractions()
        return n

    def _label_frames_staged(self, todo: Sequence[dict]):
        """Generator body of label_frames: yields once after the device
        extraction DISPATCH (stage A), then runs collect/track/fit/write
        and yields the number of frames written."""
        cfg = self.cfg
        from concurrent.futures import ThreadPoolExecutor

        # phase A: camera-frame candidates, once per DISTINCT frame
        cam_cache = {}
        use_bank = False
        bank = None
        have_ids = bool(todo) and all("frame_ids" in j for j in todo)
        if have_ids:
            tasks = {}
            for j in todo:
                for k, fid in enumerate(j["frame_ids"]):
                    tasks.setdefault(fid, (j, k))
            fids = list(tasks)

            # device path: jobs supply per-frame depth maps -> the whole
            # extraction (erosion, membership, medians, filters) runs as
            # batched TPU calls (sowa/candidates_device.py)
            use_bank = (cfg.device_bank
                        and cfg.use_pseudo_lidar
                        and cfg.use_clever_aggregation
                        and all("get_depth" in j for j in todo)
                        and cfg.cars_cache_dir is None
                        and not cfg.use_ensemble_filter
                        and not cfg.use_scale_detector
                        and not cfg.use_dimensions_estimation)
            bank = None
            ext = ext_state = None
            new_fids = []
            arena_rows = {}     # chunk bank id -> its arena row0 (stage A)
            if all("get_depth" in j for j in todo):
                from monosowa_tpu.sowa.candidates_device import \
                    DeviceExtractor
                j0 = todo[0]
                p2 = np.asarray(j0["p2"], np.float32)
                ext = DeviceExtractor(p2, tuple(j0["img_hw"]), cfg.candidate,
                                      max_masks=cfg.max_cars)
                if use_bank:
                    # cross-group extraction cache: overlapping windows of
                    # CONSECUTIVE stream groups share most frames — only
                    # fids never extracted (under this calibration) are
                    # dispatched; label_frames_stream owns eviction
                    sig = (p2.tobytes(), tuple(j0["img_hw"]),
                           cfg.max_points)
                    if not (self._ext_cache
                            and self._ext_cache["sig"] == sig):
                        self._ext_cache = {"sig": sig, "cands": {}}
                    cached = self._ext_cache["cands"]
                    new_fids = [f for f in fids if f not in cached]
                    # mark in-flight fids so the NEXT group's stage A (which
                    # runs before this group's collect under the stream's
                    # 2-deep schedule) doesn't re-dispatch the overlap; the
                    # owner group's stage B always runs first and replaces
                    # the sentinel with the real entry
                    for f in new_fids:
                        cached[f] = _EXT_PENDING
                else:
                    new_fids = list(fids)
                depths, masks_pf = [], []
                for fid in new_fids:
                    j, k = tasks[fid]
                    depths.append(j["get_depth"](k))
                    mk = j["get_masks"](k)
                    masks_pf.append(list(mk) if mk else [])
                if use_bank:
                    # bank mode (sowa/bank.py): points stay device-resident;
                    # DISPATCH only — the meta pull happens after the stage
                    # boundary so a streaming caller can overlap it
                    ext_state = ext.extract_frames_banked_begin(
                        depths, masks_pf, cap=cfg.max_points)
                    # copy each chunk into the persistent arena NOW (still
                    # stage A): BankRef rows become global arena rows and
                    # the fit program's bank shape stays constant across
                    # groups (see bank.BankArena)
                    pending = ext_state[1]
                    if pending is not None:
                        from monosowa_tpu.sowa import bank as bank_mod
                        arena = self._ext_cache.get("arena")
                        if arena is None:
                            nb = 2 * (-(-len(fids) // ext.frame_bucket)) + 4
                            arena = bank_mod.BankArena(
                                ext.frame_bucket, ext.max_masks,
                                cfg.max_points, nb)
                            self._ext_cache["arena"] = arena
                        arena_rows = {
                            id(bank_dev): arena.write(
                                bank_dev, [new_fids[fi] for fi in chunk])
                            for (chunk, _m, bank_dev) in pending}
                else:
                    for fid, c in zip(new_fids,
                                      ext.extract_frames(depths, masks_pf)):
                        cam_cache[fid] = c
            else:
                use_bank = False
                def extract_one(fid):
                    j, k = tasks[fid]
                    pts = j["get_points"](k)
                    masks_k = j["get_masks"](k)
                    if pts is None or masks_k is None or len(masks_k) == 0:
                        return fid, None
                    return fid, candidates.extract_candidates_cam(
                        pts, j["p2"], j["img_hw"], masks_k, cfg.candidate)

                if len(fids) > 1:
                    with ThreadPoolExecutor(
                            max_workers=min(8, len(fids))) as p:
                        for fid, c in p.map(extract_one, fids):
                            cam_cache[fid] = c
                else:
                    for fid in fids:
                        cam_cache[fid] = extract_one(fid)[1]
        else:
            ext = ext_state = None

        yield None          # --- stage boundary: extraction dispatched ---

        if ext_state is not None:
            from monosowa_tpu.sowa.bank import BankRef
            new_res, _ = ext.extract_frames_banked_finish_chunks(ext_state)
            cached = self._ext_cache["cands"]
            # cached entries carry FINAL BankRefs: rows are global arena
            # rows (chunk row0 from stage A's arena.write + in-chunk k),
            # valid for the frame's whole cache lifetime — every group's
            # fit gathers from the one fixed-shape arena buffer, so the
            # fused fit program compiles once per arena size
            for fid, c in zip(new_fids, new_res):
                if c is not None:
                    c = {"locations": c["locations"], "masks": c["masks"],
                         "points": [BankRef(row=arena_rows[id(bdev)] + k,
                                            mi=mi, count=cnt, trunc=tr)
                                    for (bdev, k, mi, cnt, tr)
                                    in c["chunk_refs"]]}
                cached[fid] = c
            arena = self._ext_cache.get("arena")
            bank = arena.buf if arena is not None else None
            for fid in fids:
                c = cached.get(fid)
                assert c is not _EXT_PENDING, fid
                cam_cache[fid] = c
            use_bank = bank is not None

        quota = cfg.max_points // cfg.bank_slots
        # real-LiDAR scale detector re-gathers from the live window scans
        # (scale_detector.py:14-104) — keep them per prepared item so this
        # batched entry point matches label_frame's behaviour
        keep_scans = cfg.use_scale_detector and not cfg.use_pseudo_lidar

        def prep(job):
            window_frames = job["window_frames"]
            window_scans = ([job["get_points"](k)
                             for k in range(len(window_frames))]
                            if keep_scans else None)
            cands = []
            for k in range(len(window_frames)):
                if have_ids:
                    cand_cam = cam_cache[job["frame_ids"][k]]
                    if use_bank:
                        from monosowa_tpu.sowa import bank as bank_mod
                        cands.append(bank_mod.transform_candidates_bank(
                            cand_cam, job["transforms"][k],
                            cfg.candidate.moving_detection_threshold))
                    else:
                        cands.append(None if cand_cam is None else
                                     candidates.transform_candidates(
                                         cand_cam, job["transforms"][k],
                                         cfg.candidate))
                    continue
                pts = job["get_points"](k)
                masks_k = job["get_masks"](k)
                if pts is None or masks_k is None or len(masks_k) == 0:
                    cands.append(None)
                    continue
                cands.append(candidates.extract_candidates(
                    pts, job["p2"], job["img_hw"], masks_k,
                    job["transforms"][k], cfg.candidate))
            tracks = lomm.greedy_track(cands, window_frames,
                                       cfg.dist_threshold_tracking)
            lomm.classify_all(tracks, method=cfg.moving_method)
            if use_bank:
                from monosowa_tpu.sowa import bank as bank_mod
                kept, ref_masks, slots = bank_mod.select_car_slots(
                    tracks, job["transforms"], window_frames,
                    cfg.keep_k_frames, cfg.min_standing_points,
                    cfg.bank_slots, quota,
                    use_pseudo_lidar=cfg.use_pseudo_lidar,
                    max_distance=cfg.candidate.max_distance_pseudo_lidar)
                return dict(job=job, kept=kept, points=None,
                            ref_masks=ref_masks, window=window_frames,
                            slots=slots, scans=window_scans,
                            npts=[s.npts for s in slots])
            kept, points, ref_masks = aggregation.aggregate_tracks(
                tracks, job["transforms"], window_frames, cfg.keep_k_frames,
                cfg.min_standing_points,
                use_pseudo_lidar=cfg.use_pseudo_lidar,
                max_distance=cfg.candidate.max_distance_pseudo_lidar,
                ref_scan=self._ref_scan(window_frames, job["get_points"]),
                strict_hidden=cfg.strict_hidden_standing,
                clever=cfg.use_clever_aggregation)
            return dict(job=job, kept=kept, points=points,
                        ref_masks=ref_masks, window=window_frames,
                        slots=None, scans=window_scans,
                        npts=[p.shape[0] for p in points])

        # host prep (tracking / aggregation — numpy + scipy, GIL-releasing)
        # threads across frames so it overlaps rather than serializes ahead
        # of the one big device fit
        if len(todo) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=min(8, len(todo))) as pool:
                prepared = list(pool.map(prep, todo))
        else:
            prepared = [prep(j) for j in todo]

        # one cross-frame batched fit for every prepared car
        all_tracks, all_points, all_slots, all_windows, owners = \
            [], [], [], [], []
        for fi, item in enumerate(prepared):
            n_i = min(len(item["kept"]), cfg.max_cars)
            all_tracks.extend(item["kept"][:n_i])
            if use_bank:
                all_slots.extend(item["slots"][:n_i])
            else:
                all_points.extend(item["points"][:n_i])
            # each track's frame offsets are relative to its OWN frame's
            # window — edge frames have truncated/shifted windows, so the
            # moving-car trajectory theta must index with the right base
            all_windows.extend([item["window"]] * n_i)
            owners.extend([fi] * n_i)
        n_written = 0
        nms_by_frame = {}
        bank_refits = {}
        bank_targets = 0
        if all_tracks and use_bank:
            from monosowa_tpu.sowa import bank as bank_mod
            # bucket the bank's frame-row count for compile-cache stability
            # (the arena keeps it constant between grows; bucketing also
            # covers the non-arena extract_frames_banked path — every
            # distinct row count is a multi-minute remote recompile of the
            # fused fit program)
            frows = bank.shape[0]
            fpad = -(-frows // 32) * 32 - frows
            bank_b = (jnp.pad(bank, ((0, fpad), (0, 0), (0, 0), (0, 0)))
                      if fpad else bank)
            l0, w0, h0 = cfg.template_dims_lwh
            (centers, thetas, nms_by_frame, bank_targets,
             bank_refits) = bank_mod.fit_and_nms_slots(
                bank_b, all_slots, all_tracks, all_windows, owners,
                len(prepared), cfg.max_cars,
                np.array([l0, w0, h0], np.float32), cfg.nms_iou,
                self.template, self.occ_kernels, self.memb_kernels,
                self.conv_spec, cfg.fit, cfg.bank_slots, quota,
                refit_cap=cfg.bank_refit_cap)
        elif all_tracks:
            # bucket the batch size so repeated label_frames calls reuse the
            # compiled fit instead of recompiling per distinct car count
            fb = cfg.fit_bucket
            bucket = -(-len(all_tracks) // fb) * fb
            big = aggregation.build_car_batch(
                all_tracks, all_points, prepared[0]["window"],
                max_cars=bucket, max_points=cfg.max_points,
                per_track_windows=all_windows)
            res = fit_cars_conv(big, self.template, self.occ_kernels,
                                self.memb_kernels, self.conv_spec, cfg.fit)
            # ONE host pull for the whole result (each pull is a full
            # device round-trip under remote execution)
            import jax.numpy as _jnp
            packed = np.asarray(_jnp.stack([res.x, res.y, res.z, res.theta]))
            centers = packed[:3].T
            thetas = packed[3]
        owners = np.asarray(owners, np.int64) if owners else np.zeros(0)

        # one vmapped NMS over all frames instead of F per-frame dispatches;
        # frame count padded to a bucket for compile-cache stability
        # (bank mode already got keep/merged from the fused program)
        if all_tracks and not use_bank:
            mc = cfg.max_cars
            l0, w0, h0 = cfg.template_dims_lwh
            f_n = -(-len(prepared) // 8) * 8
            c_f = np.zeros((f_n, mc, 3), np.float32)
            t_f = np.zeros((f_n, mc), np.float32)
            np_f = np.zeros((f_n, mc), np.float32)
            v_f = np.zeros((f_n, mc), bool)
            for fi, item in enumerate(prepared):
                sel = np.where(owners == fi)[0]
                n_i = len(sel)
                c_f[fi, :n_i] = centers[sel]
                t_f[fi, :n_i] = thetas[sel]
                np_f[fi, :n_i] = item["npts"][:n_i]
                v_f[fi, :n_i] = True
            lwh_f = np.tile(np.array([l0, w0, h0], np.float32),
                            (f_n, mc, 1))
            keep_f, merged_f = jax.vmap(
                box3d.nms_3d, in_axes=(0, 0, 0, 0, 0, None))(
                jnp.asarray(c_f), jnp.asarray(lwh_f), jnp.asarray(t_f),
                jnp.asarray(np_f), jnp.asarray(v_f),
                jnp.float32(cfg.nms_iou))
            packed_nms = np.asarray(jnp.stack(
                [keep_f.astype(jnp.int32), merged_f.astype(jnp.int32)]))
            for fi in range(f_n):
                nms_by_frame[fi] = (packed_nms[0, fi].astype(bool),
                                    packed_nms[1, fi])

        # cross-frame batched merge re-fit.  Bank mode: the fused program
        # already re-fit the first ``bank_refit_cap`` merge targets —
        # unpack them (batch order = frame-major = the host group order)
        # and only the rare overflow needs a second device call.  Host
        # mode: collect every frame's merge targets and fit them in ONE
        # device call instead of per-frame dispatches (each dispatch
        # costs a full round-trip).
        refit_by_frame = {fi: {} for fi in range(len(prepared))}
        if all_tracks and use_bank and bank_refits:
            frame_first = {}
            for b_idx, fi in enumerate(owners):
                frame_first.setdefault(int(fi), b_idx)
            for b_idx, val in bank_refits.items():
                fi = int(owners[b_idx])
                refit_by_frame[fi][b_idx - frame_first[fi]] = val
        need_host_refit = ((not use_bank) or cfg.bank_refit_cap == 0
                           or bank_targets > cfg.bank_refit_cap)
        if all_tracks and need_host_refit:
            groups = []   # (fi, t, merged_points|slots, track, window)
            for fi, item in enumerate(prepared):
                keep_i, merged_i = nms_by_frame[fi]
                n_i = min(len(item["kept"]), cfg.max_cars)
                targets = sorted({int(merged_i[i]) for i in range(n_i)
                                  if not keep_i[i] and keep_i[merged_i[i]]})
                for t in targets:
                    if use_bank:
                        from monosowa_tpu.sowa import bank as bank_mod
                        merged = item["slots"][t]
                        for i in range(n_i):
                            if not keep_i[i] and merged_i[i] == t:
                                merged = bank_mod.merge_slots(
                                    merged, item["slots"][i])
                        payload = merged
                    else:
                        parts = [item["points"][t]] + [
                            item["points"][i] for i in range(n_i)
                            if not keep_i[i] and merged_i[i] == t]
                        payload = aggregation.cap_points(
                            np.concatenate(parts, 0))
                    groups.append((fi, t, payload,
                                   item["kept"][t], item["window"]))
            if use_bank:
                # the fused program covered the first bank_refit_cap
                # targets in this exact order; fit only the overflow
                groups = groups[cfg.bank_refit_cap:]
            if groups and use_bank:
                from monosowa_tpu.sowa import bank as bank_mod
                rres = bank_mod.fit_slots(
                    bank_b, [g[2] for g in groups],
                    [g[3] for g in groups], [g[4] for g in groups],
                    self.template, self.occ_kernels, self.memb_kernels,
                    self.conv_spec, cfg.fit, cfg.bank_slots, quota)
                rpacked = np.asarray(jnp.stack(
                    [rres.x, rres.y, rres.z, rres.theta]))
                for gi, (fi, t, _, _, _) in enumerate(groups):
                    refit_by_frame[fi][t] = (rpacked[:3, gi],
                                             float(rpacked[3, gi]))
            elif groups:
                fb = cfg.fit_bucket
                rb = -(-len(groups) // fb) * fb
                rbatch = aggregation.build_car_batch(
                    [g[3] for g in groups], [g[2] for g in groups],
                    prepared[0]["window"], max_cars=rb,
                    max_points=cfg.max_points,
                    per_track_windows=[g[4] for g in groups])
                rres = fit_cars_conv(rbatch, self.template,
                                     self.occ_kernels, self.memb_kernels,
                                     self.conv_spec, cfg.fit)
                rpacked = np.asarray(jnp.stack(
                    [rres.x, rres.y, rres.z, rres.theta]))
                for gi, (fi, t, _, _, _) in enumerate(groups):
                    refit_by_frame[fi][t] = (rpacked[:3, gi],
                                             float(rpacked[3, gi]))

        for fi, item in enumerate(prepared):
            sel = np.where(owners == fi)[0]
            pre = ((centers[sel], thetas[sel]) if len(sel) else
                   (np.zeros((0, 3)), np.zeros(0)))
            cars = self.label_from_cars(
                item["kept"], item["points"],
                item["ref_masks"], item["window"],
                precomputed=pre,
                precomputed_nms=nms_by_frame.get(fi),
                precomputed_refit=refit_by_frame[fi],
                npts_override=item["npts"],
                scale_scan_source=((item["scans"],
                                    item["job"]["transforms"])
                                   if item.get("scans") is not None
                                   else None))
            job = item["job"]
            cars = cars + self.pedestrian_labels(
                item["window"], job["get_points"], job["p2"],
                job["img_hw"], job.get("ped_masks"))
            out_path = job["out_path"]
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            write_pseudo_label_file(out_path, cars)
            self._save_cars_cache(out_path, cars)
            n_written += 1
        yield n_written


def mask_bbox(mask: np.ndarray) -> np.ndarray:
    """2D bbox [x1, y1, x2, y2] of a boolean mask (output.py:201-212)."""
    ys, xs = np.where(mask)
    if len(xs) == 0:
        return np.zeros(4)
    return np.array([xs.min(), ys.min(), xs.max(), ys.max()], np.float64)

"""Pseudo-label generator CLI.

CLI contract (pseudo_label_generator/3d/scripts/main.py:5-17): ``--dataset
{kitti,kitti360,waymo,all,waymo_converted}``, ``--action {lidar_scans,
transformations, homographies, mask_tracking, frames_aggregation,
candidates, optimization, dimensions_output, demo}``, ``--config``,
``--seq_start/--seq_end`` work-sharding.  Multi-machine scaling stays
share-nothing: N processes over disjoint [seq_start, seq_end) shards with
skip-if-exists idempotency (main_class.py:606-646) — file existence is the
completion marker.

Dataset drivers implement the KITTI-object-layout path (images + calib +
cached pseudo-lidar + cached masks); raw-dataset ingestion converters live
in tools/.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List, Optional

import numpy as np

from monosowa_tpu.config import Config, PipelineFlags, known_actions, load_config
from monosowa_tpu.sowa import depth as depth_mod
from monosowa_tpu.sowa import masks as masks_mod
from monosowa_tpu.sowa import transforms as transforms_mod
from monosowa_tpu.sowa.fitting import FitConfig
from monosowa_tpu.sowa.pipeline import PipelineConfig, PseudoLabeler


def parse_args(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser("monosowa-tpu pseudo-label generator")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--dataset", type=str, default="kitti",
                   choices=["kitti", "kitti360", "waymo", "all",
                            "waymo_converted"])
    p.add_argument("--action", type=str, required=True,
                   choices=known_actions())
    p.add_argument("--seq_start", type=int, default=None)
    p.add_argument("--seq_end", type=int, default=None)
    return p.parse_args(argv)


def pipeline_config_from(cfg: Config) -> PipelineConfig:
    fc = cfg.frames_creation or Config({})
    opt = cfg.optimization or Config({})
    filt = cfg.filtering or Config({})
    lf = cfg.loss_functions or Config({})
    tpl = cfg.templates or Config({})
    return PipelineConfig(
        template_mesh_dir=tpl.get("mesh_dir") or None,
        nscans_before=int(fc.get("nscans_before", 30)),
        nscans_after=int(fc.get("nscans_after", 30)),
        min_standing_points=int(filt.get("lidar_threshold_during_optim", 1000)),
        keep_k_frames=10,
        nms_iou=float(opt.get("nms_threshold", 0.1)),
        dist_threshold_tracking=float(fc.get("dist_treshold_tracking", 10.0)),
        fit=FitConfig(
            dx_min=float(opt.get("opt_param1_min", -2.0)),
            dx_max=float(opt.get("opt_param1_max", 2.0)),
            dz_min=float(opt.get("opt_param2_min", -1.0)),
            dz_max=float(opt.get("opt_param2_max", 3.0)),
            n_dx=int(opt.get("opt_param1_iters", 40)),
            n_dz=int(opt.get("opt_param2_iters", 40)),
            n_theta=int(opt.get("opt_param3_iters", 40)),
            # fine theta pass: hardcoded 360 in the reference
            # (optimizer.py:103); exposed here for small-grid test runs
            n_theta_fine=int(opt.get("opt_fine_iters", 360)),
            radius=float(lf.get("binary_loss_threshold", 0.2)),
            # loss_functions.loss_function dispatch (loss.py:98-116)
            loss_function=str(lf.get("loss_function", "binary2way")),
            sigmoid_steepness=float(lf.get("sigmoid_steepness", 10.0)),
            # the yaml ships trim_threshold; compute_loss reads the
            # misspelled trim_treshold — honor either spelling
            trim_threshold=float(lf.get("trim_treshold",
                                        lf.get("trim_threshold", 0.3)))),
        max_cars=int(opt.get("max_cars_per_frame", 32)),
        max_points=int(filt.get("max_points_per_car", 2048)),
        skip_non_visible=bool(opt.get("skip_non_visible_cars", True)),
        use_pseudo_lidar=bool(fc.get("use_pseudo_lidar", True)),
        use_clever_aggregation=bool(fc.get("use_clever_aggregation", True)),
        use_robust_optimization=bool(opt.get("robust_optimization", False)),
        extract_pedestrians=bool(fc.get("extract_pedestrians", False)),
    )


def shuffled_frame_order(n: int, seq_start: Optional[int],
                         seq_end: Optional[int]) -> np.ndarray:
    """The KITTI-360 fleet draw (main_class.py:636-646
    limit_sequences_all_random): a FIXED seed-360 shuffle of the frame
    index space, sliced by [seq_start:seq_end] — concurrent share-nothing
    workers with disjoint slices draw disjoint random frame subsets, so a
    partial fleet run still covers the dataset uniformly."""
    np.random.seed(360)
    indexes = np.arange(0, n)
    np.random.shuffle(indexes)
    return indexes[seq_start:seq_end]


class KittiObjectDriver:
    """Drives the KITTI object-detection layout: training/image_2 + calib,
    with caches under merged_frames_path (lidar_raw/, masks_raw/,
    transformations/) and outputs under labels_path."""

    def __init__(self, cfg: Config, flags: PipelineFlags,
                 dataset: str = "kitti"):
        self.cfg = cfg
        self.flags = flags
        self.dataset = dataset
        paths = cfg.paths or Config({})
        self.kitti_path = paths.get("kitti_path", ".")
        self.all_dataset_path = paths.get("all_dataset_path", None)
        self.cache = paths.get("merged_frames_path", "./cache")
        self.labels_path = paths.get("labels_path", "./labels")
        self.pcfg = pipeline_config_from(cfg)

    # cache directories (output.py:127-172 taxonomy)
    @property
    def pcd_dir(self):
        return os.path.join(self.cache, "lidar_raw")

    @property
    def masks_dir(self):
        return os.path.join(self.cache, "masks_raw")

    @property
    def transforms_dir(self):
        return os.path.join(self.cache, "transformations")

    def frame_ids(self) -> List[str]:
        img_dir = os.path.join(self.kitti_path, "training", "image_2")
        ids = sorted(os.path.splitext(f)[0] for f in os.listdir(img_dir))
        return ids

    def run(self, seq_start: Optional[int], seq_end: Optional[int],
            shuffle: bool = False) -> int:
        ids = self.frame_ids()
        if shuffle:
            # KITTI-360 fleet draw: disjoint random subsets per worker
            ids = [ids[i] for i in shuffled_frame_order(
                len(ids), seq_start, seq_end)]
        else:
            lo = seq_start or 0
            hi = min(seq_end if seq_end is not None else len(ids), len(ids))
            ids = ids[lo:hi]
        n_done = 0
        if self.flags.do_optim or self.flags.compute_dimensions:
            import dataclasses as _dc
            pcfg = self.pcfg
            if self.flags.do_optim_scale or self.flags.compute_dimensions:
                # demo / dimensions_output actions enable the size stages
                pcfg = _dc.replace(
                    pcfg,
                    use_scale_detector=self.flags.do_optim_scale,
                    use_dimensions_estimation=self.flags.compute_dimensions
                    and not self.flags.do_optim_scale)
            labeler = PseudoLabeler(pcfg)
            group = int((self.cfg.general or Config({}))
                        .get("frames_per_batch", 8))
            pending = []
            for fid in ids:
                used_cache = self._optimize_frame_cached(labeler, fid)
                if used_cache is not None:
                    n_done += used_cache
                    continue
                job = self._optimize_job(fid)
                if job is None:
                    continue
                pending.append(job)
            # 2-deep pipelined groups: group k+1's extraction dispatch
            # overlaps group k's fit pull + label writing
            n_done += labeler.label_frames_stream(pending, group_size=group)
        elif self.flags.generate_transformations_only:
            for fid in ids:
                n_done += self._transforms_frame(fid)
        elif self.flags.generate_candidates:
            for fid in ids:
                n_done += self._candidates_frame(fid)
        elif self.flags.generate_merged_frames_only:
            labeler = PseudoLabeler(self.pcfg)
            for fid in ids:
                n_done += self._merge_frame(labeler, fid)
        elif self.flags.generate_raw_lidar:
            for fid in ids:
                n_done += self._lidar_frame(fid)
        elif self.flags.generate_raw_masks_or_tracking:
            from monosowa_tpu.sowa import zoo
            backend = zoo.mask_backend(self.cfg)
            if backend is None:
                raise NotImplementedError(
                    "action 'mask_tracking' on frame datasets needs a live "
                    "instance-segmentation backend: set backends.mask "
                    "(e.g. mask2former + mask_checkpoint) in the config, "
                    "or precompute masks_raw/ artifacts")
            refine = zoo.sam_refine_backend(self.cfg)
            for fid in ids:
                n_done += self._masks_frame(fid, backend, refine)
        else:
            raise NotImplementedError(
                f"action {self.flags.action!r} requires the external "
                "depth/segmentation backends; run with cached artifacts or "
                "see monosowa_tpu.sowa.depth / masks for the interfaces")
        return n_done

    def _calib(self, fid: str):
        from monosowa_tpu.kittiio import Calibration
        return Calibration(os.path.join(self.kitti_path, "training",
                                        "calib", f"{fid}.txt"))

    @staticmethod
    def _read_calib_safe(path: str):
        from monosowa_tpu.kittiio import Calibration
        try:
            return Calibration(path)
        except (OSError, KeyError):
            return None

    def _transforms_frame(self, fid: str) -> int:
        """`--action transformations`, dataset-dispatched pose sources
        (loader.py:901-1013):

        * kitti360 / all: ``data_poses/<seq>/cam0_to_world.txt`` windows
          (calculate_transformations_all :942-982) — frame ids are
          ``<sequence>_<number>``;
        * waymo_converted: per-frame calib ``Cur_pose`` rows
          (calculate_transformations_waymoc :984-1013), sequence layout
          ``training/<seq>/calib/`` under all_dataset_path when the frame
          id carries a sequence prefix, else the flat object-layout calib
          dir (numeric neighbour frames);
        * kitti (object layout): identity windows — single-shot frames
          have no pose chain; raw-sequence OXTS chains come through
          tools/kitti_raw_transforms.py.
        """
        out = transforms_mod.transforms_cache_path(self.transforms_dir, fid)
        if os.path.exists(out):
            return 0
        rng = int((self.cfg.frames_creation or Config({}))
                  .get("nscans_transformation_range", 130))
        t = None
        if self.dataset in ("kitti360", "all") and self.all_dataset_path:
            folder, _, number = fid.rpartition("_")
            pose_file = os.path.join(self.all_dataset_path, "data_poses",
                                     folder, "cam0_to_world.txt")
            if folder and os.path.exists(pose_file):
                poses = transforms_mod.read_cam0_to_world(pose_file)
                t = transforms_mod.k360_window_transforms(
                    poses, int(number), rng, rng)
        elif self.dataset == "waymo_converted":
            folder, _, number = fid.rpartition("_")
            seq_calib = (os.path.join(self.all_dataset_path, "training",
                                      folder, "calib")
                         if self.all_dataset_path and folder else None)
            if seq_calib and os.path.isdir(seq_calib):
                t = transforms_mod.waymoc_window_transforms(
                    seq_calib, int(number), rng, rng)
            else:
                flat_calib = os.path.join(self.kitti_path, "training",
                                          "calib")
                ref = self._read_calib_safe(os.path.join(flat_calib,
                                                         f"{fid}.txt"))
                if ref is not None and ref.pose is not None:
                    width = len(fid)
                    t = transforms_mod.waymoc_window_transforms(
                        flat_calib, int(fid), rng, rng,
                        name_fn=lambda i: str(i).zfill(width))
        if t is None:
            t = np.tile(np.eye(4), (2 * rng + 1, 1, 1))
        transforms_mod.save_window_transforms(self.transforms_dir, fid, t)
        return 1

    @property
    def candidates_dir(self):
        return os.path.join(self.cache, "candidates")

    @property
    def merged_dir(self):
        return os.path.join(self.cache, "merged_cars")

    def _window_accessors(self, fid: str):
        from monosowa_tpu.kittiio import Calibration

        before, after = self.pcfg.nscans_before, self.pcfg.nscans_after
        window = list(range(-before, after + 1))
        seq_pcds = os.path.join(self.pcd_dir, fid, "pcds")

        def get_points(k):
            path = os.path.join(seq_pcds, f"{window[k]:+d}.npz")
            if not os.path.exists(path) and window[k] == 0:
                path = os.path.join(self.pcd_dir, f"{fid}.npz")
            return depth_mod.load_pseudo_lidar(path)

        def get_masks(k):
            name = fid if window[k] == 0 else f"{fid}{window[k]:+d}"
            return masks_mod.load_masks(self.masks_dir, name)

        full = transforms_mod.load_window_transforms(self.transforms_dir, fid)
        if full is None:
            transforms = np.tile(np.eye(4), (len(window), 1, 1))
        else:
            rng_full = (full.shape[0] - 1) // 2
            transforms = transforms_mod.slice_window(full, rng_full, before,
                                                     after)
        return window, get_points, get_masks, transforms

    def _depth_backend(self):
        """Configured depth source, cached per driver (live backends hold a
        jitted forward — one instance per run, not per frame)."""
        if not hasattr(self, "_depth_backend_cache"):
            from monosowa_tpu.sowa import zoo
            self._depth_backend_cache = zoo.depth_backend(
                self.cfg, os.path.join(self.cache, "depth_maps"))
        return self._depth_backend_cache

    def _lidar_frame(self, fid: str) -> int:
        """`--action lidar_scans`: depth map -> pseudo-lidar cache
        (metric3d.py:39-279).  ``backends.depth`` selects the source:
        cached reads <merged_frames_path>/depth_maps/<fid>.npz; the live
        modes (metric3d_hub / depth_anything, zoo.depth_backend) run on the
        frame's image with its calib fx."""
        out = os.path.join(self.pcd_dir, f"{fid}.npz")
        if os.path.exists(out):
            return 0
        backend = self._depth_backend()
        calib = self._calib(fid)
        if hasattr(backend, "predict_depth_for"):
            dmap = backend.predict_depth_for(fid)
        else:
            img = self._image(fid)
            if img is None:
                return 0
            # canonical contract: metric = canonical * fx / 1000, with fx
            # from this frame's calib (metric3d.py:327-333); fx only
            # scales the host-side output, never the jitted forward
            backend.fx = float(calib.P2[0, 0])
            dmap = backend.predict_depth(img)
        if dmap is None:
            return 0
        pts = depth_mod.pseudo_lidar_from_depth(dmap, calib.P2)
        os.makedirs(self.pcd_dir, exist_ok=True)
        np.savez_compressed(out, points=pts)
        return 1

    def _masks_frame(self, fid: str, backend, refine) -> int:
        """`--action mask_tracking` for frame datasets: live instance
        segmentation -> masks_raw cache (precompute_detectron_kitti,
        loader.py:1703-1790; SAM refinement loader.py:1727-1739).  With
        extract_pedestrians, person-class masks land in the pedestrians/
        cache (output.py:141-143) from the SAME forward pass."""
        if masks_mod.load_masks(self.masks_dir, fid) is not None:
            return 0
        img = self._image(fid)
        if img is None:
            return 0
        if self.pcfg.extract_pedestrians and hasattr(backend,
                                                     "predict_masks_multi"):
            person_ids = tuple((self.cfg.backends or Config({}))
                               .get("mask_person_labels", (0,)))
            (masks, scores), (ped_masks, _) = backend.predict_masks_multi(
                img, [backend.car_label_ids, person_ids])
            masks_mod.save_masks(os.path.join(self.cache, "pedestrians"),
                                 fid, ped_masks, img.shape[:2])
        else:
            masks, scores = backend.predict_masks_scores(img)
        if refine is not None:
            masks = masks_mod.refine_masks(masks, scores, img, refine)
        masks_mod.save_masks(self.masks_dir, fid, masks, img.shape[:2])
        return 1

    def _candidates_frame(self, fid: str) -> int:
        """`--action candidates`: extract + cache per-frame candidates
        (loader.py:1535-1649 precompute path)."""
        from monosowa_tpu.sowa import cache as cache_mod
        from monosowa_tpu.sowa import candidates as cand_mod

        if cache_mod.stage_done(self.candidates_dir, fid):
            return 0
        window, get_points, get_masks, transforms = self._window_accessors(fid)
        calib = self._calib(fid)
        img_hw = self._image_hw(fid)
        ref_k = window.index(0)
        pts = get_points(ref_k)
        masks = get_masks(ref_k)
        if pts is None or masks is None:
            return 0
        cand = cand_mod.extract_candidates(pts, calib.P2, img_hw, masks,
                                           transforms[ref_k],
                                           self.pcfg.candidate)
        cache_mod.save_candidates(self.candidates_dir, fid, cand)
        return 1

    def _merge_frame(self, labeler: PseudoLabeler, fid: str) -> int:
        """`--action frames_aggregation`: run candidates -> tracking ->
        classification -> aggregation and cache the merged cars."""
        from monosowa_tpu.sowa import aggregation, cache as cache_mod
        from monosowa_tpu.sowa import candidates as cand_mod, lomm

        if cache_mod.stage_done(self.merged_dir, fid):
            return 0
        window, get_points, get_masks, transforms = self._window_accessors(fid)
        calib = self._calib(fid)
        img_hw = self._image_hw(fid)
        cands = []
        for k in range(len(window)):
            pts = get_points(k)
            masks = get_masks(k)
            if pts is None or masks is None or len(masks) == 0:
                cands.append(None)
                continue
            cands.append(cand_mod.extract_candidates(
                pts, calib.P2, img_hw, masks, transforms[k],
                self.pcfg.candidate))
        tracks = lomm.greedy_track(cands, window,
                                   self.pcfg.dist_threshold_tracking)
        lomm.classify_all(tracks, method=self.pcfg.moving_method)
        kept, points, ref_masks = aggregation.aggregate_tracks(
            tracks, transforms, window, self.pcfg.keep_k_frames,
            self.pcfg.min_standing_points)
        cache_mod.save_merged_cars(self.merged_dir, fid, kept, points,
                                   ref_masks)
        return 1

    def _optimize_frame_cached(self, labeler: PseudoLabeler, fid: str):
        """Skip-if-done / merged-cache fast path.  Returns frames written
        (0 or 1) or None when the frame needs the full pipeline."""
        out = os.path.join(self.labels_path, f"{fid}.txt")
        if os.path.exists(out):
            return 0
        from monosowa_tpu.sowa import cache as cache_mod
        from monosowa_tpu.kittiio.labels import write_pseudo_label_file
        merged = cache_mod.load_merged_cars(self.merged_dir, fid)
        if merged is not None:
            tracks, points, ref_masks = merged
            before, after = self.pcfg.nscans_before, self.pcfg.nscans_after
            window = list(range(-before, after + 1))
            cars = labeler.label_from_cars(tracks, points, ref_masks, window)
            if self.pcfg.extract_pedestrians:
                _, get_points, _, _ = self._window_accessors(fid)
                cars = cars + labeler.pedestrian_labels(
                    window, get_points, self._calib(fid).P2,
                    self._image_hw(fid),
                    masks_mod.load_masks(
                        os.path.join(self.cache, "pedestrians"), fid))
            os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
            write_pseudo_label_file(out, cars)
            return 1
        return None

    def _optimize_job(self, fid: str):
        """Build a label_frames job dict for a frame (full pipeline)."""
        window, get_points, get_masks, transforms = self._window_accessors(fid)
        calib = self._calib(fid)
        img_hw = self._image_hw(fid)
        job = dict(out_path=os.path.join(self.labels_path, f"{fid}.txt"),
                   window_frames=window, get_points=get_points,
                   get_masks=get_masks, transforms=transforms,
                   p2=calib.P2, img_hw=img_hw)
        if self.pcfg.extract_pedestrians:
            # person-class masks from the pedestrians/ cache
            # (prepare_dirs taxonomy, output.py:141-143)
            job["ped_masks"] = masks_mod.load_masks(
                os.path.join(self.cache, "pedestrians"), fid)
        # global window-frame ids: overlapping windows (and consecutive
        # stream groups) then share each frame's candidate extraction
        try:
            base = int(fid)
            job["frame_ids"] = [base + k for k in window]
        except ValueError:
            job["frame_ids"] = [f"{fid}{k:+d}" for k in window]
        # per-window depth-map cache (depth_maps/<fid>/{offset:+d}.npz,
        # canonical scale like the flat per-frame maps) -> the whole
        # extraction runs device-side in bank mode
        dm_dir = os.path.join(self.cache, "depth_maps", fid)
        if os.path.isdir(dm_dir):
            fu = float(calib.P2[0, 0])

            def get_depth(k, dm_dir=dm_dir, fu=fu, window=window):
                p = os.path.join(dm_dir, f"{window[k]:+d}.npz")
                if not os.path.exists(p):
                    return None
                with np.load(p) as z:
                    d = z["depth"]
                return np.clip(
                    d.astype(np.float32) * (fu / depth_mod.CANONICAL_FOCAL),
                    0.0, depth_mod.MAX_DEPTH)

            job["get_depth"] = get_depth
        return job

    def _optimize_frame(self, labeler: PseudoLabeler, fid: str) -> int:
        out = os.path.join(self.labels_path, f"{fid}.txt")
        cached = self._optimize_frame_cached(labeler, fid)
        if cached is not None:
            return cached

        calib = self._calib(fid)
        full = transforms_mod.load_window_transforms(self.transforms_dir, fid)
        before, after = self.pcfg.nscans_before, self.pcfg.nscans_after
        if full is None:
            transforms = np.tile(np.eye(4), (before + after + 1, 1, 1))
        else:
            rng = (full.shape[0] - 1) // 2
            transforms = transforms_mod.slice_window(full, rng, before, after)
        window = list(range(-before, after + 1))

        seq_pcds = os.path.join(self.pcd_dir, fid, "pcds")

        def get_points(k):
            # window frame ids for object-layout data: only the ref frame
            # exists unless a sequence cache was generated
            path = os.path.join(seq_pcds, f"{window[k]:+d}.npz")
            if not os.path.exists(path) and window[k] == 0:
                path = os.path.join(self.pcd_dir, f"{fid}.npz")
            return depth_mod.load_pseudo_lidar(path)

        def get_masks(k):
            name = fid if window[k] == 0 else f"{fid}{window[k]:+d}"
            return masks_mod.load_masks(self.masks_dir, name)

        img_hw = self._image_hw(fid)
        ped_masks = (masks_mod.load_masks(
            os.path.join(self.cache, "pedestrians"), fid)
            if self.pcfg.extract_pedestrians else None)
        labeler.label_and_write(out, window, before, get_points, get_masks,
                                transforms, calib.P2, img_hw,
                                ped_masks=ped_masks)
        return 1

    def _image_hw(self, fid: str):
        from PIL import Image
        p = os.path.join(self.kitti_path, "training", "image_2", f"{fid}.png")
        if os.path.exists(p):
            with Image.open(p) as im:
                return im.size[1], im.size[0]
        return (375, 1242)

    def _image(self, fid: str) -> Optional[np.ndarray]:
        """(H, W, 3) uint8 RGB frame image, or None when absent."""
        from PIL import Image
        p = os.path.join(self.kitti_path, "training", "image_2", f"{fid}.png")
        if not os.path.exists(p):
            return None
        with Image.open(p) as im:
            return np.asarray(im.convert("RGB"))


class WaymoSegmentDriver:
    """Drives raw multi-camera Waymo segments through the 2D-tracker
    product path (main_class.main_waymo, tracker_for_merging: '2D').

    On-disk segment layout (one dir per segment under paths.waymo_path —
    tools/waymo_extract_segment.py writes it from a TFRecord):

      <segment>/camera_{0..4}/{frame:06d}.png   slot-ordered images
                                                (get_imgs order: SIDE_LEFT,
                                                FRONT_LEFT, FRONT,
                                                FRONT_RIGHT, SIDE_RIGHT)
      <segment>/lidar/{frame:06d}.npz           key "points": (N, 6) fused
                                                vehicle-frame xyz + cam id
                                                + (u, v) pixel
      <segment>/poses.npy                       (T, 4, 4) T_world<-vehicle

    Stage caches under merged_frames_path mirror the reference taxonomy
    (output.py:127-172): homographies/<seg>.npz, detandtracked/<seg>.npz
    (the reference's detandtrackedV2 blobs), masks_raw/<seg>/ for
    precomputed pair-canvas masks; labels under labels_path/<seg>/.
    """

    def __init__(self, cfg: Config, flags: PipelineFlags):
        from monosowa_tpu.sowa import waymo2d

        self.cfg = cfg
        self.flags = flags
        self.w2d = waymo2d
        paths = cfg.paths or Config({})
        self.waymo_path = paths.get("waymo_path", ".")
        self.cache = paths.get("merged_frames_path", "./cache")
        self.labels_path = paths.get("labels_path", "./labels")
        self.pcfg = pipeline_config_from(cfg)

    def segments(self) -> List[str]:
        return sorted(d for d in os.listdir(self.waymo_path)
                      if os.path.isdir(os.path.join(self.waymo_path, d)))

    def run(self, seq_start: Optional[int], seq_end: Optional[int]) -> int:
        segs = self.segments()[seq_start or 0:seq_end]
        n = 0
        for seg in segs:
            if self.flags.generate_homographies:
                n += self._homographies_segment(seg)
            elif self.flags.generate_raw_masks_or_tracking:
                n += self._tracking_segment(seg)
            elif self.flags.generate_transformations_only:
                n += self._transforms_segment(seg)
            elif (self.flags.do_optim
                  or self.flags.generate_merged_frames_only):
                n += self._optimize_segment(seg)
            else:
                raise NotImplementedError(
                    f"action {self.flags.action!r} for raw waymo segments")
        return n

    # -- segment data accessors -----------------------------------------
    def _seg_dir(self, seg):
        return os.path.join(self.waymo_path, seg)

    def _n_frames(self, seg) -> int:
        cam0 = os.path.join(self._seg_dir(seg), "camera_2")
        return len([f for f in os.listdir(cam0) if f.endswith(".png")])

    def _get_imgs(self, seg):
        from PIL import Image

        def get(i):
            out = []
            for slot in range(5):
                p = os.path.join(self._seg_dir(seg), f"camera_{slot}",
                                 f"{i:06d}.png")
                with Image.open(p) as im:
                    out.append(np.asarray(im))
            return out
        return get

    def _layout(self, seg):
        imgs = self._get_imgs(seg)(0)
        ist = self.cfg.image_stitching or Config({})
        return self.w2d.PairLayout(
            cam_h=imgs[2].shape[0], cam_w=imgs[2].shape[1],
            side_h=imgs[0].shape[0],
            height_pad=int(ist.get("height_pxl_pad", 100)),
            width_pad=int(ist.get("width_pxl_pad", 750)))

    def _lidar(self, seg, i) -> np.ndarray:
        p = os.path.join(self._seg_dir(seg), "lidar", f"{i:06d}.npz")
        with np.load(p) as z:
            return z["points"]

    def _poses(self, seg) -> np.ndarray:
        return np.load(os.path.join(self._seg_dir(seg), "poses.npy"))

    def _homos_path(self, seg):
        return os.path.join(self.cache, "homographies", f"{seg}.npz")

    def _tracked_path(self, seg):
        return os.path.join(self.cache, "detandtracked", f"{seg}.npz")

    # -- stages ----------------------------------------------------------
    def _homographies_segment(self, seg) -> int:
        """`--action homographies` (perform_img_stitching homography branch
        + find_the_best_homo, stitching.py:29-216)."""
        out = self._homos_path(seg)
        if os.path.exists(out):
            return 0
        layout = self._layout(seg)
        matcher = stitching_matcher_backend(self.cfg)
        homos = self.w2d.estimate_pair_homographies(
            self._get_imgs(seg), self._n_frames(seg), matcher, layout)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.savez_compressed(
            out, homos=np.stack([h if h is not None else np.full((3, 3),
                                                                 np.nan)
                                 for h in homos]))
        return 1

    def _load_homos(self, seg):
        with np.load(self._homos_path(seg)) as z:
            hs = z["homos"]
        return [None if np.isnan(h).any() else h for h in hs]

    def _pair_masks(self, seg, i, z, canvas) -> List[np.ndarray]:
        """Detection masks for one pair canvas: precomputed masks_raw
        cache first, else the configured live mask backend."""
        cached = masks_mod.load_masks(
            os.path.join(self.cache, "masks_raw", seg), f"{i:06d}_{z}")
        if cached is not None:
            return cached
        if not hasattr(self, "_mask_backend_cache"):
            self._mask_backend_cache = mask_backend(self.cfg)
        backend = self._mask_backend_cache
        if backend is None:
            return []
        return backend.predict_masks(canvas)

    def _tracking_segment(self, seg) -> int:
        """`--action mask_tracking` (perform_stitching_and_trackingV2 +
        perform_tracking, main_class.py:60-66, tracker_ODTrack.py:60-155)."""
        out = self._tracked_path(seg)
        if os.path.exists(out):
            return 0
        layout = self._layout(seg)
        homos = self._load_homos(seg)
        get_imgs = self._get_imgs(seg)
        n = self._n_frames(seg)
        stitched, det_masks = [], []
        for i in range(n):
            canvases = self.w2d.stitch_frame(get_imgs(i), homos, layout)
            stitched.append(canvases)
            det_masks.append([self._pair_masks(seg, i, z, canvases[z])
                              for z in range(4)])
        from monosowa_tpu.sowa import zoo
        cars = self.w2d.track_pair_sequence(
            stitched, det_masks, homos, layout,
            tracker_factory=zoo.tracker_factory(self.cfg))
        obs_arr = np.empty(len(cars), object)   # ragged-safe object array
        for ci, o in enumerate(cars):
            obs_arr[ci] = np.asarray(o, int)
        payload = {"cars": obs_arr}
        for i in range(n):
            for z in range(4):
                ms = det_masks[i][z]
                if ms:
                    stack = np.stack([np.asarray(m, bool) for m in ms])
                    payload[f"m_{i}_{z}"] = np.packbits(stack, axis=-1)
                    payload[f"s_{i}_{z}"] = np.asarray(stack.shape)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.savez_compressed(out, **payload)
        return 1

    def _load_tracked(self, seg, n_frames):
        with np.load(self._tracked_path(seg), allow_pickle=True) as z:
            cars = [[tuple(row) for row in obs] for obs in z["cars"]]
            det_masks = []
            for i in range(n_frames):
                frame = []
                for zi in range(4):
                    key = f"m_{i}_{zi}"
                    if key in z:
                        shape = z[f"s_{i}_{zi}"]
                        packed = z[key]
                        unpacked = np.unpackbits(
                            packed, axis=-1)[..., :shape[-1]]
                        frame.append(list(unpacked.astype(bool)))
                    else:
                        frame.append([])
                det_masks.append(frame)
        return cars, det_masks

    def _transforms_segment(self, seg) -> int:
        """`--action transformations`: vehicle poses -> camera-frame
        T_cur_to_ref windows (calculate_transformations_waymo)."""
        out_dir = os.path.join(self.cache, "transformations", seg)
        poses = self._poses(seg)
        rng = int((self.cfg.frames_creation or Config({}))
                  .get("nscans_transformation_range", 130))
        n = 0
        for i in range(len(poses)):
            fid = f"{i:06d}"
            out = transforms_mod.transforms_cache_path(out_dir, fid)
            if os.path.exists(out):
                continue
            lo, hi = max(0, i - rng), min(len(poses), i + rng + 1)
            t_cam = self.w2d.camera_transforms_from_vehicle(
                poses[lo:hi], i - lo)
            full = np.tile(np.eye(4), (2 * rng + 1, 1, 1))
            full[rng - (i - lo):rng + (hi - i)] = t_cam
            transforms_mod.save_window_transforms(out_dir, fid, full)
            n += 1
        return n

    def _optimize_segment(self, seg) -> int:
        """`--action optimization` through the 2D-tracked path
        (load_and_prepare_lidar_scan_from_multiple_waymo_tracker + the
        main_waymo per-frame fit loop)."""
        from monosowa_tpu.kittiio.labels import write_pseudo_label_file
        from monosowa_tpu.sowa import aggregation, lomm

        layout = self._layout(seg)
        homos = self._load_homos(seg)
        n_frames = self._n_frames(seg)
        cars2d, det_masks = self._load_tracked(seg, n_frames)
        poses = self._poses(seg)
        labeler = PseudoLabeler(self.pcfg)
        before, after = self.pcfg.nscans_before, self.pcfg.nscans_after
        lidars = [self._lidar(seg, i) for i in range(n_frames)]
        n_done = 0
        for ref in range(n_frames):
            out = os.path.join(self.labels_path, seg, f"{ref:06d}.txt")
            if os.path.exists(out):
                continue
            lo, hi = max(0, ref - before), min(n_frames, ref + after + 1)
            window = list(range(lo - ref, hi - ref))
            t_cam = self.w2d.camera_transforms_from_vehicle(
                poses[lo:hi], ref - lo)
            tracks = self.w2d.tracks_from_2d(
                cars2d, det_masks, lidars, homos, t_cam, ref, window,
                layout)
            lomm.classify_all(tracks, method=self.pcfg.moving_method)
            kept, points, ref_masks = aggregation.aggregate_tracks(
                tracks, t_cam, window, self.pcfg.keep_k_frames,
                self.pcfg.min_standing_points)
            cars = labeler.label_from_cars(kept, points, ref_masks, window)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            write_pseudo_label_file(out, cars)
            n_done += 1
        return n_done


def stitching_matcher_backend(cfg: Config):
    """Matcher for homography estimation: ORB by default (checkpoint-free);
    ``backends.matcher: loftr`` + ``matcher_checkpoint`` plugs in the
    TPU-served EfficientLoFTR (zoo.matcher_backend)."""
    from monosowa_tpu.sowa import zoo
    return zoo.matcher_backend(cfg)


def mask_backend(cfg: Config):
    """Live instance-segmentation backend per ``backends.mask``
    (zoo.mask_backend); None means cached-artifact mode only (masks_raw/)."""
    from monosowa_tpu.sowa import zoo
    return zoo.mask_backend(cfg)


def main(argv: Optional[List[str]] = None) -> int:
    args = parse_args(argv)
    cfg = load_config(args.config)
    flags = PipelineFlags(args.action)
    t0 = time.time()
    if args.dataset in ("kitti", "all", "waymo_converted", "kitti360"):
        driver = KittiObjectDriver(cfg, flags, dataset=args.dataset)
        # KITTI-360 workers draw seed-360-shuffled disjoint random frames
        # (main_class.py:360, 636-646); the other datasets iterate in order
        n = driver.run(args.seq_start, args.seq_end,
                       shuffle=args.dataset in ("kitti360", "all"))
    else:
        # raw waymo: the 2D-tracker stitching path over extracted segments
        driver = WaymoSegmentDriver(cfg, flags)
        n = driver.run(args.seq_start, args.seq_end)
    print(f"[{args.action}] processed {n} frames in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())

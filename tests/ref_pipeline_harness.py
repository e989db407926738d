"""Harness that drives the REFERENCE pseudo-label pipeline END-TO-END on a
synthetic scene: candidates (loader.py:2802-2922) -> 3D tracking
(loader.py:2118-2245) -> moving/standing both5 (loader.py:2516-2579) ->
aggregation/filters (loader.py:639-875) -> grid-search fit (optimizer.py) ->
3D NMS (loader.py:2727-2800) -> KITTI writer (output.py:12-91), running the
reference's OWN code (main_class.py:152-270 `main_kitti` optimization path).

The reference's native/GPU deps are replaced by contract-exact stubs:

* faiss range_search     -> brute-force pairwise distances (exact; the real
                            IVF index with nprobe=1 is itself approximate)
* pytorch3d box3d_overlap-> exact y-aligned rotated-box IoU (BEV convex
                            polygon clipping x vertical overlap)
* zstd                   -> zlib (the caches are write-then-read-back here)
* point_cloud_utils      -> average-per-voxel downsampling
* hdbscan / pyod / open3d / kornia / detectron2 -> import-only stubs (the
  shipped config has use_hdbscan: False and masks are precomputed)

Everything the pipeline computes numerically runs the reference's code.
"""

from __future__ import annotations

import importlib
import os
import pickle
import sys
import types
import zlib

import numpy as np

REF_SCRIPTS = "/root/reference/pseudo_label_generator/3d/scripts"
REF_CONFIG = "/root/reference/pseudo_label_generator/3d/configs/config.yaml"


def reference_available() -> bool:
    return os.path.isdir(REF_SCRIPTS)


# ---------------------------------------------------------------------------
# faiss stub (exact range_search; matmul-based so the 64k-pose grid is fast)
# ---------------------------------------------------------------------------

class _IndexFlatL2:
    def __init__(self, d):
        self.d = d


class _IndexIVFFlat:
    """Brute-force faiss stand-in with the exact range_search contract:
    (lims, D, I) with lims the per-query prefix array, hits strictly inside
    the squared radius, row-major (per-query) order."""

    def __init__(self, quantizer, d, nlist):
        self.data = None
        self.nprobe = 1

    def train(self, x):
        pass

    def add(self, x):
        self.data = np.ascontiguousarray(x, np.float32)
        self._dt = self.data.T.copy()
        self._sq = (self.data.astype(np.float64) ** 2).sum(1).astype(
            np.float32)

    def range_search(self, q, thresh):
        # in-place float32 pipeline: the 64k-pose coarse grid calls this
        # per pose, so the (Q, N) temporaries dominate the harness runtime
        q = np.ascontiguousarray(q, np.float32)
        d2 = q @ self._dt
        d2 *= -2.0
        d2 += (q ** 2).sum(1)[:, None]
        d2 += self._sq[None, :]
        hits = d2 < thresh
        counts = hits.sum(1)
        lims = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        rows, cols = np.nonzero(hits)
        return lims, d2[rows, cols].astype(np.float64), cols.astype(np.int64)


# ---------------------------------------------------------------------------
# pytorch3d.ops.box3d_overlap stub: exact IoU for y-axis-aligned yaw boxes
# ---------------------------------------------------------------------------

def _convex_hull_xz(corners):
    """BEV footprint of the 8 box corners -> CCW convex polygon (4, 2)."""
    pts = np.unique(np.round(corners[:, [0, 2]], 9), axis=0)
    c = pts.mean(0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    return pts[np.argsort(ang)]


def _clip_poly(subject, clip):
    """Sutherland-Hodgman convex clip (both CCW)."""
    out = list(subject)
    n = len(clip)
    for i in range(n):
        a, b = clip[i], clip[(i + 1) % n]
        edge = np.array([b[0] - a[0], b[1] - a[1]])
        inp, out = out, []
        if not inp:
            break
        prev = inp[-1]
        prev_in = edge[0] * (prev[1] - a[1]) - edge[1] * (prev[0] - a[0]) >= 0
        for cur in inp:
            cur_in = edge[0] * (cur[1] - a[1]) - edge[1] * (cur[0] - a[0]) >= 0
            if cur_in != prev_in:
                d = cur - prev
                denom = edge[0] * d[1] - edge[1] * d[0]
                t = (edge[1] * (prev[0] - a[0])
                     - edge[0] * (prev[1] - a[1])) / denom
                out.append(prev + t * d)
            if cur_in:
                out.append(cur)
            prev, prev_in = cur, cur_in
    return out


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    p = np.asarray(poly)
    x, z = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(z, -1)) - np.dot(z, np.roll(x, -1)))


def _box3d_overlap(b1, b2):
    """pytorch3d.ops.box3d_overlap contract for (N,8,3)/(M,8,3) torch
    corner tensors of y-aligned boxes -> (vol, iou) torch tensors."""
    import torch
    c1 = b1.detach().cpu().numpy().astype(np.float64)
    c2 = b2.detach().cpu().numpy().astype(np.float64)
    n, m = c1.shape[0], c2.shape[0]
    vol = np.zeros((n, m))
    iou = np.zeros((n, m))
    for i in range(n):
        p1 = _convex_hull_xz(c1[i])
        y1a, y1b = c1[i][:, 1].min(), c1[i][:, 1].max()
        v1 = _poly_area(p1) * (y1b - y1a)
        for j in range(m):
            p2 = _convex_hull_xz(c2[j])
            y2a, y2b = c2[j][:, 1].min(), c2[j][:, 1].max()
            v2 = _poly_area(p2) * (y2b - y2a)
            inter_a = _poly_area(_clip_poly(list(p1), list(p2)))
            inter_y = max(0.0, min(y1b, y2b) - max(y1a, y2a))
            vi = inter_a * inter_y
            vol[i, j] = vi
            union = v1 + v2 - vi
            iou[i, j] = vi / union if union > 0 else 0.0
    return torch.tensor(vol), torch.tensor(iou)


# ---------------------------------------------------------------------------
# module stubs
# ---------------------------------------------------------------------------

def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def install_stubs():
    mods = sys.modules
    if "faiss" not in mods:
        mods["faiss"] = _module("faiss", IndexFlatL2=_IndexFlatL2,
                                IndexIVFFlat=_IndexIVFFlat)
    else:  # reuse whatever faiss stub is installed, but keep contract
        faiss = mods["faiss"]
        if not hasattr(faiss, "IndexFlatL2"):
            faiss.IndexFlatL2 = _IndexFlatL2
            faiss.IndexIVFFlat = _IndexIVFFlat

    if "zstd" not in mods:
        mods["zstd"] = _module("zstd", compress=zlib.compress,
                               decompress=zlib.decompress)

    if "open3d" not in mods:
        o3d = _module("open3d")
        mods["open3d"] = o3d

    if "pytorch3d" not in mods or not hasattr(
            mods.get("pytorch3d", None), "ops"):
        p3d = mods.get("pytorch3d") or _module("pytorch3d")
        ops = _module("pytorch3d.ops", box3d_overlap=_box3d_overlap)
        io = _module("pytorch3d.io", load_objs_as_meshes=None)
        tr = mods.get("pytorch3d.transforms") or _module(
            "pytorch3d.transforms", euler_angles_to_matrix=None)
        p3d.ops, p3d.io, p3d.transforms = ops, io, tr
        mods["pytorch3d"] = p3d
        mods["pytorch3d.ops"] = ops
        mods["pytorch3d.io"] = io
        mods["pytorch3d.transforms"] = tr

    if "detectron2" not in mods:
        d2 = _module("detectron2")
        utils = _module("detectron2.utils")
        logger = _module("detectron2.utils.logger",
                         setup_logger=lambda *a, **k: None)
        ckpt = _module("detectron2.checkpoint", DetectionCheckpointer=None)
        cfgm = _module("detectron2.config", LazyConfig=None, instantiate=None)
        eng = _module("detectron2.engine")
        engd = _module("detectron2.engine.defaults", create_ddp_model=None)
        utils.logger = logger
        d2.utils, d2.checkpoint, d2.config, d2.engine = utils, ckpt, cfgm, eng
        eng.defaults = engd
        mods.update({"detectron2": d2, "detectron2.utils": utils,
                     "detectron2.utils.logger": logger,
                     "detectron2.checkpoint": ckpt,
                     "detectron2.config": cfgm,
                     "detectron2.engine": eng,
                     "detectron2.engine.defaults": engd})
    else:
        d2 = mods["detectron2"]
        if "detectron2.checkpoint" not in mods:
            ckpt = _module("detectron2.checkpoint",
                           DetectionCheckpointer=None)
            cfgm = _module("detectron2.config", LazyConfig=None,
                           instantiate=None)
            eng = _module("detectron2.engine")
            engd = _module("detectron2.engine.defaults",
                           create_ddp_model=None)
            eng.defaults = engd
            d2.checkpoint, d2.config, d2.engine = ckpt, cfgm, eng
            mods.update({"detectron2.checkpoint": ckpt,
                         "detectron2.config": cfgm,
                         "detectron2.engine": eng,
                         "detectron2.engine.defaults": engd})

    if "hdbscan" not in mods:
        mods["hdbscan"] = _module("hdbscan", HDBSCAN=None)

    if "pyod" not in mods:
        pyod = _module("pyod")
        models = _module("pyod.models")
        hbos = _module("pyod.models.hbos", HBOS=None)
        pyod.models = models
        models.hbos = hbos
        mods.update({"pyod": pyod, "pyod.models": models,
                     "pyod.models.hbos": hbos})

    def _pcu_voxel(voxel_size, pts):
        vs = float(voxel_size[0] if hasattr(voxel_size, "__len__")
                   else voxel_size)
        pts = np.asarray(pts, np.float64)
        mins = pts.min(0)
        idx = np.floor((pts - mins) / vs).astype(np.int64)
        _, inv = np.unique(idx, axis=0, return_inverse=True)
        k = inv.max() + 1
        sums = np.zeros((k, 3))
        np.add.at(sums, inv, pts)
        counts = np.bincount(inv, minlength=k).astype(np.float64)
        return sums / counts[:, None]

    if "point_cloud_utils" not in mods:
        mods["point_cloud_utils"] = _module(
            "point_cloud_utils",
            downsample_point_cloud_on_voxel_grid=_pcu_voxel)

    if "kornia" not in mods:
        kornia = _module("kornia")
        geom = _module("kornia.geometry")
        tr = _module("kornia.geometry.transform", warp_perspective=None)
        kornia.geometry = geom
        geom.transform = tr
        mods.update({"kornia": kornia, "kornia.geometry": geom,
                     "kornia.geometry.transform": tr})


# ---------------------------------------------------------------------------
# pipeline construction + scene IO
# ---------------------------------------------------------------------------

def build_reference_pipeline(tmpdir, window=6, grid=(16, 16, 24),
                             total_frames=24, template=None):
    """Returns a reference pipeline object (Output+Losses+Optimizer+
    Filtering+Loader mixins over the shipped config) pointed at tmp dirs.

    grid = (n_dx, n_dz, n_theta) coarse-grid sizes (reduced identically on
    the rebuilt side for test wall clock; the geometry/ranges are shipped).
    """
    import yaml

    install_stubs()
    if REF_SCRIPTS not in sys.path:
        sys.path.insert(0, REF_SCRIPTS)

    kitti = os.path.join(tmpdir, "kitti/")
    mapping = os.path.join(kitti, "object_detection/devkit_object/mapping")
    os.makedirs(mapping, exist_ok=True)
    os.makedirs(os.path.join(kitti, "object_detection/training/image_2"),
                exist_ok=True)
    with open(os.path.join(mapping, "train_rand.txt"), "w") as f:
        f.write("1")
    with open(os.path.join(mapping, "train_mapping.txt"), "w") as f:
        f.write("2011_09_26 2011_09_26_drive_0001_sync 0000000005\n")
    merged = os.path.join(tmpdir, "merged/")
    labels = os.path.join(tmpdir, "labels_ref/")
    pcds = os.path.join(tmpdir, "pcds/")
    for d in (os.path.join(merged, "masks_raw"),
              os.path.join(merged, "transformations"), labels, pcds):
        os.makedirs(d, exist_ok=True)

    # Loader.__init__ reads mapping files from cfg.paths at construction
    # time, so patch the shipped yaml (paths + reduced window/grid) and
    # hand the reference that file — every other key stays as shipped.
    with open(REF_CONFIG) as f:
        cfg_dict = yaml.safe_load(f)
    cfg_dict["paths"]["kitti_path"] = kitti
    cfg_dict["paths"]["merged_frames_path"] = merged
    cfg_dict["paths"]["labels_path"] = labels
    cfg_dict["frames_creation"]["nscans_before"] = window
    cfg_dict["frames_creation"]["nscans_after"] = window
    cfg_dict["frames_creation"]["nscans_transformation_range"] = window
    cfg_dict["optimization"]["opt_param1_iters"] = grid[0]
    cfg_dict["optimization"]["opt_param2_iters"] = grid[1]
    cfg_dict["optimization"]["opt_param3_iters"] = grid[2]
    patched_cfg = os.path.join(tmpdir, "config_patched.yaml")
    with open(patched_cfg, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    loader_mod = importlib.import_module("loader")
    loss_mod = importlib.import_module("loss")
    optimizer_mod = importlib.import_module("optimizer")
    filtering_mod = importlib.import_module("filtering")
    output_mod = importlib.import_module("output")

    class RefPipe(output_mod.Output, loss_mod.Losses, optimizer_mod.Optimizer,
                  filtering_mod.Filtering, loader_mod.Loader):
        pass

    args = types.SimpleNamespace(config=patched_cfg, dataset="kitti",
                                 action="optimization", seq_start=-1,
                                 seq_end=-1)
    pipe = RefPipe(args)
    pipe.pseudo_lidar_folder = pcds
    pipe.total_frames = total_frames
    if template is not None:
        pipe.lidar_car_template_non_filt = [np.asarray(template, np.float64)]
    return pipe


def run_reference_on_scene(pipe, scene):
    """scene: dict with
      frames:      {frame_number: {"points": (N,3) cam-frame float32,
                                   "masks": [(H,W) bool, ...]}}
      ref_frame:   int frame number of the reference frame
      transforms:  (2*window+1, 4, 4) T_cur_to_ref for the ref window
      p2:          (3, 4) projection
      img_hw:      (H, W)
    Writes the reference label txt and returns its path."""
    import zstd as zstd_mod

    window = pipe.cfg.frames_creation.nscans_before
    h, w = scene["img_hw"]
    ref = scene["ref_frame"]
    file_name = f"{ref:06d}"

    for num, fr in scene["frames"].items():
        np.savez(os.path.join(pipe.pseudo_lidar_folder,
                              str(num).zfill(10) + ".npz"),
                 array1=np.asarray(fr["points"], np.float32))

    # masks_raw cache: per window slot, (N_masks, W, H) transposed layout
    # exactly as precompute_detectron_kitti stores detectron masks
    masks_window = []
    for i in range(-window, window + 1):
        num = ref + i
        fr = scene["frames"].get(num)
        if fr is None:
            masks_window.append([])
        else:
            arr = np.array([np.asarray(m, bool).T for m in fr["masks"]])
            masks_window.append(arr)
    blob = zstd_mod.compress(pickle.dumps(masks_window,
                                          pickle.HIGHEST_PROTOCOL))
    with open(os.path.join(pipe.cfg.paths.merged_frames_path, "masks_raw",
                           file_name + ".zstd"), "wb") as f:
        f.write(blob)

    np.save(os.path.join(pipe.cfg.paths.merged_frames_path, "transformations",
                         file_name + ".npy"),
            np.asarray(scene["transforms"], np.float64))

    p2 = np.asarray(scene["p2"], np.float64)
    pipe.kitti_data = types.SimpleNamespace(
        oxts=[None] * pipe.total_frames,
        calib=types.SimpleNamespace(P_rect_00=p2))
    pipe.file_number = ref
    pipe.file_name = file_name
    pipe.pic_index = ref
    pipe.path_to_folder = os.path.join(pipe.pseudo_lidar_folder, "nothere/")
    pipe.img = np.zeros((3, h, w), np.uint8)

    # --- main_kitti optimization path (main_class.py:203-259) -------------
    pipe.load_and_prepare_lidar_scan_from_multiple_pykittiV2(
        pipe.file_name, pipe.img, save=False)
    for idx in range(len(pipe.cars)):
        if not pipe.est_location_and_downsample(pipe.cars[idx]):
            continue
        pipe.cars[idx] = pipe.optimize_car(pipe.cars[idx])
    pipe.cars, to_be_reopt = pipe.non_maxima_surpression(pipe.cars)
    if pipe.cfg.optimization.nms_merge_and_reopt:
        for index in to_be_reopt:
            if not pipe.est_location_and_downsample(pipe.cars[index]):
                continue
            pipe.cars[index] = pipe.optimize_car(pipe.cars[index])
    pipe.writetxt_cars(pipe.cars)
    return os.path.join(pipe.cfg.paths.labels_path, file_name + ".txt")

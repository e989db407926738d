"""WHOLE-PIPELINE differential parity: the reference auto-labeller running
its own code end-to-end (candidates -> tracking -> both5 -> aggregation ->
grid fit -> NMS+reopt -> writer; see ref_pipeline_harness) vs the rebuilt
PseudoLabeler on the SAME synthetic scenes.

Both sides consume identical per-frame point clouds, masks, transforms and
the identical (single) template cloud, with identically reduced coarse
grids; final KITTI label files must agree: same car count, matched centers
within grid quantization, theta within the binary-loss plateau (mod pi),
dims/score byte-identical, 2D boxes byte-identical, AND the rebuilt pose
must score at least as well under the reference's own loss on the
reference's own aggregated points.

Scenes: multi-standing-car (incl. a split-mask car that exercises
NMS-merge+reopt), a moving car, and a truncated window at the sequence
start with an image-edge-truncated mask (the clever-aggregation penalty).
"""

import os
import sys

import numpy as np
import pytest
import scipy.ndimage

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ref_pipeline_harness as harness

pytestmark = pytest.mark.skipif(not harness.reference_available(),
                                reason="reference checkout not present")

H, W = 192, 640
FU = 320.0
P2 = np.array([[FU, 0, W / 2, 0], [0, FU, H / 2, 0], [0, 0, 1, 0]],
              np.float64)
WINDOW = 6
GRID = (10, 10, 16)            # (n_dx, n_dz, n_theta) on BOTH sides
CELL_X = 4.0 / (GRID[0] - 1)
CELL_Z = 4.0 / (GRID[1] - 1)
N_TOTAL = 24


def _template():
    """The shared (single) template cloud, subsampled to 500 points so the
    reference's per-pose python loss loop stays test-sized; both sides use
    this identical array."""
    from monosowa_tpu.sowa.templates import TemplateBank
    tpl = TemplateBank.default().points[0].astype(np.float64)
    idx = np.sort(np.random.default_rng(0).choice(len(tpl), size=500,
                                                  replace=False))
    return tpl[idx]


def _project(pts):
    hom = np.hstack([pts, np.ones((len(pts), 1))]) @ P2.T
    return hom[:, :2] / hom[:, 2:3]


def _mask_from_points(pts):
    uv = np.rint(_project(pts)).astype(int)
    ok = ((uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0)
          & (uv[:, 1] < H) & (pts[:, 2] > 0.5))
    mask = np.zeros((H, W), bool)
    mask[uv[ok, 1], uv[ok, 0]] = True
    return scipy.ndimage.binary_dilation(mask, iterations=2)


def build_scene(ref_frame, cars, n_total=N_TOTAL, seed=0, ego_dz=0.8):
    """cars: list of dicts {x, y, z, theta, vx, vz, split(bool)} in WORLD
    coords (world == ref==0 ego frame).  Returns the harness scene dict."""
    rng = np.random.default_rng(seed)
    tpl = _template()

    car_clouds = []
    for c in cars:
        idx = rng.choice(len(tpl), size=300, replace=False)
        car_clouds.append(tpl[idx])

    # ground plane point grid (y = 1.65) backprojected from a pixel lattice
    vs, us = np.mgrid[H // 2 + 6:H:3, 0:W:3]
    depth = FU * 1.65 / (vs - H / 2).astype(np.float64)
    keep = depth < 55.0
    gx = (us - W / 2) * depth / FU
    gy = np.full_like(depth, 1.65)
    ground = np.stack([gx[keep], gy[keep], depth[keep]], -1)

    frames = {}
    for k in range(n_total):
        ego_z = k * ego_dz
        pts_list = [ground]
        masks = []
        for c, cloud in zip(cars, car_clouds):
            t = k - ref_frame
            cx = c["x"] + c.get("vx", 0.0) * t
            cz = c["z"] + c.get("vz", 0.0) * t
            th = c["theta"]
            rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                            [-np.sin(th), 0, np.cos(th)]])
            world = cloud @ rot.T + np.array([cx, c["y"], cz])
            # cam frame of frame k: world frame == the REF camera frame
            cam = world.copy()
            cam[:, 2] -= (ego_z - ref_frame * ego_dz)
            if cam[:, 2].min() < 2.0 or cam[:, 2].max() > 70.0:
                continue
            pts_list.append(cam)
            if c.get("split"):
                mid = np.median(_project(cam)[:, 0])
                uvx = _project(cam)[:, 0]
                masks.append(_mask_from_points(cam[uvx < mid]))
                masks.append(_mask_from_points(cam[uvx >= mid]))
            else:
                masks.append(_mask_from_points(cam))
        pts = np.concatenate(pts_list, 0)
        pts = pts + rng.normal(scale=0.008, size=pts.shape)
        frames[k] = {"points": pts.astype(np.float32), "masks": masks}

    transforms = np.tile(np.eye(4), (2 * WINDOW + 1, 1, 1))
    for i, off in enumerate(range(-WINDOW, WINDOW + 1)):
        transforms[i, 2, 3] = off * ego_dz    # T_cur_to_ref: +z ego motion
    return {"frames": frames, "ref_frame": ref_frame,
            "transforms": transforms, "p2": P2, "img_hw": (H, W)}


# ---------------------------------------------------------------------------

def run_ours(scene, tmp_path):
    from monosowa_tpu.sowa import pipeline
    from monosowa_tpu.sowa.fitting import FitConfig

    from monosowa_tpu.sowa.fitting import make_conv_kernels

    # CPU-budget shapes: every padded fit row does the full grid search
    # (the single-frame label_frame path pads straight to max_cars), so
    # pad to 4 cars and cap points at 4096 (the scene clouds are <= ~3000
    # pts and <= 4 candidates/frame, so nothing is subsampled or dropped
    # and parity stays exact)
    cfg = pipeline.PipelineConfig(
        nscans_before=WINDOW, nscans_after=WINDOW, max_cars=4,
        max_points=4096, fit_bucket=4,
        fit=FitConfig(n_dx=GRID[0], n_dz=GRID[1], n_theta=GRID[2],
                      fine_chunk=12))
    labeler = pipeline.PseudoLabeler(cfg)
    # the identical 500-pt template cloud the reference side was given
    import jax.numpy as jnp
    tpl = _template().astype(np.float32)
    labeler.template = jnp.asarray(tpl)
    labeler.conv_spec, labeler.occ_kernels, labeler.memb_kernels = \
        make_conv_kernels(tpl, cfg.fit)
    offsets = list(range(-WINDOW, WINDOW + 1))
    ref = scene["ref_frame"]
    frames = scene["frames"]

    def get_points(k):
        fr = frames.get(ref + offsets[k])
        return None if fr is None else fr["points"]

    def get_masks(k):
        fr = frames.get(ref + offsets[k])
        return None if fr is None else fr["masks"]

    out = str(tmp_path / f"ours_{ref:06d}.txt")
    labeler.label_and_write(out, offsets, WINDOW,
                            get_points=get_points, get_masks=get_masks,
                            transforms=scene["transforms"], p2=P2,
                            img_hw=(H, W))
    return out


def parse_labels(path):
    rows = []
    with open(path) as f:
        for line in f:
            p = line.split()
            if not p:
                continue
            rows.append(dict(cls=p[0], box=[float(v) for v in p[4:8]],
                             h=float(p[8]), w=float(p[9]), l=float(p[10]),
                             x=float(p[11]), y=float(p[12]), z=float(p[13]),
                             yaw=float(p[14]), score=float(p[15])))
    return rows


def _ref_loss_at(pipe, scan, x, y, z, theta):
    """The reference's own binary2way loss at a pose over ``scan``."""
    pipe.filtered_lidar = scan
    pipe.index = pipe.create_faiss_tree(scan)
    tpl = pipe.get_template(x, y, z, theta)
    return pipe.binary_loss_bothway_faiss(scan, tpl)


def _written_ref_cars(pipe):
    """The reference Car objects in the order writetxt_cars emitted them."""
    out = []
    for car in pipe.cars:
        if not (car.optimized and car.lidar is not None):
            continue
        if car.mask is None and pipe.cfg.optimization.skip_non_visible_cars:
            continue
        out.append(car)
    return out


def _compare(ref_rows, our_rows, pipe, label=""):
    assert len(our_rows) == len(ref_rows), (
        f"{label}: car count {len(our_rows)} != reference {len(ref_rows)}\n"
        f"ref={ref_rows}\nours={our_rows}")
    ref_cars = _written_ref_cars(pipe)
    assert len(ref_cars) == len(ref_rows)

    used = set()
    for r_i, ref_row in enumerate(ref_rows):
        best, best_d = None, np.inf
        for o_i, our_row in enumerate(our_rows):
            if o_i in used:
                continue
            d = np.hypot(ref_row["x"] - our_row["x"],
                         ref_row["z"] - our_row["z"])
            if d < best_d:
                best, best_d = o_i, d
        assert best is not None
        used.add(best)
        ours = our_rows[best]

        ctx = f"{label} ref_row {r_i}: ref={ref_row} ours={ours}"
        assert ours["cls"] == ref_row["cls"], ctx
        assert (ours["h"], ours["w"], ours["l"]) == \
            (ref_row["h"], ref_row["w"], ref_row["l"]), ctx
        assert ours["score"] == ref_row["score"], ctx
        assert ours["box"] == ref_row["box"], ctx
        assert abs(ours["x"] - ref_row["x"]) <= 1.5 * CELL_X + 0.05, ctx
        assert abs(ours["z"] - ref_row["z"]) <= 1.5 * CELL_Z + 0.05, ctx
        assert abs(ours["y"] - ref_row["y"]) <= 0.08, ctx

        # mod pi: the binary loss has a symmetric plateau; the reference's
        # strict argmin picks the plateau's first edge while the rebuilt
        # fine pass takes the plateau centroid, so allow the plateau width
        # — the loss criterion below is the strong check
        dth = (ours["yaw"] - ref_row["yaw"] + np.pi) % (2 * np.pi) - np.pi
        assert min(abs(dth), abs(abs(dth) - np.pi)) < np.deg2rad(10), ctx

        # the strong criterion: our pose scores at least as well under the
        # REFERENCE's loss evaluated on the REFERENCE's aggregated points
        scan = np.ascontiguousarray(ref_cars[r_i].lidar[:3].T)
        th_ref = ref_row["yaw"] + np.pi / 2
        th_our = ours["yaw"] + np.pi / 2
        l_ref = _ref_loss_at(pipe, scan, ref_row["x"],
                             ref_row["y"] - ref_row["h"] / 2, ref_row["z"],
                             th_ref)
        l_our = _ref_loss_at(pipe, scan, ours["x"],
                             ours["y"] - ours["h"] / 2, ours["z"], th_our)
        assert l_our <= l_ref + 0.03, (ctx, l_our, l_ref)


def _run_case(scene, tmp_path, label):
    pipe = harness.build_reference_pipeline(
        str(tmp_path), window=WINDOW, grid=GRID, total_frames=N_TOTAL,
        template=_template())
    ref_path = harness.run_reference_on_scene(pipe, scene)
    our_path = run_ours(scene, tmp_path)
    ref_rows = parse_labels(ref_path)
    our_rows = parse_labels(our_path)
    assert ref_rows, f"{label}: reference produced no cars"
    _compare(ref_rows, our_rows, pipe, label)
    return ref_rows


@pytest.mark.slow
def test_standing_cars_with_nms_merge(tmp_path):
    scene = build_scene(ref_frame=10, cars=[
        dict(x=-3.0, y=0.9, z=13.0, theta=0.4),
        dict(x=3.5, y=0.9, z=19.0, theta=2.1),
        dict(x=0.5, y=0.9, z=28.0, theta=1.2, split=True),
    ], seed=1)
    rows = _run_case(scene, tmp_path, "standing")
    assert len(rows) == 3          # split-mask car merged by NMS


def test_moving_car(tmp_path):
    scene = build_scene(ref_frame=10, cars=[
        dict(x=-2.5, y=0.9, z=16.0, theta=0.0),
        # drives toward the ego at 0.9 m/frame: net displacement ~10 m;
        # theta=pi matches the trajectory estimate -arctan2(dz,dx)+pi/2
        dict(x=2.0, y=0.9, z=24.0, theta=np.pi, vz=-0.9),
    ], seed=2)
    rows = _run_case(scene, tmp_path, "moving")
    assert len(rows) == 2


@pytest.mark.slow
def test_truncated_window_and_edge_mask(tmp_path):
    # reference frame near the sequence start: window frames -6..-3 missing;
    # one car projects onto the left image edge (truncated-mask penalty in
    # the clever aggregation)
    scene = build_scene(ref_frame=3, cars=[
        dict(x=-8.0, y=0.9, z=9.0, theta=0.1),
        dict(x=2.0, y=0.9, z=21.0, theta=2.8),
    ], n_total=16, seed=3)
    _run_case(scene, tmp_path, "edge")

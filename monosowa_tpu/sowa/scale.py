"""Scale detector: template/size grid search + bbox reducer.

Behavioral contract (pseudo_label_generator/3d/scripts/optimizer.py:179-290
optimize_scale and scale_detector.py:14-259):

* second grid search over 4 template models x 8 length scales
  (x optional 8 width scales) x 10x10 translations whose ranges are
  modulated by |cos/sin theta| (optimizer.py:204-209), height scale fixed
  from the point y-extent clipped to [0.75, 1.25]; then an 8x20
  height-scale x shift pass (optimizer.py:259-290);
* ``bbox_reducer``: gather points inside the fitted box bloated by
  width_bloat/0.4 (scale_detector.py:150-175), shrink to the axis-aligned
  extent of contained points in the box frame, +0.1 m length offset,
  falling back to template dims when the reduced length deviates beyond
  [max_length_diff_scale, 1.1] x the fitted length (:223-240).

TPU design: the whole scale grid is one vmapped exact-TFL evaluation
(chunked); the template bank is pre-posed per (model, length, width) so
poses share the MXU distance matrices.  Off by default
(use_scale_detector False, configs/config.yaml:90) like the reference.

DOCUMENTED DEVIATION: the reference's KITTI scale branch
(optimizer.py:438-463 get_template(scale=True)) applies
``[:, 0] *= scale_length; [:, 1] *= scale_width; [:, 2] *= scale_height``
to camera-frame templates whose axes are x=width (1.63 m extent),
y=height (1.53), z=length (3.88) — i.e. its "length" scale varies the
car's WIDTH, its height-extent-derived scale varies the LENGTH, and the
"width" scale (a no-op [1.0] in the shipped config) would vary the
HEIGHT; `lidar_car_template_scale` is the same list as the main
templates (loader.py:3498).  This rebuild scales the geometrically
intended axes instead: width*x, height*y, length*z.  No differential
test is possible against the swapped-axis code without reproducing the
bug; the loss machinery underneath is the same binary2way TFL already
reference-parity-tested in tests/test_reference_fit_parity.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.ops import tfl
from monosowa_tpu.ops.geometry import rot_y, points_in_obb, points_in_obb_r

BIG = 1e9


@dataclasses.dataclass(frozen=True)
class ScaleConfig:
    scale_min: float = 0.75
    scale_max: float = 1.25
    n_scale: int = 8            # scale_num_scale_iters
    n_width: int = 8            # width_num_scale_iters
    n_trans: int = 10           # opt_param{1,2}_scale_iters
    independent_width: bool = False
    num_templates: int = 4
    radius: float = 0.2
    template_length: float = 3.88
    template_width: float = 1.63
    template_height: float = 1.526
    height_n: int = 8
    height_trans_n: int = 20
    chunk: int = 64


class ScaleResult(NamedTuple):
    template_index: jnp.ndarray
    length: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    theta: jnp.ndarray
    loss: jnp.ndarray


def _chunked_losses(scan, scan_mask, posed, radius, chunk):
    n = posed.shape[0]
    pad = (-n) % chunk
    posed_p = jnp.concatenate(
        [posed, jnp.full((pad,) + posed.shape[1:], BIG, posed.dtype)], 0)
    losses = jax.lax.map(
        lambda batch: tfl.binary_both_way_loss(scan, scan_mask, batch, radius),
        posed_p.reshape(-1, chunk, posed.shape[1], 3))
    return losses.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("cfg",))
def optimize_scale(scan: jnp.ndarray, scan_mask: jnp.ndarray,
                   templates: jnp.ndarray, base_pose: jnp.ndarray,
                   cfg: ScaleConfig = ScaleConfig()) -> ScaleResult:
    """scan (S, 3) camera coords; templates (4, T, 3) canonical;
    base_pose = [x, y, z, theta] from the main fit."""
    x0, y0, z0, theta = base_pose[0], base_pose[1], base_pose[2], base_pose[3]

    # height scale from the point extent (optimizer.py:196-201)
    ys = jnp.where(scan_mask, scan[:, 1], BIG)
    y_ext = (jnp.max(jnp.where(scan_mask, scan[:, 1], -BIG)) - jnp.min(ys))
    h_scale = jnp.clip(y_ext / cfg.template_height, 0.75, 1.25)

    # translation ranges modulated by theta (optimizer.py:204-207)
    amp = jnp.abs(jnp.cos(theta) + jnp.sin(theta))
    t1 = jnp.linspace(-amp, amp, cfg.n_trans)
    t2 = jnp.linspace(-amp, amp, cfg.n_trans)
    scales = np.linspace(cfg.scale_min, cfg.scale_max, cfg.n_scale)
    widths = (np.linspace(cfg.scale_min, cfg.scale_max, cfg.n_width)
              if cfg.independent_width else np.array([1.0]))

    # pose table: (template, l_scale, w_scale, t1, t2)
    ti, li, wi, ai, bi = np.meshgrid(
        np.arange(cfg.num_templates), np.arange(len(scales)),
        np.arange(len(widths)), np.arange(cfg.n_trans),
        np.arange(cfg.n_trans), indexing="ij")
    ti = jnp.asarray(ti.reshape(-1))
    li = jnp.asarray(li.reshape(-1))
    wi = jnp.asarray(wi.reshape(-1))
    ai = jnp.asarray(ai.reshape(-1))
    bi = jnp.asarray(bi.reshape(-1))

    rot = rot_y(theta)
    sl = jnp.asarray(scales)[li]
    sw = jnp.where(cfg.independent_width, jnp.asarray(widths)[wi], sl)

    def pose_points(k):
        tpl = templates[ti[k]]
        scaled = tpl * jnp.stack([sw[k], h_scale, sl[k]])
        posed = scaled @ rot.T
        off = jnp.stack([t1[ai[k]] + x0, y0, t2[bi[k]] + z0])
        return posed + off

    posed_all = jax.lax.map(pose_points, jnp.arange(ti.shape[0]))
    losses = _chunked_losses(scan, scan_mask, posed_all, cfg.radius,
                             cfg.chunk)
    best = jnp.argmin(losses)
    bt = ti[best]
    bl = sl[best]
    bw = sw[best]
    bx = t1[ai[best]] + x0
    bz = t2[bi[best]] + z0

    # second pass: height scale x y-shift (optimizer.py:259-290)
    h_scales = jnp.linspace(cfg.scale_min, cfg.scale_max, cfg.height_n)
    y_shifts = jnp.linspace(-amp, amp, cfg.height_trans_n)
    hi, yi = jnp.meshgrid(jnp.arange(cfg.height_n),
                          jnp.arange(cfg.height_trans_n), indexing="ij")
    hi, yi = hi.reshape(-1), yi.reshape(-1)

    def pose_points2(k):
        tpl = templates[bt]
        scaled = tpl * jnp.stack([bw, h_scales[hi[k]], bl])
        posed = scaled @ rot.T
        off = jnp.stack([bx, y_shifts[yi[k]] + y0, bz])
        return posed + off

    posed2 = jax.lax.map(pose_points2, jnp.arange(hi.shape[0]))
    losses2 = _chunked_losses(scan, scan_mask, posed2, cfg.radius, cfg.chunk)
    best2 = jnp.argmin(losses2)

    return ScaleResult(
        template_index=bt,
        length=bl * cfg.template_length,
        width=bw * cfg.template_width,
        height=h_scales[hi[best2]] * cfg.template_height,
        x=bx, y=y_shifts[yi[best2]] + y0, z=bz, theta=theta,
        loss=losses2[best2])


def extract_scale_lidar_scans(center, lwh, theta, scans, transforms,
                              bbox_scale: float = 1.5) -> np.ndarray:
    """Re-aggregate a standing car's points from live per-frame scans for
    the scale optimizer — the real-LiDAR branch of
    ``extract_lidar_data_from_bbox_tracker`` (scale_detector.py:14-104).
    With ``use_pseudo_lidar: True`` the reference short-circuits to
    ``scale_lidar = lidar`` (:17-21), which the pipeline's default path
    already matches by fitting on the aggregated cloud.

    Per neighbor frame: the fitted yaw box (dims x ``bbox_scale``,
    scale_detector.bbox_scale / create_bboxes :121) is carried into the
    frame with the inverse ego transform (:67-78 — the box center is
    moved by T_inv and its rotation becomes T_inv[:3,:3] @ R_y(theta),
    no longer yaw-only), live-scan points inside are gathered and
    returned to the reference frame with T (:85-91).

    ``scans``: list of (N_i, >=3) camera-frame arrays (one per frame);
    ``transforms``: (T, 4, 4) T_cur_to_ref.  Returns (M, 3) ref-frame
    points (possibly empty).
    """
    center = np.asarray(center, np.float64)
    lwh = np.asarray(lwh, np.float64) * bbox_scale
    ry = np.asarray(rot_y(jnp.float32(theta)), np.float64)
    out = []
    for scan, t in zip(scans, np.asarray(transforms, np.float64)):
        if scan is None or len(scan) == 0:
            continue
        t_inv = np.linalg.inv(t)
        c_cur = t_inv[:3, :3] @ center + t_inv[:3, 3]
        r_cur = t_inv[:3, :3] @ ry
        pts = np.asarray(scan, np.float64)[:, :3]
        inside = np.asarray(points_in_obb_r(
            jnp.asarray(pts), jnp.asarray(c_cur), jnp.asarray(lwh),
            jnp.asarray(r_cur)))
        if not inside.any():
            continue
        sel = pts[inside]
        out.append(sel @ t[:3, :3].T + t[:3, 3])
    if not out:
        return np.zeros((0, 3))
    return np.concatenate(out, 0)


def _local_aabb(scan, inside, gather_center, theta):
    """Axis-aligned extents/centers of the inside points in the gather
    box's local frame (x=width, y=height, z=length)."""
    local = (scan - gather_center) @ rot_y(theta)
    lo = jnp.min(jnp.where(inside[:, None], local, BIG), axis=0)
    hi = jnp.max(jnp.where(inside[:, None], local, -BIG), axis=0)
    return lo, hi


@partial(jax.jit, static_argnames=("width_bloat", "length_offset",
                                   "max_length_diff", "template_dims"))
def bbox_reduce(scan: jnp.ndarray, scan_mask: jnp.ndarray,
                center: jnp.ndarray, lwh: jnp.ndarray, theta: jnp.ndarray,
                width_bloat: float = 0.5, length_offset: float = 0.1,
                max_length_diff: float = 0.75,
                template_dims: tuple = (3.88, 1.63, 1.526)):
    """Shrink a fitted box to the axis-aligned extent of contained points.

    Reference-exact (scale_detector.py:135-259 ``bbox_reducer_tracked``,
    KITTI branch; differentially tested in
    tests/test_scale_reference_parity.py):

    1. gather points in the fitted box bloated by |cos|/|sin|-modulated
       ``width_bloat`` on the width/length axes and 0.4 on height, the box
       shifted up by 0.4 (:154-158);
    2. new length = local-z extent of the gathered points; the new center
       keeps the gathered AABB's y and z (length-axis) offsets but zeroes
       the cross (width) shift (:178-187);
    3. a second gather bloated 0.8 in height and shifted up only 0.2 gives
       the refined height (:197-218);
    4. fall back to template dims at the original center when the reduced
       length is outside [max_length_diff, 1.1] x the fitted length
       (:223-240); otherwise width is kept and length gets +0.1 m (:241-246).

    Returns (center', lwh', used_reduction flag).  scan in camera coords.
    """
    sin_b = jnp.abs(jnp.sin(theta)) * width_bloat
    cos_b = jnp.abs(jnp.cos(theta)) * width_bloat

    g1_lwh = jnp.stack([lwh[0] + sin_b, lwh[1] + cos_b, lwh[2] + 0.4])
    g1_center = center + jnp.stack([0.0, -0.4, 0.0])
    inside1 = points_in_obb(scan, g1_center, g1_lwh, theta) & scan_mask
    lo1, hi1 = _local_aabb(scan, inside1, g1_center, theta)

    new_len = hi1[2] - lo1[2]
    mid1 = (hi1 + lo1) / 2.0
    # zero the width-axis shift (scale_detector.py:184 center[0] = 0)
    shift_local = jnp.stack([jnp.zeros_like(mid1[1]), mid1[1], mid1[2]])
    new_center = g1_center + rot_y(theta) @ shift_local

    g2_lwh = jnp.stack([lwh[0] + sin_b, lwh[1] + cos_b, lwh[2] + 0.8])
    g2_center = center + jnp.stack([0.0, -0.2, 0.0])
    inside2 = points_in_obb(scan, g2_center, g2_lwh, theta) & scan_mask
    lo2, hi2 = _local_aabb(scan, inside2, g2_center, theta)
    new_h = hi2[1] - lo2[1]

    ratio = new_len / jnp.maximum(lwh[0], 1e-6)
    ok = (ratio >= max_length_diff) & (ratio <= 1.1) & jnp.any(inside1) \
        & jnp.any(inside2)
    tl, tw, th = template_dims
    out_center = jnp.where(ok, new_center, center)
    out_lwh = jnp.where(ok,
                        jnp.stack([new_len + length_offset, lwh[1], new_h]),
                        jnp.asarray([tl, tw, th]))
    return out_center, out_lwh, ok

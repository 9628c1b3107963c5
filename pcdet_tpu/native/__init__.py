"""Native (C++) runtime components, built on demand and bound via ctypes.

Replaces the reference's numba-JIT / numba-CUDA host kernels (which need a
CUDA toolchain) with a small self-contained shared library compiled by g++
the first time it is needed.  A pure-numpy fallback exists for every entry
point so the framework still works without a compiler.
"""
import ctypes
import hashlib
import os
import subprocess

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_THIS_DIR, 'kitti_eval_native.cpp'),
         os.path.join(_THIS_DIR, 'voxelizer_native.cpp'),
         os.path.join(_THIS_DIR, 'augmentation_native.cpp'),
         os.path.join(_THIS_DIR, 'host_books_native.cpp')]
_LIB = None
_BUILD_FAILED = False


def _build_dir():
    d = os.path.join(_THIS_DIR, '_build')
    os.makedirs(d, exist_ok=True)
    return d


def _lib_path():
    h = hashlib.sha1()
    for src in _SRCS:
        with open(src, 'rb') as f:
            h.update(f.read())
    return os.path.join(_build_dir(), 'libpcdet_native_%s.so'
                        % h.hexdigest()[:12])


def get_lib():
    """Build (once) and load the native library; None if unavailable."""
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    path = _lib_path()
    if not os.path.exists(path):
        cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
               '-fopenmp', '-o', path] + _SRCS
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except Exception:
            try:  # retry without openmp
                cmd.remove('-fopenmp')
                subprocess.run(cmd, check=True, capture_output=True)
            except Exception:
                _BUILD_FAILED = True
                return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _BUILD_FAILED = True
        return None

    c_double_p = ctypes.POINTER(ctypes.c_double)
    c_long_p = ctypes.POINTER(ctypes.c_long)

    lib.rotate_iou_eval.argtypes = [c_double_p, ctypes.c_long, c_double_p,
                                    ctypes.c_long, ctypes.c_int, c_double_p]
    lib.image_box_overlap.argtypes = [c_double_p, ctypes.c_long, c_double_p,
                                      ctypes.c_long, ctypes.c_int, c_double_p]
    lib.compute_statistics.argtypes = [
        c_double_p, ctypes.c_long, ctypes.c_long, c_double_p, c_double_p,
        c_long_p, c_long_p, c_double_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        c_double_p, c_double_p, c_long_p]
    lib.fused_compute_statistics.argtypes = [
        c_double_p, ctypes.c_long, c_double_p, c_long_p, c_long_p, c_long_p,
        ctypes.c_long, c_double_p, c_double_p, c_double_p, c_long_p, c_long_p,
        ctypes.c_int, ctypes.c_double, c_double_p, ctypes.c_long, ctypes.c_int]
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_int_p = ctypes.POINTER(ctypes.c_int)
    lib.voxelize.argtypes = [
        c_float_p, ctypes.c_long, ctypes.c_int, c_float_p, c_float_p,
        c_long_p, ctypes.c_int, ctypes.c_long, c_float_p, c_int_p, c_int_p,
        c_long_p]
    lib.voxelize.restype = ctypes.c_long
    c_uint8_p = ctypes.POINTER(ctypes.c_uint8)
    lib.noise_per_box_native.argtypes = [
        c_float_p, c_uint8_p, c_float_p, c_float_p, ctypes.c_long,
        ctypes.c_long, c_long_p]
    lib.points_in_rbboxes_native.argtypes = [
        c_float_p, ctypes.c_long, ctypes.c_long, c_float_p, ctypes.c_long,
        c_uint8_p]
    c_uint16_p = ctypes.POINTER(ctypes.c_uint16)
    c_uint32_p = ctypes.POINTER(ctypes.c_uint32)
    lib.subm_books_batch.argtypes = (
        [c_int_p, c_int_p] + [ctypes.c_int] * 8
        + [c_uint16_p, c_uint32_p])
    lib.strided_books_batch.argtypes = (
        [c_int_p, c_int_p] + [ctypes.c_int] * 15
        + [c_int_p, c_int_p, c_int_p, c_int_p, c_uint16_p, c_uint32_p])
    _LIB = lib
    return _LIB


def noise_per_box(boxes, valid_mask, loc_noises, rot_noises):
    """Native first-success per-object noise search; None if unavailable.

    :param boxes: (N, 5) [x, y, dx, dy, rot]
    :return: (N,) int64 selected try index (or -1)
    """
    lib = get_lib()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    valid = np.ascontiguousarray(valid_mask, dtype=np.uint8)
    loc = np.ascontiguousarray(loc_noises, dtype=np.float32)
    rot = np.ascontiguousarray(rot_noises, dtype=np.float32)
    n, t = rot.shape
    selected = np.empty((n,), dtype=np.int64)
    lib.noise_per_box_native(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        loc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rot.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, t, selected.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
    return selected


def voxelize(points, voxel_size, pc_range_min, grid_size, max_pts,
             max_voxels):
    """Native host voxelizer; returns None if the library is unavailable.

    :param points: (P, C) float32, xyz first
    :return: dict(voxels, coordinates, num_points_per_voxel, num_voxels,
                  voxel_pt_indices_into_original_pt_cloud)
    """
    lib = get_lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, dtype=np.float32)
    p, c = points.shape
    voxels = np.empty((max_voxels, max_pts, c), dtype=np.float32)
    coords = np.empty((max_voxels, 3), dtype=np.int32)
    num_points = np.empty(max_voxels, dtype=np.int32)
    pt_indices = np.empty((max_voxels, max_pts), dtype=np.int64)
    vs = np.ascontiguousarray(voxel_size, dtype=np.float32)
    rmin = np.ascontiguousarray(pc_range_min, dtype=np.float32)
    gs = np.ascontiguousarray(grid_size, dtype=np.int64)

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    i64p = ctypes.POINTER(ctypes.c_long)
    n_vox = lib.voxelize(
        points.ctypes.data_as(f32p), p, c,
        vs.ctypes.data_as(f32p), rmin.ctypes.data_as(f32p),
        gs.ctypes.data_as(i64p), int(max_pts), int(max_voxels),
        voxels.ctypes.data_as(f32p), coords.ctypes.data_as(i32p),
        num_points.ctypes.data_as(i32p), pt_indices.ctypes.data_as(i64p))
    return {
        'voxels': voxels,
        'coordinates': coords,
        'num_points_per_voxel': num_points,
        'num_voxels': int(n_vox),
        'voxel_pt_indices_into_original_pt_cloud': pt_indices,
    }


def _as_c(arr, dtype):
    arr = np.ascontiguousarray(arr, dtype=dtype)
    ptr_type = ctypes.POINTER(ctypes.c_double if dtype == np.float64
                              else ctypes.c_long)
    return arr, arr.ctypes.data_as(ptr_type)


def rotate_iou_eval(boxes, qboxes, criterion=-1):
    """(N,5)[x,y,dx,dy,ang] x (K,5) -> (N,K) rotated IoU/overlap."""
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    qboxes = np.ascontiguousarray(qboxes, dtype=np.float64)
    n, k = boxes.shape[0], qboxes.shape[0]
    out = np.zeros((n, k), dtype=np.float64)
    lib = get_lib()
    if lib is not None:
        _, bp = _as_c(boxes, np.float64)
        _, qp = _as_c(qboxes, np.float64)
        lib.rotate_iou_eval(bp, n, qp, k, int(criterion),
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out
    # fallback: jnp implementation
    import jax.numpy as jnp
    from ..ops import rotated_iou as ri
    return np.asarray(ri.rotate_iou_eval(jnp.asarray(boxes, jnp.float32),
                                         jnp.asarray(qboxes, jnp.float32),
                                         criterion), dtype=np.float64)


def image_box_overlap(boxes, query_boxes, criterion=-1):
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    query_boxes = np.ascontiguousarray(query_boxes, dtype=np.float64)
    n, k = boxes.shape[0], query_boxes.shape[0]
    out = np.zeros((n, k), dtype=np.float64)
    lib = get_lib()
    if lib is not None and n and k:
        lib.image_box_overlap(
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            query_boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k,
            int(criterion),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out
    # numpy fallback
    qarea = ((query_boxes[:, 2] - query_boxes[:, 0])
             * (query_boxes[:, 3] - query_boxes[:, 1]))
    barea = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    iw = (np.minimum(boxes[:, None, 2], query_boxes[None, :, 2])
          - np.maximum(boxes[:, None, 0], query_boxes[None, :, 0]))
    ih = (np.minimum(boxes[:, None, 3], query_boxes[None, :, 3])
          - np.maximum(boxes[:, None, 1], query_boxes[None, :, 1]))
    valid = (iw > 0) & (ih > 0)
    inter = np.where(valid, iw * ih, 0.0)
    if criterion == -1:
        ua = barea[:, None] + qarea[None, :] - inter
    elif criterion == 0:
        ua = np.broadcast_to(barea[:, None], inter.shape)
    elif criterion == 1:
        ua = np.broadcast_to(qarea[None, :], inter.shape)
    else:
        ua = np.ones_like(inter)
    with np.errstate(divide='ignore', invalid='ignore'):
        return np.where(valid, inter / ua, 0.0)


def compute_statistics(overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                       dc_bboxes, metric, min_overlap, thresh=0.0,
                       compute_fp=False, compute_aos=False):
    """Single-frame matching statistics (eval.py compute_statistics_jit).

    :param overlaps: (det, gt) float64
    :return: tp, fp, fn, similarity, thresholds(np array)
    """
    lib = get_lib()
    if lib is None:
        return _compute_statistics_py(overlaps, gt_datas, dt_datas,
                                      ignored_gt, ignored_det, dc_bboxes,
                                      metric, min_overlap, thresh, compute_fp,
                                      compute_aos)
    det_size, gt_size = dt_datas.shape[0], gt_datas.shape[0]
    overlaps, op = _as_c(overlaps, np.float64)
    gt_datas, gp = _as_c(gt_datas, np.float64)
    dt_datas, dp = _as_c(dt_datas, np.float64)
    ignored_gt, igp = _as_c(ignored_gt, np.int64)
    ignored_det, idp = _as_c(ignored_det, np.int64)
    dc_bboxes, dcp = _as_c(dc_bboxes.reshape(-1, 4) if dc_bboxes.size
                           else np.zeros((0, 4)), np.float64)
    out4 = np.zeros(4, dtype=np.float64)
    out_thresh = np.zeros(max(gt_size, 1), dtype=np.float64)
    n_thresh = np.zeros(1, dtype=np.int64)
    lib.compute_statistics(
        op, det_size, gt_size, gp, dp, igp, idp, dcp, dc_bboxes.shape[0],
        int(metric), float(min_overlap), float(thresh), int(compute_fp),
        int(compute_aos),
        out4.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_thresh.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_thresh.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
    return (int(out4[0]), int(out4[1]), int(out4[2]), out4[3],
            out_thresh[:n_thresh[0]])


def fused_compute_statistics(overlaps, pr, gt_nums, dt_nums, dc_nums,
                             gt_datas, dt_datas, dontcares, ignored_gts,
                             ignored_dets, metric, min_overlap, thresholds,
                             compute_aos=False):
    lib = get_lib()
    if lib is None:
        _fused_py(overlaps, pr, gt_nums, dt_nums, dc_nums, gt_datas, dt_datas,
                  dontcares, ignored_gts, ignored_dets, metric, min_overlap,
                  thresholds, compute_aos)
        return
    overlaps, op = _as_c(overlaps, np.float64)
    pr_c = np.ascontiguousarray(pr, dtype=np.float64)
    gt_nums, gnp = _as_c(gt_nums, np.int64)
    dt_nums, dnp = _as_c(dt_nums, np.int64)
    dc_nums, dcp_ = _as_c(dc_nums, np.int64)
    gt_datas, gp = _as_c(gt_datas, np.float64)
    dt_datas, dp = _as_c(dt_datas, np.float64)
    dontcares, dop = _as_c(dontcares.reshape(-1, 4) if dontcares.size
                           else np.zeros((0, 4)), np.float64)
    ignored_gts, igp = _as_c(ignored_gts, np.int64)
    ignored_dets, idp = _as_c(ignored_dets, np.int64)
    thresholds, tp_ = _as_c(thresholds, np.float64)
    lib.fused_compute_statistics(
        op, overlaps.shape[1],
        pr_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        gnp, dnp, dcp_, len(gt_nums), gp, dp, dop, igp, idp, int(metric),
        float(min_overlap), tp_, len(thresholds), int(compute_aos))
    pr[:] = pr_c


# ------------------------------------------------------------------ fallbacks
def _compute_statistics_py(overlaps, gt_datas, dt_datas, ignored_gt,
                           ignored_det, dc_bboxes, metric, min_overlap,
                           thresh, compute_fp, compute_aos):
    det_size, gt_size = dt_datas.shape[0], gt_datas.shape[0]
    dt_scores = dt_datas[:, -1]
    assigned = [False] * det_size
    ignored_threshold = [False] * det_size
    if compute_fp:
        for i in range(det_size):
            if dt_scores[i] < thresh:
                ignored_threshold[i] = True
    NO_DET = -10000000
    tp = fp = fn = 0
    similarity = 0.0
    thresholds, delta = [], []
    for i in range(gt_size):
        if ignored_gt[i] == -1:
            continue
        det_idx, valid_detection = -1, NO_DET
        max_overlap, assigned_ignored_det = 0, False
        for j in range(det_size):
            if ignored_det[j] == -1 or assigned[j] or ignored_threshold[j]:
                continue
            overlap = overlaps[j, i]
            if (not compute_fp and overlap > min_overlap
                    and dt_scores[j] > valid_detection):
                det_idx, valid_detection = j, dt_scores[j]
            elif (compute_fp and overlap > min_overlap
                  and (overlap > max_overlap or assigned_ignored_det)
                  and ignored_det[j] == 0):
                max_overlap, det_idx = overlap, j
                valid_detection, assigned_ignored_det = 1, False
            elif (compute_fp and overlap > min_overlap
                  and valid_detection == NO_DET and ignored_det[j] == 1):
                det_idx, valid_detection, assigned_ignored_det = j, 1, True
        if valid_detection == NO_DET and ignored_gt[i] == 0:
            fn += 1
        elif valid_detection != NO_DET and (ignored_gt[i] == 1
                                            or ignored_det[det_idx] == 1):
            assigned[det_idx] = True
        elif valid_detection != NO_DET:
            tp += 1
            thresholds.append(dt_scores[det_idx])
            if compute_aos:
                delta.append(gt_datas[i, 4] - dt_datas[det_idx, 4])
            assigned[det_idx] = True
    if compute_fp:
        for j in range(det_size):
            if not (assigned[j] or ignored_det[j] in (-1, 1)
                    or ignored_threshold[j]):
                fp += 1
        nstuff = 0
        if metric == 0 and len(dc_bboxes):
            ov = image_box_overlap(dt_datas[:, :4], dc_bboxes.reshape(-1, 4), 0)
            for i in range(dc_bboxes.reshape(-1, 4).shape[0]):
                for j in range(det_size):
                    if (assigned[j] or ignored_det[j] in (-1, 1)
                            or ignored_threshold[j]):
                        continue
                    if ov[j, i] > min_overlap:
                        assigned[j] = True
                        nstuff += 1
        fp -= nstuff
        if compute_aos:
            if tp > 0 or fp > 0:
                similarity = float(np.sum((1.0 + np.cos(delta)) / 2.0)) \
                    if delta else 0.0
            else:
                similarity = -1
    return tp, fp, fn, similarity, np.asarray(thresholds)


def _fused_py(overlaps, pr, gt_nums, dt_nums, dc_nums, gt_datas, dt_datas,
              dontcares, ignored_gts, ignored_dets, metric, min_overlap,
              thresholds, compute_aos):
    gt_num = dt_num = dc_num = 0
    for i in range(len(gt_nums)):
        for t, thr in enumerate(thresholds):
            overlap = overlaps[dt_num:dt_num + dt_nums[i],
                               gt_num:gt_num + gt_nums[i]]
            tp, fp, fn, sim, _ = _compute_statistics_py(
                overlap, gt_datas[gt_num:gt_num + gt_nums[i]],
                dt_datas[dt_num:dt_num + dt_nums[i]],
                ignored_gts[gt_num:gt_num + gt_nums[i]],
                ignored_dets[dt_num:dt_num + dt_nums[i]],
                dontcares[dc_num:dc_num + dc_nums[i]], metric, min_overlap,
                thr, True, compute_aos)
            pr[t, 0] += tp
            pr[t, 1] += fp
            pr[t, 2] += fn
            if sim != -1:
                pr[t, 3] += sim
        gt_num += gt_nums[i]
        dt_num += dt_nums[i]
        dc_num += dc_nums[i]


def points_in_rbboxes(points, boxes):
    """Native (N, P) point-in-rotated-box mask; None if unavailable.

    :param points: (P, C) float32, xyz first
    :param boxes: (N, 7) [x, y, z, w, l, h, rz], z = bottom center
    """
    lib = get_lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, dtype=np.float32)
    boxes = np.ascontiguousarray(boxes, dtype=np.float32).reshape(-1, 7)
    p = points.shape[0]
    n = boxes.shape[0]
    mask = np.empty((n, p), dtype=np.uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.points_in_rbboxes_native(
        points.ctypes.data_as(f32p), p, points.shape[1],
        boxes.ctypes.data_as(f32p), n,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return mask.astype(bool)


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def subm_books_batch(coords, n_valid, grid_shape, kernel):
    """Native batched subm rulebooks (compact wire format); None if the
    library is unavailable.

    :param coords: (B, V, 3) int32 ZYX, sorted by linear id, valid prefix
    :param n_valid: (B,) int32 valid prefix lengths
    :return: rows (B, V, K) uint16, found (B, V) uint32 tap bitpack
    """
    lib = get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.int32)
    n_valid = np.ascontiguousarray(n_valid, dtype=np.int32)
    b, v, _ = coords.shape
    kd, kh, kw = kernel
    k = kd * kh * kw
    assert v < 65536 and k <= 32, (v, k)
    rows = np.empty((b, v, k), dtype=np.uint16)
    found = np.empty((b, v), dtype=np.uint32)
    d, h, w = (int(s) for s in grid_shape)
    lib.subm_books_batch(
        _iptr(coords), _iptr(n_valid), b, v, d, h, w, kd, kh, kw,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        found.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return rows, found


def strided_books_batch(coords, n_valid, grid_shape, kernel, stride,
                        padding, out_cap):
    """Native batched strided-conv output set + forward rulebook (compact
    wire format); None if the library is unavailable.

    :return: out_ids (B, O) int32 (INT32_MAX pad), out_coords (B, O, 3)
             int32 (-1 pad), out_n (B,) int32, dropped (B,) int32,
             rows (B, O, K) uint16, found (B, O) uint32 tap bitpack
    """
    lib = get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.int32)
    n_valid = np.ascontiguousarray(n_valid, dtype=np.int32)
    b, v, _ = coords.shape
    kd, kh, kw = kernel
    k = kd * kh * kw
    assert v < 65536 and k <= 32 and out_cap < 65536, (v, k, out_cap)
    out_ids = np.empty((b, out_cap), dtype=np.int32)
    out_coords = np.empty((b, out_cap, 3), dtype=np.int32)
    out_n = np.empty((b,), dtype=np.int32)
    dropped = np.empty((b,), dtype=np.int32)
    rows = np.empty((b, out_cap, k), dtype=np.uint16)
    found = np.empty((b, out_cap), dtype=np.uint32)
    d, h, w = (int(s) for s in grid_shape)
    lib.strided_books_batch(
        _iptr(coords), _iptr(n_valid), b, v, d, h, w, kd, kh, kw,
        int(stride[0]), int(stride[1]), int(stride[2]),
        int(padding[0]), int(padding[1]), int(padding[2]), int(out_cap),
        _iptr(out_ids), _iptr(out_coords), _iptr(out_n), _iptr(dropped),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        found.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out_ids, out_coords, out_n, dropped, rows, found

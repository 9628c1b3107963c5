"""Rotated NMS — fixed-shape, fully on-device (jnp).

Replaces the reference's CUDA bitmask NMS + host-side greedy scan
(`pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu:251-293`,
`iou3d_nms.cpp:79-126`): here the greedy suppression runs as a
`lax.fori_loop` over a precomputed (K, K) rotated-IoU matrix, so the whole
post-processing path stays inside one jit with no host round-trip.

All outputs are fixed-shape: `selected` is a (post_max,) int32 index array
padded with -1, plus a validity count.
"""
from functools import partial

import jax
import jax.numpy as jnp

from . import rotated_iou

NEG_INF = -1e9


def _axis_aligned_iou_matrix(boxes5):
    """(K,5)->(K,K) plain axis-aligned IoU (nms_normal_* path)."""
    x1, y1, x2, y2 = [boxes5[:, i] for i in range(4)]
    area = (x2 - x1) * (y2 - y1)
    iw = jnp.clip(jnp.minimum(x2[:, None], x2[None, :])
                  - jnp.maximum(x1[:, None], x1[None, :]), min=0)
    ih = jnp.clip(jnp.minimum(y2[:, None], y2[None, :])
                  - jnp.maximum(y1[:, None], y1[None, :]), min=0)
    inter = iw * ih
    return inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-8)


def _greedy_suppress(iou, valid, thresh):
    """Exact greedy NMS over a (K, K) IoU matrix ordered by descending score.

    :param iou: (K, K), :param valid: (K,) bool
    :return: (K,) bool keep mask
    """
    k = iou.shape[0]
    idx = jnp.arange(k)

    def body(i, keep):
        sup = keep[i] & (iou[i] > thresh) & (idx > i)
        return keep & ~sup

    keep0 = valid
    return jax.lax.fori_loop(0, k, body, keep0)


@partial(jax.jit, static_argnames=('pre_max', 'post_max', 'rotated', 'row_chunk'))
def nms_bev(boxes5, scores, thresh, pre_max=4096, post_max=500,
            valid_mask=None, rotated=True, row_chunk=64):
    """Fixed-shape rotated (or axis-aligned) NMS.

    :param boxes5: (A, 5) [x1, y1, x2, y2, ry]
    :param scores: (A,) ranking scores
    :param thresh: IoU threshold (python float or scalar)
    :param valid_mask: (A,) bool — boxes to consider (e.g. score >= SCORE_THRESH)
    :param rotated: rotated IoU (nms_gpu) vs axis-aligned (nms_normal_gpu)
    :return: selected (post_max,) int32 indices into boxes5 (-1 pad),
             num_selected () int32
    """
    a = boxes5.shape[0]
    pre_max = min(pre_max, a)
    if valid_mask is None:
        valid_mask = jnp.ones(a, dtype=bool)
    ranked = jnp.where(valid_mask, scores, NEG_INF)
    top_scores, order = jax.lax.top_k(ranked, pre_max)          # (pre,)
    top_valid = top_scores > NEG_INF / 2
    top_boxes = boxes5[order]

    if rotated:
        chunk = row_chunk if pre_max % row_chunk == 0 else None
        iou = rotated_iou.boxes_iou_bev(top_boxes, top_boxes, row_chunk=chunk)
    else:
        iou = _axis_aligned_iou_matrix(top_boxes)

    keep = _greedy_suppress(iou, top_valid, thresh)             # (pre,)

    # compact kept indices (score order) into post_max slots, -1 padded
    keep_rank = jnp.where(keep, jnp.arange(pre_max), pre_max)
    sel_order = jnp.argsort(keep_rank)[:post_max]               # kept first
    sel_valid = jnp.sort(keep_rank)[:post_max] < pre_max
    selected = jnp.where(sel_valid, order[sel_order], -1).astype(jnp.int32)
    if selected.shape[0] < post_max:                            # pre_max < post
        pad = jnp.full((post_max - selected.shape[0],), -1, jnp.int32)
        selected = jnp.concatenate([selected, pad])
    num = jnp.minimum(jnp.sum(keep), post_max).astype(jnp.int32)
    return selected, num

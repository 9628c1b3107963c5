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
    """EXACT greedy NMS over a (K, K) IoU matrix ordered by descending score.

    Instead of the K-iteration sequential scan (the reference's host-side
    bitmask walk, and prohibitively loop-overhead-bound on TPU: ~2 ms/iter x
    4096), this runs the *frontier* fixed point: a box is decided kept once
    no higher-ranked box that could still suppress it remains alive; each
    round is one vectorised (K, K) masked reduce.  The fixed point equals the
    greedy result exactly; the round count is the depth of the longest
    suppression chain (typically < 20), handled by a data-dependent
    lax.while_loop.

    :param iou: (K, K), :param valid: (K,) bool (descending-score order)
    :return: (K,) bool keep mask
    """
    k = iou.shape[0]
    idx = jnp.arange(k)
    # sup[j, i]: j (higher-ranked) would suppress i if j is kept
    sup = (iou > thresh) & (idx[:, None] < idx[None, :]) & valid[:, None]

    def cond(state):
        _, alive = state
        return alive.any()

    def body(state):
        kept, alive = state
        blocked = (sup & alive[:, None]).any(axis=0)
        frontier = alive & ~blocked          # provably kept this round
        suppressed = (sup & frontier[:, None]).any(axis=0)
        return kept | frontier, alive & ~frontier & ~suppressed

    kept, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros(k, dtype=bool), valid))
    return kept


def _lazy_greedy_rotated(top_boxes, top_valid, thresh, post_max, block=64):
    """Exact greedy rotated NMS with LAZY, BLOCKED IoU.

    The full (pre, pre) rotated-IoU matrix costs ~16.7M polygon clips
    (measured 12.5 s/matrix on v5e through XLA).  Greedy only ever consults
    rows of boxes near the decision frontier, so per round we take the
    `block` highest-ranked alive boxes, compute their (block, pre) IoU rows,
    resolve greedy exactly WITHIN the block (no higher-ranked alive box
    exists outside it), kill everything the block's keepers suppress, and
    repeat — a data-dependent lax.while_loop that retires >= block boxes per
    round (<= pre/block rounds worst case, typically a handful).  Bitwise
    identical to the reference's sequential greedy.

    :param top_boxes: (pre, 5), descending score order
    :return: (pre,) bool keep mask
    """
    pre = top_boxes.shape[0]
    use_pallas = jax.default_backend() != 'cpu'
    if not use_pallas:
        # XLA polygon clip is pair-cost-bound (~500 ns/pair): smaller blocks
        # minimise total pairs (each kept box needs exactly one row)
        block = 1
    block = min(block, pre)
    corners = rotated_iou.boxes5_to_corners(top_boxes)          # (pre, 4, 2)
    area = ((top_boxes[:, 2] - top_boxes[:, 0])
            * (top_boxes[:, 3] - top_boxes[:, 1]))
    idx = jnp.arange(pre)

    def cond(state):
        keep, alive, n = state
        return alive.any() & (n < post_max)

    def body(state):
        keep, alive, n = state
        # first `block` alive boxes in rank order (pre = sentinel pad)
        blk = jnp.sort(jnp.where(alive, idx, pre))[:block]
        blk_valid = blk < pre
        blk_idx = jnp.where(blk_valid, blk, 0)

        cb = corners[blk_idx]                                    # (B, 4, 2)
        if use_pallas:
            from .pallas.rotated_overlap import pair_overlap
            inter = pair_overlap(cb, corners)                    # (B, pre)
        else:
            inter = rotated_iou.quad_intersection_area(
                cb[:, None], corners[None])                      # (B, pre)
        iou_blk = inter / jnp.maximum(
            area[blk_idx][:, None] + area[None, :] - inter, 1e-8)

        # exact greedy within the block (rows/cols already rank-ordered)
        iou_bb = jnp.take_along_axis(
            iou_blk, blk_idx[None, :].repeat(block, 0), axis=1)  # (B, B)
        keep_b = _greedy_suppress(iou_bb, blk_valid, thresh)

        # anything a block keeper overlaps dies (keepers/losers incl., via
        # self-IoU = 1 and within-block suppression respectively)
        kill = ((iou_blk > thresh) & keep_b[:, None]).any(axis=0)
        in_block = jnp.zeros(pre, bool).at[blk_idx].max(blk_valid)
        keep = keep.at[blk_idx].max(keep_b & blk_valid)
        alive = alive & ~kill & ~in_block
        return keep, alive, n + keep_b.sum()

    keep, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros(pre, bool), top_valid, jnp.zeros((), jnp.int32)))
    return keep


def _greedy_suppress_batched(iou, valid, thresh):
    """Batched frontier fixed point: (G, K, K) IoU, (G, K) valid ->
    (G, K) keep.  Per-group results are bit-identical to _greedy_suppress
    (frontier rounds are independent across groups; the shared while_loop
    just runs until the SLOWEST group converges — finished groups have
    alive == False everywhere and are no-ops)."""
    g, k = iou.shape[0], iou.shape[1]
    idx = jnp.arange(k)
    sup = (iou > thresh) & (idx[:, None] < idx[None, :])[None] & valid[:, :, None]

    def cond(state):
        _, alive = state
        return alive.any()

    def body(state):
        kept, alive = state
        blocked = (sup & alive[:, :, None]).any(axis=1)
        frontier = alive & ~blocked
        suppressed = (sup & frontier[:, :, None]).any(axis=1)
        return kept | frontier, alive & ~frontier & ~suppressed

    kept, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((g, k), dtype=bool), valid))
    return kept


def _lazy_greedy_batched(top_boxes, top_valid, thresh, post_max, rotated,
                         block=64):
    """Batched exact greedy NMS with lazy blocked IoU rows.

    Per-sample semantics identical to _lazy_greedy_rotated, but ALL samples
    advance their frontier each round: one pair_overlap_batched kernel call
    computes every sample's (block, pre) IoU rows, so the round count is the
    MAX suppression-chain depth over the batch instead of the SUM (the
    lax.map formulation serialized samples — PointPillar fps/chip DROPPED
    with batch size, 80.6 at B2 -> 42.3 at B8).

    Scatter-free: block membership and slot mapping are derived from
    cumsum(alive) instead of .at[] scatters (lane scatters into big arrays
    lower pathologically on TPU — PERF_NOTES round 1 item 1).

    :param top_boxes: (G, pre, 5) descending score order per group
    :param top_valid: (G, pre) bool
    :param rotated: rotated IoU rows (pallas kernel / edge-clip) vs
        axis-aligned rows (nms_normal_* path)
    :return: (G, pre) bool keep mask
    """
    g, pre = top_boxes.shape[0], top_boxes.shape[1]
    use_pallas = rotated and jax.default_backend() != 'cpu'
    if rotated and not use_pallas:
        block = 1          # XLA polygon clip is pair-cost-bound
    block = min(block, pre)
    if rotated:
        corners = rotated_iou.boxes5_to_corners(top_boxes)   # (G, pre, 4, 2)
    area = ((top_boxes[..., 2] - top_boxes[..., 0])
            * (top_boxes[..., 3] - top_boxes[..., 1]))       # (G, pre)

    def cond(state):
        keep, alive, n = state
        return (alive.any(axis=1) & (n < post_max)).any()

    def body(state):
        keep, alive, n = state
        upd = alive.any(axis=1) & (n < post_max)              # (G,)
        # first `block` alive boxes per group, in rank order
        cnt = jnp.cumsum(alive, axis=1)                       # (G, pre)
        in_block = alive & (cnt <= block)
        slot = jnp.clip(cnt - 1, 0, block - 1)                # pos -> blk slot
        blk = jnp.sort(jnp.where(alive, jnp.arange(pre)[None], pre),
                       axis=1)[:, :block]                     # (G, block)
        blk_valid = blk < pre
        blk_idx = jnp.where(blk_valid, blk, 0)

        if rotated:
            cb = jnp.take_along_axis(
                corners, blk_idx[:, :, None, None], axis=1)   # (G, B, 4, 2)
            if use_pallas:
                from .pallas.rotated_overlap import pair_overlap_batched
                inter = pair_overlap_batched(cb, corners)     # (G, B, pre)
            else:
                inter = rotated_iou.quad_intersection_area(
                    cb[:, :, None], corners[:, None])
        else:
            bb = jnp.take_along_axis(top_boxes, blk_idx[:, :, None], axis=1)
            iw = jnp.clip(jnp.minimum(bb[:, :, None, 2], top_boxes[:, None, :, 2])
                          - jnp.maximum(bb[:, :, None, 0], top_boxes[:, None, :, 0]),
                          min=0)
            ih = jnp.clip(jnp.minimum(bb[:, :, None, 3], top_boxes[:, None, :, 3])
                          - jnp.maximum(bb[:, :, None, 1], top_boxes[:, None, :, 1]),
                          min=0)
            inter = iw * ih
        area_blk = jnp.take_along_axis(area, blk_idx, axis=1)  # (G, B)
        iou_blk = inter / jnp.maximum(
            area_blk[:, :, None] + area[:, None, :] - inter, 1e-8)

        # exact greedy within each block (rows/cols already rank-ordered)
        iou_bb = jnp.take_along_axis(
            iou_blk, jnp.broadcast_to(blk_idx[:, None, :],
                                      (g, block, block)), axis=2)
        keep_b = _greedy_suppress_batched(iou_bb, blk_valid, thresh)

        kill = ((iou_blk > thresh) & keep_b[:, :, None]).any(axis=1)
        keep_full = jnp.take_along_axis(keep_b, slot, axis=1) & in_block
        keep = keep | (keep_full & upd[:, None])
        alive = jnp.where(upd[:, None], alive & ~kill & ~in_block, alive)
        n = n + jnp.where(upd, keep_b.sum(axis=1), 0)
        return keep, alive, n

    keep, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((g, pre), bool), top_valid, jnp.zeros((g,), jnp.int32)))
    return keep


@partial(jax.jit, static_argnames=('pre_max', 'post_max', 'rotated'))
def nms_bev_batched(boxes5, scores, thresh, pre_max=4096, post_max=500,
                    valid_mask=None, rotated=True):
    """Batch-parallel fixed-shape NMS: every sample's greedy frontier
    advances per round in one kernel call (vs nms_bev under lax.map, which
    serializes samples).  Per-sample results identical to nms_bev.

    :param boxes5: (G, A, 5), :param scores: (G, A)
    :return: selected (G, post_max) int32 (-1 pad), num_selected (G,) int32
    """
    g, a = boxes5.shape[0], boxes5.shape[1]
    pre_max = min(pre_max, a)
    if valid_mask is None:
        valid_mask = jnp.ones((g, a), dtype=bool)
    ranked = jnp.where(valid_mask, scores, NEG_INF)
    top_scores, order = jax.lax.top_k(ranked, pre_max)        # (G, pre)
    top_valid = top_scores > NEG_INF / 2
    top_boxes = jnp.take_along_axis(boxes5, order[:, :, None], axis=1)

    keep = _lazy_greedy_batched(top_boxes, top_valid, thresh, post_max,
                                rotated=rotated)

    keep_rank = jnp.where(keep, jnp.arange(pre_max)[None], pre_max)
    sel_order = jnp.argsort(keep_rank, axis=1)[:, :post_max]
    sel_valid = jnp.sort(keep_rank, axis=1)[:, :post_max] < pre_max
    selected = jnp.where(
        sel_valid, jnp.take_along_axis(order, sel_order, axis=1),
        -1).astype(jnp.int32)
    if selected.shape[1] < post_max:                          # pre_max < post
        pad = jnp.full((g, post_max - selected.shape[1]), -1, jnp.int32)
        selected = jnp.concatenate([selected, pad], axis=1)
    num = jnp.minimum(jnp.sum(keep, axis=1), post_max).astype(jnp.int32)
    return selected, num


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
        keep = _lazy_greedy_rotated(top_boxes, top_valid, thresh, post_max)
    else:
        iou = _axis_aligned_iou_matrix(top_boxes)
        keep = _greedy_suppress(iou, top_valid, thresh)         # (pre,)

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

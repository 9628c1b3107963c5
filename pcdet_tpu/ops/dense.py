"""Dense-grid execution of the deep sparse-backbone levels ("dense tail").

At /8 resolution the SECOND / Part-A² conv4 block runs on ~9-12k active
voxels of a 5x200x176 grid (5-7% occupancy) — small enough that one dense
XLA conv3d on the MXU (plus an occupancy mask) is cheaper than the
rulebook + gather-GEMM machinery: the profiled conv4 + conv_out stages are
74 ms of the 470 ms B8 SECOND eval step (PROFILE_EVAL_STAGES.json), almost
all of it rulebook sorts and gather issue at tiny V.  Dense compute also
removes the level caps at those stages (no truncation risk at all).

Submanifold / strided sparse-conv semantics are preserved EXACTLY by
zero-filled inactive cells plus output occupancy masking:

  subm    y = occ_in  * conv(x_dense)          active set unchanged;
                                               inactive taps read 0, which
                                               is what a missing rulebook
                                               entry contributes
  strided occ_out = maxpool(occ_in)            every output whose receptive
          y = occ_out * conv(x_dense)          field touches an active input
                                               — the official dilated set

Masking after BN+ReLU mirrors the sparse blocks' `feats * mask`, so
inactive cells enter the next conv as exact zeros.  BatchNorm statistics
run over the same masked cell set as the sparse path's masked BN.

Tap convention matches ops/sparse.py (`_kernel_offsets`, z-major,
x-fastest; input site = out*stride - pad + tap), i.e. plain
cross-correlation — a (K, Cin, Cout) sparse weight reshapes to DHWIO with
no flips.  Summation order differs from the gather-GEMM, so parity is to
f32 tolerance, pinned by tests/test_dense_tail.py.

Parity target: spconv SubMConv3d / SparseConv3d as used by the reference
conv4/conv_out stages (pcdet/models/rpn/rpn_backbone.py).
"""
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import sparse


class DenseGrid(NamedTuple):
    """Batched dense counterpart of a batched SparseLevel."""
    grid: jnp.ndarray        # (B, D, H, W, C)
    occ: jnp.ndarray         # (B, D, H, W) bool — official active set


def from_level(level, dtype=None) -> DenseGrid:
    """Batched SparseLevel -> DenseGrid (one XLA scatter per array).

    `dtype` optionally narrows the canvas (e.g. bfloat16) so the dense
    activations never materialise in f32 when the conv runs in bf16.
    """
    d, h, w = level.shape
    n = d * h * w
    b, v, c = level.features.shape
    dt = dtype or level.features.dtype
    flat = jnp.where(level.mask, level.ids, n)             # drop padding
    canvas = jnp.zeros((b, n, c), dt)
    canvas = jax.vmap(lambda cv, f, feat: cv.at[f].set(feat, mode='drop'))(
        canvas, flat, level.features.astype(dt))
    occ = jnp.zeros((b, n), jnp.bool_)
    occ = jax.vmap(lambda oc, f: oc.at[f].set(True, mode='drop'))(occ, flat)
    return DenseGrid(canvas.reshape(b, d, h, w, c), occ.reshape(b, d, h, w))


def gather_level(dense: DenseGrid, level):
    """Read a DenseGrid back at a batched SparseLevel's sites.

    Returns `level` with replaced features (ids/mask/coords and any stashed
    rulebooks — subm_rules, strided_rules/meta — untouched, so a decoder
    consuming the level keeps its indice-key reuse).
    """
    b, d, h, w, c = dense.grid.shape
    flat = dense.grid.reshape(b, d * h * w, c)
    idx = jnp.clip(level.ids, 0, d * h * w - 1)
    feats = jnp.take_along_axis(flat, idx[..., None], axis=1)
    feats = feats * level.mask[..., None].astype(feats.dtype)
    return level._replace(features=feats.astype(level.features.dtype))


def conv3d(x, weights, kernel, stride=(1, 1, 1), padding=(0, 0, 0),
           compute_dtype=None):
    """Dense conv with ops/sparse.py's tap convention.

    :param x: (B, D, H, W, Cin)
    :param weights: (K, Cin, Cout) in `_kernel_offsets` tap order
    :return: (B, D', H', W', Cout) float32
    """
    kd, kh, kw = kernel
    cin, cout = weights.shape[-2:]
    rhs = weights.reshape(kd, kh, kw, cin, cout)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        rhs = rhs.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, rhs, window_strides=tuple(stride),
        padding=[(int(p), int(p)) for p in padding],
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=jnp.float32)
    return y.astype(jnp.float32)


def dilate_occ(occ, kernel, stride, padding):
    """Strided-conv output active set: maxpool of the input occupancy with
    the conv's exact geometry (out site active <=> >=1 active input tap —
    precisely ops/sparse.py `_strided_out_set`, without the cap)."""
    y = jax.lax.reduce_window(
        occ.astype(jnp.int32), 0, jax.lax.max,
        window_dimensions=(1,) + tuple(kernel),
        window_strides=(1,) + tuple(stride),
        padding=[(0, 0)] + [(int(p), int(p)) for p in padding])
    return y.astype(jnp.bool_)


def bev_from_grid(dense: DenseGrid):
    """(B, D, H, W, C) -> (B, H, W, C*D), the backbone's final BEV fold
    (same layout as sparse.to_dense_batched + transpose/reshape)."""
    b, d, h, w, c = dense.grid.shape
    return jnp.transpose(dense.grid, (0, 2, 3, 4, 1)).reshape(b, h, w, c * d)


def level_from_grid(dense: DenseGrid, cap: int, parent=None):
    """DenseGrid -> batched SparseLevel (top-`cap` active sites by linear id,
    ascending — the library's sorted-ids invariant).  Only needed when a
    dense-tail stage must hand a *new* active set back to sparse consumers;
    the backbone tails avoid it (they end dense or gather into an existing
    level), but profiling / debug paths use it."""
    b, d, h, w, c = dense.grid.shape
    n = d * h * w
    occ = dense.occ.reshape(b, n)
    ids_all = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    key = jnp.where(occ, ids_all, sparse.INT_MAX)
    # top-cap smallest ids == first `cap` of the ascending sort
    ids = jax.lax.sort(key, dimension=1)[:, :cap]
    mask = ids < sparse.INT_MAX
    idx = jnp.clip(ids, 0, n - 1)
    feats = jnp.take_along_axis(dense.grid.reshape(b, n, c),
                                idx[..., None], axis=1)
    feats = feats * mask[..., None].astype(feats.dtype)
    coords = sparse.delinearize(idx, (d, h, w))
    coords = jnp.where(mask[..., None], coords, -1)
    dropped = occ.sum(axis=1).astype(jnp.int32) - mask.sum(axis=1)
    return sparse.SparseLevel(
        features=feats.astype(jnp.float32),
        ids=jnp.where(mask, ids, sparse.INT_MAX).astype(jnp.int32),
        coords=coords.astype(jnp.int32), mask=mask, shape=(d, h, w),
        overflow=dropped)

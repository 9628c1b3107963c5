"""Stage-level Part-A² timings on the chip: which of UNet / proposals /
RoI-pool / RCNN dominates the 2.7 s train step (BENCH_MODELS.json)?

Methodology: each stage is jitted standalone, warmed, enqueued ITERS times,
one host fetch at the end (dispatch+fetch ~30 ms through the tunnel,
amortized over ITERS).
"""
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', str(ROOT / '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import numpy as np

from bench_models import realistic_cfg, build  # noqa: E402  (same dir)

ITERS = 8


def timed(label, fn, *args):
    import jax
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    # block_until_ready is a no-op through the tunnel: fetch one scalar
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print('%-34s %8.1f ms' % (label, dt), flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    from pcdet_tpu.models.parta2 import PartA2Net
    from pcdet_tpu.ops.roiaware_pool import roiaware_pool3d

    cfg = realistic_cfg('PartA2.yaml')
    model, batch = build(cfg, training=True, batch_size=2)
    assert isinstance(model, PartA2Net)
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    params, stats = variables['params'], variables['batch_stats']

    # ---------------- stage 1 alone (UNet + RPN module) ----------------
    def stage1(p1, s1, batch):
        ret = model.module.apply(
            {'params': p1, 'batch_stats': s1}, batch['voxels'],
            batch['num_points'], batch['coordinates'], batch['voxel_mask'],
            train=False)
        return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(ret)
                   if hasattr(v, 'dtype') and v.dtype.kind == 'f')

    timed('stage1 (UNet+RPN) fwd', jax.jit(stage1),
          params['stage1'], stats['stage1'], batch)
    timed('stage1 fwd+bwd', jax.jit(jax.grad(stage1)),
          params['stage1'], stats['stage1'], batch)

    # ---------------- full model fwd ----------------
    def full_fwd(params, stats, batch):
        ret, _ = model.forward({'params': params, 'batch_stats': stats},
                               batch, train=True, rng=jax.random.PRNGKey(1))
        return ret['rcnn']['rcnn_cls']

    timed('full fwd (train)', jax.jit(full_fwd), params, stats, batch)

    def full_loss(params):
        ret, _ = model.forward({'params': params, 'batch_stats': stats},
                               batch, train=True, rng=jax.random.PRNGKey(1))
        loss, _ = model.loss(ret, batch)
        return loss

    timed('full fwd+bwd', jax.jit(jax.grad(full_loss)), params)

    # ---------------- isolated RoI-aware pooling ----------------
    rng = np.random.RandomState(0)
    v = int(batch['voxel_mask'].shape[1])
    rois = np.concatenate([
        rng.uniform(0, 60, (512, 1)), rng.uniform(-30, 30, (512, 1)),
        rng.uniform(-2, 0, (512, 1)), rng.uniform(1, 4, (512, 3)),
        rng.uniform(-np.pi, np.pi, (512, 1))], axis=1).astype(np.float32)
    centers = np.concatenate([
        rng.uniform(0, 60, (v, 1)), rng.uniform(-30, 30, (v, 1)),
        rng.uniform(-2, 1, (v, 1))], axis=1).astype(np.float32)
    part = rng.randn(v, 4).astype(np.float32)
    seg = rng.randn(v, 16).astype(np.float32)
    mask = np.ones(v, bool)

    # .sum() — program RESULTS are eagerly shipped through the tunnel
    # (~160 MB/s); returning the 90 MB pooled grid would measure transfer
    pool_avg = jax.jit(lambda r, c, f, m: roiaware_pool3d(
        r, c, f, m, out_size=14, pool_method='avg').sum())
    pool_max = jax.jit(lambda r, c, f, m: roiaware_pool3d(
        r, c, f, m, out_size=14, pool_method='max').sum())
    timed('roiaware avg 512x%dx4 (1 sample)' % v, pool_avg,
          rois, centers, part, mask)
    timed('roiaware max 512x%dx16 (1 sample)' % v, pool_max,
          rois, centers, seg, mask)

    def pool_grad(f):
        return jax.grad(lambda ff: jnp.sum(
            roiaware_pool3d(rois, centers, ff, mask, out_size=14,
                            pool_method='avg')))(f)

    timed('roiaware avg fwd+bwd', jax.jit(pool_grad), part)

    from pcdet_tpu.ops.roiaware_pool import roiaware_pool3d_multi
    timed('roiaware_multi compacted (1 sample)', jax.jit(
        lambda r, c, p, s, m: sum(
            x.sum() for x in roiaware_pool3d_multi(
                r, c, [(p, 'avg'), (s, 'max')], m, out_size=14,
                max_pts_per_roi=512))), rois, centers, part, seg, mask)

    # ---------------- stage-2 pieces ----------------
    from pcdet_tpu.models.roi_heads import proposal_layer
    n_anchor = model.anchor_targets.num_anchors \
        if hasattr(model, 'anchor_targets') else 211200
    rngj = jax.random.PRNGKey(3)
    cls_p = jax.random.normal(rngj, (2, int(n_anchor), 3))
    box_p = jnp.concatenate([
        jax.random.uniform(rngj, (2, int(n_anchor), 2), minval=0, maxval=60),
        jax.random.uniform(rngj, (2, int(n_anchor), 1), minval=-2, maxval=0),
        jax.random.uniform(rngj, (2, int(n_anchor), 3), minval=1, maxval=4),
        jax.random.uniform(rngj, (2, int(n_anchor), 1), minval=-3, maxval=3),
    ], axis=-1)
    timed('proposal_layer train (pre9000/post512)', jax.jit(
        lambda c, b: jax.tree_util.tree_leaves(proposal_layer(
            c, b, nms_pre=9000, nms_post=512,
            nms_thresh=0.8))[0].sum()), cls_p, box_p)

    pooled_part = jax.random.normal(rngj, (1024, 14, 14, 14, 4))
    pooled_rpn = jax.random.normal(rngj, (1024, 14, 14, 14, 16))
    rcnn_vars = {'params': variables['params']['rcnn'],
                 'batch_stats': variables['batch_stats']['rcnn']}

    def rcnn_fwd(pp, pr):
        cls_o, reg_o = model.rcnn_module.apply(rcnn_vars, pp, pr, False)
        return cls_o.sum() + reg_o.sum()

    timed('rcnn module fwd (1024 rois)', jax.jit(rcnn_fwd),
          pooled_part, pooled_rpn)

    def rcnn_bwd_scalar(pp, pr):
        g1, g2 = jax.grad(rcnn_fwd, argnums=(0, 1))(pp, pr)
        return g1.sum() + g2.sum()      # scalar out: no eager 9 MB transfer

    timed('rcnn module fwd+bwd', jax.jit(rcnn_bwd_scalar),
          pooled_part, pooled_rpn)


if __name__ == '__main__':
    main()

"""Fast on-chip lowering + numerics smoke for every Pallas kernel path.

Round-4 lesson: kernels built during a tunnel outage are interpret-mode
tested only, and Mosaic's lowering constraints (block-shape divisibility,
SMEM rules, narrow loads) do NOT apply in interpret mode — the round-3
tile gate passed the whole CPU suite and failed to lower on the first real
chip (a (1, 1) block over an (n_tiles, 1) SMEM array).  This script runs
every kernel variant at TINY shapes on the real device (seconds of compile
each) so a lowering break surfaces in minutes, not after hours of queued
benches.  Run it as chip-queue step 0; exit code 1 if anything fails.
"""
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', str(ROOT / '.jax_cache'))
# kernel-level checks name xwin variants explicitly via kw3=True; keep that
# meaning under the rows-by-default fwd policy (gather_gemm.XWIN_FWD)
os.environ.setdefault('PCDET_XWIN_FWD', '1')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax
import jax.numpy as jnp
import numpy as np

from pcdet_tpu.ops import sparse
from pcdet_tpu.ops.pallas import gather_gemm as gg

V, C, COUT = 512, 32, 32
SHAPE = (5, 32, 32)
FAILURES = []


def check(name, fn, expect=None, tol=None):
    t0 = time.perf_counter()
    try:
        out = np.asarray(jax.device_get(fn()))
    except Exception as e:
        FAILURES.append(name)
        print('FAIL %-28s %s' % (name, str(e).splitlines()[0][:200]))
        return None
    dt = time.perf_counter() - t0
    if not np.all(np.isfinite(out)):
        FAILURES.append(name)
        print('FAIL %-28s non-finite output' % name)
        return out
    if expect is not None:
        rel = np.abs(out - expect).max() / max(np.abs(expect).max(), 1e-6)
        if rel > tol:
            FAILURES.append(name)
            print('FAIL %-28s rel err %.3e > %.0e' % (name, rel, tol))
            return out
        print('ok   %-28s rel err %.3e  (%.1fs)' % (name, rel, dt))
    else:
        print('ok   %-28s (%.1fs)' % (name, dt))
    return out


def make_level(rng):
    ids = np.unique(rng.randint(0, SHAPE[0] * SHAPE[1] * SHAPE[2],
                                size=(V,)))[:V - 64]
    n = len(ids)
    buf = np.full((V,), sparse.INT_MAX, np.int64)
    buf[:n] = ids
    mask = np.zeros((V,), bool)
    mask[:n] = True
    cz = buf // (SHAPE[1] * SHAPE[2])
    rem = buf % (SHAPE[1] * SHAPE[2])
    coords = np.stack([cz, rem // SHAPE[2], rem % SHAPE[2]], -1)
    coords = np.where(mask[:, None], coords, -1).astype(np.int32)
    feats = rng.randn(V, C).astype(np.float32) * mask[:, None]
    return sparse.SparseLevel(jnp.asarray(feats),
                              jnp.asarray(buf.astype(np.int32)),
                              jnp.asarray(coords), jnp.asarray(mask),
                              SHAPE), n


def main():
    print('devices:', jax.devices())
    rng = np.random.RandomState(0)
    lv, n_act = make_level(rng)
    w = jnp.asarray(rng.randn(27, C, COUT).astype(np.float32) * 0.1)
    rows, found = jax.jit(lambda: sparse._rules_subm(lv, (3, 3, 3)))()
    rules = jnp.where(found, rows, V)
    fp = jnp.concatenate([lv.features, jnp.zeros((1, C))], axis=0)
    nl = jnp.int32(n_act)

    rules_h = np.asarray(rules)
    fp_h = np.asarray(fp)
    w_h = np.asarray(w)
    expect = np.einsum('vkc,kcd->vd', fp_h[rules_h], w_h)

    # per-row f32 / packed, gated + ungated
    for gname, g in [('', None), (' gated', nl)]:
        check('rows f32%s' % gname,
              jax.jit(lambda g=g: gg._gm_any(fp, rules, w, False, False, g)),
              expect, 1e-4)
        check('rows packed%s' % gname,
              jax.jit(lambda g=g: gg._gm_any(fp, rules, w, True, False, g)),
              expect, 5e-2)
        check('xwin f32%s' % gname,
              jax.jit(lambda g=g: gg._gm_any(fp, rules, w, False, True, g)),
              expect, 1e-4)
        check('xwin packed%s' % gname,
              jax.jit(lambda g=g: gg._gm_any(fp, rules, w, True, True, g)),
              expect, 5e-2)

    base, sel = sparse._xwin_selectors(rules, V)
    wfl = gg.group_weights_x(w)

    # segment kernel (round 5): one (S, Cin) block load + one-hot MXU
    # routing per (tile, group).  The small-S pass forces the per-row
    # FALLBACK branch to lower on device too (its code path differs).
    wfe = gg.group_weights_x_eo(w.astype(jnp.bfloat16).astype(jnp.float32))
    fp_g = jnp.concatenate([fp, jnp.zeros((gg.SEG_S - 1, C))], axis=0)
    check('seg f32',
          jax.jit(lambda: gg._gather_matmul_seg_call(fp_g, base, sel, wfl)),
          expect, 1e-4)
    check('seg f32 gated',
          jax.jit(lambda: gg._gather_matmul_seg_call(fp_g, base, sel, wfl,
                                                     nl)), expect, 1e-4)
    check('seg packed gated',
          jax.jit(lambda: gg._gather_matmul_seg_call(
              gg.pack_bf16_pairs(fp_g), base, sel, wfe, nl)), expect, 5e-2)
    seg_s_orig = gg.SEG_S
    gg.SEG_S = 16
    try:
        fp_g16 = jnp.concatenate([fp, jnp.zeros((15, C))], axis=0)
        check('seg f32 smallS fallback',
              jax.jit(lambda: gg._gather_matmul_seg_call(
                  fp_g16, base, sel, wfl, nl)), expect, 1e-4)
        check('seg packed smallS fallback',
              jax.jit(lambda: gg._gather_matmul_seg_call(
                  gg.pack_bf16_pairs(fp_g16), base, sel, wfe, nl)),
              expect, 5e-2)
    finally:
        gg.SEG_S = seg_s_orig

    # dW kernels (k-major grid gates on tile axis 1)
    gup = jnp.asarray(rng.randn(V, COUT).astype(np.float32) * 0.1)
    expect_dw = np.einsum('vc,vd->cd', fp_h[rules_h][:, 0, :],
                          np.asarray(gup))
    dw = check('dw rows gated',
               jax.jit(lambda: gg.gather_dw(fp, rules, gup, nl)))
    if dw is not None:
        rel = (np.abs(dw[0] - expect_dw).max()
               / max(np.abs(expect_dw).max(), 1e-6))
        print('     dw tap0 rel err %.3e' % rel)
        if rel > 1e-4:
            FAILURES.append('dw rows gated numerics')
    check('dw rows ungated',
          jax.jit(lambda: gg.gather_dw(fp, rules, gup)))
    fp2 = jnp.concatenate([fp, jnp.zeros((1, C))], axis=0)
    check('dw xwin gated',
          jax.jit(lambda: gg.gather_dw_xwin(fp2, base, sel, gup, nl)))
    check('dw seg gated',
          jax.jit(lambda: gg.gather_dw_seg(fp_g, base, sel, gup, nl)))
    gg.SEG_S = 16
    try:
        fp_g16b = jnp.concatenate([fp, jnp.zeros((15, C))], axis=0)
        check('dw seg smallS fallback',
              jax.jit(lambda: gg.gather_dw_seg(fp_g16b, base, sel, gup, nl)))
    finally:
        gg.SEG_S = seg_s_orig

    # autodiff through the subm custom-vjp (mirror book backward)
    rules_m = rules[:, ::-1]

    def loss(wv):
        return gg.gather_matmul_subm(fp, rules, rules_m, wv, nl,
                                     False, True).sum()

    check('grad subm xwin gated', jax.jit(lambda: jax.grad(loss)(w)))

    # full sparse library ops on device (rulebook build + kernels + books)
    w2 = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)
    check('subm_conv3d', jax.jit(
        lambda: sparse.subm_conv3d(lv, w2).features))

    def chain():
        # SparseLevel carries static metadata (indice-key string), so the
        # strided -> inverse chain runs inside ONE jit returning arrays
        st = sparse.sparse_conv3d(lv, w2, kernel=3, stride=2, padding=1,
                                  out_cap=256)
        inv = sparse.inverse_conv3d(st, lv, w2, kernel=3, stride=2,
                                    padding=1)
        mp = sparse.sparse_maxpool3d(lv, out_cap=256)
        return jnp.stack([jnp.abs(st.features).sum(),
                          jnp.abs(inv.features).sum(),
                          jnp.abs(mp.features).sum()])

    check('strided+inverse+maxpool', jax.jit(chain))

    def conv_loss(wv):
        return sparse.subm_conv3d(lv, wv).features.sum()

    check('grad subm_conv3d', jax.jit(lambda: jax.grad(conv_loss)(w2)))

    # rotated NMS (Green's-theorem overlap kernel) + roiaware pooling
    from pcdet_tpu.ops.nms import nms_bev, nms_bev_batched
    xy1 = rng.rand(128, 2) * 30
    boxes5 = jnp.asarray(np.concatenate(
        [xy1, xy1 + 1 + rng.rand(128, 2) * 3,
         rng.rand(128, 1) * 3], axis=1).astype(np.float32))
    scores = jnp.asarray(rng.rand(128).astype(np.float32))
    check('nms_bev', jax.jit(
        lambda: nms_bev(boxes5, scores, 0.5, pre_max=128, post_max=32)[0]))
    check('nms_bev_batched', jax.jit(
        lambda: nms_bev_batched(boxes5[None], scores[None], 0.5,
                                pre_max=128, post_max=32)[0]))

    from pcdet_tpu.ops.roiaware_pool import roiaware_pool3d
    rois = jnp.asarray(
        np.concatenate([rng.rand(8, 3) * 20, 1 + rng.rand(8, 3) * 3,
                        rng.rand(8, 1) * 3], axis=1).astype(np.float32))
    pts = jnp.asarray((rng.rand(1024, 3) * 25).astype(np.float32))
    pf = jnp.asarray(rng.randn(1024, 16).astype(np.float32))
    pm = jnp.ones((1024,), bool)
    check('roiaware_pool3d', jax.jit(
        lambda: roiaware_pool3d(rois, pts, pf, pm, out_size=4)))

    print('chip smoke: %d failures' % len(FAILURES))
    if FAILURES:
        print('FAILED:', ', '.join(FAILURES))
        sys.exit(1)


if __name__ == '__main__':
    main()

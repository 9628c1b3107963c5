"""Validate + time the x-window gather kernel on the TPU.

Every kw=3 rulebook satisfies the x-window property (ids q-1, q, q+1 of a
tap group occupy consecutive sorted-table rows — tests/test_xwin_property),
so the 27 per-row loads per output collapse to 9 dynamic (3, C) block
loads.  This script compares the OLD per-row kernels against the new
x-window kernels on the same real rulebook at conv2 shapes (V=43520,
C=32->32), both f32 and bf16-pair-packed, asserting equality and timing.
"""
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', str(ROOT / '.jax_cache'))
# this experiment times rows vs xwin side by side via kw3; keep kw3=True
# meaning xwin under the rows-by-default fwd policy (gather_gemm.XWIN_FWD)
os.environ.setdefault('PCDET_XWIN_FWD', '1')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax
import jax.numpy as jnp
import numpy as np

from pcdet_tpu.ops import sparse
from pcdet_tpu.ops.pallas import gather_gemm as gg

V, C = 43520, 32
SHAPE = (21, 800, 704)
B = 8
WARMUP, ITERS = 2, 20


def make_level(rng, v=V, c=C, shape=SHAPE, frac=0.77):
    n_seeds = int(v * frac) // 5
    z = rng.randint(0, shape[0], size=(n_seeds,))
    y = rng.randint(0, shape[1], size=(n_seeds,))
    x = rng.randint(0, shape[2] - 8, size=(n_seeds,))
    run = rng.randint(3, 8, size=(n_seeds,))
    allx = np.concatenate([np.where(i < run, x + i, -1) for i in range(8)])
    allz, ally = np.tile(z, 8), np.tile(y, 8)
    m = allx >= 0
    ids = np.unique((allz[m] * shape[1] + ally[m]) * shape[2] + allx[m])[:v]
    n = len(ids)
    buf = np.full((v,), sparse.INT_MAX, np.int64)
    buf[:n] = ids
    mask = np.zeros((v,), bool)
    mask[:n] = True
    cz = buf // (shape[1] * shape[2])
    rem = buf % (shape[1] * shape[2])
    coords = np.stack([cz, rem // shape[2], rem % shape[2]], -1)
    coords = np.where(mask[:, None], coords, -1).astype(np.int32)
    feats = rng.randn(v, c).astype(np.float32) * mask[:, None]
    return sparse.SparseLevel(jnp.asarray(feats), jnp.asarray(
        buf.astype(np.int32)), jnp.asarray(coords), jnp.asarray(mask), shape)


def timed(fn, *args):
    out = fn(*args)
    for _ in range(WARMUP - 1):
        out = fn(*args)
    float(np.asarray(jax.device_get(out)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(np.asarray(jax.device_get(out)).ravel()[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.RandomState(0)
    lv = make_level(rng)
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.05)
    rows, found = jax.jit(lambda: sparse._rules_subm(lv, (3, 3, 3)))()
    n_in = lv.features.shape[0]
    rules = jnp.where(found, rows, n_in)
    fp = jnp.concatenate([lv.features,
                          jnp.zeros((1, C), jnp.float32)], axis=0)

    base, sel = sparse._xwin_selectors(rules, n_in)
    fp_g = jnp.concatenate(
        [fp, jnp.zeros((gg.SEG_S - 1, C), jnp.float32)], axis=0)
    n_act = int(np.asarray(lv.mask).sum())
    pad = (-V) % gg.TV
    _, oks, _ = gg.segment_desc(
        jnp.pad(base, ((0, pad), (0, 0))),
        jnp.pad(sel, ((0, pad), (0, 0)), constant_values=0x3f),
        gg.TV, gg.SEG_S)
    print('seg: TV=%d S=%d tile-groups covered %.1f%%'
          % (gg.TV, gg.SEG_S, 100 * float(np.asarray(oks).mean())))

    variants = {
        'f32 rows': jax.jit(lambda: gg._gather_matmul_fwd_only(
            fp, rules, w)),
        'f32 xwin': jax.jit(lambda: gg._gm_any(fp, rules, w, False, True)),
        'packed rows': jax.jit(lambda: gg._gm_any(fp, rules, w, True, False)),
        'packed xwin': jax.jit(lambda: gg._gm_any(fp, rules, w, True, True)),
        'f32 seg': jax.jit(lambda: gg._gather_matmul_seg_call(
            fp_g, base, sel, gg.group_weights_x(w))),
        'packed seg': jax.jit(lambda: gg._gather_matmul_seg_call(
            gg.pack_bf16_pairs(fp_g), base, sel,
            gg.group_weights_x_eo(
                w.astype(jnp.bfloat16).astype(jnp.float32)))),
    }
    # fault isolation: one variant failing to lower (round 4: the gated
    # round-4 gated superwindow SMEM spec) must not kill the others' numbers or
    # the chip queue's xwin numerics gate.
    outs = {}
    for name, fn in variants.items():
        try:
            outs[name] = np.asarray(jax.device_get(fn()))
        except Exception as e:
            print('VARIANT FAILED %-14s: %s'
                  % (name, str(e).splitlines()[0][:160]))
    scale = np.abs(outs['f32 rows']).max()

    def err(label, a, b):
        if a in outs and b in outs:
            print(label, np.abs(outs[a] - outs[b]).max() / scale)

    err('f32  xwin vs rows max rel err:', 'f32 xwin', 'f32 rows')
    err('pack xwin vs pack rows   err:', 'packed xwin', 'packed rows')
    err('pack rows vs f32 rows    err:', 'packed rows', 'f32 rows')
    err('f32  seg vs rows         err:', 'f32 seg', 'f32 rows')
    err('pack seg vs pack rows    err:', 'packed seg', 'packed rows')

    # timing: B=8 vmapped like the backbone (one kernel grid per sample);
    # gated rows measure the occupancy tile-skip at this book's density
    nl = jnp.int32(n_act)
    rules_b = jnp.broadcast_to(rules[None], (B,) + rules.shape)
    fp_b = jnp.broadcast_to(fp[None], (B,) + fp.shape)
    wfl = gg.group_weights_x(w)
    wfle = gg.group_weights_x_eo(w.astype(jnp.bfloat16).astype(jnp.float32))
    fpg_b = jnp.broadcast_to(fp_g[None], (B,) + fp_g.shape)
    for name, one, tbl in [
            ('f32 rows', lambda f, r: gg._gather_matmul_fwd_only(f, r, w),
             'fp'),
            ('f32 xwin', lambda f, r: gg._gm_any(f, r, w, False, True),
             'fp'),
            ('f32 xwin gated', lambda f, r: gg._gm_any(
                f, r, w, False, True, nl), 'fp'),
            ('packed rows', lambda f, r: gg._gm_any(f, r, w, True, False),
             'fp'),
            ('packed xwin', lambda f, r: gg._gm_any(f, r, w, True, True),
             'fp'),
            ('packed xwin gated', lambda f, r: gg._gm_any(
                f, r, w, True, True, nl), 'fp'),
            ('f32 seg', lambda f, r: gg._gather_matmul_seg_call(
                f, *sparse._xwin_selectors(r, n_in), wfl, nl), 'fpg'),
            ('packed seg', lambda f, r: gg._gather_matmul_seg_call(
                gg.pack_bf16_pairs(f), *sparse._xwin_selectors(r, n_in),
                wfle, nl), 'fpg')]:
        fn = jax.jit(lambda f, r, one=one: jax.vmap(one)(f, r).sum())
        try:
            t = timed(fn, fpg_b if tbl == 'fpg' else fp_b, rules_b)
            print('B%d %-18s %8.2f ms/batch' % (B, name, t))
        except Exception as e:
            print('B%d %-18s FAILED: %s'
                  % (B, name, str(e).splitlines()[0][:160]))

    # dW (training backward): per-row xwin vs segment
    gup = jnp.asarray(rng.randn(V, C).astype(np.float32) * 0.05)
    gup_b = jnp.broadcast_to(gup[None], (B,) + gup.shape)
    for name, one, tbl in [
            ('f32 dw xwin', lambda f, r, gu: gg.gather_dw_xwin(
                f, *sparse._xwin_selectors(r, n_in), gu, nl), 'fp2'),
            ('f32 dw seg', lambda f, r, gu: gg.gather_dw_seg(
                f, *sparse._xwin_selectors(r, n_in), gu, nl), 'fpg')]:
        if tbl == 'fp2':
            tb = jnp.broadcast_to(
                jnp.concatenate([fp, jnp.zeros((1, C))], axis=0)[None],
                (B, V + 2, C))
        else:
            tb = fpg_b
        fn = jax.jit(lambda f, r, gu, one=one: jax.vmap(one)(f, r, gu).sum())
        try:
            t = timed(fn, tb, rules_b, gup_b)
            print('B%d %-18s %8.2f ms/batch' % (B, name, t))
        except Exception as e:
            print('B%d %-18s FAILED: %s'
                  % (B, name, str(e).splitlines()[0][:160]))


if __name__ == '__main__':
    main()

"""Pallas TPU kernel: rulebook gather + GEMM for sparse 3D convolution.

XLA's TPU row-gather path runs at ~1 GB/s effective on the (V x K, Cin)
neighbour gathers of ops.sparse (measured 238 ms for one 16k-voxel layer);
this kernel keeps the whole feature table VMEM-resident and streams each
output tile's neighbour rows through scratch with per-row dynamic ref loads
(supported by Mosaic, unlike vector gathers), accumulating one MXU matmul
per kernel tap.

API: `gather_matmul(features (V+1, Cin) [row V = zeros], rules (V, K) int32
in [0, V], weights (K, Cin, Cout)) -> (V, Cout)`, equal to

    features[rules].reshape(V, K*Cin) @ weights.reshape(K*Cin, Cout)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Output rows per program. 256 is the chip-measured default: the r5 TV
# sweep (CHIP_QUEUE_LOG seg-tv64/seg-tv256) has the packed-rows fwd kernel
# at 33.6/27.2/22.9 ms per conv2-density B8 book for TV=64/128/256, and e2e
# SECOND B8 eval at 21.6 fps (TV=256) vs 19.04 (TV=64).  Tests pin 64 via
# conftest (interpret-mode cost scales with the static TV unroll).
TV = int(os.environ.get('PCDET_GATHER_TV', '256'))
INTERPRET = False   # tests set True to run kernels in interpret mode on CPU


class _LiveFlag:
    """Stands in for a per-tile live flag: `[0, 0]` computes
    `tile_first_row < n_live` from the grid position and the (1, 1) SMEM
    live-count scalar.

    Live rows of every SparseLevel are a sorted PREFIX (ids ascend with
    INT_MAX padding, out-sets keep smallest ids on truncation), and rows
    >= n_live carry all-miss rules (found=False routes to the zero row), so
    a dead tile's output is exactly zeros — the gated kernels skip its
    loads/dots and store zeros instead.  Caps run 1.3-1.9x typical
    occupancy (measure_occupancy.py), so the skip is a real fraction of
    kernel time at production shapes.

    Why arithmetic instead of a precomputed (n_tiles, 1) flag column: the
    TPU lowering requires a block's last two dims to divide (8, 128) or
    equal the array dims, so a (1, 1) block over (n_tiles, 1) SMEM — the
    round-3 design, interpret-mode tested only — fails to lower on real
    hardware.  A (1, 1) scalar whose block IS the whole array lowers fine.
    """

    def __init__(self, count_ref, tile_axis):
        self._ref = count_ref
        self._axis = tile_axis

    def __getitem__(self, idx):
        first_row = pl.program_id(self._axis) * TV
        return (first_row < self._ref[0, 0]).astype(jnp.int32)


class _AlwaysLive:
    """Stands in for live_ref when no live count is given: `[0, 0]` yields a
    constant 1, so pl.when(1 != 0) folds to the unconditional body."""

    def __getitem__(self, idx):
        return jnp.int32(1)


def _ungated(kernel_fn):
    """Adapt a gated kernel (leading live_ref) to an ungated signature —
    the pallas call then carries NO live input (true fallback for
    PCDET_DISABLE_TILE_GATE, structurally identical to the pre-gating
    kernels)."""
    return functools.partial(kernel_fn, _AlwaysLive())


def _gate_args(n_live, n_tiles, tile_axis=0):
    """(kern_adapter, extra inputs, extra in_specs) for a wrapper: gating
    inserts the (1, 1) SMEM live-count scalar as the first input; the
    kernel's live_ref[0, 0] is this tile's occupancy flag (see _LiveFlag).
    tile_axis: which grid axis walks the output tiles."""
    del n_tiles
    if n_live is None:
        return _ungated, [], []
    spec = pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM)
    count = jnp.asarray(n_live, jnp.int32).reshape(1, 1)

    def adapt(kernel_fn):
        def wrapped(count_ref, *args):
            return kernel_fn(_LiveFlag(count_ref, tile_axis), *args)
        return wrapped

    return adapt, [count], [spec]


def _kernel(live_ref, rules_ref, feats_ref, w_ref, out_ref, g_scratch):
    # live_ref: this tile's occupancy flag at [0, 0] (see _LiveFlag);
    # rules_ref: (TV, K) int32 in SMEM; feats_ref: (V+1, Cin) VMEM;
    # w_ref: (K, Cin, Cout) VMEM; out_ref: (TV, Cout); g_scratch: (TV, Cin).
    # feats/weights may be bfloat16 (halves the VMEM streaming that
    # dominates); accumulation stays float32.
    k_taps = w_ref.shape[0]
    cout = w_ref.shape[2]

    def tap_body(k, acc):
        # per-row dynamic loads (vector gathers are not lowerable); the
        # row index comes from SMEM as a scalar
        for i in range(TV):                     # static unroll
            row = rules_ref[i, k]
            g_scratch[i, :] = feats_ref[row, :]
        prec = (jax.lax.Precision.DEFAULT
                if g_scratch.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        acc = acc + jnp.dot(g_scratch[:], w_ref[k],
                            preferred_element_type=jnp.float32,
                            precision=prec)
        return acc

    @pl.when(live_ref[0, 0] != 0)
    def _():
        acc = jax.lax.fori_loop(
            0, k_taps, tap_body, jnp.zeros((TV, cout), jnp.float32))
        out_ref[:] = acc

    @pl.when(live_ref[0, 0] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


# ---------------------------------------------------------------------------
# bf16 pair-packed variant: Mosaic cannot lower narrow bf16 row loads
# (vector<1x1xCxbf16>, C < 128), so bf16 streaming packs TWO bf16 channels
# per int32 word host-side, dynamic-row-loads the (V+1, C/2) int32 table
# (supported), and unpacks inside the kernel with shift/mask + a SAME-WIDTH
# i32->f32 bitcast: a bf16's value is exactly the f32 whose top 16 bits are
# its bits.  Measured 2.07x over the f32 kernel at V=16k, C=64, K=27
# (scripts/exp_gather_packed.py; rel err ~2.5e-3 — inherent to bf16).
# ---------------------------------------------------------------------------

def _kernel_packed(live_ref, rules_ref, featsp_ref, w_ref, out_ref,
                   g_scratch):
    # featsp_ref: (V+1, C/2) int32 (hi half = channel 2c+1, lo = 2c);
    # w_ref: (K, 2, C/2, Cout) f32 ([k, 0] even channels, [k, 1] odd);
    # g_scratch: (TV, C/2) int32.
    k_taps = w_ref.shape[0]
    cout = w_ref.shape[3]

    def tap_body(k, acc):
        for i in range(TV):                     # static unroll
            row = rules_ref[i, k]
            g_scratch[i, :] = featsp_ref[row, :]
        wv = g_scratch[:]
        lo = jax.lax.bitcast_convert_type(wv << 16, jnp.float32)
        hi = jax.lax.bitcast_convert_type(
            wv & jnp.int32(-65536), jnp.float32)
        acc = acc + jnp.dot(lo, w_ref[k, 0],
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(hi, w_ref[k, 1],
                            preferred_element_type=jnp.float32)
        return acc

    @pl.when(live_ref[0, 0] != 0)
    def _():
        acc = jax.lax.fori_loop(
            0, k_taps, tap_body, jnp.zeros((TV, cout), jnp.float32))
        out_ref[:] = acc

    @pl.when(live_ref[0, 0] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


# ---------------------------------------------------------------------------
# x-window variant: one (3, Cin) block load per (dz, dy) tap group
#
# Every kw=3 rulebook in ops.sparse satisfies the x-window property
# (sparse._xwin_selectors): the three x-taps of a tap group query ids q-1,
# q, q+1, whose present rows are CONSECUTIVE in the sorted table.  So the
# 27 per-row loads per output collapse to 9 dynamic (3, Cin) block loads;
# cheap VPU selects (2-bit offsets from the packed selector word)
# distribute the 3 window rows to the 3 taps, and each group contracts as
# ONE (TV, 3*Cin) MXU dot.  Load issue count — the f32/packed kernels'
# bottleneck — drops 3x.
# ---------------------------------------------------------------------------

def _xwin_select(wv, selv, zero):
    """wv: (TV, 3, C) window rows; selv: (TV,) packed 2-bit offsets.
    -> (TV, 3*C): per x-tap dx, row `off_dx` of the window (off 3 = miss ->
    zero).  Misses select nothing because off==3 matches no j."""
    parts = []
    for dx in range(3):
        off = (selv >> (2 * dx)) & 3            # (TV,)
        s = zero
        for j in range(3):
            m = (off == j)[:, None]
            s = s + jnp.where(m, wv[:, j, :], zero)
        parts.append(s)
    return jnp.concatenate(parts, axis=1)


def _kernel_xwin(live_ref, base_ref, sel_ref, feats_ref, w_ref, out_ref,
                 blk):
    """live_ref: (1, 1) SMEM tile-occupancy flag; base_ref: (TV, G) SMEM
    window starts; sel_ref: (TV, G) VMEM packed offsets; feats_ref:
    (V+2, Cin) VMEM (last 2 rows zero); w_ref: (G, 3*Cin, Cout); blk:
    (3*TV, Cin) scratch."""
    g_groups = w_ref.shape[0]
    cin = feats_ref.shape[1]
    cout = w_ref.shape[2]
    tv = out_ref.shape[0]

    @pl.when(live_ref[0, 0] != 0)
    def _():
        selv_all = sel_ref[:]
        acc = jnp.zeros((tv, cout), jnp.float32)
        zero = jnp.zeros((tv, cin), feats_ref.dtype)
        prec = (jax.lax.Precision.DEFAULT if feats_ref.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        for g in range(g_groups):               # static unroll
            for i in range(tv):
                blk[3 * i:3 * i + 3, :] = feats_ref[
                    pl.ds(base_ref[i, g], 3), :]
            wv = blk[:].reshape(tv, 3, cin)
            sp = _xwin_select(wv, selv_all[:, g], zero)
            acc = acc + jnp.dot(sp, w_ref[g],
                                preferred_element_type=jnp.float32,
                                precision=prec)
        out_ref[:] = acc

    @pl.when(live_ref[0, 0] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


def _kernel_xwin_packed(live_ref, base_ref, sel_ref, featsp_ref, w_ref,
                        out_ref, blk):
    """Packed bf16-pairs x-window kernel.  featsp_ref: (V+2, Cin/2) int32;
    w_ref: (G, 2, 3*Cin/2, Cout) ([g, 0] even channels, [g, 1] odd)."""
    g_groups = w_ref.shape[0]
    c2 = featsp_ref.shape[1]
    cout = w_ref.shape[3]
    tv = out_ref.shape[0]

    @pl.when(live_ref[0, 0] != 0)
    def _():
        selv_all = sel_ref[:]
        acc = jnp.zeros((tv, cout), jnp.float32)
        zero = jnp.zeros((tv, c2), jnp.int32)
        for g in range(g_groups):               # static unroll
            for i in range(tv):
                blk[3 * i:3 * i + 3, :] = featsp_ref[
                    pl.ds(base_ref[i, g], 3), :]
            wv = blk[:].reshape(tv, 3, c2)
            sp = _xwin_select(wv, selv_all[:, g], zero)
            lo = jax.lax.bitcast_convert_type(sp << 16, jnp.float32)
            hi = jax.lax.bitcast_convert_type(sp & jnp.int32(-65536),
                                              jnp.float32)
            acc = acc + jnp.dot(lo, w_ref[g, 0],
                                preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(hi, w_ref[g, 1],
                                preferred_element_type=jnp.float32)
        out_ref[:] = acc

    @pl.when(live_ref[0, 0] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@jax.jit
def _gather_matmul_xwin_call(feats, base, sel, weights_grouped, n_live=None):
    """feats: (V+2, Cin) f32/int32-packed (last 2 rows zero); base/sel:
    (V, G) int32; weights_grouped: (G, 3*Cin, Cout) f32 or
    (G, 2, 3*Cin/2, Cout) for the packed table; n_live: optional scalar
    count of live output rows (live rows are a prefix) — tiles past it are
    skipped."""
    vp, g = base.shape
    packed = feats.dtype == jnp.int32
    cout = weights_grouped.shape[-1]
    pad = (-vp) % TV
    if pad:
        base = jnp.pad(base, ((0, pad), (0, 0)))
        sel = jnp.pad(sel, ((0, pad), (0, 0)), constant_values=0x3f)
    n_tiles = base.shape[0] // TV
    adapt, gate_in, gate_specs = _gate_args(n_live, n_tiles)
    out = pl.pallas_call(
        adapt(_kernel_xwin_packed if packed else _kernel_xwin),
        out_shape=jax.ShapeDtypeStruct((base.shape[0], cout), jnp.float32),
        grid=(n_tiles,),
        in_specs=gate_specs + [
            pl.BlockSpec((TV, g), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TV, g), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TV, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3 * TV, feats.shape[1]), feats.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*gate_in, base, sel, feats, weights_grouped)
    return out[:vp]


# Kernel-choice policy, decided by the 2026-08-18 on-chip A/B
# (CHIP_QUEUE_LOG.txt): per-row packed gather beats the x-window variants
# for the forward/dX gather-GEMMs both on the conv2-density microbench
# (33.6 vs 57.4 ms/B8) and e2e (SECOND B8 eval 19.05 vs 14.48 fps), while
# the dW backward is FASTER with x-window block loads (train 6.67 vs
# 5.72 fps rows-everywhere) — its k-major per-row grid re-reads the table
# once per tap.  So the defaults split by direction; both stay
# env-flippable for future sweeps (and PCDET_DISABLE_XWIN still kills
# every x-window path at the rulebook layer).
XWIN_FWD = os.environ.get('PCDET_XWIN_FWD', '0') == '1'
XWIN_DW = os.environ.get('PCDET_XWIN_DW', '1') == '1'

# ---------------------------------------------------------------------------
# segment variant (round 5): ONE (S, Cin) block load per (tile, tap group)
#
# The sorted-id layout makes every tap group's window starts MONOTONE over
# the tile's TV consecutive output rows, and the spans are tight on LiDAR
# surfaces: at TV=64, S=256 covers 98.5-99.4% of (tile, group)s on
# realistic subm books and 98.8-99.3% on strided books
# (scripts/exp_seg_span.py).  So the whole tile-group gather is ONE dynamic
# (S, Cin) block load, and rows route to taps by ONE-HOT MXU MATMULS
# (sp = onehot(offsets) @ window) instead of per-row loads or VPU
# where-chains: 27 block loads + 36 dots per tile replace 3*TV*9 = 1728
# row loads — the direct fix for the issue-bound SECOND eval roofline
# (5.4% MFU / 13.7% HBM, ROOFLINE.json).  One-hot routing is EXACT: 1.0*x
# and 0.0*x are exact in every MXU pass mode, and the f32 path forces
# HIGHEST (bf16x3 decomposes f32 exactly).  The ~1% non-coverable
# tile-groups take the per-row x-window fallback branch.
# ---------------------------------------------------------------------------

SEG_S = int(os.environ.get('PCDET_SEG_S', '256'))       # segment rows
# fwd: seg LOST its e2e A/B (SECOND B8 eval 18.77 vs 21.74 fps stock,
# r5d chip queue) despite winning the isolated microbench — same
# pattern as superwindow (the (V+S-1, C) zero-padded table copy per conv
# + in-graph layout pressure swamp the issue-rate win).  Default stays
# per-row packed.
SEG_FWD = os.environ.get('PCDET_GATHER_SEG', '0') == '1'
# dW: seg WON e2e (SECOND B8 train 740.3 vs 805.4 ms under host books,
# r5e chip queue = 10.81 vs 9.93 fps/chip) on top of its -29% microbench
# (32.99 vs xwin 46.59 ms) -> production default since r5e.
SEG_DW = os.environ.get('PCDET_GATHER_SEG_DW', '1') == '1'
_SEG_MISS = 1023                 # 10-bit offset sentinel (selects nothing)


def segment_desc(base, sel, tv, s):
    """Per-(tile, group) descriptors for the segment kernel.

    :param base: (Vp, G) int32 3-row window starts (Vp multiple of tv)
    :param sel: (Vp, G) int32 packed 2-bit x-offsets (0x3f = all-miss row)
    :return: anchor (n_tiles, G) int32 segment starts, ok (n_tiles, G)
        int32 coverability flags (span <= s), seloff (Vp, G) int32 packed
        10-bit per-tap segment offsets (1023 = miss, selects nothing)
    """
    assert s <= _SEG_MISS - 1, s
    vp, g = base.shape
    n_tiles = vp // tv
    b3 = base.reshape(n_tiles, tv, g)
    s3 = sel.reshape(n_tiles, tv, g)
    rowmiss = s3 == 0x3f
    big = jnp.int32(np.iinfo(np.int32).max)
    lo = jnp.min(jnp.where(rowmiss, big, b3), axis=1)
    anchor = jnp.where(lo == big, 0, lo).astype(jnp.int32)
    hi = jnp.max(jnp.where(rowmiss, -1, b3 + 3), axis=1)
    ok = (hi - anchor) <= s
    rel = b3 - anchor[:, None, :]
    parts = []
    for dx in range(3):
        tap = (s3 >> (2 * dx)) & 3
        o = jnp.where(tap == 3, _SEG_MISS, jnp.clip(rel + tap, 0, _SEG_MISS))
        parts.append(o << (10 * dx))
    seloff = parts[0] | parts[1] | parts[2]
    seloff = jnp.where(ok[:, None, :], seloff, 0)   # fallback tiles: unused
    return (anchor, ok.astype(jnp.int32),
            seloff.reshape(vp, g).astype(jnp.int32))


def _seg_meta(anchor, ok):
    """Pack the per-(tile, group) anchor/ok descriptors into an
    (8 * n_tiles, G) array consumable as per-tile (8, G) SMEM blocks:
    row 8i = tile i's anchors, row 8i+1 = its ok flags, rows 8i+2.. pad.

    The first seg version passed anchor/ok as FULL (n_tiles, G) SMEM
    arrays (block == array) — at production V (n_tiles ~ 680) that is
    ~25 KB of SMEM per array and the remote TPU compiler crashed outright
    (tpu_compile_helper exit 1, CHIP_QUEUE_LOG r5b seg-tv64) while the
    same kernel compiled fine at smoke shapes.  Per-tile (8, G) blocks
    keep SMEM usage constant and respect the Mosaic block-shape rule
    (8 divides 8; G equals the array dim)."""
    n_tiles, g = anchor.shape
    meta = jnp.zeros((n_tiles, 8, g), jnp.int32)
    meta = meta.at[:, 0].set(anchor).at[:, 1].set(ok)
    return meta.reshape(8 * n_tiles, g)


def _seg_covered_sps(a0, seloff_all, feats_ref, g, tv, prec):
    """Covered-branch select: (TV, 3*Cin) f32, per tap [even||odd] column
    order when the table is packed (matching group_weights_x_eo), original
    channel order when f32 (matching group_weights_x).  `a0` is the tile's
    scalar segment anchor (row index into feats)."""
    s = SEG_S
    packed = feats_ref.dtype == jnp.int32
    win = feats_ref[pl.ds(a0, s), :]                        # (S, cw)
    if packed:
        lo = jax.lax.bitcast_convert_type(win << 16, jnp.float32)
        hi = jax.lax.bitcast_convert_type(win & jnp.int32(-65536),
                                          jnp.float32)
        wcat = jnp.concatenate([lo, hi], axis=1)            # (S, Cin)
    else:
        wcat = win
    offs = seloff_all[:, g:g + 1]                           # (TV, 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tv, s), 1)
    sps = []
    for dx in range(3):
        od = (offs >> (10 * dx)) & _SEG_MISS
        oh = (od == iota).astype(jnp.float32)               # (TV, S)
        sps.append(jnp.dot(oh, wcat, preferred_element_type=jnp.float32,
                           precision=prec))
    return jnp.concatenate(sps, axis=1)                     # (TV, 3*Cin)


def _seg_fallback_sps(base_ref, sel_all, feats_ref, blk, g, tv):
    """Fallback-branch select (span > S): per-row (3, cw) window loads into
    `blk` + 2-bit VPU selects — the x-window body.  Returns (TV, 3*Cin) f32
    in the same column order as the covered branch."""
    cw = feats_ref.shape[1]
    packed = feats_ref.dtype == jnp.int32
    for r in range(tv):                                     # static unroll
        blk[3 * r:3 * r + 3, :] = feats_ref[pl.ds(base_ref[r, g], 3), :]
    wv = blk[:].reshape(tv, 3, cw)
    zero = jnp.zeros((tv, cw), feats_ref.dtype)
    spx = _xwin_select(wv, sel_all[:, g], zero)             # (TV, 3*cw)
    if not packed:
        return spx
    lo3 = jax.lax.bitcast_convert_type(spx << 16, jnp.float32)
    hi3 = jax.lax.bitcast_convert_type(spx & jnp.int32(-65536), jnp.float32)
    parts = []
    for t in range(3):                  # tap-major -> per-tap [even||odd]
        parts.append(lo3[:, t * cw:(t + 1) * cw])
        parts.append(hi3[:, t * cw:(t + 1) * cw])
    return jnp.concatenate(parts, axis=1)


def _kernel_seg(live_ref, meta_ref, base_ref, sel_ref, seloff_ref,
                feats_ref, w_ref, out_ref, blk, acc_ref):
    """meta: per-tile (8, G) SMEM block — row 0 anchors, row 1 ok flags
    (_seg_meta; constant SMEM, unlike the full (n_tiles, G) arrays that
    crashed the compiler at production n_tiles); base: (TV, G) SMEM
    (fallback row loads); sel/seloff: (TV, G) VMEM; feats: (V+S, cw) f32 or
    int32-packed (last S rows zero); w_ref: (G, 3*Cin, Cout) f32
    (group_weights_x order for f32 tables, group_weights_x_eo for packed);
    blk: (3*TV, cw) fallback scratch; acc_ref: (TV, Cout) f32 scratch."""
    g_groups = w_ref.shape[0]
    tv = out_ref.shape[0]
    packed = feats_ref.dtype == jnp.int32
    prec = (jax.lax.Precision.DEFAULT if packed
            else jax.lax.Precision.HIGHEST)

    @pl.when(live_ref[0, 0] != 0)
    def _():
        sel_all = sel_ref[:]
        seloff_all = seloff_ref[:]
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for g in range(g_groups):               # static unroll
            @pl.when(meta_ref[1, g] != 0)
            def _(g=g):
                sps = _seg_covered_sps(meta_ref[0, g], seloff_all,
                                       feats_ref, g, tv, prec)
                acc_ref[:] = acc_ref[:] + jnp.dot(
                    sps, w_ref[g], preferred_element_type=jnp.float32,
                    precision=prec)

            @pl.when(meta_ref[1, g] == 0)
            def _(g=g):
                sps = _seg_fallback_sps(base_ref, sel_all, feats_ref, blk,
                                        g, tv)
                acc_ref[:] = acc_ref[:] + jnp.dot(
                    sps, w_ref[g], preferred_element_type=jnp.float32,
                    precision=prec)
        out_ref[:] = acc_ref[:]

    @pl.when(live_ref[0, 0] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@jax.jit
def _gather_matmul_seg_call(feats, base, sel, weights_grouped, n_live=None):
    """feats: (V+SEG_S, cw) f32 or int32-packed (last SEG_S rows zero);
    base/sel: (V, G) int32; weights_grouped: (G, 3*Cin, Cout) f32 —
    group_weights_x for f32 tables, group_weights_x_eo for packed."""
    vp, g = base.shape
    cout = weights_grouped.shape[-1]
    pad = (-vp) % TV
    if pad:
        base = jnp.pad(base, ((0, pad), (0, 0)))
        sel = jnp.pad(sel, ((0, pad), (0, 0)), constant_values=0x3f)
    anchor, ok, seloff = segment_desc(base, sel, TV, SEG_S)
    meta = _seg_meta(anchor, ok)
    n_tiles = base.shape[0] // TV
    adapt, gate_in, gate_specs = _gate_args(n_live, n_tiles)
    out = pl.pallas_call(
        adapt(_kernel_seg),
        out_shape=jax.ShapeDtypeStruct((base.shape[0], cout), jnp.float32),
        grid=(n_tiles,),
        in_specs=gate_specs + [
            pl.BlockSpec((8, g), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),          # meta
            pl.BlockSpec((TV, g), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TV, g), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TV, g), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),          # feats
            pl.BlockSpec(memory_space=pltpu.VMEM),          # weights
        ],
        out_specs=pl.BlockSpec((TV, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3 * TV, feats.shape[1]), feats.dtype),
                        pltpu.VMEM((TV, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*gate_in, meta, base, sel, seloff, feats, weights_grouped)
    return out[:vp]


def _dw_kernel_seg(live_ref, meta_ref, base_ref, sel_ref,
                   seloff_ref, g_ref, feats_ref, out_ref, blk, spg,
                   acc_ref):
    """Segment dW (f32 tables only — training path): same dual-branch
    select as _kernel_seg, but the (TV, 3*Cin) rows contract against the
    upstream grads and accumulate across tiles (like _dw_kernel_xwin).
    meta: per-tile (8, G) SMEM block (row 0 anchors, row 1 ok flags);
    g_ref: (TV, Cout); out_ref: (K, Cin, Cout)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    k_taps, cin, cout = out_ref.shape
    g_groups = k_taps // 3
    tv = g_ref.shape[0]

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(live_ref[0, 0] != 0)
    def _():
        sel_all = sel_ref[:]
        seloff_all = seloff_ref[:]
        gv = g_ref[:]
        for g in range(g_groups):               # static unroll
            @pl.when(meta_ref[1, g] != 0)
            def _(g=g):
                spg[:] = _seg_covered_sps(meta_ref[0, g], seloff_all,
                                          feats_ref, g, tv,
                                          jax.lax.Precision.HIGHEST)

            @pl.when(meta_ref[1, g] == 0)
            def _(g=g):
                spg[:] = _seg_fallback_sps(base_ref, sel_all, feats_ref,
                                           blk, g, tv)
            d = jax.lax.dot_general(spg[:], gv, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            acc_ref[3 * cin * g:3 * cin * (g + 1), :] = (
                acc_ref[3 * cin * g:3 * cin * (g + 1), :] + d)

    @pl.when(i == n - 1)
    def _():
        out_ref[...] = acc_ref[...].reshape(k_taps, cin, cout)


@jax.jit
def gather_dw_seg(features, base, sel, g, n_live=None):
    """Segment dW (kw=3 books): features (V+SEG_S, Cin) f32 (last SEG_S
    rows zero), base/sel (V, G) int32, g (V, Cout) -> (3*G, Cin, Cout)."""
    vp, n_groups = base.shape
    cin = features.shape[1]
    cout = g.shape[1]
    pad = (-vp) % TV
    if pad:
        base = jnp.pad(base, ((0, pad), (0, 0)))
        sel = jnp.pad(sel, ((0, pad), (0, 0)), constant_values=0x3f)
        g = jnp.pad(g, ((0, pad), (0, 0)))
    anchor, ok, seloff = segment_desc(base, sel, TV, SEG_S)
    meta = _seg_meta(anchor, ok)
    n_tiles = base.shape[0] // TV
    adapt, gate_in, gate_specs = _gate_args(n_live, n_tiles)
    out = pl.pallas_call(
        adapt(_dw_kernel_seg),
        out_shape=jax.ShapeDtypeStruct((3 * n_groups, cin, cout),
                                       jnp.float32),
        grid=(n_tiles,),
        in_specs=gate_specs + [
            pl.BlockSpec((8, n_groups), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),          # meta
            pl.BlockSpec((TV, n_groups), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TV, n_groups), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TV, n_groups), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TV, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # full feature table
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3 * TV, cin), features.dtype),
                        pltpu.VMEM((TV, 3 * cin), jnp.float32),
                        pltpu.VMEM((3 * n_groups * cin, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*gate_in, meta, base, sel, seloff, g, features)
    return out


def group_weights_x_eo(w):
    """(K, Cin, Cout) -> (K//3, 3*Cin, Cout) with each tap's rows reordered
    [even channels; odd channels] — the packed segment kernel's unpacked
    window column order ([lo-plane || hi-plane])."""
    k, cin, cout = w.shape
    wt = jnp.concatenate([w[:, 0::2, :], w[:, 1::2, :]], axis=1)
    return wt.reshape(k // 3, 3 * cin, cout)


def group_weights_x(w):
    """(K, Cin, Cout) -> (K//3, 3*Cin, Cout): per-group tap-major rows."""
    k, cin, cout = w.shape
    return w.reshape(k // 3, 3 * cin, cout)


def group_weights_x_packed(w):
    """(K, Cin, Cout) -> (G, 2, 3*Cin/2, Cout) for the packed x-window
    kernel ([g, 0] = even channels of the 3 taps, [g, 1] = odd)."""
    k, cin, cout = w.shape
    we = w[:, 0::2, :].reshape(k // 3, 3 * (cin // 2), cout)
    wo = w[:, 1::2, :].reshape(k // 3, 3 * (cin // 2), cout)
    return jnp.stack([we, wo], axis=1)


def pack_bf16_pairs(feats_f32):
    """(N, C) f32 -> (N, C/2) int32, word c = bf16(ch 2c+1) << 16 | bf16(ch 2c)."""
    fb = feats_f32.astype(jnp.bfloat16)
    bits = jax.lax.bitcast_convert_type(fb, jnp.uint16).astype(jnp.uint32)
    return ((bits[:, 1::2] << 16) | bits[:, 0::2]).astype(jnp.int32)


def split_weights_packed(w):
    """(K, Cin, Cout) -> (K, 2, Cin/2, Cout): [k, 0] even-channel rows,
    [k, 1] odd — matching pack_bf16_pairs' channel interleave."""
    return jnp.stack([w[:, 0::2, :], w[:, 1::2, :]], axis=1)


@jax.jit
def _gather_matmul_packed_call(feats_packed, rules, weights_split,
                               n_live=None):
    vp, k = rules.shape
    cout = weights_split.shape[3]
    pad = (-vp) % TV
    if pad:
        rules = jnp.pad(rules, ((0, pad), (0, 0)),
                        constant_values=feats_packed.shape[0] - 1)
    n_tiles = rules.shape[0] // TV
    adapt, gate_in, gate_specs = _gate_args(n_live, n_tiles)
    out = pl.pallas_call(
        adapt(_kernel_packed),
        out_shape=jax.ShapeDtypeStruct((rules.shape[0], cout), jnp.float32),
        grid=(n_tiles,),
        in_specs=gate_specs + [
            pl.BlockSpec((TV, k), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TV, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TV, feats_packed.shape[1]), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*gate_in, rules, feats_packed, weights_split)
    return out[:vp]


@jax.custom_vjp
def gather_matmul(features, rules, weights, n_live=None):
    """:param features: (V+1, Cin) f32, last row zeros
    :param rules: (V, K) int32 row indices in [0, V]
    :param weights: (K, Cin, Cout) f32
    :param n_live: optional scalar live-row count (live rows are a prefix)
    :return: (V, Cout) f32
    """
    return _gather_matmul_fwd_only(features, rules, weights, n_live)


@jax.jit
def _gather_matmul_fwd_only(features, rules, weights, n_live=None):
    v, k = rules.shape
    cin = features.shape[1]
    cout = weights.shape[2]
    pad = (-v) % TV
    if pad:
        rules = jnp.pad(rules, ((0, pad), (0, 0)),
                        constant_values=features.shape[0] - 1)
    vp = rules.shape[0]
    n_tiles = vp // TV
    adapt, gate_in, gate_specs = _gate_args(n_live, n_tiles)

    out = pl.pallas_call(
        adapt(_kernel),
        out_shape=jax.ShapeDtypeStruct((vp, cout), jnp.float32),
        grid=(n_tiles,),
        in_specs=gate_specs + [
            pl.BlockSpec((TV, k), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # full feature table
            pl.BlockSpec(memory_space=pltpu.VMEM),      # full weights
        ],
        out_specs=pl.BlockSpec((TV, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TV, cin), features.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*gate_in, rules, features, weights)
    return out[:v]


def _gather_matmul_vjp_fwd(features, rules, weights, n_live=None):
    return _gather_matmul_fwd_only(features, rules, weights, n_live), (
        features, rules, weights)


def _gather_matmul_vjp_bwd(res, g):
    """out[v] = sum_k feats[rules[v,k]] @ W[k], rules constant:
    dW[k] = feats[rules[:,k]]^T @ g;  dfeats[rules[v,k]] += g[v] @ W[k]^T.

    The backward runs as XLA gathers/scatter-add (the scatter-add has no
    Pallas equivalent yet; misses were routed to the zero padding row, whose
    gradient is discarded by the caller's concatenate VJP).
    """
    features, rules, weights = res
    v, k = rules.shape
    cin = features.shape[1]
    gathered = features[rules.reshape(-1)].reshape(v, k, cin)
    dw = jnp.einsum('vki,vo->kio', gathered, g,
                    preferred_element_type=jnp.float32)
    contrib = jnp.einsum('vo,kio->vki', g, weights,
                         preferred_element_type=jnp.float32)
    df = jnp.zeros_like(features).at[rules.reshape(-1)].add(
        contrib.reshape(v * k, cin))
    return df, None, dw, None


gather_matmul.defvjp(_gather_matmul_vjp_fwd, _gather_matmul_vjp_bwd)


# ---------------------------------------------------------------------------
# dW kernel for the subm-conv backward: dW[k] = feats[rules[:, k]]^T @ g
# ---------------------------------------------------------------------------

def _dw_kernel(live_ref, rules_ref, g_ref, feats_ref, out_ref, f_scratch,
               acc_ref):
    """Grid (K, n_tiles) with the tile dim fastest: for each tap k the
    scratch accumulator is reset at tile 0, accumulates one
    (Cin, TV) x (TV, Cout) MXU matmul per tile, and lands in out block k at
    the last tile.  rules_ref: (TV, K) SMEM (full tap dim — Mosaic requires
    the last block dim to span the array; the tap column is selected by
    program id); g_ref: (TV, Cout); feats_ref: (V+1, Cin) resident;
    out_ref: (1, Cin, Cout)."""
    k = pl.program_id(0)
    i = pl.program_id(1)
    n = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # dead tiles contribute exactly zero (their rules all route to the zero
    # row), so the accumulate is skipped outright
    @pl.when(live_ref[0, 0] != 0)
    def _():
        for r in range(f_scratch.shape[0]):      # static unroll
            row = rules_ref[r, k]
            f_scratch[r, :] = feats_ref[row, :]
        prec = (jax.lax.Precision.DEFAULT if f_scratch.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
            f_scratch[:], g_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    @pl.when(i == n - 1)
    def _():
        out_ref[0] = acc_ref[...]


def _dw_kernel_xwin(live_ref, base_ref, sel_ref, g_ref, feats_ref, out_ref,
                    blk, acc_ref):
    """x-window dW: grid (n_tiles,); all G groups statically unrolled so
    the selector column index is static.  One (3, Cin) block load per
    (output row, group) replaces 3 row loads; the tap selects reuse
    `_xwin_select`; dW[k] accumulates in a (K*Cin, Cout) scratch written
    out at the last tile.  base/sel as in `_kernel_xwin`; g_ref: (TV, Cout)
    upstream grads; out_ref: (K, Cin, Cout) f32."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    k_taps, cin, cout = out_ref.shape
    g_groups = k_taps // 3
    tv = g_ref.shape[0]

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(live_ref[0, 0] != 0)
    def _():
        selv_all = sel_ref[:]
        gv = g_ref[:]
        zero = jnp.zeros((tv, cin), feats_ref.dtype)
        prec = (jax.lax.Precision.DEFAULT if feats_ref.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        for g in range(g_groups):               # static unroll
            for r in range(tv):
                blk[3 * r:3 * r + 3, :] = feats_ref[
                    pl.ds(base_ref[r, g], 3), :]
            wv = blk[:].reshape(tv, 3, cin)
            sp = _xwin_select(wv, selv_all[:, g], zero)  # (TV, 3*Cin)
            d = jax.lax.dot_general(sp, gv, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)      # (3*Cin, Cout)
            acc_ref[3 * cin * g:3 * cin * (g + 1), :] = (
                acc_ref[3 * cin * g:3 * cin * (g + 1), :] + d)

    @pl.when(i == n - 1)
    def _():
        out_ref[...] = acc_ref[...].reshape(k_taps, cin, cout)


@jax.jit
def gather_dw_xwin(features, base, sel, g, n_live=None):
    """dW via the x-window gather (kw=3 books): features (V+2, Cin) f32
    (last 2 rows zero), base/sel (V, G) int32, g (V, Cout) ->
    (3*G, Cin, Cout)."""
    vp, n_groups = base.shape
    cin = features.shape[1]
    cout = g.shape[1]
    pad = (-vp) % TV
    if pad:
        base = jnp.pad(base, ((0, pad), (0, 0)))
        sel = jnp.pad(sel, ((0, pad), (0, 0)), constant_values=0x3f)
        g = jnp.pad(g, ((0, pad), (0, 0)))
    n_tiles = base.shape[0] // TV
    adapt, gate_in, gate_specs = _gate_args(n_live, n_tiles)
    out = pl.pallas_call(
        adapt(_dw_kernel_xwin),
        out_shape=jax.ShapeDtypeStruct((3 * n_groups, cin, cout),
                                       jnp.float32),
        grid=(n_tiles,),
        in_specs=gate_specs + [
            pl.BlockSpec((TV, n_groups), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TV, n_groups), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TV, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # full feature table
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3 * TV, cin), features.dtype),
                        pltpu.VMEM((3 * n_groups * cin, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*gate_in, base, sel, g, features)
    return out


@jax.jit
def gather_dw(features, rules, g, n_live=None):
    """dW[k] = sum_v features[rules[v, k]] (outer) g[v]  ->  (K, Cin, Cout).

    :param features: (V+1, Cin), last row zeros; :param rules: (V, K) int32
    in [0, V] (misses routed to the zero row); :param g: (V, Cout) f32
    """
    v, k = rules.shape
    cin = features.shape[1]
    cout = g.shape[1]
    pad = (-v) % TV
    if pad:
        rules = jnp.pad(rules, ((0, pad), (0, 0)),
                        constant_values=features.shape[0] - 1)
        g = jnp.pad(g, ((0, pad), (0, 0)))
    vp = rules.shape[0]
    n_tiles = vp // TV
    adapt, gate_in, gate_specs = _gate_args(n_live, n_tiles, tile_axis=1)

    out = pl.pallas_call(
        adapt(_dw_kernel),
        out_shape=jax.ShapeDtypeStruct((k, cin, cout), jnp.float32),
        grid=(k, n_tiles),
        in_specs=gate_specs + [
            pl.BlockSpec((TV, k), lambda kk, i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TV, cout), lambda kk, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # full feature table
        ],
        out_specs=pl.BlockSpec((1, cin, cout), lambda kk, i: (kk, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TV, cin), features.dtype),
                        pltpu.VMEM((cin, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*gate_in, rules, g, features)
    return out


# ---------------------------------------------------------------------------
# Scatter-free subm-conv matmul: backward uses the MIRRORED rulebook
# ---------------------------------------------------------------------------

def _gm_any(features, rules, weights, packed=False, kw3=False, n_live=None):
    """gather+GEMM on either backend (Pallas on TPU, XLA gather on CPU).

    packed=True streams the table as bf16 pairs packed in int32 words
    (TPU: the 2.07x packed kernel; CPU: emulates the same bf16 rounding so
    numerics tests cover the TPU path's precision).

    kw3=True (static) asserts the rulebook came from a kernel with kw=3 in
    `_kernel_offsets` tap order, enabling the x-window kernel (one (3, Cin)
    block load per (dz, dy) tap group instead of 3 row loads).

    n_live: optional scalar count of live output rows (a prefix — see
    _LiveFlag); tiles past it skip their loads/dots on TPU."""
    if jax.default_backend() != 'cpu':
        if kw3 and rules.shape[1] % 3 == 0 and SEG_FWD:
            from ..sparse import _xwin_selectors
            base, sel = _xwin_selectors(rules, features.shape[0] - 1)
            use_packed = packed and features.shape[1] % 2 == 0
            # segment loads read (SEG_S, cw) windows anchored at any live
            # row: pad the table so the last anchor's window stays in bounds
            zrows = jnp.zeros((SEG_S - 1, features.shape[1]), features.dtype)
            feats2 = jnp.concatenate([features, zrows], axis=0)
            if use_packed:
                w_r = weights.astype(jnp.bfloat16).astype(jnp.float32)
                return _gather_matmul_seg_call(
                    pack_bf16_pairs(feats2), base, sel,
                    group_weights_x_eo(w_r), n_live)
            return _gather_matmul_seg_call(
                feats2, base, sel, group_weights_x(weights), n_live)
        if kw3 and rules.shape[1] % 3 == 0 and XWIN_FWD:
            from ..sparse import _xwin_selectors
            base, sel = _xwin_selectors(rules, features.shape[0] - 1)
            use_packed = packed and features.shape[1] % 2 == 0
            zrow = jnp.zeros((1, features.shape[1]), features.dtype)
            feats2 = jnp.concatenate([features, zrow], axis=0)
            if use_packed:
                w_r = weights.astype(jnp.bfloat16).astype(jnp.float32)
                return _gather_matmul_xwin_call(
                    pack_bf16_pairs(feats2), base, sel,
                    group_weights_x_packed(w_r), n_live)
            return _gather_matmul_xwin_call(feats2, base, sel,
                                            group_weights_x(weights), n_live)
        if packed and features.shape[1] % 2 == 0:
            # weights bf16-rounded (stored f32 — they are tiny) so numerics
            # match the CPU bf16 emulation below
            w_r = weights.astype(jnp.bfloat16).astype(jnp.float32)
            return _gather_matmul_packed_call(
                pack_bf16_pairs(features), rules, split_weights_packed(w_r),
                n_live)
        return _gather_matmul_fwd_only(features, rules, weights, n_live)
    if packed:
        features = features.astype(jnp.bfloat16)
        weights = weights.astype(jnp.bfloat16)
    v, k = rules.shape
    cin = features.shape[1]
    gathered = features[rules.reshape(-1)].reshape(v, k * cin)
    return jnp.dot(gathered, weights.reshape(k * cin, -1),
                   preferred_element_type=jnp.float32)


def _dw_any(features, rules, g, kw3=False, n_live=None):
    if jax.default_backend() != 'cpu':
        if kw3 and rules.shape[1] % 3 == 0 and SEG_DW:
            from ..sparse import _xwin_selectors
            base, sel = _xwin_selectors(rules, features.shape[0] - 1)
            zrows = jnp.zeros((SEG_S - 1, features.shape[1]), features.dtype)
            return gather_dw_seg(jnp.concatenate([features, zrows], axis=0),
                                 base, sel, g, n_live)
        if kw3 and rules.shape[1] % 3 == 0 and XWIN_DW:
            from ..sparse import _xwin_selectors
            base, sel = _xwin_selectors(rules, features.shape[0] - 1)
            zrow = jnp.zeros((1, features.shape[1]), features.dtype)
            return gather_dw_xwin(jnp.concatenate([features, zrow], axis=0),
                                  base, sel, g, n_live)
        return gather_dw(features, rules, g, n_live)
    v, k = rules.shape
    cin = features.shape[1]
    gathered = features[rules.reshape(-1)].reshape(v, k, cin)
    return jnp.einsum('vki,vo->kio', gathered, g,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def gather_matmul_subm(features, rules, rules_mirror, weights, n_live=None,
                       packed=False, kw3=False):
    """gather_matmul for SUBMANIFOLD convs (output sites == input sites,
    odd kernel): `rules_mirror` = rules[:, ::-1] is the exact transpose
    rulebook (offset a_{K-1-k} = -a_k), so the feature gradient is ANOTHER
    gather-GEMM — no XLA scatter-add anywhere in the backward:

        df[u] = sum_k g[rules[u, K-1-k]] @ W[K-1-k]^T
        dW[k] = feats[rules[:, k]]^T @ g        (gather_dw Pallas kernel)

    `n_live` (traced scalar) gates dead output tiles in forward AND both
    backward gathers (subm out sites == in sites, so one count covers all
    three).  `packed` (static) streams features/weights as bf16 (the
    pair-packed kernel on TPU); dW keeps the f32 table.  `kw3` (static)
    enables the x-window kernel for both directions (the mirrored book
    keeps the group structure — tests/test_xwin_property.py).
    """
    return _gm_any(features, rules, weights, packed, kw3, n_live)


def _gm_subm_fwd(features, rules, rules_mirror, weights, n_live, packed,
                 kw3):
    return _gm_any(features, rules, weights, packed, kw3, n_live), (
        features, rules, rules_mirror, weights, n_live)


def _gm_subm_bwd(packed, kw3, res, g):
    features, rules, rules_mirror, weights, n_live = res
    cin = features.shape[1]
    g_c = g.astype(features.dtype)
    g_padded = jnp.concatenate(
        [g_c, jnp.zeros((1, g.shape[1]), g_c.dtype)], axis=0)
    # df[u] = sum_k g[neighbor at -a_k] @ W[k]^T: the gather taps come from
    # the MIRRORED rulebook while the weights keep their original tap order
    # (mirroring both would cancel out)
    w_t = jnp.transpose(weights, (0, 2, 1)).astype(features.dtype)
    df = _gm_any(g_padded, rules_mirror, w_t, packed, kw3,
                 n_live).astype(features.dtype)
    df = jnp.concatenate([df, jnp.zeros((1, cin), features.dtype)], axis=0)
    dw = _dw_any(features, rules, g_c, kw3, n_live).astype(weights.dtype)
    return df, None, None, dw, None


gather_matmul_subm.defvjp(_gm_subm_fwd, _gm_subm_bwd)

"""Segment gather kernel (round 5: one (S, Cin) block load + one-hot MXU
routing per (tile, tap group), PCDET_GATHER_SEG): interpret-mode parity
with the rulebook reference on a real subm book, exercising BOTH the
covered and the fallback branch (SEG_S patched small), plus the strided
geometries, gating, vmap, and the dW kernel.  On-chip speed is measured by
scripts/exp_xwin_loads.py + bench_models A/B passes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# interpret-mode execution of the static unroll is minutes on this 1-core
# host; the kernel is opt-in (PCDET_GATHER_SEG) until chip-measured
pytestmark = pytest.mark.slow

from pcdet_tpu.ops import sparse
from pcdet_tpu.ops.pallas import gather_gemm as gg
from tests.test_xwin_property import _make_level

V, C = 128, 8
N_ACT = 100
SHAPE = (7, 16, 24)
SMALL_S = 16        # forces a real fallback population at V=128


@pytest.fixture()
def book():
    rng = np.random.RandomState(7)
    lv = _make_level(rng, V, SHAPE, N_ACT, c=C)
    rows, found = jax.jit(lambda: sparse._rules_subm(lv, (3, 3, 3)))()
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)
    rules = jnp.where(found, rows, V)
    fp = jnp.concatenate([lv.features, jnp.zeros((1, C))], axis=0)
    ref = np.asarray(
        fp[rules.reshape(-1)].reshape(V, 27 * C) @ w.reshape(27 * C, C))
    return fp, rules, w, ref


def _seg_inputs(fp, rules, n_tab=V):
    base, sel = sparse._xwin_selectors(rules, n_tab)
    zrows = jnp.zeros((gg.SEG_S - 1, fp.shape[1]), fp.dtype)
    return jnp.concatenate([fp, zrows], axis=0), base, sel


def test_desc_exercises_both_branches(book, monkeypatch):
    monkeypatch.setattr(gg, 'SEG_S', SMALL_S)
    fp, rules, w, ref = book
    _, base, sel = _seg_inputs(fp, rules)
    pad = (-V) % gg.TV
    base_p = jnp.pad(base, ((0, pad), (0, 0)))
    sel_p = jnp.pad(sel, ((0, pad), (0, 0)), constant_values=0x3f)
    anchor, ok, seloff = gg.segment_desc(base_p, sel_p, gg.TV, gg.SEG_S)
    ok = np.asarray(ok)
    assert ok.any() and (ok == 0).any(), (
        'fixture must populate covered AND fallback tile-groups: %s'
        % ok.mean())


@pytest.mark.parametrize('s', [SMALL_S, 256])
def test_seg_f32(book, monkeypatch, s):
    fp, rules, w, ref = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    monkeypatch.setattr(gg, 'SEG_S', s)
    fp2, base, sel = _seg_inputs(fp, rules)
    out = np.asarray(gg._gather_matmul_seg_call(
        fp2, base, sel, gg.group_weights_x(w)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_seg_f32_gated(book, monkeypatch):
    fp, rules, w, ref = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    monkeypatch.setattr(gg, 'SEG_S', SMALL_S)
    fp2, base, sel = _seg_inputs(fp, rules)
    wf = gg.group_weights_x(w)
    full = np.asarray(gg._gather_matmul_seg_call(fp2, base, sel, wf))
    gated = np.asarray(gg._gather_matmul_seg_call(fp2, base, sel, wf,
                                                  jnp.int32(N_ACT)))
    np.testing.assert_array_equal(gated, full)


@pytest.mark.parametrize('s', [SMALL_S, 256])
def test_seg_packed(book, monkeypatch, s):
    fp, rules, w, ref = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    monkeypatch.setattr(gg, 'SEG_S', s)
    fp2, base, sel = _seg_inputs(fp, rules)
    w_r = w.astype(jnp.bfloat16).astype(jnp.float32)
    out = np.asarray(gg._gather_matmul_seg_call(
        gg.pack_bf16_pairs(fp2), base, sel, gg.group_weights_x_eo(w_r)))
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2


def test_seg_packed_matches_rowpacked(book, monkeypatch):
    """Same bf16 operand rounding as the per-row packed kernel; only the
    f32 accumulation ORDER differs, so equality is tolerance-level."""
    fp, rules, w, ref = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    monkeypatch.setattr(gg, 'SEG_S', SMALL_S)
    fp2, base, sel = _seg_inputs(fp, rules)
    w_r = w.astype(jnp.bfloat16).astype(jnp.float32)
    out_s = np.asarray(gg._gather_matmul_seg_call(
        gg.pack_bf16_pairs(fp2), base, sel, gg.group_weights_x_eo(w_r)))
    out_r = np.asarray(gg._gather_matmul_packed_call(
        gg.pack_bf16_pairs(fp), rules, gg.split_weights_packed(w_r)))
    scale = np.abs(out_r).max() + 1e-6
    assert np.abs(out_s - out_r).max() / scale < 1e-5


def test_seg_vmap(book, monkeypatch):
    """Batched-backbone path: seg call under vmap."""
    fp, rules, w, ref = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    monkeypatch.setattr(gg, 'SEG_S', SMALL_S)
    fp2, base, sel = _seg_inputs(fp, rules)
    wf = gg.group_weights_x(w)
    fp_b = jnp.stack([fp2, fp2 * 2.0])
    out = np.asarray(jax.vmap(
        lambda f: gg._gather_matmul_seg_call(f, base, sel, wf))(fp_b))
    np.testing.assert_allclose(out[0], ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[1], 2 * ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('s', [SMALL_S, 256])
def test_seg_dw(book, monkeypatch, s):
    """Segment dW == einsum reference, both branches, gated == full."""
    fp, rules, w, ref = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    monkeypatch.setattr(gg, 'SEG_S', s)
    rng = np.random.RandomState(9)
    g = jnp.asarray(rng.randn(V, C).astype(np.float32))
    fp2, base, sel = _seg_inputs(fp, rules)
    out = np.asarray(gg.gather_dw_seg(fp2, base, sel, g))
    dw_ref = np.einsum('vki,vo->kio',
                       np.asarray(fp[rules.reshape(-1)]).reshape(V, 27, C),
                       np.asarray(g))
    np.testing.assert_allclose(out, dw_ref, rtol=1e-4, atol=1e-4)
    gated = np.asarray(gg.gather_dw_seg(fp2, base, sel, g, jnp.int32(N_ACT)))
    np.testing.assert_array_equal(gated, out)


@pytest.mark.parametrize('which', ['strided_fwd', 'transpose_bwd'])
def test_seg_on_strided_geometries(which, monkeypatch):
    """The seg call must stay exact on the other kw=3 book geometries it
    serves through _gm_any (different miss patterns than subm books)."""
    monkeypatch.setattr(gg, 'INTERPRET', True)
    monkeypatch.setattr(gg, 'SEG_S', SMALL_S)
    rng = np.random.RandomState(3)
    lv = _make_level(rng, V, SHAPE, N_ACT, c=C)
    out = sparse._strided_out_set(lv, (3, 3, 3), (2, 2, 2), (1, 1, 1), 96)
    _, _, out_mask, _, _, rows, found = out
    if which == 'strided_fwd':
        n_tab = V
        rules = jnp.where(found, rows, n_tab)
        table = jnp.concatenate([lv.features, jnp.zeros((1, C))], axis=0)
        n_rows = 96
    else:
        fwd_rules = jnp.where(found, rows, V)
        rules = sparse._transpose_rules_from_fwd(fwd_rules, V, 96)
        n_tab = 96
        coarse_feats = rng.randn(96, C).astype(np.float32)
        table = jnp.concatenate(
            [jnp.asarray(coarse_feats), jnp.zeros((1, C))], axis=0)
        n_rows = V
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)
    ref = np.asarray(table)[np.asarray(rules).ravel()].reshape(
        n_rows, 27 * C) @ np.asarray(w).reshape(27 * C, C)

    base, sel = sparse._xwin_selectors(rules, n_tab)
    tbl = jnp.concatenate(
        [table, jnp.zeros((gg.SEG_S - 1, C), table.dtype)], axis=0)
    got = np.asarray(gg._gather_matmul_seg_call(
        tbl, base, sel, gg.group_weights_x(w)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

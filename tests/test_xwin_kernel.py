"""x-window gather kernel logic, validated on CPU via Pallas interpret
mode against the plain gather+GEMM reference on a REAL subm rulebook.
(Mosaic lowering is exercised on the chip by scripts/exp_xwin_loads.py and
the model benches; this pins the kernel's math.)"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdet_tpu.ops import sparse
from pcdet_tpu.ops.pallas import gather_gemm as gg
from tests.test_xwin_property import _make_level

V, C = 512, 8
SHAPE = (9, 40, 48)


@pytest.fixture()
def book():
    rng = np.random.RandomState(7)
    lv = _make_level(rng, V, SHAPE, 420, c=C)
    rows, found = jax.jit(lambda: sparse._rules_subm(lv, (3, 3, 3)))()
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)
    rules = jnp.where(found, rows, V)
    fp = jnp.concatenate([lv.features, jnp.zeros((1, C))], axis=0)
    ref = np.asarray(
        fp[rules.reshape(-1)].reshape(V, 27 * C) @ w.reshape(27 * C, C))
    return fp, rules, w, ref


def test_xwin_f32_interpret(book, monkeypatch):
    fp, rules, w, ref = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    base, sel = sparse._xwin_selectors(rules, V)
    fp2 = jnp.concatenate([fp, jnp.zeros((1, C))], axis=0)
    out = np.asarray(gg._gather_matmul_xwin_call(
        fp2, base, sel, gg.group_weights_x(w)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_xwin_dw_interpret(book, monkeypatch):
    fp, rules, w, ref = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    rng = np.random.RandomState(11)
    g = jnp.asarray(rng.randn(V, C).astype(np.float32))
    base, sel = sparse._xwin_selectors(rules, V)
    fp2 = jnp.concatenate([fp, jnp.zeros((1, C))], axis=0)
    out = np.asarray(gg.gather_dw_xwin(fp2, base, sel, g))
    dw_ref = np.einsum('vki,vo->kio',
                       np.asarray(fp[rules.reshape(-1)]).reshape(V, 27, C),
                       np.asarray(g))
    np.testing.assert_allclose(out, dw_ref, rtol=1e-4, atol=1e-4)


def test_xwin_vmap_interpret(book, monkeypatch):
    """vmap over the x-window pallas call (the batched backbone path)."""
    fp, rules, w, ref = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    base, sel = sparse._xwin_selectors(rules, V)
    fp2 = jnp.concatenate([fp, jnp.zeros((1, C))], axis=0)
    wg = gg.group_weights_x(w)
    fp_b = jnp.stack([fp2, fp2 * 2.0])
    out = np.asarray(jax.vmap(
        lambda f: gg._gather_matmul_xwin_call(f, base, sel, wg))(fp_b))
    np.testing.assert_allclose(out[0], ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[1], 2 * ref, rtol=1e-5, atol=1e-5)


def test_xwin_packed_interpret(book, monkeypatch):
    fp, rules, w, ref = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    base, sel = sparse._xwin_selectors(rules, V)
    fp2 = jnp.concatenate([fp, jnp.zeros((1, C))], axis=0)
    w_r = w.astype(jnp.bfloat16).astype(jnp.float32)
    out = np.asarray(gg._gather_matmul_xwin_call(
        gg.pack_bf16_pairs(fp2), base, sel, gg.group_weights_x_packed(w_r)))
    # bf16 table + bf16-rounded weights: loose tolerance
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2

"""Occupancy-gated tile skipping (gather_gemm._LiveFlag): with `n_live`
passed, every Pallas gather kernel must stay bit-identical to the ungated
run.  Live rows of a SparseLevel are a sorted PREFIX (ids ascend with
INT_MAX padding) and rows past the count carry all-miss rules (routed to
the zero row), so a dead tile's forward output is exactly zeros and its dW
contribution vanishes — the gate skips the tile's loads/dots outright.
Kernel math pinned in interpret mode; Mosaic lowering is exercised on-chip
by the model benches (the gate is default-on in ops.sparse)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdet_tpu.ops import sparse
from pcdet_tpu.ops.pallas import gather_gemm as gg
from tests.test_xwin_property import _make_level

V, C = 512, 8
N_ACT = 420              # live prefix; tail rows carry all-miss rules
SHAPE = (9, 40, 48)


@pytest.fixture()
def book():
    rng = np.random.RandomState(7)
    lv = _make_level(rng, V, SHAPE, N_ACT, c=C)
    rows, found = jax.jit(lambda: sparse._rules_subm(lv, (3, 3, 3)))()
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)
    rules = jnp.where(found, rows, V)
    fp = jnp.concatenate([lv.features, jnp.zeros((1, C))], axis=0)
    return fp, rules, w


def test_fwd_rows_gated(book, monkeypatch):
    fp, rules, w = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    full = np.asarray(gg._gather_matmul_fwd_only(fp, rules, w))
    gated = np.asarray(gg._gather_matmul_fwd_only(fp, rules, w,
                                                  jnp.int32(N_ACT)))
    np.testing.assert_array_equal(gated, full)
    assert (full[N_ACT:] == 0).all()     # the invariant the gate relies on


def test_fwd_packed_gated(book, monkeypatch):
    fp, rules, w = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    w_r = w.astype(jnp.bfloat16).astype(jnp.float32)
    fpp = gg.pack_bf16_pairs(fp)
    ws = gg.split_weights_packed(w_r)
    full = np.asarray(gg._gather_matmul_packed_call(fpp, rules, ws))
    gated = np.asarray(gg._gather_matmul_packed_call(fpp, rules, ws,
                                                     jnp.int32(N_ACT)))
    np.testing.assert_array_equal(gated, full)


def test_fwd_xwin_gated(book, monkeypatch):
    fp, rules, w = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    base, sel = sparse._xwin_selectors(rules, V)
    fp2 = jnp.concatenate([fp, jnp.zeros((1, C))], axis=0)
    wg = gg.group_weights_x(w)
    full = np.asarray(gg._gather_matmul_xwin_call(fp2, base, sel, wg))
    gated = np.asarray(gg._gather_matmul_xwin_call(fp2, base, sel, wg,
                                                   jnp.int32(N_ACT)))
    np.testing.assert_array_equal(gated, full)


def test_fwd_xwin_packed_gated(book, monkeypatch):
    fp, rules, w = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    base, sel = sparse._xwin_selectors(rules, V)
    fp2 = jnp.concatenate([fp, jnp.zeros((1, C))], axis=0)
    w_r = w.astype(jnp.bfloat16).astype(jnp.float32)
    fpp = gg.pack_bf16_pairs(fp2)
    wg = gg.group_weights_x_packed(w_r)
    full = np.asarray(gg._gather_matmul_xwin_call(fpp, base, sel, wg))
    gated = np.asarray(gg._gather_matmul_xwin_call(fpp, base, sel, wg,
                                                   jnp.int32(N_ACT)))
    np.testing.assert_array_equal(gated, full)


def test_dw_gated(book, monkeypatch):
    """dW gating must hold even with NONZERO upstream grads on dead rows
    (their rules all route to the zero feature row)."""
    fp, rules, w = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    rng = np.random.RandomState(3)
    g = jnp.asarray(rng.randn(V, C).astype(np.float32))   # dense, no mask
    full = np.asarray(gg.gather_dw(fp, rules, g))
    gated = np.asarray(gg.gather_dw(fp, rules, g, jnp.int32(N_ACT)))
    np.testing.assert_array_equal(gated, full)


def test_dw_xwin_gated(book, monkeypatch):
    fp, rules, w = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    rng = np.random.RandomState(4)
    g = jnp.asarray(rng.randn(V, C).astype(np.float32))
    base, sel = sparse._xwin_selectors(rules, V)
    fp2 = jnp.concatenate([fp, jnp.zeros((1, C))], axis=0)
    full = np.asarray(gg.gather_dw_xwin(fp2, base, sel, g))
    gated = np.asarray(gg.gather_dw_xwin(fp2, base, sel, g,
                                         jnp.int32(N_ACT)))
    np.testing.assert_array_equal(gated, full)


def test_vmap_per_sample_counts(book, monkeypatch):
    """Batched path: each sample carries its own live count through vmap."""
    fp, rules, w = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    fp_b = jnp.stack([fp, fp * 2.0])
    counts = jnp.asarray([N_ACT, V], jnp.int32)   # both valid upper bounds
    ref = np.asarray(gg._gather_matmul_fwd_only(fp, rules, w))
    out = np.asarray(jax.vmap(
        lambda f, n: gg._gather_matmul_fwd_only(f, rules, w, n))(
            fp_b, counts))
    np.testing.assert_array_equal(out[0], ref)
    np.testing.assert_array_equal(out[1], 2 * ref)


def test_subm_custom_vjp_gated(book, monkeypatch):
    """gather_matmul_subm fwd+bwd with n_live == per-path ungated run."""
    fp, rules, w = book
    monkeypatch.setattr(gg, 'INTERPRET', True)
    rng = np.random.RandomState(5)
    g = jnp.asarray(rng.randn(V, C).astype(np.float32))
    mirror = rules[:, ::-1]

    def run(n_live):
        def f(fp_, w_):
            out = gg.gather_matmul_subm(fp_, rules, mirror, w_, n_live)
            return jnp.vdot(out, g), out
        (_, out), grads = jax.value_and_grad(f, argnums=(0, 1),
                                             has_aux=True)(fp, w)
        return out, grads

    out_full, (df_full, dw_full) = run(None)
    out_g, (df_g, dw_g) = run(jnp.int32(N_ACT))
    np.testing.assert_array_equal(np.asarray(out_g), np.asarray(out_full))
    np.testing.assert_array_equal(np.asarray(df_g), np.asarray(df_full))
    np.testing.assert_array_equal(np.asarray(dw_g), np.asarray(dw_full))


def test_tv_knob_subprocess():
    """PCDET_GATHER_TV=128 (the queued tile-size sweep) must keep kernel
    math exact — run in a subprocess because TV is baked into traces at
    import.  Covers the pad path (V not a multiple of TV) and gating at
    the new tile size."""
    import os
    import subprocess
    import sys
    code = r'''
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, %r)
import jax
# sitecustomize force-registers the axon TPU tunnel; override back to CPU
# (same as tests/conftest.py) so this never rides (or hangs on) the tunnel
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from pcdet_tpu.ops.pallas import gather_gemm as gg
assert gg.TV == 128, gg.TV
gg.INTERPRET = True
rng = np.random.RandomState(0)
V, K, CIN, COUT, N_ACT = 300, 9, 8, 16, 170
feats = jnp.asarray(rng.randn(V + 1, CIN).astype(np.float32)).at[-1].set(0)
rules = jnp.asarray(rng.randint(0, V + 1, size=(V, K)).astype(np.int32))
rules = jnp.where(jnp.arange(V)[:, None] < N_ACT, rules, V)
w = jnp.asarray(rng.randn(K, CIN, COUT).astype(np.float32))
ref = np.asarray(feats)[np.asarray(rules).ravel()].reshape(V, K * CIN) @ \
    np.asarray(w).reshape(K * CIN, COUT)
out = np.asarray(gg._gather_matmul_fwd_only(feats, rules, w))
np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
gated = np.asarray(gg._gather_matmul_fwd_only(feats, rules, w,
                                              jnp.int32(N_ACT)))
np.testing.assert_array_equal(gated, out)
print("TV128 OK")
'''
    env = dict(os.environ, PCDET_GATHER_TV='128', JAX_PLATFORMS='cpu')
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run([sys.executable, '-c', code % root], env=env,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert 'TV128 OK' in res.stdout

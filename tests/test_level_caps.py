"""Per-level voxel caps: resolution logic + the dilation-truncation fix.

Round-1 measurement (scripts/measure_occupancy.py): a stride-2 sparse conv
DILATES a thin LiDAR surface — conv2's active set reaches ~1.9x a truncated
input.  The historical default out_cap == input cap silently truncated it;
these tests pin the fixed behaviour.
"""
import numpy as np
import pytest

from pcdet_tpu.models.backbones3d import _resolve_caps

# XLA-compile-heavy on a 1-core host; run with -m slow (CI) or full suite
pytestmark = pytest.mark.slow


def test_resolve_caps_defaults():
    assert _resolve_caps(16000, (0, 0, 0), (0., 0., 0., 0.), True) \
        == [16000] * 4


def test_resolve_caps_fracs_scale_with_input_cap():
    caps = _resolve_caps(16000, (0, 0, 0), (2.0, 1.6, 0.85, 0.7), True)
    assert caps == [32000, 25600, 13824, 11264]
    # same fracs at a smaller cap scale down proportionally
    caps_small = _resolve_caps(2048, (0, 0, 0), (2.0, 1.6, 0.85, 0.7), True)
    assert caps_small == [4096, 3328, 1792, 1536]


def test_resolve_caps_clamps():
    # the clamp (4x input cap, BOTH modes) keeps production absolutes sane
    # at tiny unit-test input caps...
    caps = _resolve_caps(2048, (30720, 24576, 12288, 10240), (0.,) * 4, False)
    assert caps == [4 * 2048, 4 * 2048, 4 * 2048, 4 * 2048]
    caps = _resolve_caps(2048, (0, 0, 0), (8.0, 0., 0., 0.), True)
    assert caps[0] == 4 * 2048


def test_resolve_caps_eval_absolutes_not_clamped_at_production_cap():
    """Regression: round 2 clamped eval caps to 1x the input cap, which
    silently undid second.yaml's measured level_caps_test — conv2's 43520
    (measured 33.3k dilation x1.3) resolved to the 25088 input cap and
    re-introduced ~25% conv2 eval truncation.  Dilation exceeds 1x by
    measurement, so the eval bound must leave headroom."""
    caps = _resolve_caps(25088, (43520, 29184, 12288, 10240), (0.,) * 4,
                         False)
    assert caps == [43520, 29184, 12288, 10240]


def test_strided_conv_dilation_not_truncated():
    """A thin sheet of V active voxels dilates to ~2x V active outputs under
    a stride-2 conv; with out_cap = 2*V every one must survive."""
    import jax.numpy as jnp
    from pcdet_tpu.ops import sparse

    v = 512
    sh = (8, 64, 64)
    # isolated voxels 4 apart at ODD coordinates (an odd index i has two
    # stride-2 candidates (i-1)/2 and (i+1)/2; an even one has 1): every
    # input spawns 8 disjoint outputs — like ring ground at coarse levels
    ys, xs = np.meshgrid(np.arange(3, 60, 4), np.arange(3, 60, 4),
                         indexing='ij')
    coords = np.stack([np.full(ys.size, 5), ys.ravel(), xs.ravel()], 1)
    coords = coords.astype(np.int32)
    n = len(coords)
    ids = (coords[:, 0] * sh[1] + coords[:, 1]) * sh[2] + coords[:, 2]
    order = np.argsort(ids)
    buf = np.full((v,), sparse.INT_MAX, np.int32)
    buf[:n] = ids[order]
    cbuf = np.full((v, 3), -1, np.int32)
    cbuf[:n] = coords[order]
    m = np.zeros(v, bool)
    m[:n] = True
    feats = np.ones((v, 4), np.float32) * m[:, None]
    lv = sparse.SparseLevel(jnp.asarray(feats), jnp.asarray(buf),
                            jnp.asarray(cbuf), jnp.asarray(m), sh)
    w = jnp.ones((27, 4, 4), jnp.float32)

    n_in = int(m.sum())
    out_tight = sparse.sparse_conv3d(lv, w, stride=2, out_cap=n_in)
    out_wide = sparse.sparse_conv3d(lv, w, stride=2, out_cap=8 * v)
    n_tight = int(np.asarray(out_tight.mask).sum())
    n_wide = int(np.asarray(out_wide.mask).sum())
    assert n_wide > 2 * n_in, 'isolated voxels must dilate well beyond 1x'
    assert n_tight == n_in, 'tight cap truncates (the round-1 default)'
    # every active output must be genuinely reachable: ids unique + sorted
    ids_w = np.asarray(out_wide.ids)[np.asarray(out_wide.mask)]
    assert len(np.unique(ids_w)) == n_wide

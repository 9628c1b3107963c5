"""Selection-before-decode post-processing is bit-identical to the eager path.

`post_process_from_head` ranks anchors by a score computable from raw
logits, decodes only the NMS_PRE_MAXSIZE_LAST survivors, and must produce
byte-identical results to decode-everything (`decode_single_stage` +
`post_process_batch`) — across class counts, direction-classifier modes,
multi-class NMS, and axis-aligned NMS (reference
detector3d.post_processing:155-236 semantics on both sides).
"""
import numpy as np
import pytest

from pcdet_tpu.models import detector3d
from pcdet_tpu.utils.box_coder import ResidualCoder
from pcdet_tpu.utils.edict import EDict


def _make_inputs(rng, batch=2, num_anchors=600, num_class=3, with_dir=True):
    import jax.numpy as jnp
    anchors = np.concatenate([
        rng.uniform(-40, 40, (num_anchors, 2)),
        rng.uniform(-2, 0, (num_anchors, 1)),
        rng.uniform(1.0, 4.0, (num_anchors, 3)),
        rng.uniform(-np.pi, np.pi, (num_anchors, 1)),
    ], axis=1).astype(np.float32)
    ret = {
        'cls_preds': jnp.asarray(
            rng.randn(batch, num_anchors, num_class).astype(np.float32) * 2),
        'box_preds': jnp.asarray(
            rng.randn(batch, num_anchors, 7).astype(np.float32) * 0.2),
    }
    if with_dir:
        ret['dir_cls_preds'] = jnp.asarray(
            rng.randn(batch, num_anchors, 2).astype(np.float32))
    return ret, jnp.asarray(anchors)


def _cfgs():
    base = dict(SCORE_THRESH=0.1, NMS_THRESH=0.3, NMS_PRE_MAXSIZE_LAST=128,
                NMS_POST_MAXSIZE_LAST=32)
    yield EDict(base)
    yield EDict({**base, 'MULTI_CLASSES_NMS': True})
    yield EDict({**base, 'NMS_TYPE': 'nms_normal_gpu'})
    yield EDict({**base, 'USE_RAW_SCORE': False, 'SCORE_THRESH': 0.3})
    # pre cap above the anchor count: selection degenerates to a full sort
    yield EDict({**base, 'NMS_PRE_MAXSIZE_LAST': 4096})


@pytest.mark.parametrize('num_class,with_dir,binary_dir', [
    (3, True, False),
    (1, True, True),
    (1, False, False),
])
def test_lazy_equals_eager(num_class, with_dir, binary_dir):
    rng = np.random.RandomState(0)
    ret, anchors = _make_inputs(rng, num_class=num_class, with_dir=with_dir)
    coder = ResidualCoder()
    head_args = {'num_direction_bins': 2, 'dir_offset': 0.78539,
                 'dir_limit_offset': 0.0,
                 'use_binary_dir_classifier': binary_dir}
    for cfg in _cfgs():
        if num_class == 1 and cfg.get('MULTI_CLASSES_NMS', False):
            continue
        cls_preds, box_preds = detector3d.decode_single_stage(
            ret, anchors, coder, num_class, head_args)
        eager = detector3d.post_process_batch(cls_preds, box_preds, cfg)
        lazy = detector3d.post_process_from_head(
            ret, anchors, coder, num_class, head_args, cfg)
        assert set(eager) == set(lazy)
        for k in eager:
            np.testing.assert_array_equal(
                np.asarray(lazy[k]), np.asarray(eager[k]),
                err_msg='key %r cfg %r' % (k, dict(cfg)))
        # the paths did real work: something was kept somewhere
        assert np.asarray(eager['valid']).any()


@pytest.mark.parametrize('nms_pre,rotated', [(128, True), (4096, False)])
def test_proposal_layer_lazy_equals_eager(nms_pre, rotated):
    import jax.numpy as jnp
    from pcdet_tpu.models import roi_heads
    rng = np.random.RandomState(2)
    ret, anchors = _make_inputs(rng, num_class=3)
    coder = ResidualCoder()
    head_args = {'num_direction_bins': 2, 'dir_offset': 0.78539,
                 'dir_limit_offset': 0.0, 'use_binary_dir_classifier': False}
    cls_preds, box_preds = detector3d.decode_single_stage(
        ret, anchors, coder, 3, head_args)
    eager = roi_heads.proposal_layer(cls_preds, box_preds, nms_pre=nms_pre,
                                     nms_post=32, nms_thresh=0.3,
                                     rotated=rotated)
    lazy = roi_heads.proposal_layer_from_head(
        jnp.asarray(ret['cls_preds']), jnp.asarray(ret['box_preds']),
        anchors, jnp.asarray(ret['dir_cls_preds']), coder, head_args,
        nms_pre=nms_pre, nms_post=32, nms_thresh=0.3, rotated=rotated)
    assert set(eager) == set(lazy)
    for k in eager:
        np.testing.assert_array_equal(np.asarray(lazy[k]),
                                      np.asarray(eager[k]), err_msg=k)
    assert np.asarray(eager['roi_valid']).any()


def test_lazy_class_labels_override():
    import jax.numpy as jnp
    rng = np.random.RandomState(1)
    ret, anchors = _make_inputs(rng, num_class=1)
    coder = ResidualCoder()
    head_args = {'num_direction_bins': 2, 'dir_offset': 0.78539,
                 'dir_limit_offset': 0.0, 'use_binary_dir_classifier': False}
    cfg = EDict(dict(SCORE_THRESH=0.1, NMS_THRESH=0.3,
                     NMS_PRE_MAXSIZE_LAST=128, NMS_POST_MAXSIZE_LAST=32))
    labels = jnp.asarray(
        rng.randint(1, 4, size=(2, anchors.shape[0])).astype(np.int32))
    cls_preds, box_preds = detector3d.decode_single_stage(
        ret, anchors, coder, 1, head_args)
    eager = detector3d.post_process_batch(cls_preds, box_preds, cfg,
                                          class_labels_override=labels)
    lazy = detector3d.post_process_from_head(
        ret, anchors, coder, 1, head_args, cfg, class_labels_override=labels)
    for k in eager:
        np.testing.assert_array_equal(np.asarray(lazy[k]),
                                      np.asarray(eager[k]), err_msg=k)

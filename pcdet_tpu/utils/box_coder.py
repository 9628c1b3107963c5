"""Box residual coder (SECOND encoding).

Numpy encode (host target-assignment path) + jnp decode (on-device, inside the
jitted detect path).  Semantics mirror reference pcdet/utils/box_coder_utils.py.

Box layout: (x, y, z, w, l, h, r [, extras]) with z at the *bottom* center.
Internally the codec shifts z to the geometric center (z + h/2).
"""
import numpy as np


class ResidualCoder:
    def __init__(self, code_size=7):
        self.code_size = code_size

    # ------------------------------------------------------------------ numpy
    @staticmethod
    def encode_np(boxes, anchors):
        """(N, 7+) gt boxes vs (N, 7+) anchors -> (N, 7+) regression targets."""
        box_ndim = anchors.shape[-1]
        xa, ya, za, wa, la, ha, ra = [anchors[..., i:i + 1] for i in range(7)]
        xg, yg, zg, wg, lg, hg, rg = [boxes[..., i:i + 1] for i in range(7)]
        cas = [anchors[..., i:i + 1] for i in range(7, box_ndim)]
        cgs = [boxes[..., i:i + 1] for i in range(7, box_ndim)]

        zg = zg + hg / 2
        za = za + ha / 2

        diagonal = np.sqrt(la ** 2 + wa ** 2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / ha
        lt = np.log(lg / la)
        wt = np.log(wg / wa)
        ht = np.log(hg / ha)
        rt = rg - ra
        cts = [g - a for g, a in zip(cgs, cas)]
        return np.concatenate([xt, yt, zt, wt, lt, ht, rt, *cts], axis=-1)

    @staticmethod
    def decode_np(box_encodings, anchors):
        box_ndim = anchors.shape[-1]
        xa, ya, za, wa, la, ha, ra = [anchors[..., i:i + 1] for i in range(7)]
        xt, yt, zt, wt, lt, ht, rt = [box_encodings[..., i:i + 1] for i in range(7)]
        cas = [anchors[..., i:i + 1] for i in range(7, box_ndim)]
        cts = [box_encodings[..., i:i + 1] for i in range(7, box_ndim)]

        za = za + ha / 2
        diagonal = np.sqrt(la ** 2 + wa ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * ha + za
        lg = np.exp(lt) * la
        wg = np.exp(wt) * wa
        hg = np.exp(ht) * ha
        rg = rt + ra
        zg = zg - hg / 2
        cgs = [t + a for t, a in zip(cts, cas)]
        return np.concatenate([xg, yg, zg, wg, lg, hg, rg, *cgs], axis=-1)

    # -------------------------------------------------------------------- jnp
    @staticmethod
    def encode_jnp(boxes, anchors):
        import jax.numpy as jnp
        xa, ya, za, wa, la, ha, ra = [anchors[..., i] for i in range(7)]
        xg, yg, zg, wg, lg, hg, rg = [boxes[..., i] for i in range(7)]
        zg = zg + hg / 2
        za = za + ha / 2
        diagonal = jnp.sqrt(la ** 2 + wa ** 2)
        out = jnp.stack([
            (xg - xa) / diagonal,
            (yg - ya) / diagonal,
            (zg - za) / ha,
            jnp.log(wg / wa),
            jnp.log(lg / la),
            jnp.log(hg / ha),
            rg - ra,
        ], axis=-1)
        if anchors.shape[-1] > 7:
            out = jnp.concatenate([out, boxes[..., 7:] - anchors[..., 7:]], axis=-1)
        return out

    @staticmethod
    def decode_jnp(box_encodings, anchors):
        import jax.numpy as jnp
        xa, ya, za, wa, la, ha, ra = [anchors[..., i] for i in range(7)]
        xt, yt, zt, wt, lt, ht, rt = [box_encodings[..., i] for i in range(7)]
        za = za + ha / 2
        diagonal = jnp.sqrt(la ** 2 + wa ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * ha + za
        lg = jnp.exp(lt) * la
        wg = jnp.exp(wt) * wa
        hg = jnp.exp(ht) * ha
        rg = rt + ra
        zg = zg - hg / 2
        out = jnp.stack([xg, yg, zg, wg, lg, hg, rg], axis=-1)
        if anchors.shape[-1] > 7:
            out = jnp.concatenate([out, box_encodings[..., 7:] + anchors[..., 7:]],
                                  axis=-1)
        return out

    def decode_with_head_direction(self, box_preds, anchors, dir_cls_preds,
                                   num_dir_bins, dir_offset, dir_limit_offset,
                                   use_binary_dir_classifier=False):
        """Decode + snap heading into the direction-classifier bin (jnp).

        :param box_preds: (..., N, 7) encoded predictions
        :param anchors:   (..., N, 7)
        :param dir_cls_preds: (..., N, num_dir_bins) or None
        (reference: box_coder_utils.py:115-144)
        """
        import jax.numpy as jnp
        from . import jnp_common
        batch_box_preds = self.decode_jnp(box_preds, anchors)
        if dir_cls_preds is None:
            return batch_box_preds
        dir_cls_preds = dir_cls_preds.reshape(*box_preds.shape[:-1], -1)
        dir_labels = jnp.argmax(dir_cls_preds, axis=-1)
        if use_binary_dir_classifier:
            opp = (batch_box_preds[..., -1] > 0) ^ (dir_labels.astype(bool))
            rot = batch_box_preds[..., 6] + jnp.where(opp, jnp.pi, 0.0)
        else:
            period = 2 * np.pi / num_dir_bins
            dir_rot = jnp_common.limit_period(
                batch_box_preds[..., 6] - dir_offset, dir_limit_offset, period)
            rot = dir_rot + dir_offset + period * dir_labels.astype(batch_box_preds.dtype)
        # NOTE: concatenate instead of .at[..., 6].set — the scatter lowering
        # of a lane-indexed set on a large (B, A, 7) array is pathologically
        # slow on TPU (measured 38 s/batch vs <1 ms for the concat).
        return jnp.concatenate([batch_box_preds[..., :6], rot[..., None],
                                batch_box_preds[..., 7:]], axis=-1)

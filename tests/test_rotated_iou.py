"""Rotated IoU / NMS kernel tests vs an independent polygon-clipping reference."""
import numpy as np
import pytest


# --------------------------------------------------------------------------
# Independent slow reference: Sutherland–Hodgman convex polygon clipping
# --------------------------------------------------------------------------

def _corners_ref(box5):
    x1, y1, x2, y2, ang = box5
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    hx, hy = (x2 - x1) / 2, (y2 - y1) / 2
    pts = []
    for sx, sy in [(1, 1), (-1, 1), (-1, -1), (1, -1)]:
        ox, oy = sx * hx, sy * hy
        c, s = np.cos(ang), np.sin(ang)
        pts.append((ox * c + oy * s + cx, -ox * s + oy * c + cy))
    return pts


def _clip_polygon(subject, clip):
    """Sutherland–Hodgman: clip `subject` polygon by convex `clip` polygon."""
    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= -1e-12

    def line_intersect(p1, p2, a, b):
        s = (p2[0] - p1[0], p2[1] - p1[1])
        d = (b[0] - a[0], b[1] - a[1])
        denom = s[0] * d[1] - s[1] * d[0]
        t = ((a[0] - p1[0]) * d[1] - (a[1] - p1[1]) * d[0]) / denom
        return (p1[0] + t * s[0], p1[1] + t * s[1])

    output = list(subject)
    n = len(clip)
    for i in range(n):
        a, b = clip[i], clip[(i + 1) % n]
        input_list, output = output, []
        if not input_list:
            break
        prev = input_list[-1]
        for cur in input_list:
            if inside(cur, a, b):
                if not inside(prev, a, b):
                    output.append(line_intersect(prev, cur, a, b))
                output.append(cur)
            elif inside(prev, a, b):
                output.append(line_intersect(prev, cur, a, b))
            prev = cur
    return output


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    s = 0.0
    for i in range(len(poly)):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % len(poly)]
        s += x1 * y2 - x2 * y1
    return abs(s) / 2


def overlap_ref(ba, bb):
    ca, cb = _corners_ref(ba), _corners_ref(bb)
    # ensure CCW ordering for the clipper (our corner order is CCW already
    # for positive extents; Sutherland–Hodgman `inside` assumes CCW clip)
    return _poly_area(_clip_polygon(ca, cb))


def _rand_boxes(rng, n, scale=10.0):
    cx = rng.uniform(-scale, scale, n)
    cy = rng.uniform(-scale, scale, n)
    dx = rng.uniform(0.5, 6.0, n)
    dy = rng.uniform(0.5, 6.0, n)
    ang = rng.uniform(-np.pi, np.pi, n)
    return np.stack([cx - dx / 2, cy - dy / 2, cx + dx / 2, cy + dy / 2, ang],
                    axis=1).astype(np.float32)


def test_overlap_vs_reference_random():
    import jax.numpy as jnp
    from pcdet_tpu.ops import rotated_iou
    rng = np.random.RandomState(42)
    a = _rand_boxes(rng, 24, scale=4.0)   # close together -> many overlaps
    b = _rand_boxes(rng, 16, scale=4.0)
    got = np.asarray(rotated_iou.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([[overlap_ref(ba, bb) for bb in b] for ba in a])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_overlap_identical_and_disjoint():
    import jax.numpy as jnp
    from pcdet_tpu.ops import rotated_iou
    box = np.array([[0, 0, 2, 4, 0.7]], dtype=np.float32)
    got = np.asarray(rotated_iou.boxes_overlap_bev(jnp.asarray(box), jnp.asarray(box)))
    np.testing.assert_allclose(got, [[8.0]], rtol=1e-4)

    far = np.array([[100, 100, 102, 104, 0.3]], dtype=np.float32)
    got = np.asarray(rotated_iou.boxes_overlap_bev(jnp.asarray(box), jnp.asarray(far)))
    np.testing.assert_allclose(got, [[0.0]], atol=1e-6)


def test_contained_box():
    import jax.numpy as jnp
    from pcdet_tpu.ops import rotated_iou
    outer = np.array([[-5, -5, 5, 5, 0.0]], dtype=np.float32)
    inner = np.array([[-1, -1, 1, 1, 0.9]], dtype=np.float32)
    got = np.asarray(rotated_iou.boxes_overlap_bev(jnp.asarray(outer), jnp.asarray(inner)))
    np.testing.assert_allclose(got, [[4.0]], rtol=1e-4)


def test_iou3d():
    import jax.numpy as jnp
    from pcdet_tpu.ops import rotated_iou
    a = jnp.asarray([[0., 0., 0., 2., 4., 2., 0.]])
    b = jnp.asarray([[0., 0., 1., 2., 4., 2., 0.]])  # shifted up 1m: z-overlap 1/2
    iou = np.asarray(rotated_iou.boxes_iou3d(a, b))
    inter = 8.0 * 1.0
    expect = inter / (16 + 16 - inter)
    np.testing.assert_allclose(iou, [[expect]], rtol=1e-4)


def test_nms_matches_greedy_reference():
    import jax.numpy as jnp
    from pcdet_tpu.ops import nms as nms_ops
    rng = np.random.RandomState(7)
    boxes = _rand_boxes(rng, 64, scale=6.0)
    scores = rng.uniform(0, 1, 64).astype(np.float32)

    sel, num = nms_ops.nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.3,
                               pre_max=64, post_max=32)
    sel = np.asarray(sel)
    num = int(num)

    # python greedy reference
    order = np.argsort(-scores)
    keep = []
    for i in order:
        ok = True
        for j in keep:
            inter = overlap_ref(boxes[i], boxes[j])
            area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            area_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(area_i + area_j - inter, 1e-8) > 0.3:
                ok = False
                break
        if ok:
            keep.append(i)
    keep = keep[:32]
    assert num == len(keep)
    np.testing.assert_array_equal(sel[:num], keep)
    assert np.all(sel[num:] == -1)


def test_nms_score_threshold_mask():
    import jax.numpy as jnp
    from pcdet_tpu.ops import nms as nms_ops
    boxes = np.array([[0, 0, 2, 2, 0.0], [10, 10, 12, 12, 0.0]], dtype=np.float32)
    scores = np.array([0.9, 0.8], dtype=np.float32)
    valid = jnp.asarray([True, False])
    sel, num = nms_ops.nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                               pre_max=2, post_max=2, valid_mask=valid)
    assert int(num) == 1
    assert int(sel[0]) == 0 and int(sel[1]) == -1

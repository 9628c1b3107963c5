"""KITTI calibration: numpy transforms + a differentiable jnp twin.

Parity target: reference pcdet/utils/calibration.py (Calibration numpy class
+ Calibration_torch nn.Module).  The jnp twin (`CalibrationJnp`) is pure
functions over static matrices so it composes with jit/grad — it backs the
fork's differentiable pseudolidar lift (experiments.py:47-123).
"""
import numpy as np


def get_calib_from_file(calib_file):
    with open(calib_file) as f:
        lines = f.readlines()
    out = {}
    key_map = {'P2': (2, (3, 4)), 'P3': (3, (3, 4)), 'R0': (4, (3, 3)),
               'Tr_velo2cam': (5, (3, 4))}
    for key, (line_no, shape) in key_map.items():
        vals = lines[line_no].strip().split(' ')[1:]
        out[key] = np.array(vals, dtype=np.float32).reshape(shape)
    return out


def _hom(pts):
    return np.hstack((pts, np.ones((pts.shape[0], 1), dtype=np.float32)))


class Calibration:
    def __init__(self, calib_file):
        calib = get_calib_from_file(calib_file) if isinstance(calib_file, str) \
            else calib_file
        self.P2 = calib['P2']
        self.R0 = calib['R0']
        self.V2C = calib['Tr_velo2cam']

        self.cu = self.P2[0, 2]
        self.cv = self.P2[1, 2]
        self.fu = self.P2[0, 0]
        self.fv = self.P2[1, 1]
        self.tx = self.P2[0, 3] / (-self.fu)
        self.ty = self.P2[1, 3] / (-self.fv)

    def lidar_to_rect(self, pts_lidar):
        """(N, 3) velodyne -> (N, 3) rect camera: x_rect = R0 @ V2C @ x."""
        return np.dot(_hom(pts_lidar), np.dot(self.V2C.T, self.R0.T))

    def rect_to_lidar(self, pts_rect):
        """(N, 3) rect camera -> (N, 3) velodyne (inverse of lidar_to_rect)."""
        r0_ext = np.eye(4, dtype=np.float32)
        r0_ext[:3, :3] = self.R0
        v2c_ext = np.eye(4, dtype=np.float32)
        v2c_ext[:3, :4] = self.V2C
        inv = np.linalg.inv(np.dot(r0_ext, v2c_ext).T)
        return np.dot(_hom(pts_rect), inv)[:, 0:3]

    def rect_to_img(self, pts_rect):
        """(N, 3) rect -> image (N, 2) + rect-frame depth (N,)."""
        pts_2d_hom = np.dot(_hom(pts_rect), self.P2.T)
        pts_img = (pts_2d_hom[:, 0:2].T / pts_rect[:, 2]).T
        pts_rect_depth = pts_2d_hom[:, 2] - self.P2.T[3, 2]
        return pts_img, pts_rect_depth

    def lidar_to_img(self, pts_lidar):
        pts_rect = self.lidar_to_rect(pts_lidar)
        return self.rect_to_img(pts_rect)

    def img_to_rect(self, u, v, depth_rect):
        """Pixel (u, v) + depth -> rect 3D."""
        x = ((u - self.cu) * depth_rect) / self.fu + self.tx
        y = ((v - self.cv) * depth_rect) / self.fv + self.ty
        return np.concatenate((x.reshape(-1, 1), y.reshape(-1, 1),
                               depth_rect.reshape(-1, 1)), axis=1)

    def corners3d_to_img_boxes(self, corners3d):
        """(N, 8, 3) rect corners -> (N, 4) image boxes + (N, 8, 2) corners."""
        n = corners3d.shape[0]
        hom = np.concatenate((corners3d, np.ones((n, 8, 1))), axis=2)
        img_pts = np.matmul(hom, self.P2.T)
        x = img_pts[:, :, 0] / img_pts[:, :, 2]
        y = img_pts[:, :, 1] / img_pts[:, :, 2]
        boxes = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
        return boxes, np.stack([x, y], axis=2)

    def as_dict(self):
        return {'P2': self.P2, 'P3': getattr(self, 'P3', self.P2),
                'R0': self.R0, 'Tr_velo2cam': self.V2C}


class CalibrationJnp:
    """Differentiable twin (jnp); same math, static matrices.

    Backs the differentiable pseudolidar/depth-lift path — gradients flow
    from detection loss through these transforms into image networks.
    """

    def __init__(self, calib: Calibration):
        import jax.numpy as jnp
        self.P2 = jnp.asarray(calib.P2)
        self.R0 = jnp.asarray(calib.R0)
        self.V2C = jnp.asarray(calib.V2C)
        self.cu, self.cv = float(calib.cu), float(calib.cv)
        self.fu, self.fv = float(calib.fu), float(calib.fv)
        self.tx, self.ty = float(calib.tx), float(calib.ty)

    def lidar_to_rect(self, pts_lidar):
        import jax.numpy as jnp
        hom = jnp.concatenate([pts_lidar,
                               jnp.ones((*pts_lidar.shape[:-1], 1),
                                        pts_lidar.dtype)], axis=-1)
        return hom @ (self.V2C.T @ self.R0.T)

    def rect_to_lidar(self, pts_rect):
        import jax.numpy as jnp
        r0_ext = jnp.eye(4, dtype=pts_rect.dtype).at[:3, :3].set(self.R0)
        v2c_ext = jnp.eye(4, dtype=pts_rect.dtype).at[:3, :4].set(self.V2C)
        inv = jnp.linalg.inv((r0_ext @ v2c_ext).T)
        hom = jnp.concatenate([pts_rect,
                               jnp.ones((*pts_rect.shape[:-1], 1),
                                        pts_rect.dtype)], axis=-1)
        return (hom @ inv)[..., 0:3]

    def rect_to_img(self, pts_rect):
        import jax.numpy as jnp
        hom = jnp.concatenate([pts_rect,
                               jnp.ones((*pts_rect.shape[:-1], 1),
                                        pts_rect.dtype)], axis=-1)
        pts_2d_hom = hom @ self.P2.T
        pts_img = pts_2d_hom[..., 0:2] / pts_rect[..., 2:3]
        depth = pts_2d_hom[..., 2] - self.P2.T[3, 2]
        return pts_img, depth

    def img_to_rect(self, u, v, depth_rect):
        import jax.numpy as jnp
        x = ((u - self.cu) * depth_rect) / self.fu + self.tx
        y = ((v - self.cv) * depth_rect) / self.fv + self.ty
        return jnp.stack([x, y, depth_rect], axis=-1)

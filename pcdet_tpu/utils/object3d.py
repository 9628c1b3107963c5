"""KITTI label-file parsing (reference pcdet/utils/object3d_utils.py)."""
import numpy as np

CLS_TYPE_TO_ID = {'Car': 1, 'Pedestrian': 2, 'Cyclist': 3, 'Van': 4}


def cls_type_to_id(cls_type):
    return CLS_TYPE_TO_ID.get(cls_type, -1)


def get_objects_from_label(label_file):
    with open(label_file, 'r') as f:
        lines = f.readlines()
    return [Object3d(line) for line in lines if line.strip()]


class Object3d:
    def __init__(self, line):
        label = line.strip().split(' ')
        self.src = line
        self.cls_type = label[0]
        self.cls_id = cls_type_to_id(self.cls_type)
        self.truncation = float(label[1])
        self.occlusion = float(label[2])
        self.alpha = float(label[3])
        self.box2d = np.array([float(x) for x in label[4:8]], dtype=np.float32)
        self.h = float(label[8])
        self.w = float(label[9])
        self.l = float(label[10])
        self.loc = np.array([float(x) for x in label[11:14]], dtype=np.float32)
        self.dis_to_cam = np.linalg.norm(self.loc)
        self.ry = float(label[14])
        self.score = float(label[15]) if len(label) == 16 else -1.0
        self.level_str = None
        self.level = self.get_kitti_obj_level()

    def get_kitti_obj_level(self):
        """Easy/Moderate/Hard by 2D height, truncation, occlusion
        (KITTI difficulty rules, reference object3d_utils.py:39-53)."""
        height = float(self.box2d[3]) - float(self.box2d[1]) + 1
        if height >= 40 and self.truncation <= 0.15 and self.occlusion <= 0:
            self.level_str = 'Easy'
            return 0
        if height >= 25 and self.truncation <= 0.3 and self.occlusion <= 1:
            self.level_str = 'Moderate'
            return 1
        if height >= 25 and self.truncation <= 0.5 and self.occlusion <= 2:
            self.level_str = 'Hard'
            return 2
        self.level_str = 'UnKnown'
        return -1

    def generate_corners3d(self):
        """(8, 3) corners in camera coords (y-down, ry about y)."""
        l, h, w = self.l, self.h, self.w
        x_sign = np.array([1, 1, -1, -1, 1, 1, -1, -1], np.float32)
        z_sign = np.array([1, -1, -1, 1, 1, -1, -1, 1], np.float32)
        x_c = (l / 2) * x_sign
        z_c = (w / 2) * z_sign
        y_c = np.array([0, 0, 0, 0, -h, -h, -h, -h], np.float32)
        c, s = np.cos(self.ry), np.sin(self.ry)
        # camera-frame rotation about y: R = [[c,0,s],[0,1,0],[-s,0,c]]
        xr = c * x_c + s * z_c
        zr = -s * x_c + c * z_c
        return np.stack([xr, y_c, zr], axis=1) + self.loc

    def to_kitti_format(self):
        return ('%s %.2f %d %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f %.2f '
                '%.2f %.2f %.2f') % (
            self.cls_type, self.truncation, int(self.occlusion), self.alpha,
            self.box2d[0], self.box2d[1], self.box2d[2], self.box2d[3],
            self.h, self.w, self.l, self.loc[0], self.loc[1], self.loc[2],
            self.ry)

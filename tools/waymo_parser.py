"""Offline Waymo TFRecord -> per-frame .npy extraction.

Parity: tools/waymo_parser.py — converts Waymo Open Dataset segments into the
per-frame directory layout WaymoDataset consumes:
  lidar/<ctx>-<ts>-<frame>.npy : [N, 15] = xyz, range, intensity, elongation,
                                 6-dim camera projection, (col, row, return)
  label/...  : [N, 2] (instance id, semantic id; 1-based, 0 = unlabeled)
  pose/....txt : 4x4 vehicle pose
  image/<cam>/... : camera PNGs
  calib/....txt : KITTI-style calibration

Requires tensorflow + waymo_open_dataset (offline tooling environment only —
same dependency as the reference parser).

Usage:
  python tools/waymo_parser.py --tfrecord_list segments.txt --save_dir out/ \
      [--num_workers 8] [--test_mode]
"""

from __future__ import annotations

import argparse
import multiprocessing
import os

import numpy as np

TOP_LIDAR_ROW_NUM = 64
TOP_LIDAR_COL_NUM = 2650


def _require_waymo():
    try:
        import tensorflow as tf  # noqa: F401
        from waymo_open_dataset import dataset_pb2  # noqa: F401
        from waymo_open_dataset.utils import frame_utils  # noqa: F401
    except ImportError as e:
        raise ImportError(
            'waymo_parser needs tensorflow + waymo_open_dataset installed '
            '(offline preprocessing environment).') from e


class WaymoParser:
    def __init__(self, tfrecord_list_file, save_dir, num_workers=4,
                 test_mode=False):
        _require_waymo()
        with open(tfrecord_list_file) as fp:
            self.paths = fp.read().splitlines()
        self.save_dir = save_dir
        self.num_workers = num_workers
        self.test_mode = test_mode
        for sub in ('lidar', 'label', 'pose', 'calib'):
            os.makedirs(os.path.join(save_dir, sub), exist_ok=True)
        for cam in range(5):
            os.makedirs(os.path.join(save_dir, 'image', str(cam)), exist_ok=True)

    def parse(self):
        with multiprocessing.Pool(self.num_workers) as pool:
            for i, p in enumerate(pool.imap(self.parse_one, range(len(self.paths)))):
                print(f'[{i + 1}/{len(self.paths)}] {p}')

    # ------------------------------------------------------------------
    def parse_one(self, index):
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2

        path = self.paths[index]
        try:
            for frame_idx, data in enumerate(
                    tf.data.TFRecordDataset(path, compression_type='')):
                frame = dataset_pb2.Frame()
                frame.ParseFromString(bytearray(data.numpy()))
                stem = (f'{frame.context.name}-{frame.timestamp_micros}-'
                        f'{frame_idx:03d}')
                self._save_lidar_and_label(frame, stem)
                self._save_pose(frame, stem)
                self._save_images(frame, stem)
                self._save_calib(frame, stem)
        except Exception as e:  # keep going over corrupt segments
            print(f'failed to parse {path}: {e}')
        return path

    def _save_lidar_and_label(self, frame, stem):
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2
        from waymo_open_dataset.utils import frame_utils

        (range_images, camera_projections, segmentation_labels,
         range_image_top_pose) = frame_utils.parse_range_image_and_camera_projection(frame)

        clouds, cps, ris, labs = [], [], [], []
        for ri_index in (0, 1):
            pts, cp = frame_utils.convert_range_image_to_point_cloud(
                frame, range_images, camera_projections, range_image_top_pose,
                ri_index=ri_index, keep_polar_features=True)
            # polar-feature layout is (range, intensity, elongation, x, y, z)
            pts = np.concatenate(pts, axis=0)[:, [3, 4, 5, 0, 1, 2]]
            cp = np.concatenate(cp, axis=0)
            clouds.append(pts)
            cps.append(cp)
            ris.append(self._range_image_indices(frame, range_images, ri_index))
            if segmentation_labels and not self.test_mode:
                labs.append(self._point_labels(frame, range_images,
                                               segmentation_labels, ri_index))

        cloud = np.concatenate([
            np.concatenate(clouds, axis=0),
            np.concatenate(cps, axis=0),
            np.concatenate(ris, axis=0)], axis=1).astype(np.float32)
        np.save(os.path.join(self.save_dir, 'lidar', stem), cloud)
        if labs:
            np.save(os.path.join(self.save_dir, 'label', stem),
                    np.concatenate(labs, axis=0))

    @staticmethod
    def _range_image_indices(frame, range_images, ri_index):
        """(col, row, return) per point of the TOP lidar; -1 for the others —
        used by the submission writer to scatter predictions back."""
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2

        out = []
        for c in sorted(frame.context.laser_calibrations, key=lambda c: c.name):
            ri = range_images[c.name][ri_index]
            t = tf.reshape(tf.convert_to_tensor(ri.data), ri.shape.dims)
            mask = (t[..., 0] > 0).numpy()
            if c.name == dataset_pb2.LaserName.TOP:
                rows, cols = np.nonzero(mask)
                ids = np.stack([cols, rows, np.full_like(cols, ri_index)], axis=1)
            else:
                n = int(mask.sum())
                ids = -np.ones((n, 3), np.int64)
            out.append(ids)
        return np.concatenate(out, axis=0)

    @staticmethod
    def _point_labels(frame, range_images, segmentation_labels, ri_index):
        """(instance id, semantic id) per point; zeros where unlabeled."""
        import tensorflow as tf
        from waymo_open_dataset import dataset_pb2

        out = []
        for c in sorted(frame.context.laser_calibrations, key=lambda c: c.name):
            ri = range_images[c.name][ri_index]
            t = tf.reshape(tf.convert_to_tensor(ri.data), ri.shape.dims)
            mask = (t[..., 0] > 0).numpy()
            if c.name in segmentation_labels:
                sl = segmentation_labels[c.name][ri_index]
                st = tf.reshape(tf.convert_to_tensor(sl.data), sl.shape.dims).numpy()
                out.append(st[mask])
            else:
                out.append(np.zeros((int(mask.sum()), 2), np.int64))
        return np.concatenate(out, axis=0)

    def _save_pose(self, frame, stem):
        pose = np.array(frame.pose.transform).reshape(4, 4)
        np.savetxt(os.path.join(self.save_dir, 'pose', stem + '.txt'), pose)

    def _save_images(self, frame, stem):
        import cv2
        for img in frame.images:
            cam = img.name - 1
            arr = cv2.imdecode(np.frombuffer(img.image, np.uint8), cv2.IMREAD_COLOR)
            cv2.imwrite(os.path.join(self.save_dir, 'image', str(cam),
                                     stem + '.png'), arr)

    def _save_calib(self, frame, stem):
        """KITTI-style calibration file: per-camera intrinsics (P0..P4), a
        rectification identity, and vehicle->camera extrinsics."""
        lines = []
        # Waymo camera frame -> KITTI camera frame axis swap
        axes = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
                        np.float64)
        extrinsics, intrinsics = [], []
        for cam in sorted(frame.context.camera_calibrations, key=lambda c: c.name):
            ext = np.array(cam.extrinsic.transform).reshape(4, 4)
            k = cam.intrinsic
            P = np.array([[k[0], 0, k[2], 0], [0, k[1], k[3], 0], [0, 0, 1, 0]])
            intrinsics.append(P.reshape(-1))
            extrinsics.append((axes @ np.linalg.inv(ext)).reshape(-1))
        for i, P in enumerate(intrinsics):
            lines.append(f'P{i}: ' + ' '.join(f'{v:e}' for v in P))
        lines.append('R0_rect: ' + ' '.join(f'{v:e}' for v in np.eye(3).reshape(-1)))
        for i, T in enumerate(extrinsics):
            lines.append(f'Tr_velo_to_cam_{i}: ' + ' '.join(f'{v:e}' for v in T))
        with open(os.path.join(self.save_dir, 'calib', stem + '.txt'), 'w') as fp:
            fp.write('\n'.join(lines) + '\n')


def main():
    ap = argparse.ArgumentParser()
    # --tfrecord_list_file is the reference CLI's flag name
    # (tools/waymo_parser.py:333); --tfrecord_list is kept as an alias
    ap.add_argument('--tfrecord_list', '--tfrecord_list_file',
                    dest='tfrecord_list', required=True)
    ap.add_argument('--save_dir', required=True)
    ap.add_argument('--num_workers', type=int, default=4)
    ap.add_argument('--test_mode', action='store_true')
    args = ap.parse_args()
    WaymoParser(args.tfrecord_list, args.save_dir, args.num_workers,
                args.test_mode).parse()


if __name__ == '__main__':
    main()

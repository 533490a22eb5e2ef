"""Precompute per-point 2D semantic features (camera painting).

Parity: tools/extract_image_feature.py — run a 2D semantic segmentor over the
5 camera images of each frame, then gather each lidar point's class-score
vector via its 6-dim camera-projection columns (two candidate projections per
point), saved as a sparse {point_index: feature} dict per frame.

The 2D model is a HuggingFace SegFormer (transformers is in the image) instead
of the reference's mmseg checkpoint; pass any local
SegformerForSemanticSegmentation checkpoint directory.

Usage:
  python tools/extract_image_feature.py --data_dir /data/waymo/training \
      --model_path /models/segformer-b5 [--device cpu]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_model(model_path: str):
    try:
        import torch
        from transformers import (AutoImageProcessor,
                                  SegformerForSemanticSegmentation)
    except ImportError as e:
        raise ImportError('extract_image_feature needs torch + transformers') from e
    processor = AutoImageProcessor.from_pretrained(model_path)
    model = SegformerForSemanticSegmentation.from_pretrained(model_path).eval()
    return processor, model


def image_class_scores(processor, model, image_bgr: np.ndarray) -> np.ndarray:
    """[C, H, W] per-pixel class scores at input resolution."""
    import torch
    import torch.nn.functional as F
    rgb = image_bgr[..., ::-1].copy()
    inputs = processor(images=rgb, return_tensors='pt')
    with torch.no_grad():
        logits = model(**inputs).logits          # [1, C, h/4, w/4]
        up = F.interpolate(logits, size=rgb.shape[:2], mode='bilinear',
                           align_corners=False)
    return up[0].numpy()


def gather_point_features(lidar: np.ndarray, feature_maps: dict) -> dict:
    """Vectorized gather of the reference's per-point loop
    (extract_image_feature.py:80-102): prefer the primary projection
    (cols 6-8), fall back to the secondary (cols 9-11)."""
    cams = np.asarray(sorted(feature_maps), dtype=np.int64)
    cam1 = lidar[:, 6].astype(np.int64) - 1
    cam2 = lidar[:, 9].astype(np.int64) - 1
    has1 = np.isin(cam1, cams)
    has2 = np.isin(cam2, cams) & ~has1     # primary projection wins
    cam = np.where(has1, cam1, np.where(has2, cam2, -1))
    x = np.where(has1, lidar[:, 7], lidar[:, 10]).astype(np.int64)
    y = np.where(has1, lidar[:, 8], lidar[:, 11]).astype(np.int64)
    out = {}
    for c, fm in feature_maps.items():
        sel = ((cam == c) & (y >= 0) & (y < fm.shape[1])
               & (x >= 0) & (x < fm.shape[2]))
        idx = np.nonzero(sel)[0]
        feats = fm[:, y[idx], x[idx]].T    # [n_sel, C]
        out.update(zip(idx.tolist(), feats))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data_dir', required=True)
    ap.add_argument('--model_path', required=True)
    ap.add_argument('--limit', type=int, default=0)
    args = ap.parse_args()

    import cv2
    processor, model = load_model(args.model_path)
    lidar_files = sorted(glob.glob(os.path.join(args.data_dir, 'lidar', '*.npy')))
    if args.limit:
        lidar_files = lidar_files[:args.limit]
    feat_dir = os.path.join(args.data_dir, 'image_feature')
    os.makedirs(feat_dir, exist_ok=True)

    for n, lf in enumerate(lidar_files):
        stem = os.path.splitext(os.path.basename(lf))[0]
        maps = {}
        for cam in range(5):
            img_file = os.path.join(args.data_dir, 'image', str(cam), stem + '.png')
            if not os.path.exists(img_file):
                continue
            img = cv2.imread(img_file, cv2.IMREAD_COLOR)
            if img is None:
                continue
            maps[cam] = image_class_scores(processor, model, img)
        lidar = np.load(lf)
        np.save(os.path.join(feat_dir, stem + '.npy'),
                gather_point_features(lidar, maps))
        if (n + 1) % 20 == 0:
            print(f'[{n + 1}/{len(lidar_files)}]')


if __name__ == '__main__':
    main()

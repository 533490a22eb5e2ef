"""Configuration system.

Keeps the reference's public YAML schema (DATASET / MODEL / TRAIN sections with
identical keys — see /root/reference/seg3d/utils/config.py:5-78) but replaces the
mutable global ``cfg`` singleton with an explicit, immutable config object that is
returned from :func:`cfg_from_file`.

Additions over the reference schema live in the new ``RUNTIME`` section: TPU
execution needs *static* shapes, so every dynamic count (points/frame,
voxels/stage, windows/bucket) is padded to a configured capacity there. The
reference's own window-bucket tables (``MODEL.BATCHING_INFO``) prove the models
tolerate capacity capping; ``RUNTIME`` generalises that scheme to the whole
pipeline.
"""

from __future__ import annotations

import copy
from typing import Any

import numpy as np
import yaml


def _rebuild_config(items: dict, frozen: bool) -> "ConfigDict":
    c = ConfigDict(items)
    return c.freeze() if frozen else c


class ConfigDict(dict):
    """A dict with attribute access. Immutable once ``freeze()`` is called.

    Picklable (``__reduce__``): default dict-subclass pickling restores items
    via __setitem__ on an object whose ``_frozen`` slot was never initialized,
    which raises — and configs must cross process boundaries for the spawned
    dataloader workers."""

    def __reduce__(self):
        return (_rebuild_config, (dict(self),
                                  object.__getattribute__(self, "_frozen")))

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        object.__setattr__(self, "_frozen", False)
        for k, v in list(self.items()):
            if isinstance(v, dict) and not isinstance(v, ConfigDict):
                self[k] = ConfigDict(v)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(f"Config is frozen; cannot set {name!r}")
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            value = ConfigDict(value)
        self[name] = value

    def __setitem__(self, key, value):
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(f"Config is frozen; cannot set {key!r}")
        super().__setitem__(key, value)

    def freeze(self) -> "ConfigDict":
        for v in self.values():
            if isinstance(v, ConfigDict):
                v.freeze()
        object.__setattr__(self, "_frozen", True)
        return self

    def unfrozen_copy(self) -> "ConfigDict":
        out = ConfigDict()
        for k, v in self.items():
            if isinstance(v, ConfigDict):
                out[k] = v.unfrozen_copy()
            else:
                out[k] = copy.deepcopy(v)
        return out


def default_config() -> ConfigDict:
    """Defaults mirroring the reference schema (seg3d/utils/config.py:5-78),
    plus the TPU-specific RUNTIME section."""
    c = ConfigDict()

    # ----- dataset config (schema parity with reference) -----
    c.DATASET = ConfigDict()
    c.DATASET.USE_MULTI_SWEEPS = False
    c.DATASET.MAX_NUM_SWEEPS = 5
    c.DATASET.NUM_SWEEPS = 3
    c.DATASET.USE_CYLINDER = False
    c.DATASET.POINT_CLOUD_RANGE = [-72, -72, -2, 72, 72, 4.4]
    c.DATASET.VOXEL_SIZE = [0.1, 0.1, 0.1]
    c.DATASET.DIM_POINT = 6
    c.DATASET.USE_IMAGE_FEATURE = False
    c.DATASET.DIM_IMAGE_FEATURE = 28
    c.DATASET.NUM_CLASSES = 22
    c.DATASET.CLASS_NAMES = []
    c.DATASET.CLASS_WEIGHT = []
    c.DATASET.PALETTE = []
    c.DATASET.IGNORE_INDEX = 255

    c.DATASET.AUG_DATA = True
    c.DATASET.AUG_ROT_RANGE = [-0.78539816, 0.78539816]
    c.DATASET.AUG_SCALE_RANGE = [0.95, 1.05]
    c.DATASET.AUG_TRANSLATE_STD = 0.5
    c.DATASET.AUG_SAMPLE_RATIO = 0.95
    c.DATASET.AUG_SAMPLE_RANGE = 50.0
    c.DATASET.AUG_COLOR_DROP_RATIO = 0.5

    c.DATASET.VISUALIZE = False

    # ----- model config (schema parity) -----
    c.MODEL = ConfigDict()
    c.MODEL.SEGMENTOR = 'segformer'
    c.MODEL.LOSSES = {'ohem_ce': 1.0, 'lovasz': 1.0}
    c.MODEL.OHEM_KEEP_RATIO = 0.3
    c.MODEL.OHEM_KEEP_THRESH = 0.7
    # Feed DATASET.CLASS_WEIGHT into the CE-family losses. Default False =
    # reference parity: its builder parses the weights but never passes them
    # to any loss (seg3d/models/builder.py:27-40), so the shipped recipes are
    # tuned for the unweighted landscape (see models/losses.build_criterion).
    c.MODEL.USE_CLASS_WEIGHT = False
    c.MODEL.AUX_LOSS_WEIGHT = 0.4
    # Window-occupancy bucket tables, one per backbone stage. Same schema as
    # the reference (seg3d/utils/config.py:42-67) but refined to power-of-2
    # ladders: each bucket's max_tokens equals its occupancy upper bound, so
    # refinement NEVER changes which voxels drop (a window with occ < hi always
    # fits its bucket) — it only shrinks per-window padding. Measured on
    # Waymo-like bench frames, the reference's coarse 4-level tables leave
    # windows ~40% full (attention pays T^2 per window: 2.0x more MXU block
    # work, 1.4x more buffer slots than these ladders). The top bucket keeps
    # the reference's 800-token drop cap.
    def _ladder(ts, top=800):
        out, lo = {}, 0
        for i, t in enumerate(ts):
            out[str(i)] = {'max_tokens': t, 'batching_range': [lo, t]}
            lo = t
        out[str(len(ts))] = {'max_tokens': top, 'batching_range': [lo, 100000]}
        return out

    c.MODEL.BATCHING_INFO = [
        _ladder([16, 32, 64, 128, 256]),
        _ladder([32, 64, 128, 256, 512]),
        _ladder([32, 64, 128, 256, 512]),
        _ladder([64, 128, 256, 512]),
    ]
    c.MODEL.WINDOW_SHAPE = [10, 10, 8]
    c.MODEL.DEPTHS = [3, 4, 8, 3]
    c.MODEL.DROP_PATH_RATE = 0.3
    # DeepFusion candidate-KNN shell (ops/knn.voxel_bucket_knn): kernel 3 =
    # the 27-voxel (±1 voxel ≈ ±0.1 m) neighborhood. Widen to 5 for parity
    # runs at far range where LiDAR spacing exceeds the default shell and
    # points would otherwise see < n_neighbors candidates (cost ∝ kernel^3).
    c.MODEL.FUSION_KNN_KERNEL_SIZE = 3
    c.MODEL.FUSION_KNN_BUCKET_CAP = 8

    # ----- training config (schema parity) -----
    c.TRAIN = ConfigDict()
    c.TRAIN.OPTIMIZER = 'adamw'
    c.TRAIN.LR = 0.001
    c.TRAIN.WEIGHT_DECAY = 0.01
    c.TRAIN.MOMENTUM = 0.9
    c.TRAIN.LR_SCHEDULER = 'warmup_poly_lr'

    # ----- TPU runtime section (new; static-shape capacities) -----
    c.RUNTIME = ConfigDict()
    # Max LiDAR points per frame after augmentation (Waymo two-return frames
    # carry ~170k points; multi-sweep configs concatenate NUM_SWEEPS frames).
    c.RUNTIME.MAX_POINTS_PER_SAMPLE = 180224
    # Max occupied voxels per frame at full resolution (~65-90k typical at 0.1m).
    c.RUNTIME.MAX_VOXELS_PER_SAMPLE = 114688
    # Voxel capacity of backbone stages 1..4 as fractions of MAX_VOXELS_PER_SAMPLE.
    # IMPORTANT: the stride-2 SparseConv3d output set is the spconv-semantics
    # DILATED set (every site whose 3^3 receptive field touches an input), so
    # stage 2 is LARGER than stage 1 on surface-like LiDAR: measured on
    # Waymo-like frames (~66-80k stage-1 voxels) the true per-stage counts
    # peak at [0.81, 1.14, 0.55, 0.20] of MAX_VOXELS — these ratios add
    # ~25% margin. Undersizing a stage drops the largest-key (far +y) voxels,
    # which is spatially biased; don't.
    c.RUNTIME.STAGE_CAPACITY_RATIOS = [1.0, 1.45, 0.7, 0.25]
    # Per-stage, per-level token capacity of each window-attention bucket, as a
    # fraction of the stage voxel capacity (window capacity W_l =
    # frac*V_stage/T_l). Overflow windows/voxels are dropped, mirroring the
    # reference keep_mask policy (point_transformer_layer.py:86). Values are
    # sized from measured per-level WINDOW counts on Waymo-like frames at the
    # dilated stage capacities above (1.25x margin over the observed per-frame
    # max; window count x max_tokens is the binding constraint for small-T
    # levels, whose windows run far under full). The top bucket (drop cap 800)
    # is empty on outdoor LiDAR at every stage, so it gets a small safety
    # allocation instead of a worst-case one.
    c.RUNTIME.WINDOW_BUCKET_FRACTIONS = [
        [1.02, 0.28, 0.37, 0.40, 0.14, 0.02],
        [0.30, 0.32, 0.51, 0.52, 0.04, 0.02],
        [0.24, 0.26, 0.50, 0.75, 0.10, 0.02],
        [0.45, 0.42, 0.76, 0.11, 0.02],
    ]
    # Compute dtype for matmul-heavy paths ('float32' or 'bfloat16').
    c.RUNTIME.COMPUTE_DTYPE = 'bfloat16'
    # Unroll the encoder-layer depth scans (swformer.py). True compiles one
    # layer body PER layer (larger program, no loop barriers); False compiles
    # one body per (stage, shift). Measured on the real chip (NOTES r5):
    # infer step identical (379.0 vs 378.7 ms), train 851 vs 836 ms; fresh
    # compile 161 vs 203 s (infer), 229 vs 245 s (train). Step time wins.
    c.RUNTIME.SCAN_UNROLL = True
    # Number of data-parallel devices expected at train time (mesh size);
    # 0 = use all visible devices.
    c.RUNTIME.NUM_DEVICES = 0

    return c


def _merge_a_into_b(a: dict, b: ConfigDict, path: str = '') -> None:
    """Strict merge: every key in `a` must already exist in `b` with a matching
    type (mirrors reference _merge_a_into_b, seg3d/utils/config.py:90-117)."""
    for k, v in a.items():
        if k not in b:
            raise KeyError(f'{path}{k} is not a valid config key')
        old = b[k]
        if isinstance(old, ConfigDict):
            if not isinstance(v, dict):
                raise ValueError(f'Type mismatch ({type(old)} vs {type(v)}) for config key: {path}{k}')
            _merge_a_into_b(v, old, path=f'{path}{k}.')
        else:
            if old is not None and v is not None and not isinstance(old, type(v)):
                # allow int -> float promotion, mirrors YAML-number looseness
                if isinstance(old, float) and isinstance(v, int):
                    v = float(v)
                elif isinstance(old, np.ndarray):
                    v = np.array(v, dtype=old.dtype)
                else:
                    raise ValueError(
                        f'Type mismatch ({type(old)} vs. {type(v)}) for config key: {path}{k}')
            b[k] = v


def cfg_from_file(filename: str | None = None, overrides: dict | None = None) -> ConfigDict:
    """Load a YAML config overlaid onto the defaults; returns a frozen config.

    Same YAML schema as the reference (cfg_from_file, seg3d/utils/config.py:81-87)
    but pure: no global state is mutated.
    """
    c = default_config()
    if filename is not None:
        with open(filename, 'r') as f:
            yaml_cfg = yaml.safe_load(f)
        if yaml_cfg:
            _merge_a_into_b(yaml_cfg, c)
    if overrides:
        _merge_a_into_b(overrides, c)
    return c.freeze()


def grid_size(cfg: ConfigDict) -> tuple[int, int, int]:
    """Integer (gx, gy, gz) voxel grid size from range/voxel-size (reference
    VoxelGenerator.__init__, seg3d/core/voxel/voxel_generator.py:11-22)."""
    rng = np.array(cfg.DATASET.POINT_CLOUD_RANGE, dtype=np.float32)
    vs = np.array(cfg.DATASET.VOXEL_SIZE, dtype=np.float32)
    gs = np.round((rng[3:] - rng[:3]) / vs).astype(np.int64)
    return int(gs[0]), int(gs[1]), int(gs[2])

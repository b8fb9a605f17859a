"""Typed configuration for the TPU SLAM system.

One dataclass tree replaces the reference's two config channels (direct
``cv::FileStorage`` reads in constructors, reference ``src/Tracking.cc:29-141``,
plus the global ``Config::Get<T>`` singleton, ``include/Config.h:13-26``).
``load_yaml_config`` accepts the same YAML keys as the reference's
``Examples/RGB-D/*.yaml`` files (e.g. ``Camera.fx``, ``ORBextractor.nFeatures``,
``Plane.AssociationAngRef``), so a reference user can point this system at
their existing settings file.

Static capacities: XLA needs static shapes, so every per-frame and map-wide
quantity has a fixed capacity with a validity mask (SURVEY.md §7 "fixed-size
everything"). Capacities live here so tests can shrink them.
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class CameraConfig:
    """Pinhole RGB-D camera intrinsics (reference `src/Tracking.cc:29-128`)."""

    fx: float = 535.4
    fy: float = 539.2
    cx: float = 320.1
    cy: float = 247.6
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 640
    height: int = 480
    fps: float = 30.0
    bf: float = 40.0  # stereo baseline (m) times fx — pseudo-stereo right coord
    th_depth: float = 40.0  # close/far threshold in units of baseline
    depth_map_factor: float = 5000.0  # raw depth units per metre
    rgb_order: int = 1

    @property
    def depth_threshold(self) -> float:
        """Close-point depth cutoff in metres (reference `src/Tracking.cc:117-120`)."""
        return self.bf * self.th_depth / self.fx

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))


@dataclass(frozen=True)
class ORBConfig:
    """ORB front-end parameters (reference `src/ORBextractor.cc:410` ctor args).

    The octree keypoint distribution (`src/ORBextractor.cc:539`) is redesigned
    as per-tile top-k selection — same uniform-coverage goal, TPU shaped.
    """

    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7
    # TPU capacities / tiling (not in reference; implementation parameters)
    max_keypoints: int = 1024  # padded per-frame keypoint capacity
    tile: int = 32  # top-k selection tile size in pixels (level 0)
    patch_size: int = 31  # orientation / descriptor patch (reference PATCH_SIZE)
    half_patch: int = 15  # reference HALF_PATCH_SIZE (`src/ORBextractor.cc:105`)


@dataclass(frozen=True)
class LineConfig:
    """Line front end (reference `src/LSDextractor.cpp:12-40`, `src/LineExtractor.cpp`)."""

    max_lines: int = 64  # reference keeps top-40 by response (`LSDextractor.cpp:18-26`)
    keep_top: int = 40
    n_depth_samples: int = 48  # reference samples <=50 px along segment (`Frame.cc:199`)
    ransac_iters: int = 32
    min_length_px: float = 30.0
    desc_dim: int = 72  # LBD-like band descriptor dimension
    # depth noise model sigma(z) = c1 z^2 + c2 z + c3 (`LineExtractor.cpp:1182`)
    depth_c1: float = 0.00273
    depth_c2: float = 0.00074
    depth_c3: float = -0.00058


@dataclass(frozen=True)
class PlaneConfig:
    """Plane segmentation + association (reference `include/peac/*`, `src/PlaneMatcher.cpp`).

    YAML keys match `Examples/RGB-D/TUM3.yaml:73-98`.
    """

    max_planes: int = 16  # per-frame plane capacity
    min_size: int = 2000  # Plane.MinSize — min supporting pixels (TUM; ICL uses 500)
    angle_threshold_deg: float = 3.0  # Plane.AngleThreshold
    distance_threshold: float = 0.05  # Plane.DistanceThreshold (point-to-plane, m)
    leaf_size: float = 0.01  # Plane.LeafSize voxel size for plane clouds
    max_distance: float = 10.0  # Plane.MaxDistance — depth cutoff
    assoc_angle: float = 0.985  # Plane.AssociationAngRef cos(10 deg)
    assoc_dist: float = 0.05  # Plane.AssociationDisRef (m)
    vertical_threshold: float = 0.08716  # Plane.VerticalThreshold |cos| < (85 deg)
    parallel_threshold: float = 0.9962  # Plane.ParallelThreshold |cos| > (5 deg)
    angle_info: float = 0.5  # Plane.AngleInfo (optimizer information)
    distance_info: float = 50.0  # Plane.DistanceInfo
    chi: float = 100.0  # Plane.Chi gating in pose optimization
    vp_chi: float = 50.0  # Plane.VPChi gating for parallel/vertical edges
    parallel_info: float = 0.1  # Plane.ParallelInfo
    vertical_info: float = 0.1  # Plane.VerticalInfo
    # TPU implementation parameters (PEAC block size; reference default 10x10)
    block: int = 8
    # label-propagation rounds replacing the AHC heap merge; with pointer
    # jumping (path halving) coverage grows ~2^rounds, so 12 rounds span any
    # component on an 80x60 block grid — rounds are sequential device steps
    merge_rounds: int = 12
    # AHCParamSet.hpp:87 depth-dependent MSE scale. The reference coefficient
    # is 1.6e-6 with depth in MILLIMETERS (sigma(2.5 m) = 1.6e-6 * 2500^2 =
    # 10 mm, the Kinect model); converted to this codebase's meters:
    # 1.6e-6 mm^-1 * (1000 z)^2 mm^2 -> m gives 1.6e-3 * z^2.
    # (An earlier 1.6e-6 value silently applied the mm coefficient to
    # meters — 1000x too tight — so under sensor-model noise every block
    # failed the gate and whole frames produced zero planes.)
    block_mse_sigma: float = 1.6e-3
    block_mse_tol: float = 0.008  # merge tolerance (m)
    # robust pixel-refit rounds: after the coarse distance_threshold
    # assignment, re-gate each pixel at 2.5x its plane's own fitted sigma
    # and refit — trims the corner wedges that tilt normals under sensor
    # noise (see ops/planes.extract_planes)
    refine_rounds: int = 2
    # the robust re-assign/refit rounds run on a refine_stride-subsampled
    # pixel grid: plane moments from HW/stride^2 samples estimate the same
    # parameters (tens of thousands of samples per plane remain at 640x480)
    # while each round's (HW, P) distance matrix + one-hot refit — the
    # dominant extract_planes cost, measured 3.3-3.6 ms/round on TPU —
    # shrinks by stride^2. Only the FINAL pixel labeling runs at full
    # resolution. Set to 1 on tiny frames where every pixel counts.
    refine_stride: int = 2
    # edge-preserving box window for the plane/normal depth path (the role
    # of PCL integral-image smoothing 10, `src/Frame.cc:715-728`); 0/1 = off
    smooth_window: int = 5
    normal_sub: int = 6  # surface-normal subsample stride (PCL 3x then 2x, Frame.cc:694-752)


@dataclass(frozen=True)
class ManhattanConfig:
    """Manhattan-frame rotation tracking (reference `src/Tracking.cc:763-1157`)."""

    cone_sin_track: float = 0.2018  # cone half-angle sin, `Tracking.cc:919`
    cone_sin_project: float = 0.2518  # `Tracking.cc:807`
    mean_shift_kernel: float = 20.0  # exp(-20 ||x||^2), `Tracking.cc:1148`
    mean_shift_iters: int = 5
    max_normals: int = 2048  # subsampled surface-normal budget per frame
    min_axis_support: int = 20  # min votes for an axis to count as found


@dataclass(frozen=True)
class MatcherConfig:
    """Descriptor matching thresholds (reference `src/ORBmatcher.cc:38-40`)."""

    th_low: int = 50
    th_high: int = 100
    nn_ratio: float = 0.9
    check_orientation: bool = True
    histo_length: int = 30


@dataclass(frozen=True)
class MapConfig:
    """Global map capacities (struct-of-arrays device tensors)."""

    max_keyframes: int = 512
    max_points: int = 32768
    max_lines: int = 4096
    max_planes: int = 128
    plane_cloud_capacity: int = 4096  # voxel-hashed per-plane point buffer
    covis_min_weight: int = 15  # covisibility edge threshold (KeyFrame.cc)


@dataclass(frozen=True)
class TrackingConfig:
    """Tracking policy (reference `src/Tracking.cc:2049-2279`)."""

    min_frames_between_kf: int = 0
    max_frames_between_kf: int = 30  # fps
    close_points_for_kf: int = 100  # `Tracking.cc:2150-2199`
    close_lines_for_kf: int = 50
    min_matches_track: int = 10
    min_matches_local_map: int = 30
    # relocalization acceptance: >=50 inliers after the coarse-to-fine
    # guided rematch (reference `src/Tracking.cc:2648-2691` nGood>=50)
    reloc_min_inliers: int = 50
    # >1 runs C sequential frames per device program (one upload/execute/
    # pull per chunk) — throughput mode for transaction-latency-bound
    # deployments (e.g. a host<->TPU tunnel); pose output + map updates lag
    # up to 2C frames. 1 = per-frame streaming with the pipelined tracker.
    chunk_size: int = 1
    # streaming mode: frames in flight before the tracker blocks on the
    # oldest frame's D2H pull. Higher depth hides more of the tunnel's
    # round-trip latency at the cost of map updates / KF decisions lagging
    # that many frames (the reference's async LocalMapping has the same
    # kind of lag). Host-side only — changing it never recompiles.
    pipeline_depth: int = 2
    # chunked mode: whole chunks in flight before the oldest is drained —
    # the chunk-granularity analogue of pipeline_depth (host-side only,
    # never recompiles)
    chunk_pipeline_depth: int = 2

    def __post_init__(self):
        # a negative depth would make the pipeline drain loop pop from an
        # empty pending list mid-tracking; fail at construction instead
        if self.pipeline_depth < 0:
            raise ValueError(
                f"pipeline_depth must be >= 0, got {self.pipeline_depth}")
        if self.chunk_size < 1:
            raise ValueError(
                f"chunk_size must be >= 1, got {self.chunk_size}")
        if self.chunk_pipeline_depth < 0:
            raise ValueError(f"chunk_pipeline_depth must be >= 0, "
                             f"got {self.chunk_pipeline_depth}")


@dataclass(frozen=True)
class LoopConfig:
    """Loop closing (reference `src/LoopClosing.cc`)."""

    min_kf_gap: int = 10
    consistency_threshold: int = 3
    sim3_min_inliers: int = 20
    min_total_matches: int = 40
    vocab_bits: int = 12  # LSH word id bits for BoW-like retrieval (2^bits words)


@dataclass(frozen=True)
class SystemConfig:
    camera: CameraConfig = field(default_factory=CameraConfig)
    orb: ORBConfig = field(default_factory=ORBConfig)
    lines: LineConfig = field(default_factory=LineConfig)
    planes: PlaneConfig = field(default_factory=PlaneConfig)
    manhattan: ManhattanConfig = field(default_factory=ManhattanConfig)
    matcher: MatcherConfig = field(default_factory=MatcherConfig)
    map: MapConfig = field(default_factory=MapConfig)
    tracking: TrackingConfig = field(default_factory=TrackingConfig)
    loop: LoopConfig = field(default_factory=LoopConfig)
    save_path_keyframe: str = "KeyFrameTrajectory.txt"
    save_path_frame: str = "CameraTrajectory.txt"

    def replace(self, **kw) -> "SystemConfig":
        return dataclasses.replace(self, **kw)

    @staticmethod
    def tiny(height: int = 120, width: int = 160) -> "SystemConfig":
        """Small-shape config for fast CPU tests."""
        scale = width / 640.0
        return SystemConfig(
            camera=CameraConfig(
                fx=535.4 * scale, fy=539.2 * scale,
                cx=width / 2.0 - 0.5, cy=height / 2.0 - 0.5,
                width=width, height=height, bf=40.0 * scale,
            ),
            orb=ORBConfig(n_features=256, n_levels=4, max_keypoints=256, tile=16),
            lines=LineConfig(max_lines=16, keep_top=16, n_depth_samples=24,
                             ransac_iters=16, min_length_px=15.0),
            planes=PlaneConfig(max_planes=8, min_size=120, block=8,
                               merge_rounds=16, refine_stride=1),
            manhattan=ManhattanConfig(max_normals=512),
            map=MapConfig(max_keyframes=32, max_points=4096, max_lines=256,
                          max_planes=32, plane_cloud_capacity=512),
            # reloc acceptance scales with the feature budget (reference
            # nGood>=50 is tuned for 1000 ORB features; tiny runs 256 and
            # its KFs carry only ~25-80 landmark observations)
            tracking=TrackingConfig(reloc_min_inliers=15),
        )


# --- YAML loading (reference key names) -------------------------------------

_YAML_KEY = re.compile(r"^\s*([A-Za-z][\w.]*)\s*:\s*(.*?)\s*(#.*)?$")


def _parse_opencv_yaml(path: str) -> dict:
    """Parse the flat key:value subset of OpenCV YAML used by the reference.

    The reference reads these via ``cv::FileStorage``; files start with a
    ``%YAML:1.0`` directive that stock PyYAML rejects, and every key is a flat
    dotted scalar, so a tolerant line parser is both simpler and sufficient.
    """
    out: dict = {}
    with open(path, "r") as f:
        for line in f:
            if line.lstrip().startswith(("%", "#")) or ":" not in line:
                continue
            m = _YAML_KEY.match(line)
            if not m:
                continue
            key, raw = m.group(1), m.group(2)
            raw = raw.strip().strip('"')
            if raw == "":
                continue
            try:
                val: object = int(raw)
            except ValueError:
                try:
                    val = float(raw)
                except ValueError:
                    val = raw
            out[key] = val
    return out


def load_yaml_config(path: str, base: Optional[SystemConfig] = None) -> SystemConfig:
    """Build a SystemConfig from a reference-style YAML settings file.

    Accepts the key vocabulary of ``Examples/RGB-D/TUM3.yaml`` / ``ICL.yaml``.
    Unknown keys are ignored (the reference behaves the same: unread keys are
    simply never queried).
    """
    kv = _parse_opencv_yaml(path)
    base = base or SystemConfig()

    def get(key, default):
        return kv.get(key, default)

    cam = base.camera
    cam = dataclasses.replace(
        cam,
        fx=float(get("Camera.fx", cam.fx)), fy=float(get("Camera.fy", cam.fy)),
        cx=float(get("Camera.cx", cam.cx)), cy=float(get("Camera.cy", cam.cy)),
        k1=float(get("Camera.k1", cam.k1)), k2=float(get("Camera.k2", cam.k2)),
        p1=float(get("Camera.p1", cam.p1)), p2=float(get("Camera.p2", cam.p2)),
        k3=float(get("Camera.k3", cam.k3)),
        width=int(get("Camera.width", cam.width)),
        height=int(get("Camera.height", cam.height)),
        fps=float(get("Camera.fps", cam.fps)), bf=float(get("Camera.bf", cam.bf)),
        th_depth=float(get("ThDepth", cam.th_depth)),
        depth_map_factor=float(get("DepthMapFactor", cam.depth_map_factor)),
        rgb_order=int(get("Camera.RGB", cam.rgb_order)),
    )
    orb = dataclasses.replace(
        base.orb,
        n_features=int(get("ORBextractor.nFeatures", base.orb.n_features)),
        scale_factor=float(get("ORBextractor.scaleFactor", base.orb.scale_factor)),
        n_levels=int(get("ORBextractor.nLevels", base.orb.n_levels)),
        ini_th_fast=int(get("ORBextractor.iniThFAST", base.orb.ini_th_fast)),
        min_th_fast=int(get("ORBextractor.minThFAST", base.orb.min_th_fast)),
    )
    pl = base.planes
    pl = dataclasses.replace(
        pl,
        min_size=int(get("Plane.MinSize", pl.min_size)),
        angle_threshold_deg=float(get("Plane.AngleThreshold", pl.angle_threshold_deg)),
        distance_threshold=float(get("Plane.DistanceThreshold", pl.distance_threshold)),
        leaf_size=float(get("Plane.LeafSize", pl.leaf_size)),
        max_distance=float(get("Plane.MaxDistance", pl.max_distance)),
        assoc_angle=float(get("Plane.AssociationAngRef", pl.assoc_angle)),
        assoc_dist=float(get("Plane.AssociationDisRef", pl.assoc_dist)),
        vertical_threshold=float(get("Plane.VerticalThreshold", pl.vertical_threshold)),
        parallel_threshold=float(get("Plane.ParallelThreshold", pl.parallel_threshold)),
        angle_info=float(get("Plane.AngleInfo", pl.angle_info)),
        distance_info=float(get("Plane.DistanceInfo", pl.distance_info)),
        chi=float(get("Plane.Chi", pl.chi)),
        vp_chi=float(get("Plane.VPChi", pl.vp_chi)),
        parallel_info=float(get("Plane.ParallelInfo", pl.parallel_info)),
        vertical_info=float(get("Plane.VerticalInfo", pl.vertical_info)),
    )
    return dataclasses.replace(
        base, camera=cam, orb=orb, planes=pl,
        save_path_keyframe=str(get("SavePath.Keyframe", base.save_path_keyframe)),
        save_path_frame=str(get("SavePath.Frame", base.save_path_frame)),
    )

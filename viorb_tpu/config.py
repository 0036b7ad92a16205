"""Typed configuration covering both of the reference's YAML files.

The reference splits settings between the camera/ORB/viewer YAML (parsed in
the `Tracking` ctor, `/root/reference/src/Tracking.cc:750-844`) and the
VI/system YAML (`src/IMU/configparam.cc:16-131`). Here one dataclass tree
carries both, loadable from the same OpenCV-style YAML files (including the
reference's own EuRoC.yaml) with identical key names and semantics — down
to the reference's misspelled `dispalyTimeStatistic` key.

`build_system(cfg)` constructs the matching pipeline object
(Mono/MonoVI/Stereo/RGBD) from a config.
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field

import numpy as np

GRAVITY = 9.810  # ConfigParam static gravity (configparam.cc:5)


def load_cv_yaml(path: str) -> dict:
    """Parse an OpenCV FileStorage YAML (the reference's config format).

    Handles the `%YAML:1.0` header, `!!opencv-matrix` nodes, and plain
    key: value scalars — the subset cv::FileStorage writes/reads.
    """
    import yaml

    with open(path) as f:
        text = f.read()
    text = re.sub(r"^%YAML:[0-9.]+\s*", "", text)
    text = text.replace("!!opencv-matrix", "")
    # cv::FileStorage accepts "key:value" without the space; YAML does not
    text = re.sub(r"(?m)^([A-Za-z0-9_.]+):(?=\S)", r"\1: ", text)
    data = yaml.safe_load(text)
    return data or {}


@dataclass
class CameraConfig:
    fx: float = 458.654
    fy: float = 457.296
    cx: float = 367.215
    cy: float = 248.375
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    fps: float = 20.0
    rgb: int = 1
    bf: float = 0.0  # Camera.bf (stereo/RGB-D): baseline * fx
    th_depth: float = 35.0  # ThDepth close-point threshold (x baseline)
    width: int = 752
    height: int = 480
    delay_to_imu: float = 0.0  # Camera.delaytoimu (Timage = Timu + delay)


@dataclass
class OrbConfig:
    n_features: int = 1000  # ORBextractor.nFeatures
    scale_factor: float = 1.2  # ORBextractor.scaleFactor
    n_levels: int = 8  # ORBextractor.nLevels
    ini_th_fast: int = 20  # ORBextractor.iniThFAST
    min_th_fast: int = 7  # ORBextractor.minThFAST


@dataclass
class ImuConfig:
    rate: float = 200.0  # IMU.rate
    sigma_g: float = 1.6968e-4  # gyro white noise
    sigma_gw: float = 1.9393e-5  # gyro bias diffusion
    sigma_a: float = 2.0e-3  # accel white noise
    sigma_aw: float = 3.0e-3  # accel bias diffusion
    multiply_g: bool = False  # IMU.multiplyG (raw acc in g units)
    Tbc: np.ndarray = field(
        default_factory=lambda: np.eye(4)
    )  # Camera.Tbc, re-orthonormalized on load (configparam.cc:41-68)


@dataclass
class ViewerConfig:
    keyframe_size: float = 0.05
    keyframe_line_width: float = 1.0
    graph_line_width: float = 0.9
    point_size: float = 2.0
    camera_size: float = 0.08
    camera_line_width: float = 3.0
    viewpoint_x: float = 0.0
    viewpoint_y: float = -0.7
    viewpoint_z: float = -1.8
    viewpoint_f: float = 500.0


@dataclass
class SystemConfig:
    camera: CameraConfig = field(default_factory=CameraConfig)
    orb: OrbConfig = field(default_factory=OrbConfig)
    imu: ImuConfig = field(default_factory=ImuConfig)
    viewer: ViewerConfig = field(default_factory=ViewerConfig)

    # ConfigParam keys (configparam.cc:16-131)
    running_mode: int = 0  # 0: Monocular, 1: MonoVI
    deactive_loop_closure: bool = False
    only_track_local_map: bool = False
    display_time_statistic: bool = False  # "dispalyTimeStatistic" [sic]
    vision_aid_when_imu_fails: bool = False
    wait_until_local_map_idle: bool = False
    estimate_extrinsics: bool = True  # estimateExtrinsicBetweenCameraAndIMU
    random_matrix_first_vio_init: bool = False
    local_window_size: int = 10  # LocalMapping.LocalWindowSize
    discard_time: float = 0.0  # test.DiscardTime
    vio_tmp_path: str = ""  # test.InitVIOTmpPath
    bagfile: str = ""
    imu_topic: str = "/imu0"
    image_topic: str = "/cam0/image_raw"

    # capacities of the array map (TPU-native addition; fixed shapes)
    max_keyframes: int = 128
    max_landmarks: int = 16384

    # trained binary vocabulary for place recognition (the reference's
    # System(vocabulary, ...) first ctor argument; produced by
    # tools/train_vocab.py). Empty -> vocabulary-free LSH backend.
    vocabulary_path: str = ""

    @property
    def Rbc(self) -> np.ndarray:
        return self.imu.Tbc[:3, :3]

    @property
    def pbc(self) -> np.ndarray:
        return self.imu.Tbc[:3, 3]


def _orthonormalize(R: np.ndarray) -> np.ndarray:
    """Project to SO(3) via SVD (ConfigParam does the same through
    quaternion normalization, configparam.cc:41-68)."""
    U, _, Vt = np.linalg.svd(R)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
    return U @ S @ Vt


def config_from_yaml(*paths: str) -> SystemConfig:
    """Build a SystemConfig from one or more OpenCV YAML files (the
    reference reads camera/ORB keys and VI keys from the same EuRoC.yaml)."""
    d: dict = {}
    for p in paths:
        d.update(load_cv_yaml(p))

    cfg = SystemConfig()
    cam, orb, imu = cfg.camera, cfg.orb, cfg.imu

    def get(key, cur, cast=None):
        v = d.get(key, cur)
        return cast(v) if (cast and v is not None) else v

    cam.fx = get("Camera.fx", cam.fx, float)
    cam.fy = get("Camera.fy", cam.fy, float)
    cam.cx = get("Camera.cx", cam.cx, float)
    cam.cy = get("Camera.cy", cam.cy, float)
    cam.k1 = get("Camera.k1", cam.k1, float)
    cam.k2 = get("Camera.k2", cam.k2, float)
    cam.p1 = get("Camera.p1", cam.p1, float)
    cam.p2 = get("Camera.p2", cam.p2, float)
    cam.k3 = get("Camera.k3", cam.k3, float)
    cam.fps = get("Camera.fps", cam.fps, float)
    cam.rgb = get("Camera.RGB", cam.rgb, int)
    cam.bf = get("Camera.bf", cam.bf, float)
    cam.th_depth = get("ThDepth", cam.th_depth, float)
    cam.width = get("Camera.width", cam.width, int)
    cam.height = get("Camera.height", cam.height, int)
    cam.delay_to_imu = get("Camera.delaytoimu", cam.delay_to_imu, float)

    orb.n_features = get("ORBextractor.nFeatures", orb.n_features, int)
    orb.scale_factor = get("ORBextractor.scaleFactor", orb.scale_factor, float)
    orb.n_levels = get("ORBextractor.nLevels", orb.n_levels, int)
    orb.ini_th_fast = get("ORBextractor.iniThFAST", orb.ini_th_fast, int)
    orb.min_th_fast = get("ORBextractor.minThFAST", orb.min_th_fast, int)

    imu.rate = get("IMU.rate", imu.rate, float)
    imu.sigma_g = get("IMU.sigma_g", imu.sigma_g, float)
    imu.sigma_gw = get("IMU.sigma_gw", imu.sigma_gw, float)
    imu.sigma_a = get("IMU.sigma_a", imu.sigma_a, float)
    imu.sigma_aw = get("IMU.sigma_aw", imu.sigma_aw, float)
    imu.multiply_g = bool(get("IMU.multiplyG", imu.multiply_g, int))
    tbc = d.get("Camera.Tbc")
    if tbc is not None:
        if isinstance(tbc, dict):  # !!opencv-matrix form
            arr = np.array(tbc["data"], float).reshape(tbc["rows"], tbc["cols"])
        else:  # flat list form (the reference's EuRoC.yaml)
            arr = np.array(tbc, float).reshape(-1, 4)
        T = np.eye(4)
        T[:3] = arr[:3]
        T[:3, :3] = _orthonormalize(T[:3, :3])
        imu.Tbc = T

    cfg.running_mode = get("runningMode", cfg.running_mode, int)
    cfg.deactive_loop_closure = bool(get("deactiveLoopClosure", cfg.deactive_loop_closure, int))
    cfg.only_track_local_map = bool(get("onlyTrackLocalMap", cfg.only_track_local_map, int))
    cfg.display_time_statistic = bool(get("dispalyTimeStatistic", cfg.display_time_statistic, int))
    cfg.vision_aid_when_imu_fails = bool(
        get("visionAidWhenTrackWithIMUFail", cfg.vision_aid_when_imu_fails, int))
    cfg.wait_until_local_map_idle = bool(
        get("waitUntilLocalMapIdle", cfg.wait_until_local_map_idle, int))
    cfg.estimate_extrinsics = bool(
        get("estimateExtrinsicBetweenCameraAndIMU", cfg.estimate_extrinsics, int))
    cfg.random_matrix_first_vio_init = bool(
        get("CreateRandomMatrixLastForFirstVIOInit", cfg.random_matrix_first_vio_init, int))
    cfg.local_window_size = get("LocalMapping.LocalWindowSize", cfg.local_window_size, int)
    cfg.discard_time = get("test.DiscardTime", cfg.discard_time, float)
    cfg.vio_tmp_path = get("test.InitVIOTmpPath", cfg.vio_tmp_path, str)
    cfg.bagfile = get("bagfile", cfg.bagfile, str)
    cfg.imu_topic = get("imutopic", cfg.imu_topic, str)
    cfg.image_topic = get("imagetopic", cfg.image_topic, str)
    return cfg


def build_system(cfg: SystemConfig, sensor: str | None = None):
    """Construct the pipeline object for a config.

    sensor: "monocular" | "stereo" | "rgbd" | None (None = follow
    cfg.running_mode: 0 monocular, 1 mono-VI — System.cc:117-120).
    """
    from .map.arrays import Capacities
    from .ops import imu as imu_ops, orb as orb_ops
    from .ops.undistort import DistCoeffs
    from .pipeline.stereo_system import RgbdSystem, StereoSystem
    from .pipeline.system import MonoSystem
    from .pipeline.vi_system import ViMonoSystem
    from .solver.ba import Camera

    cam = Camera(
        fx=cfg.camera.fx, fy=cfg.camera.fy, cx=cfg.camera.cx, cy=cfg.camera.cy,
        bf=cfg.camera.bf,
    )
    cap = Capacities(
        max_kfs=cfg.max_keyframes, max_lms=cfg.max_landmarks,
        n_feat=cfg.orb.n_features,
    )
    orbp = orb_ops.OrbParams(
        n_features=cfg.orb.n_features,
        n_levels=cfg.orb.n_levels,
        scale=cfg.orb.scale_factor,
        ini_th=float(cfg.orb.ini_th_fast),
        min_th=float(cfg.orb.min_th_fast),
        height=cfg.camera.height, width=cfg.camera.width,
    )
    dist = DistCoeffs(
        k1=cfg.camera.k1, k2=cfg.camera.k2,
        p1=cfg.camera.p1, p2=cfg.camera.p2, k3=cfg.camera.k3,
    )
    kw = dict(
        cap=cap, orb_params=orbp, dist=dist,
        enable_loop_closing=not cfg.deactive_loop_closure,
        vocabulary_path=cfg.vocabulary_path or None,
        only_track_local_map=cfg.only_track_local_map,
    )
    # wait_until_local_map_idle needs no wiring: the TPU pipeline runs
    # tracking/mapping synchronously, so every run IS the serialized,
    # deterministic mode the reference's flag opts into (configparam.cc:111)
    W, H = cfg.camera.width, cfg.camera.height

    if sensor == "stereo":
        return StereoSystem(cam, W, H, th_depth=cfg.camera.th_depth, **kw)
    if sensor == "rgbd":
        return RgbdSystem(cam, W, H, th_depth=cfg.camera.th_depth, **kw)
    if sensor == "monocular" or cfg.running_mode == 0:
        return MonoSystem(cam, W, H, **kw)

    noise = imu_ops.ImuNoise.from_sigmas(
        sigma_g=cfg.imu.sigma_g, sigma_gw=cfg.imu.sigma_gw,
        sigma_a=cfg.imu.sigma_a, sigma_aw=cfg.imu.sigma_aw,
        rate_hz=cfg.imu.rate,
    )
    return ViMonoSystem(
        cam, W, H, noise=noise,
        Rbc=None if cfg.estimate_extrinsics else cfg.Rbc,
        pbc=None if cfg.estimate_extrinsics else cfg.pbc,
        estimate_extrinsics=cfg.estimate_extrinsics,
        local_window=cfg.local_window_size,
        vio_tmp_path=cfg.vio_tmp_path,
        vision_aid_when_imu_fails=cfg.vision_aid_when_imu_fails,
        random_matrix_first_vio_init=cfg.random_matrix_first_vio_init,
        **{k: v for k, v in kw.items()},
    )

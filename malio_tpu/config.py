"""Configuration for the LIO pipeline.

One dataclass covers both tiers of the reference's config system
(parameters.cpp:17-66 + the compile-time constants, SURVEY §5): every value
the reference reads from rosparam/YAML plus the padding capacities that make
shapes static for XLA. Defaults follow parameters.cpp and the City launch
overrides where noted.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class Config:
    # --- sensors ---
    num_lidars: int = 1
    lid_type: Sequence[int] = (3,)  # 1=Livox 2=Velodyne 3=Ouster
    n_scans: Sequence[int] = (128,)
    point_filter_num: Sequence[int] = (8,)
    blind: float = 0.01
    timestamp_unit: int = 0  # 0 s, 1 ms, 2 us, 3 ns (preprocess.h:16)
    time_offset_lidar_to_imu: float = 0.0

    # --- extrinsics (flattened like the YAML: 3L trans, 4L quat wxyz) ---
    extrinsic_T: Sequence[float] = (0.0, 0.0, 0.0)
    extrinsic_R: Sequence[float] = (1.0, 0.0, 0.0, 0.0)
    extrinsic_est_en: bool = True
    ext_cov_init: float = 1e-6  # initial extrinsic covariance diagonal
    # (IMU_Processing.hpp:191-192 hardcodes 1e-6). The tight prior is
    # load-bearing: it keeps early-map registration error out of the
    # extrinsics while the map bootstraps (measured: 1e-2 diverges a 5 cm
    # offset to 30 cm; 1e-6..1e-5 converge it) — raise with care

    # --- filter ---
    max_iteration: int = 4  # launch/mapping_city.launch:9 uses 3
    gyr_cov: float = 0.1
    acc_cov: float = 0.1
    b_gyr_cov: float = 0.0001
    b_acc_cov: float = 0.0001
    imu_noise_source: str = "measured"  # "measured" replicates the
    # reference quirk (Q's gyr/acc block from the IMU-init window's sample
    # variance, IMU_Processing.hpp:142-186; YAML values unused after
    # init); "config" uses gyr_cov/acc_cov above directly
    converge_limit: float = 0.001  # esekfom.hpp:162
    laser_point_cov: float = 0.001  # laserMapping.cpp:38 (LASER_POINT_COV)
    single_search: bool = False  # True: rank/fit neighbors only on the
    # first IEKF iteration. Since the round-3 candidate-cache redesign the
    # gathering k-NN runs ONCE per round regardless; re-searches are a
    # cheap cache re-rank, so this flag now saves little and costs
    # reference parity (0.133 m on the chained oracle) — keep it off.
    pallas_deskew: bool | None = None  # fused Pallas spline-deskew kernel
    # (ops/deskew_pallas.py, 1.8x vs the jnp path on a v5e). None =
    # auto: ON for f32 on a TPU backend (the flagship path), OFF
    # elsewhere (f64/CPU uses the jnp path; parity 8e-6 f32 roundoff).
    # True forces the kernel (interpret-mode off-TPU, for parity tests)
    pallas_knn: bool | None = None  # fused VMEM k-NN select/compact
    # kernel (ops/knn_pallas.py). None = auto: ON for f32 on a TPU
    # backend (the flagship path), OFF elsewhere (f64 tests, CPU dryrun
    # — where the jnp twin computes the identical selection). True
    # forces the kernel (interpret-mode off-TPU, for parity tests)

    # --- map ---
    filter_size_surf: float = 0.5
    filter_size_map: float = 0.5
    cube_len: float = 200.0  # City launch: 1000
    det_range: float = 300.0  # City yaml: 100
    mov_threshold: float = 1.5  # laserMapping.cpp:57

    # --- correspondence / weighting laws (City.yaml:41-50 defaults noted) ---
    plane_th: float = 0.1  # City launch: 0.4
    range_min: float = 0.0
    range_max: float = 1.0
    cov_threshold: float = 0.3  # City yaml: 0.5
    point_cov_max: float = 0.002
    point_cov_min: float = 0.0005
    plane_cov_max: float = 1.0
    plane_cov_min: float = 0.7
    localize_cov_max: float = 2.0
    localize_cov_min: float = 0.4
    localize_thresh_max: float = 0.8
    localize_thresh_min: float = 0.3

    # --- static capacities (TPU shapes) ---
    max_points_per_scan: int = 16384  # downsampled, per LiDAR
    max_meas_points: int | None = None  # measurement-lane compaction cap:
    # after the per-LiDAR downsample, live lanes are sort-compacted to
    # the front and the measurement model runs on the first
    # max_meas_points lanes only (k-NN, plane fits, H rows, insert all
    # shrink proportionally). ~30% of flagship lanes are padding
    # (round-4 SoL), so a 75% cap removes dead work without touching any
    # live point; live overflow beyond the cap is dropped AND counted
    # (StepOutput.n_meas_dropped). None = off (every lane kept; shapes
    # and goldens unchanged)
    max_raw_points: int = 65536  # per LiDAR before downsampling
    max_imu_per_group: int = 64  # IMU samples covering one scan group
    imu_cont_len: int = 16  # future-IMU continuation (laserMapping.cpp:380)
    traj_capacity: int = 128  # rolling IMU-rate pose history
    spline_capacity: int = 96  # control points (dt = 0.01 s)
    epoch_capacity: int = 64  # uncertainty epochs per LiDAR per scan
    map_capacity: int = 1 << 21  # voxel hash slots
    knn_radius: int = 1  # voxel neighborhood Chebyshev radius
    # escalating k-NN reach (voxel_hash.knn): queries failing the
    # reference acceptance rule (5 found, 5th d2 <= 5 — laserMapping.cpp
    # :587) under the base window re-search a ball-pruned wide window, so
    # sparse scenes (early map, tunnels, long range) keep the
    # correspondences the reference's exact tree search would find.
    # wide_radius should be >= ceil(sqrt(5)/filter_size_map); 0 disables.
    knn_wide_radius: int = 0
    knn_wide_budget: int = 0  # max escalated queries per search pass

    # --- replay / misc ---
    init_time: float = 0.1  # laserMapping.cpp:37 (INIT_TIME)
    imu_init_count: int = 10  # IMU_Processing.hpp:32 (MAX_INI_COUNT)
    sync_lookahead: float = 0.2  # laserMapping.cpp:313
    gravity: float = 9.81

    def __post_init__(self):
        L = self.num_lidars
        assert len(self.lid_type) == L
        assert len(self.extrinsic_T) == 3 * L
        assert len(self.extrinsic_R) == 4 * L


def city_config(**overrides) -> Config:
    """3-LiDAR City dataset configuration (config/City.yaml:1-50 +
    launch/mapping_city.launch:9-15)."""
    base = dict(
        num_lidars=3,
        lid_type=(3, 1, 1),
        n_scans=(128, 8, 8),
        point_filter_num=(8, 4, 4),
        blind=0.0,
        timestamp_unit=0,
        acc_cov=0.011197412605492375,
        gyr_cov=0.010270904839480961,
        b_acc_cov=0.00011751767903346351,
        b_gyr_cov=0.000091355383994881894,
        det_range=100.0,
        extrinsic_T=(0.215, 0.0, 0.018, -1.2574, 0.413, 0.0324, -1.306, -0.361, 0.042),
        extrinsic_R=(
            1, 0, 0, 0,
            0.6965018, -0.0037329, -0.0038405, 0.717535,
            0.0074645, 0.0000044, -0.0005919, -0.999972,
        ),
        max_iteration=3,
        filter_size_surf=0.5,
        filter_size_map=0.5,
        cube_len=1000.0,
        plane_th=0.4,
        cov_threshold=0.5,
        point_cov_max=0.00125,
        point_cov_min=0.00075,
        plane_cov_max=1.0,
        plane_cov_min=0.8,
        localize_cov_max=2.0,
        localize_cov_min=0.3,
        localize_thresh_max=0.7,
        localize_thresh_min=0.2,
        # reference-reach k-NN: ceil(sqrt(5)/0.5) = 5 voxels
        knn_wide_radius=5,
        knn_wide_budget=1024,
    )
    base.update(overrides)
    return Config(**base)


def city_ouster_config(**overrides) -> Config:
    """Single-Ouster subset of the City rig (BASELINE config 1: the
    CPU-runnable minimum slice)."""
    base = city_config().__dict__ | dict(
        num_lidars=1,
        lid_type=(3,),
        n_scans=(128,),
        point_filter_num=(8,),
        extrinsic_T=(0.215, 0.0, 0.018),
        extrinsic_R=(1.0, 0, 0, 0),
    )
    base.update(overrides)
    return Config(**base)


def urbannav_config(**overrides) -> Config:
    """2-LiDAR UrbanNav configuration (config/UrbanNav.yaml:1-48 plus the
    launch overrides, launch/mapping_urban.launch:9-15 — identical to the
    City launch: max_iteration=3, cube 1000, plane_th 0.4, filter 0.5;
    the parameters.cpp defaults (4 / 200 / 0.1) are never what runs)."""
    base = dict(
        max_iteration=3,
        cube_len=1000.0,
        plane_th=0.4,
        filter_size_surf=0.5,
        filter_size_map=0.5,
        num_lidars=2,
        lid_type=(2, 2),
        n_scans=(32, 16),
        point_filter_num=(4, 4),
        blind=0.0,
        timestamp_unit=0,
        acc_cov=0.011197412605492375,
        gyr_cov=0.010270904839480961,
        b_acc_cov=0.00011751767903346351,
        b_gyr_cov=0.000091355383994881894,
        det_range=100.0,
        extrinsic_T=(0.0, 0.0, 0.28, 0.3237, -0.0012, 0.0791),
        extrinsic_R=(1, 0, 0, 0, 0.8849, 0.0027, 0.4654, -0.0182),
        cov_threshold=0.5,
        point_cov_max=0.00125,
        point_cov_min=0.00075,
        plane_cov_max=1.0,
        plane_cov_min=0.8,
        localize_cov_max=2.0,
        localize_cov_min=0.3,
        localize_thresh_max=0.7,
        localize_thresh_min=0.2,
        max_imu_per_group=128,  # 400 Hz IMU
        traj_capacity=256,
        knn_wide_radius=5,
        knn_wide_budget=1024,
    )
    base.update(overrides)
    return Config(**base)

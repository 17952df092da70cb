"""NumPy transliteration of h_share_model (src/laserMapping.cpp:552-760)
and esti_plane (include/common_lib.h:144-190), relative /root/reference/MA_LIO.

Independent oracle: shares no code with malio_tpu.measurement. The k-NN is
an INPUT (nearest_points / nearest_covs / nearest_d2): correspondence
search is the map's job and is oracled separately (tests/test_map.py
brute-force); this isolates the measurement math.

Index conventions follow the reference verbatim: lid_idx is the
sorted-by-end-time index (0 = base LiDAR), points carry
  intensity = lid_idx, normal_x = epoch index,
and extrinsic slot num corresponds to sorted position num.
"""
import numpy as np

from .ref_uncertainty import eval_point_uncertainty

NUM_MATCH_POINTS = 5  # common_lib.h:22


def esti_plane(points5, covs5, threshold, cov_threshold):
    """common_lib.h:144-190. Returns (ok, pabcd(4,), plane_cov)."""
    A = np.asarray(points5, float)
    b = -np.ones(NUM_MATCH_POINTS)
    W = np.asarray(covs5, float)
    cov_sum = np.sum(np.abs(cov_threshold - W))
    plane_cov = 0.0
    if W[0] > 0.00001:
        plane_cov = float(
            np.sum(((cov_threshold - W) / cov_sum) ** 2 * W)
        )
    normvec, *_ = np.linalg.lstsq(A, b, rcond=None)  # colPivHouseholderQr
    n = np.linalg.norm(normvec)
    pabcd = np.array([normvec[0] / n, normvec[1] / n, normvec[2] / n, 1.0 / n])
    resid = A @ pabcd[:3] + pabcd[3]
    if np.any(np.abs(resid) > threshold):
        return False, pabcd, plane_cov
    return True, pabcd, plane_cov


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0.0]])


def _qrot(q, v):
    uv = 2.0 * np.cross(q[1:], v)
    return v + q[0] * uv + np.cross(q[1:], uv)


def _qinv_rot(q, v):
    return _qrot(np.array([q[0], -q[1], -q[2], -q[3]]), v)


def h_share_model(
    s,
    pts_body,
    pt_lid,
    pt_epoch,
    nearest_points,
    nearest_covs,
    nearest_d2,
    nearest_cnt,
    point_selected_surf,
    temporal_comp,
    pose_unc,
    cfg,
    converge=True,
    search_fn=None,
):
    """One call of h_share_model. ``s`` is a RefState; pts_body (N,3) are
    deskewed own-LiDAR-frame points, pt_lid the sorted lid_idx (0 = base),
    pt_epoch the per-point epoch (normal_x). nearest_* provide the k-NN
    result for this round (converge path). point_selected_surf (N,) bool is
    carried across iterations and MUTATED like the reference's global.

    With ``search_fn`` (the chained-oracle mode), the k-NN is performed
    HERE like the reference's ikdtree.Nearest_Search call
    (laserMapping.cpp:585): search_fn(p_global) -> (records (n,4)
    [x,y,z,normal_y], d2 (n,)), and the caller-provided nearest_* LISTS
    are mutated in place — they play the role of the reference's
    Nearest_Points global (persist across IEKF iterations; consumed by
    map_incremental afterwards).

    Returns dict(valid, h_x (E, 6(1+L)), h (E,), R (E,), eff_idx,
    point_selected_surf, normal_y (N,)) where E = effct_feat_num.
    """
    N = pts_body.shape[0]
    L = s.L
    ext_q = [s.ext_r[l] for l in range(L)]
    ext_t = [s.ext_t[l] for l in range(L)]

    normvec = np.zeros((N, 4))  # xyz + intensity(=pd2)
    cov_plane = np.zeros(N)
    res_last = np.zeros(N)
    p_body_store = np.zeros((N, 3))

    for i in range(N):
        p_body = pts_body[i].copy()
        lid_idx = int(pt_lid[i])
        if lid_idx != 0:
            tc = temporal_comp[lid_idx - 1]
            p_body = _qinv_rot(
                ext_q[0],
                (_qrot(tc.q, _qrot(ext_q[lid_idx], p_body) + ext_t[lid_idx]) + tc.t)
                - ext_t[0],
            )
        p_body_store[i] = p_body
        p_global = _qrot(s.rot, _qrot(ext_q[0], p_body) + ext_t[0]) + s.pos

        if converge:
            if search_fn is not None:
                recs, d2 = search_fn(p_global)
                nearest_points[i] = recs[:, :3]
                nearest_covs[i] = recs[:, 3]
                nearest_d2[i] = d2
                nearest_cnt[i] = len(recs)
            point_selected_surf[i] = not (
                nearest_cnt[i] < NUM_MATCH_POINTS
                or nearest_d2[i][NUM_MATCH_POINTS - 1] > 5
            )
        if not point_selected_surf[i]:
            continue

        point_selected_surf[i] = False
        ok, pabcd, unit_cov = esti_plane(
            nearest_points[i], nearest_covs[i], cfg.plane_th, cfg.cov_threshold
        )
        if ok:
            pd2 = float(pabcd[:3] @ p_global + pabcd[3])
            score = 1 - 0.9 * abs(pd2) / np.sqrt(np.linalg.norm(p_body))
            if score > 0.1:
                point_selected_surf[i] = True
                normvec[i, :3] = pabcd[:3]
                normvec[i, 3] = pd2
                cov_plane[i] = unit_cov
                res_last[i] = abs(pd2)

    eff_idx = [i for i in range(N) if point_selected_surf[i]]
    effct = len(eff_idx)
    if effct < 1:
        return dict(valid=False, point_selected_surf=point_selected_surf)
    cov_eff = cov_plane[eff_idx].copy()
    max_unit_cov = cov_eff.max() if effct else 0.0
    min_unit_cov = cov_eff.min() if effct else 1000.0

    act = 6 * (1 + L)
    h_x = np.zeros((effct, act))
    h = np.zeros(effct)
    R = np.zeros(effct)
    normal_y = np.zeros(N)

    max_cov, min_cov = 0.0, 9999.0
    for k, i in enumerate(eff_idx):
        # plane weighting law (laserMapping.cpp:649-656)
        if cov_eff[k] == 0:
            cov_eff[k] = 1.0
        elif max_unit_cov == min_unit_cov:
            cov_eff[k] = (cfg.plane_cov_max + cfg.plane_cov_min) / 2
        else:
            cov_eff[k] = 1.0 / (
                (cfg.plane_cov_max - cfg.plane_cov_min)
                * (cov_eff[k] - min_unit_cov)
                / (max_unit_cov - min_unit_cov)
                + cfg.plane_cov_min
            )

        lid_idx = int(pt_lid[i])
        point_this_be = p_body_store[i]
        point_be_crossmat = _skew(point_this_be)
        point_this = _qrot(ext_q[0], point_this_be) + ext_t[0]
        point_crossmat = _skew(point_this)

        norm_vec = normvec[i, :3]
        C = _qinv_rot(s.rot, norm_vec)
        A = point_crossmat @ C
        h_x[k, 0:3] = norm_vec
        h_x[k, 3:6] = A
        if cfg.extrinsic_est_en:
            if lid_idx == 0:
                B = point_be_crossmat @ _qinv_rot(ext_q[0], C)
            else:
                point_ori = pts_body[i]
                point_be_crossmat = _skew(point_ori)
                C = _qinv_rot(temporal_comp[lid_idx - 1].q, C)
                B = point_be_crossmat @ _qinv_rot(ext_q[lid_idx], C)
            h_x[k, 6 + 3 * lid_idx : 9 + 3 * lid_idx] = B
            h_x[k, 6 + 3 * (L + lid_idx) : 9 + 3 * (L + lid_idx)] = C
            uncertain = int(pt_epoch[i])
            if uncertain >= len(pose_unc[lid_idx]):
                uncertain = len(pose_unc[lid_idx]) - 2
            cov3 = eval_point_uncertainty(pts_body[i], pose_unc[lid_idx][uncertain])
            R[k] = np.trace(cov3)
            normal_y[i] = R[k]
            max_cov = max(max_cov, R[k])
            min_cov = min(min_cov, R[k])
        h[k] = -normvec[i, 3]

    # FIC weighting (laserMapping.cpp:710-722)
    for k in range(effct):
        h_x[k, : 6 * (L + 1)] *= cov_eff[k]
        h[k] *= cov_eff[k]
        if R[k] < min_cov + (max_cov - min_cov) * cfg.range_min:
            R[k] = cfg.point_cov_min
        elif R[k] > min_cov + (max_cov - min_cov) * cfg.range_max:
            R[k] = cfg.point_cov_max
        else:
            R[k] = (cfg.point_cov_max - cfg.point_cov_min) * (
                R[k] - (min_cov + (max_cov - min_cov) * cfg.range_min)
            ) / ((cfg.range_max - cfg.range_min) * (max_cov - min_cov)) + cfg.point_cov_min

    # non-planar point uncertainty (laserMapping.cpp:727-742)
    for i in range(N):
        if not point_selected_surf[i]:
            imu_idx = int(pt_epoch[i])
            which = int(pt_lid[i])
            if imu_idx >= len(pose_unc[which]) - 1:
                imu_idx = len(pose_unc[which]) - 2
            cov3 = eval_point_uncertainty(pts_body[i], pose_unc[which][imu_idx])
            normal_y[i] = np.trace(cov3)

    # localization weight (laserMapping.cpp:744-759)
    svd_mat = h_x[:, :3]
    sv = np.linalg.svd(svd_mat, compute_uv=False)
    weight = sv[2] / sv[0]
    if weight > cfg.localize_thresh_max:
        weight = cfg.localize_cov_max
    elif weight < cfg.localize_thresh_min:
        weight = cfg.localize_cov_min
    else:
        weight = (cfg.localize_cov_max - cfg.localize_cov_min) * (
            weight - cfg.localize_thresh_min
        ) / (cfg.localize_thresh_max - cfg.localize_thresh_min) + cfg.localize_cov_min
    h_x *= weight
    h *= weight

    return dict(
        valid=True,
        h_x=h_x,
        h=h,
        R=R,
        eff_idx=eff_idx,
        point_selected_surf=point_selected_surf,
        normal_y=normal_y,
        weight=weight,
    )

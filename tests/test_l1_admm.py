import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScR

from panovlm_tpu.solver import l1_admm
from panovlm_tpu.models import rotation_averaging as ra


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_solve_l1_dense_matches_lp(rng):
    # min ||Ax-b||_1 is an LP; compare the ADMM objective to HiGHS
    from scipy.optimize import linprog
    m, n = 60, 8
    A = rng.normal(size=(m, n))
    x_gt = rng.normal(size=n)
    b = A @ x_gt + rng.normal(scale=0.01, size=m)
    b[:6] += 5.0  # gross outliers the L1 objective should shrug off
    x = np.asarray(l1_admm.solve_l1_dense(A, b))
    obj = np.abs(A @ x - b).sum()
    # LP: min 1'y s.t. -y <= Ax - b <= y
    c = np.concatenate([np.zeros(n), np.ones(m)])
    A_ub = np.block([[A, -np.eye(m)], [-A, -np.eye(m)]])
    b_ub = np.concatenate([b, -b])
    res = linprog(c, A_ub=A_ub, b_ub=b_ub, bounds=[(None, None)] * (n + m))
    assert res.success
    assert obj <= res.fun * 1.02 + 1e-3, (obj, res.fun)
    # and the estimate is close to ground truth despite outliers
    assert np.abs(x - x_gt).max() < 0.05


def _pose_graph(rng, n=14, rot_noise=0.01, n_outliers=3):
    aa_gt = rng.normal(scale=0.6, size=(n, 3))
    R = ScR.from_rotvec(aa_gt).as_matrix()
    pi, pj, rel = [], [], []
    for gap in (1, 2, 5):
        for i in range(n - gap):
            j = i + gap
            R_ji = R[j] @ R[i].T
            noise = ScR.from_rotvec(rng.normal(scale=rot_noise, size=3))
            pi.append(i); pj.append(j)
            rel.append((noise.as_matrix() @ R_ji))
    pi, pj = np.array(pi), np.array(pj)
    rel = ScR.from_matrix(np.stack(rel)).as_rotvec()
    # gross outliers on loop-closure edges (gap > 3: outside the X84
    # temporal-connectivity exemption)
    bad = rng.choice(np.where(pj - pi > 3)[0], size=n_outliers, replace=False)
    rel[bad] += rng.normal(scale=1.5, size=(n_outliers, 3))
    return aa_gt, R, pi, pj, rel


def _align_err(aa_est, R_gt):
    # the gauge is a RIGHT factor on world->cam rotations: R_iw -> R_iw S
    R_est = ScR.from_rotvec(aa_est).as_matrix()
    S = R_gt[0].T @ R_est[0]
    R_al = np.einsum("nij,kj->nik", R_est, S)            # R_est S^T
    return np.linalg.norm(ScR.from_matrix(
        np.einsum("nij,nkj->nik", R_al, R_gt)).as_rotvec(), axis=1)


def test_refine_l1_irls_rejects_outliers(rng):
    aa_gt, R, pi, pj, rel = _pose_graph(rng)
    aa0, valid = ra.spanning_tree_init(len(aa_gt), pi, pj, rel)
    assert valid.all()
    aa = l1_admm.rotation_refine_l1_irls(len(aa_gt), pi, pj, rel, aa0,
                                         start_idx=0, weight_function=1)
    err = _align_err(aa, R)
    # 3 gross loop-closure outliers: tree init sits at ~0.065 rad; the
    # L1+IRLS refine alone (no X84 pass) must improve it meaningfully
    assert err.max() < 0.05, err.max()
    assert err.max() < 0.75 * _align_err(aa0, R).max()
    # gauge camera stays identity before re-alignment
    R_est = ScR.from_rotvec(aa).as_matrix()
    assert np.abs(R_est[0] - np.eye(3)).max() < 1e-5


def test_refine_l1_irls_geman_mcclure(rng):
    aa_gt, R, pi, pj, rel = _pose_graph(rng, n_outliers=2)
    aa0, _ = ra.spanning_tree_init(len(aa_gt), pi, pj, rel)
    aa = l1_admm.rotation_refine_l1_irls(len(aa_gt), pi, pj, rel, aa0,
                                         start_idx=0, weight_function=2)
    assert _align_err(aa, R).max() < 0.04


def test_rotation_averaging_l1_exact_vs_lm(rng):
    aa_gt, R, pi, pj, rel = _pose_graph(rng, n_outliers=2)
    aa_e, _, _ = ra.rotation_averaging_l1(len(aa_gt), pi, pj, rel, exact=True)
    aa_l, _, _ = ra.rotation_averaging_l1(len(aa_gt), pi, pj, rel,
                                          exact=False)
    assert _align_err(aa_e, R).max() < 0.03
    assert _align_err(aa_l, R).max() < 0.04

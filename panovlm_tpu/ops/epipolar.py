"""Essential-matrix estimation on unit-sphere bearings — batched RANSAC.

Replaces base/EssentialMatrix.{h,cpp} + base/ACRansac_NFA.{h,cpp}
(reference). Semantics parity:

  * 8-point solve on bearing vectors via the smallest eigenvector of A^T A,
    rank-2 projection by SVD (ComputeEssential, EssentialMatrix.cpp:9-40);
  * AC-RANSAC residual = asin(p2 . normalize(E p1))^2
    (FindEssentialACRANSAC, :219-230);
  * NFA(k) = log10(n-8) + (log10(0.5) + 0.25 log10(e_k)) (k-8)
             + log10 C(n,k) + log10 C(k,8), minimized over k on the sorted
    residuals (ACRansac_NFA.cpp:104-135, constants :16-22);
  * decomposition into 4 (R, t) candidates (DecomposeEssential, :158-186);
  * cheirality/selection by triangulating inliers and counting points whose
    reprojection angles are <= 3 deg in both views, parallax = the 50th
    largest (SfM::CheckRT, sfm/SfM.cpp:1478-1547).

TPU-first divergence: the reference's RANSAC is a sequential adaptive loop
(re-sampling from the running inlier set, early exit); here ALL hypotheses
are drawn up front and scored as one batched program (hypothesis axis x
match axis), the best by NFA wins, and E is re-fit on its inliers — the
standard batched-RANSAC formulation for SIMD hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import se3

MIN_SAMPLE = 8


def eight_point(b1, b2):
    """Essential matrix from a MINIMAL 8-pair sample (..., 8, 3) with
    p2^T E p1 = 0 (use eight_point_masked for overdetermined refits — the
    QR null-space trick below is exact only for the square-deficient case).

    The reference solves the smallest eigenvector of A^T A
    (EssentialMatrix.cpp:25-27); in float32 that squares the conditioning and
    is too inaccurate for minimal 8-row systems, so we take the exact null
    vector of A itself — via complete QR of A^T (the last Householder basis
    column spans the null space). QR is 8 unrollable reflections where the
    batched tiny SVD is a deep iterative chain: the hypothesis stage of
    AC-RANSAC (300 x 8x9 per pair) was SVD-latency bound on the v5e (the
    8pt+residual stage measured 263 of acransac's 272 ms per 32-pair batch,
    vs 34 ms for the NFA sorts; swapping svd -> qr cut the full
    relative-pose program 160 -> 76 ms/pair). Null vectors agree with the
    SVD's to 1e-7, residuals equal or better. Returns (..., 3, 3)."""
    # coefficient of E_ij (row-major) is p2_i * p1_j
    A = (b2[..., :, :, None] * b1[..., :, None, :]).reshape(*b1.shape[:-2], -1, 9)
    Q, _ = jnp.linalg.qr(jnp.swapaxes(A, -1, -2), mode="complete")
    e = Q[..., :, 8]
    E0 = e.reshape(*e.shape[:-1], 3, 3)
    U, s, Vt3 = jnp.linalg.svd(E0)
    s2 = s.at[..., 2].set(0.0)
    return se3.matmul(U * s2[..., None, :], Vt3)


def eight_point_masked(b1, b2, w):
    """Weighted/masked variant: w (..., M) zero rows drop out of A^T A."""
    A = (b2[..., :, :, None] * b1[..., :, None, :]).reshape(*b1.shape[:-2], -1, 9)
    A = A * w[..., :, None]
    AtA = se3.einsum("...mi,...mj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    e = vecs[..., :, 0]
    E0 = e.reshape(*e.shape[:-1], 3, 3)
    U, s, Vt = jnp.linalg.svd(E0)
    s2 = s.at[..., 2].set(0.0)
    return se3.matmul(U * s2[..., None, :], Vt)


def epipolar_residuals(E, b1, b2):
    """asin^2 of the angle between b2 and the epipolar plane of b1.
    E (...,3,3), b1/b2 (...,M,3) -> (...,M)."""
    ep2 = se3.einsum("...ij,...mj->...mi", E, b1)
    ep2 = ep2 / (jnp.linalg.norm(ep2, axis=-1, keepdims=True) + 1e-12)
    s = jnp.sum(ep2 * b2, axis=-1)
    return jnp.arcsin(jnp.clip(s, -1.0, 1.0)) ** 2


def _log10_binom(n, k):
    """log10 C(n, k) elementwise (gammaln-based)."""
    from jax.scipy.special import gammaln
    ln10 = jnp.log(10.0)
    return (gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(n - k + 1.0)) / ln10


def acransac_nfa(residuals, mask, max_threshold=jnp.inf):
    """A-contrario NFA over sorted residuals (ACRansac_NFA::ComputeNFA exact
    path). residuals (M,), mask (M,). Returns (nfa, err_threshold, ok):
    the best NFA value, its residual threshold, and whether a meaningful
    model was found (NFA < 0 with > 8 supporting matches)."""
    M = residuals.shape[0]
    n_valid = jnp.sum(mask)
    r = jnp.where(mask, residuals, jnp.inf)
    r_sorted = jnp.sort(r)
    ks = jnp.arange(1, M + 1, dtype=r.dtype)  # k = rank (1-based)
    log_e0 = jnp.log10(jnp.maximum(n_valid.astype(r.dtype) - MIN_SAMPLE, 1.0))
    log_alpha0 = jnp.log10(0.5)
    mult_error = 0.25
    eps = jnp.float32(1.2e-7)
    log_alpha = log_alpha0 + mult_error * jnp.log10(r_sorted + eps)
    nfa_k = (log_e0 + log_alpha * (ks - MIN_SAMPLE)
             + _log10_binom(n_valid.astype(r.dtype), ks)
             + _log10_binom(ks, float(MIN_SAMPLE)))
    valid_k = (ks > MIN_SAMPLE) & (ks <= n_valid) & (r_sorted <= max_threshold) \
        & jnp.isfinite(r_sorted)
    nfa_k = jnp.where(valid_k, nfa_k, jnp.inf)
    best = jnp.argmin(nfa_k)
    nfa = nfa_k[best]
    err = r_sorted[best]
    ok = (nfa < 0) & ((best + 1) > MIN_SAMPLE)
    return nfa, err, ok


def decompose_essential(E):
    """E -> 4 candidate (R_21, t_21): (4,3,3), (4,3)."""
    U, _, Vt = jnp.linalg.svd(E)
    t = U[..., :, 2]
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
    W = jnp.array([[0.0, -1.0, 0], [1.0, 0, 0], [0, 0, 1.0]], E.dtype)
    R1 = se3.matmul(se3.matmul(U, W), Vt)
    R2 = se3.matmul(se3.matmul(U, W.T), Vt)
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))[..., None, None]
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))[..., None, None]
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def triangulate_two_view(R_21, t_21, b1, b2):
    """Midpoint triangulation for bearing vectors (sfm/Triangulate.cpp:8-28
    semantics): point expressed in frame 1. b1/b2 (..., 3) or (..., M, 3)."""
    # rays: x = s1 * b1 (frame 1);  x = R_12 (s2 * b2) + c2, c2 = -R_21^T t_21
    R_12 = jnp.swapaxes(R_21, -1, -2)
    d1 = b1
    d2 = se3.einsum("...ij,...mj->...mi", R_12, b2) if b2.ndim > R_21.ndim - 1 \
        else R_12 @ b2
    c2 = -se3.einsum("...ij,...j->...i", R_12, t_21)
    if b1.ndim > R_21.ndim - 1:
        c2 = c2[..., None, :]
    # closed-form midpoint: solve [d1 -d2][s1 s2]^T ~ c2
    a11 = jnp.sum(d1 * d1, axis=-1)
    a12 = -jnp.sum(d1 * d2, axis=-1)
    a22 = jnp.sum(d2 * d2, axis=-1)
    r1 = jnp.sum(d1 * c2, axis=-1)
    r2 = -jnp.sum(d2 * c2, axis=-1)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s1 = (a22 * r1 - a12 * r2) / det
    s2 = (a11 * r2 - a12 * r1) / det
    p1 = s1[..., None] * d1
    p2 = c2 + s2[..., None] * d2
    return 0.5 * (p1 + p2)


def check_rt(R_21, t_21, b1, b2, mask, reproj_angle_deg: float = 3.0):
    """SfM::CheckRT (sfm/SfM.cpp:1478-1547): triangulate matches, keep those
    with finite points and reprojection angles <= 3 deg in both views.

    Returns dict: n_good, good (M,) bool, points (M,3) in frame 1,
    parallax_deg (the 50th-largest parallax like the reference)."""
    pts = triangulate_two_view(R_21, t_21, b1, b2)
    finite = jnp.all(jnp.isfinite(pts), axis=-1)
    c2 = -se3.einsum("ij,j->i", jnp.swapaxes(R_21, -1, -2), t_21)
    n1 = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-12)
    v2 = pts - c2[None, :]
    n2 = v2 / (jnp.linalg.norm(v2, axis=-1, keepdims=True) + 1e-12)
    cos_par = jnp.sum(n1 * n2, axis=-1)
    ang1 = jnp.degrees(jnp.arccos(jnp.clip(
        jnp.sum(n1 * b1, axis=-1), -1.0, 1.0)))
    p_in_2 = se3.einsum("ij,mj->mi", R_21, pts) + t_21
    p_in_2n = p_in_2 / (jnp.linalg.norm(p_in_2, axis=-1, keepdims=True) + 1e-12)
    ang2 = jnp.degrees(jnp.arccos(jnp.clip(
        jnp.sum(p_in_2n * b2, axis=-1), -1.0, 1.0)))
    good = mask & finite & (ang1 <= reproj_angle_deg) & (ang2 <= reproj_angle_deg)
    n_good = jnp.sum(good)
    # parallax: 50th largest (sort cos ascending; reference takes index
    # min(50, n)-1 of ascending cos = 50th largest angle)
    cos_sorted = jnp.sort(jnp.where(good, cos_par, jnp.inf))
    idx = jnp.minimum(50, jnp.maximum(n_good, 1)) - 1
    par = jnp.degrees(jnp.arccos(jnp.clip(cos_sorted[idx], -1.0, 1.0)))
    par = jnp.where(n_good > 0, par, 0.0)
    return {"n_good": n_good, "good": good, "points": pts, "parallax_deg": par}


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def find_essential_acransac(b1, b2, mask, n_hyp: int = 300, seed: int = 0,
                            max_threshold=jnp.inf, fold=None):
    """Batched AC-RANSAC essential estimation.

    b1, b2: (M, 3) unit bearings; mask (M,). fold: optional traced int32
    folded into the rng so every caller (e.g. each image pair in a vmapped
    batch) gets independent hypothesis draws. Returns dict with E (3,3),
    inliers (M,), nfa, err_threshold, ok.
    """
    M = b1.shape[0]
    key = jax.random.PRNGKey(seed)
    if fold is not None:
        key = jax.random.fold_in(key, fold)
    # sample hypothesis index sets from valid matches: draw uniform ints and
    # map through the valid-index list (duplicates possible, degenerate
    # hypotheses simply score badly)
    valid_idx = jnp.argsort(~mask)  # valid first
    n_valid = jnp.sum(mask)
    draws = jax.random.randint(key, (n_hyp, MIN_SAMPLE), 0, jnp.maximum(n_valid, 1))
    samples = valid_idx[draws]
    E_h = eight_point(b1[samples], b2[samples])          # (H, 3, 3)
    res = epipolar_residuals(E_h, b1[None, :, :], b2[None, :, :])  # (H, M)
    nfa, err, ok = jax.vmap(lambda r: acransac_nfa(r, mask, max_threshold))(res)
    nfa = jnp.where(ok, nfa, jnp.inf)
    best = jnp.argmin(nfa)
    inliers = (res[best] < err[best]) & mask
    # refit on the inliers (FindEssentialRANSAC final refit, :84-96)
    E = eight_point_masked(b1, b2, inliers.astype(b1.dtype))
    return {"E": E, "inliers": inliers, "nfa": nfa[best],
            "err_threshold": err[best], "ok": ok[best] & jnp.isfinite(nfa[best])}


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def find_essential_ransac(b1, b2, mask, inlier_threshold_deg: float = 2.0,
                          n_hyp: int = 200, seed: int = 0):
    """Plain RANSAC with the reference's cosine scoring (FindEssentialRANSAC
    + ScoreEssential, EssentialMatrix.cpp:43-154): symmetric test that both
    bearings lie within (90 - thr) deg of the other view's epipolar plane;
    score = sum of |cos| over inliers; best-score hypothesis wins, refit on
    its inliers."""
    M = b1.shape[0]
    key = jax.random.PRNGKey(seed)
    valid_idx = jnp.argsort(~mask)
    n_valid = jnp.sum(mask)
    draws = jax.random.randint(key, (n_hyp, MIN_SAMPLE), 0,
                               jnp.maximum(n_valid, 1))
    samples = valid_idx[draws]
    E_h = eight_point(b1[samples], b2[samples])
    cos_thr = jnp.cos(jnp.radians(90.0 - inlier_threshold_deg))

    def cos_err(E, a, b):
        ep = se3.einsum("hij,mj->hmi", E, a)
        ep = ep / (jnp.linalg.norm(ep, axis=-1, keepdims=True) + 1e-12)
        return jnp.abs(jnp.sum(ep * b[None], axis=-1))

    e21 = cos_err(E_h, b1, b2)
    e12 = cos_err(jnp.swapaxes(E_h, -1, -2), b2, b1)
    inl = (e21 <= cos_thr) & (e12 <= cos_thr) & mask[None]
    score = jnp.sum(jnp.where(inl, e21 + e12, 0.0), axis=1)
    # NOTE: the reference accumulates the raw cosines as score
    # (EssentialMatrix.cpp:131 — "would 1 - error be better?"); inlier COUNT
    # is the robust choice and is what we rank by.
    count = jnp.sum(inl, axis=1)
    best = jnp.argmax(count)
    inliers = inl[best]
    E = eight_point_masked(b1, b2, inliers.astype(b1.dtype))
    return {"E": E, "inliers": inliers, "n_inliers": count[best],
            "ok": count[best] >= MIN_SAMPLE}


def best_pose_from_essential(E, b1, b2, inliers):
    """DecomposeEssential + CheckRT best-of-4 (SfM.cpp:298-480 relative-pose
    step). Returns dict: R_21, t_21, n_good, good mask, points, parallax."""
    Rs, ts = decompose_essential(E)
    outs = jax.vmap(lambda R, t: check_rt(R, t, b1, b2, inliers))(Rs, ts)
    best = jnp.argmax(outs["n_good"])
    take = lambda x: x[best]
    return {"R_21": Rs[best], "t_21": ts[best],
            "n_good": take(outs["n_good"]), "good": take(outs["good"]),
            "points": take(outs["points"]),
            "parallax_deg": take(outs["parallax_deg"])}

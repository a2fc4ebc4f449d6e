"""3D line-segment extraction from LiDAR edge points.

Replaces sensors/LidarLineExtraction.{h,cpp} (reference): the reference grows
segments point-by-point from seed triples with a kd-tree (ExpandLine,
LidarLineExtraction.cpp:300-389), fuses near-collinear segments (<=3 deg,
:182-249) and filters by length (>0.3 m, :254-273) and scan-line spread
(>=3 distinct rings and >= half the points, :275-295).

TPU redesign: sequential greedy RANSAC — each round scores a batch of
two-point line hypotheses against all remaining edge points at once (a
(H, P) distance matrix, one fused kernel), refines the best with a PCA fit,
keeps the longest contiguous run along the line (gap <= 0.5 m, making the
infinite RANSAC line a *segment* like the reference's grown lines), applies
the reference's acceptance rules, and removes the claimed points. Lines come
out in decreasing support order, which also subsumes the reference's fusion
step (collinear fragments are claimed by one hypothesis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import geometry

MAX_LINES = 64
N_HYPOTHESES = 128
INLIER_DIST = 0.05      # reference FormLine tolerance (ExpandLine usage)
GAP = 0.5               # max along-line gap inside one segment
MIN_POINTS = 5          # LidarLineExtraction.cpp:70
MIN_LENGTH = 0.3        # FilterLineByLength threshold (:256)
MIN_ROWS = 3            # FilterLineByScan (:289)


@functools.partial(jax.jit, static_argnames=("max_lines", "n_hyp"))
def extract_lines(pts, mask, rows, max_lines: int = MAX_LINES,
                  n_hyp: int = N_HYPOTHESES, seed: int = 0):
    """Extract up to max_lines 3D segments from masked edge points.

    Args:
      pts: (P, 3) edge points (padded).
      mask: (P,) validity.
      rows: (P,) scan ring of each point (-1 invalid).

    Returns dict:
      points (L,3) point on line, dirs (L,3), endpoints (L,2,3),
      mask (L,), point_label (P,) index of owning line or -1.
    """
    P = pts.shape[0]
    key0 = jax.random.PRNGKey(seed)

    # KNN table for hypothesis seeding (the reference seeds from kd-tree
    # neighbor triples, LidarLineExtraction.cpp:15-53): a pair of *nearby*
    # edge points is far more likely to lie on one physical edge than a
    # random pair.
    d2_all = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    d2_all = jnp.where(mask[None, :] & mask[:, None], d2_all, jnp.inf)
    d2_all = d2_all + jnp.where(jnp.eye(P, dtype=bool), jnp.inf, 0.0)
    K_NN = 8
    _, knn = jax.lax.top_k(-d2_all, K_NN)  # (P, K) nearest neighbors

    def line_round(l, state):
        remaining, labels, line_pts, line_dirs, line_ends, line_mask = state
        key = jax.random.fold_in(key0, l)
        k1, k2 = jax.random.split(key)
        # hypothesis pair = (random point, one of its K nearest neighbors)
        ia = jax.random.randint(k1, (n_hyp,), 0, P)
        kb = jax.random.randint(k2, (n_hyp,), 0, K_NN)
        ib = knn[ia, kb]
        pa, pb = pts[ia], pts[ib]
        ok_h = remaining[ia] & remaining[ib] & (jnp.linalg.norm(pb - pa, axis=1) > 0.02)
        d = pb - pa
        d = d / (jnp.linalg.norm(d, axis=1, keepdims=True) + 1e-12)
        # (H, P) point-line distances
        diff = pts[None, :, :] - pa[:, None, :]
        proj = jnp.einsum("hpk,hk->hp", diff, d)
        perp = diff - proj[..., None] * d[:, None, :]
        dist = jnp.linalg.norm(perp, axis=-1)
        inl = (dist < INLIER_DIST) & remaining[None, :]
        score = jnp.sum(inl, axis=1) * ok_h
        best = jnp.argmax(score)

        # refine with PCA on best inliers (one reweighted round)
        m0 = inl[best]
        fit = geometry.fit_line_pca(pts, m0)
        c, u = fit["point"], fit["dir"]
        dist2 = geometry.point_to_line_distance(pts, c[None, :], u[None, :])
        m1 = (dist2 < INLIER_DIST) & remaining
        fit = geometry.fit_line_pca(pts, m1)
        c, u = fit["point"], fit["dir"]

        # longest contiguous run along the line (gap <= GAP)
        t = jnp.einsum("pk,k->p", pts - c[None, :], u)
        t_masked = jnp.where(m1, t, jnp.inf)
        order = jnp.argsort(t_masked)
        ts = t_masked[order]
        valid_s = jnp.isfinite(ts)
        gap_break = jnp.concatenate([
            jnp.array([False]),
            (ts[1:] - ts[:-1] > GAP) | ~valid_s[1:] | ~valid_s[:-1],
        ])
        run_id = jnp.cumsum(gap_break)
        run_cnt = jnp.zeros((P,), jnp.int32).at[run_id].add(valid_s.astype(jnp.int32))
        best_run = jnp.argmax(run_cnt)
        member_s = (run_id == best_run) & valid_s
        member = jnp.zeros((P,), bool).at[order].set(member_s)

        n_mem = jnp.sum(member)
        t_mem = jnp.where(member, t, jnp.inf)
        t_lo = jnp.min(t_mem)
        t_hi = jnp.max(jnp.where(member, t, -jnp.inf))
        length = jnp.where(n_mem > 0, t_hi - t_lo, 0.0)
        # distinct scan rows among members
        row_hist = jnp.zeros((17,), jnp.int32).at[jnp.clip(rows, 0, 16)].max(
            member.astype(jnp.int32))
        n_rows = jnp.sum(row_hist[:16])
        accept = ((n_mem >= MIN_POINTS) & (length >= MIN_LENGTH)
                  & (n_rows >= MIN_ROWS) & (n_rows * 2 >= n_mem)
                  & (score[best] > 0))

        # refit on members only for the stored line
        fit2 = geometry.fit_line_pca(pts, member)
        c2, u2 = fit2["point"], fit2["dir"]
        e0 = c2 + t_lo * u2
        e1 = c2 + t_hi * u2

        line_pts = line_pts.at[l].set(jnp.where(accept, c2, 0.0))
        line_dirs = line_dirs.at[l].set(jnp.where(accept, u2, 0.0))
        line_ends = line_ends.at[l].set(jnp.where(accept, jnp.stack([e0, e1]), 0.0))
        line_mask = line_mask.at[l].set(accept)
        labels = jnp.where(accept & member & (labels < 0), l, labels)
        # claimed points leave the pool even when the line is rejected, so a
        # degenerate cluster can't stall every later round
        remaining = remaining & ~(member & (score[best] > 0))
        return remaining, labels, line_pts, line_dirs, line_ends, line_mask

    state = (
        mask,
        jnp.full((P,), -1, jnp.int32),
        jnp.zeros((max_lines, 3)),
        jnp.zeros((max_lines, 3)),
        jnp.zeros((max_lines, 2, 3)),
        jnp.zeros((max_lines,), bool),
    )
    state = jax.lax.fori_loop(0, max_lines, line_round, state)
    _, labels, line_pts, line_dirs, line_ends, line_mask = state
    return {"points": line_pts, "dirs": line_dirs, "endpoints": line_ends,
            "mask": line_mask, "point_label": labels}

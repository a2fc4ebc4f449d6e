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

from ..ops import geometry, se3

MAX_LINES = 64
N_HYPOTHESES = 256
INLIER_DIST = 0.05      # reference FormLine tolerance (ExpandLine usage)
GAP = 0.5               # max along-line gap inside one segment
MIN_POINTS = 5          # LidarLineExtraction.cpp:70
MIN_LENGTH = 0.3        # FilterLineByLength threshold (:256)
MIN_ROWS = 3            # FilterLineByScan (:289)


def _hyp_priorities(P: int, n_draw: int, l, seed):
    """(P, n_draw) uint32 hash priorities for round l: column-wise argmax
    over a masked pool draws one uniform sample per column. Deterministic
    (multiplicative mixing of point index / draw column / round / seed) —
    the RANSAC analog of the decimation hash in velodyne.extract_features,
    and shared verbatim by the XLA and Pallas line-growth paths."""
    i = jnp.arange(P, dtype=jnp.uint32)[:, None]
    h = jnp.arange(n_draw, dtype=jnp.uint32)[None, :]
    a = (i + 1) * jnp.uint32(2654435761)
    b = ((h + 1) * jnp.uint32(40499)
         + jnp.uint32(l) * jnp.uint32(69069)
         + jnp.uint32(seed) * jnp.uint32(2654435761))
    x = (a ^ b) * jnp.uint32(2246822519)
    return x ^ (x >> 15)


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
    pts_sq = jnp.sum(pts * pts, axis=1)  # (P,)

    def line_round(state):
        l, streak, remaining, labels, line_tab = state
        # hypothesis pair = two random REMAINING points gated to lie within
        # 2 m of each other — a cheap stand-in for the reference's kd-tree
        # neighbor-triple seeding (LidarLineExtraction.cpp:15-53): nearby
        # pairs are far more likely to lie on one physical edge, and the gate
        # avoids building a (P, P) neighbor table per scan. Drawing: argmax
        # of a per-(point, hypothesis) integer hash masked to the remaining
        # pool — uniform over the pool with NO cumsum/scatter slot map (each
        # removed op paid a fixed launch floor, PERF.md round-5), and the
        # same construction runs unchanged inside the Pallas kernel.
        pri = _hyp_priorities(P, 2 * n_hyp, l, seed)
        pri = jnp.where(remaining[:, None], pri, jnp.uint32(0))
        iab = jnp.argmax(pri, axis=0).astype(jnp.int32)      # (2H,)
        ia, ib = iab[:n_hyp], iab[n_hyp:]
        pa, pb = pts[ia], pts[ib]
        sep = jnp.linalg.norm(pb - pa, axis=1)
        ok_h = remaining[ia] & remaining[ib] & (sep > 0.02) & (sep < 2.0)
        d = pb - pa
        d = d / (jnp.linalg.norm(d, axis=1, keepdims=True) + 1e-12)
        # (H, P) squared point-line distances via two MXU matmuls instead of
        # materialized (H, P, 3) difference tensors:
        # |w|^2 - (w.d)^2, w = p - pa. Full f32 precision is required — the
        # |p|^2 - 2 p.pa + |pa|^2 cancellation is ~1e-4 relative at room
        # ranges, far below bf16 MXU accuracy.
        pd = se3.matmul(pts, d.T)            # (P, H)
        ppa = se3.matmul(pts, pa.T)          # (P, H)
        pad = jnp.sum(pa * d, axis=1)        # (H,)
        pa_sq = jnp.sum(pa * pa, axis=1)     # (H,)
        w_sq = pts_sq[:, None] - 2.0 * ppa + pa_sq[None, :]
        wd = pd - pad[None, :]
        dist2 = w_sq - wd * wd               # (P, H)
        inl = (dist2 < INLIER_DIST * INLIER_DIST) & remaining[:, None]
        score = jnp.sum(inl, axis=0) * ok_h  # (H,)
        best = jnp.argmax(score)

        # refine with PCA on best inliers (one reweighted round)
        m0 = inl[:, best]
        fit = geometry.fit_line_pca(pts, m0)
        c, u = fit["point"], fit["dir"]
        dist2 = geometry.point_to_line_distance(pts, c[None, :], u[None, :])
        m1 = (dist2 < INLIER_DIST) & remaining
        fit = geometry.fit_line_pca(pts, m1)
        c, u = fit["point"], fit["dir"]

        # longest contiguous run along the line (gap <= GAP), found on a
        # GAP-sized histogram of the along-line coordinate instead of a full
        # sort: two inliers more than 2*GAP apart always land in
        # non-adjacent bins, closer than GAP always in adjacent ones, so the
        # bin-run split equals the sorted-gap split up to bin granularity.
        NB = 128
        t = jnp.einsum("pk,k->p", pts - c[None, :], u)
        t0 = jnp.min(jnp.where(m1, t, jnp.inf))
        tbin = jnp.clip(((t - t0) / GAP).astype(jnp.int32), 0, NB - 1)
        hist = jnp.zeros((NB,), jnp.int32).at[tbin].add(m1.astype(jnp.int32))
        occ = hist > 0
        # run id per bin = cumsum of starts-of-run; count points per run
        starts = occ & ~jnp.concatenate([jnp.array([False]), occ[:-1]])
        run_id = jnp.cumsum(starts) - 1
        run_cnt = jnp.zeros((NB,), jnp.int32).at[
            jnp.where(occ, run_id, NB - 1)].add(hist, mode="drop")
        best_run = jnp.argmax(run_cnt)
        member = m1 & (run_id[tbin] == best_run) & occ[tbin]

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

        # one packed row write instead of four table scatters (launch floor
        # is per op, PERF.md round-5): [c2, u2, e0, e1, accept]
        row = jnp.where(accept, jnp.concatenate(
            [c2, u2, e0, e1, jnp.ones((1,))]), 0.0)
        line_tab = line_tab.at[l].set(row)
        labels = jnp.where(accept & member & (labels < 0), l, labels)
        # claimed points leave the pool even when the line is rejected, so a
        # degenerate cluster can't stall every later round
        remaining = remaining & ~(member & (score[best] > 0))
        streak = jnp.where(accept, 0, streak + 1)
        return (l + 1, streak, remaining, labels, line_tab)

    def keep_going(state):
        # early exit: pool can no longer seat a minimal line, or several
        # consecutive rounds found nothing acceptable (strong lines come out
        # first, so a reject streak means the line supply is exhausted)
        l, streak, remaining = state[0], state[1], state[2]
        return ((l < max_lines) & (streak < 6)
                & (jnp.sum(remaining) >= MIN_POINTS))

    state = (
        jnp.int32(0),
        jnp.int32(0),
        mask,
        jnp.full((P,), -1, jnp.int32),
        jnp.zeros((max_lines, 13)),
    )
    state = jax.lax.while_loop(keep_going, line_round, state)
    _, _, _, labels, line_tab = state
    return {"points": line_tab[:, 0:3], "dirs": line_tab[:, 3:6],
            "endpoints": line_tab[:, 6:12].reshape(max_lines, 2, 3),
            "mask": line_tab[:, 12] > 0.5, "point_label": labels}

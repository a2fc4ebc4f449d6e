"""On-device SIFT: batched DoG detection + oriented descriptors in XLA.

TPU-native alternative to the host cv2 path in `utils/sift.py`
(reference: util/SIFT.cpp ExtractSIFT / ComputeSIFTDescriptor, itself
OpenCV SIFT).  The host path costs ~0.95 s/frame single-core at the Room
profile resolution (720x1440, 8096 features: 432 s for 454 frames,
PERF.md round-4) and this box has ONE core — the reference assumes a
25-thread workstation (config num_threads, main.cpp:45).  Here the whole
dataset runs as a few batched device programs: separable Gaussian
pyramid (MXU/VPU convs), 26-neighbor DoG extrema with contrast + edge
rejection (Lowe's tests, same constants as OpenCV: contrast 0.04, edge
r=10), per-octave top-k, 36-bin orientation voting and the classic
4x4x8 gradient-histogram descriptor via bilinear gathers.

NOT bit-compatible with cv2 (no subpixel scale interpolation, single
orientation per keypoint); it is a detector/descriptor of the same
family whose outputs flow through the identical downstream contract
(uv pixels, L2/RootSIFT-normed 128-d descriptors, validity mask) — the
match/RANSAC/BA chain only needs the features to be repeatable ACROSS
views, which tests/test_sift_device.py asserts end-to-end.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

CONTRAST_THRESHOLD = 0.04     # OpenCV default (applied as 0.5*thr/n_scales pre-interp)
EDGE_RATIO = 10.0             # Lowe r: reject if tr^2/det > (r+1)^2/r
N_SPLIT = 3                   # scales per octave
SIGMA0 = 1.6
N_ORI_BINS = 36
DESC_WIDTH = 4                # 4x4 cells
DESC_BINS = 8
DESC_SCALE = 3.0              # cell size in units of keypoint sigma


def _gauss_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(img, sigma: float):
    """Separable Gaussian blur of (..., H, W) by static shift-and-add
    (kernel taps are python-unrolled -> one fused XLA elementwise chain;
    radius <= 16 at the largest per-octave sigma)."""
    radius = max(1, int(math.ceil(3.0 * sigma)))
    k = _gauss_kernel1d(sigma, radius)

    def conv_last(x):
        W = x.shape[-1]
        pad = [(0, 0)] * (x.ndim - 1) + [(radius, radius)]
        xp = jnp.pad(x, pad, mode="edge")
        acc = jnp.zeros_like(x)
        for i, ki in enumerate(k):
            acc = acc + float(ki) * jax.lax.slice_in_dim(
                xp, i, i + W, axis=-1)
        return acc

    x = conv_last(img)                          # along W
    x = conv_last(jnp.swapaxes(x, -1, -2))      # along H
    return jnp.swapaxes(x, -1, -2)


def _octave_candidates(gauss, dog, octave: int, per_octave: int, mask):
    """Extrema of one octave's DoG stack.

    gauss: (S+3, H, W); dog: (S+2, H, W); mask (H, W) bool or None.
    Returns (score (K,), yx (K, 2) f32 octave coords, scale_idx (K,),
    valid (K,)) with K = per_octave.
    """
    S2, H, W = dog.shape
    # 26-neighbor extremum over the S middle layers
    mid = dog[1:-1]                                       # (S, H, W)
    stacks = []
    for ds in (-1, 0, 1):
        layer = dog[1 + ds:S2 - 1 + ds]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if ds == 0 and dy == 0 and dx == 0:
                    continue
                stacks.append(jnp.roll(layer, (dy, dx), axis=(1, 2)))
    neigh = jnp.stack(stacks)                             # (26, S, H, W)
    is_max = jnp.all(mid > neigh, axis=0)
    is_min = jnp.all(mid < neigh, axis=0)
    resp = jnp.abs(mid)
    ok = (is_max | is_min) & (resp > 0.5 * CONTRAST_THRESHOLD / N_SPLIT)

    # edge response: 2x2 Hessian of the DoG layer
    dxx = jnp.roll(mid, -1, 2) + jnp.roll(mid, 1, 2) - 2 * mid
    dyy = jnp.roll(mid, -1, 1) + jnp.roll(mid, 1, 1) - 2 * mid
    dxy = 0.25 * (jnp.roll(mid, (-1, -1), (1, 2)) + jnp.roll(mid, (1, 1), (1, 2))
                  - jnp.roll(mid, (-1, 1), (1, 2)) - jnp.roll(mid, (1, -1), (1, 2)))
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    edge_ok = (det > 0) & (tr * tr * EDGE_RATIO
                           < (EDGE_RATIO + 1.0) ** 2 * det)
    ok = ok & edge_ok

    # borders (descriptor window must fit) and detection mask
    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    b = 8
    ok = ok & (yy >= b) & (yy < H - b) & (xx >= b) & (xx < W - b)
    if mask is not None:
        ok = ok & mask[None]

    score = jnp.where(ok, resp, -jnp.inf).reshape(-1)
    k = min(per_octave, score.shape[0])
    top_v, top_i = jax.lax.top_k(score, k)
    s_idx = top_i // (H * W)
    y = (top_i % (H * W)) // W
    x = top_i % W

    # subpixel: 1D quadratic offsets along x and y on the DoG layer
    flat = mid.reshape(-1)
    def g(dy, dx):
        return flat[s_idx * (H * W) + jnp.clip(y + dy, 0, H - 1) * W
                    + jnp.clip(x + dx, 0, W - 1)]
    c = g(0, 0)
    off_x = jnp.where(
        jnp.abs(g(0, 1) + g(0, -1) - 2 * c) > 1e-12,
        -0.5 * (g(0, 1) - g(0, -1)) / (g(0, 1) + g(0, -1) - 2 * c + 1e-12), 0.0)
    off_y = jnp.where(
        jnp.abs(g(1, 0) + g(-1, 0) - 2 * c) > 1e-12,
        -0.5 * (g(1, 0) - g(-1, 0)) / (g(1, 0) + g(-1, 0) - 2 * c + 1e-12), 0.0)
    off_x = jnp.clip(off_x, -0.5, 0.5)
    off_y = jnp.clip(off_y, -0.5, 0.5)
    yx = jnp.stack([y + off_y, x + off_x], axis=1)
    valid = jnp.isfinite(top_v)
    return top_v, yx, s_idx, valid


def _bilinear(img, y, x):
    """img (H, W), y/x (...) float -> (...) bilinear sample, edge-clamped."""
    H, W = img.shape
    y = jnp.clip(y, 0.0, H - 1.001)
    x = jnp.clip(x, 0.0, W - 1.001)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    fy = y - y0
    fx = x - x0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


def _pack_grad_u16(gimg):
    """Central-difference gradient images of gimg packed for one-gather
    bilinear sampling (VERDICT r4 item 9: the descriptor stage's ~160M
    bilinear gathers/frame are the measured wall of device SIFT; gathers
    cost per INDEX, so packing each gradient's 2x2 footprint into one
    (H,W,2)-int32 word pair turns the 16 gathers per grid point — 2
    central differences x 2 bilinear x 4 taps — into 2).

    Bilinear sampling commutes with the (linear) central difference, so
    sampling the difference IMAGE equals differencing two shifted samples
    exactly in the interior (borders clamp). u16 quantization of the
    [-1, 1] gradient range steps at 3.1e-5 — far below image noise.
    Returns (dx_packed (H,W,2) i32, dy_packed, scale)."""
    H, W = gimg.shape
    right = jnp.concatenate([gimg[:, 1:], gimg[:, -1:]], axis=1)
    left = jnp.concatenate([gimg[:, :1], gimg[:, :-1]], axis=1)
    down = jnp.concatenate([gimg[1:], gimg[-1:]], axis=0)
    up = jnp.concatenate([gimg[:1], gimg[:-1]], axis=0)
    scale = 16383.75

    def pack(d):
        q = jnp.clip(jnp.round((d + 2.0) * scale), 0, 65535).astype(
            jnp.uint16)
        qr = jnp.concatenate([q[:, 1:], q[:, -1:]], axis=1)
        qd = jnp.concatenate([q[1:], q[-1:]], axis=0)
        qdr = jnp.concatenate([qd[:, 1:], qd[:, -1:]], axis=1)
        taps = jnp.stack([q, qr, qd, qdr], axis=-1)          # (H,W,4) u16
        return jax.lax.bitcast_convert_type(
            taps.reshape(H, W, 2, 2), jnp.int32).reshape(H, W, 2)

    return pack(right - left), pack(down - up), scale


def _sample_grad_packed(packed, scale, y, x):
    """Edge-clamped bilinear sample of a _pack_grad_u16 image: ONE (...,2)
    gather per sample (same per-index cost as one word)."""
    H, W = packed.shape[:2]
    y = jnp.clip(y, 0.0, H - 1.001)
    x = jnp.clip(x, 0.0, W - 1.001)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    fy = y - y0
    fx = x - x0
    w = packed[y0, x0]                                       # (...,2) i32
    u = jax.lax.bitcast_convert_type(w, jnp.uint16).reshape(w.shape[:-1] + (4,))
    t = u.astype(jnp.float32) / scale - 2.0
    v00, v01, v10, v11 = t[..., 0], t[..., 1], t[..., 2], t[..., 3]
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


def _orientation_and_descriptor(gimg, yx, sigma, root_sift: bool):
    """Dominant orientation + 4x4x8 descriptor for keypoints of ONE image
    at ONE octave level. gimg (H, W) the Gaussian image of the keypoint's
    scale; yx (K, 2); sigma (K,) keypoint scale in octave pixels.
    Returns desc (K, 128)."""
    # sample a 16x16 grid of gradients around the keypoint, spacing
    # DESC_SCALE*sigma/4 (cell size DESC_SCALE*sigma), Gaussian weighted
    G = 16
    grid = (jnp.arange(G) - (G - 1) / 2.0)                # (16,)
    gy, gx = jnp.meshgrid(grid, grid, indexing="ij")      # (16, 16)
    dx_pk, dy_pk, gscale = _pack_grad_u16(gimg)

    def one(kyx, ksig):
        step = DESC_SCALE * ksig * DESC_WIDTH / G         # px per sample
        sy = kyx[0] + gy * step
        sx = kyx[1] + gx * step
        # gradients: one packed gather each (see _pack_grad_u16)
        dx = _sample_grad_packed(dx_pk, gscale, sy, sx)
        dy = _sample_grad_packed(dy_pk, gscale, sy, sx)
        mag = jnp.sqrt(dx * dx + dy * dy)
        ang = jnp.arctan2(dy, dx)                         # (-pi, pi]
        w = jnp.exp(-(gy ** 2 + gx ** 2) / (2.0 * (0.5 * G) ** 2))
        magw = mag * w

        # orientation histogram (36 bins) -> dominant, with parabolic
        # peak interpolation (cv2 calcOrientationHist + peak refine)
        bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * N_ORI_BINS)
        bins = jnp.clip(bins, 0, N_ORI_BINS - 1).astype(jnp.int32)
        hist = jnp.zeros((N_ORI_BINS,)).at[bins.reshape(-1)].add(
            magw.reshape(-1))
        # smooth the circular histogram once
        hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
        peak = jnp.argmax(hist)
        hl = hist[(peak - 1) % N_ORI_BINS]
        hc = hist[peak]
        hr = hist[(peak + 1) % N_ORI_BINS]
        off = jnp.where(jnp.abs(hl - 2 * hc + hr) > 1e-12,
                        0.5 * (hl - hr) / (hl - 2 * hc + hr + 1e-12), 0.0)
        off = jnp.clip(off, -0.5, 0.5)
        theta = ((peak.astype(jnp.float32) + 0.5 + off) / N_ORI_BINS
                 * 2 * jnp.pi - jnp.pi)

        # rotate sample frame by -theta; TRILINEAR soft binning into the
        # (4, 4, 8) histogram (hard binning measured 4x worse match rates
        # — descriptors become sub-bin-shift sensitive)
        ct, st = jnp.cos(theta), jnp.sin(theta)
        ry = -st * gx + ct * gy                           # rotated offsets
        rx = ct * gx + st * gy
        rang = jnp.mod(ang - theta + jnp.pi, 2 * jnp.pi) - jnp.pi
        cyf = (ry / G + 0.5) * DESC_WIDTH - 0.5
        cxf = (rx / G + 0.5) * DESC_WIDTH - 0.5
        obf = (rang + jnp.pi) / (2 * jnp.pi) * DESC_BINS - 0.5
        cy0 = jnp.floor(cyf)
        cx0 = jnp.floor(cxf)
        ob0 = jnp.floor(obf)
        fy = cyf - cy0
        fx = cxf - cx0
        fo = obf - ob0
        d = jnp.zeros((DESC_WIDTH, DESC_WIDTH, DESC_BINS))
        for dy_ in (0, 1):
            wy = jnp.where(dy_ == 0, 1 - fy, fy)
            iy = (cy0 + dy_).astype(jnp.int32)
            in_y = (iy >= 0) & (iy < DESC_WIDTH)
            for dx_ in (0, 1):
                wx = jnp.where(dx_ == 0, 1 - fx, fx)
                ix = (cx0 + dx_).astype(jnp.int32)
                in_x = (ix >= 0) & (ix < DESC_WIDTH)
                for do_ in (0, 1):
                    wo = jnp.where(do_ == 0, 1 - fo, fo)
                    io = jnp.mod(ob0.astype(jnp.int32) + do_, DESC_BINS)
                    w8 = magw * wy * wx * wo * (in_y & in_x)
                    d = d.at[jnp.clip(iy, 0, DESC_WIDTH - 1),
                             jnp.clip(ix, 0, DESC_WIDTH - 1),
                             io].add(w8)
        d = d.reshape(128)
        # SIFT normalization: L2, clip 0.2, L2 again; optional RootSIFT
        d = d / (jnp.linalg.norm(d) + 1e-12)
        d = jnp.minimum(d, 0.2)
        d = d / (jnp.linalg.norm(d) + 1e-12)
        if root_sift:
            d = jnp.sqrt(d / (jnp.sum(d) + 1e-12))
        return d

    return jax.vmap(one)(yx, sigma)


@functools.partial(jax.jit,
                   static_argnames=("num_features", "n_octaves", "root_sift"))
def detect_and_describe(gray, num_features: int = 2048, n_octaves: int = 4,
                        root_sift: bool = True, mask=None):
    """SIFT features of one image fully on device.

    gray (H, W) float in [0, 1]. Returns (uv (num_features, 2) float32
    full-res pixel coords (x, y), desc (num_features, 128), valid
    (num_features,) bool, response (num_features,)).
    """
    H, W = gray.shape
    # octave -1 (cv2 firstOctave=-1): 2x bilinear upsample — the doubled
    # base supplies the fine-scale keypoints that are the majority of
    # OpenCV SIFT's output
    up = jax.image.resize(gray, (2 * H, 2 * W), method="bilinear")
    base = _blur(up, SIGMA0)
    mask_up = None if mask is None else \
        jax.image.resize(mask.astype(jnp.float32),
                         (2 * H, 2 * W), method="nearest") > 0.5
    sigmas = [SIGMA0 * (2.0 ** (s / N_SPLIT)) for s in range(N_SPLIT + 3)]

    per_oct = num_features  # candidates per octave before the global top-k
    scores, uvs, sigs, valids, descs = [], [], [], [], []
    img_o = base
    mask_o = mask_up
    for o in range(n_octaves):
        Ho, Wo = img_o.shape
        if Ho < 32 or Wo < 32:
            break
        gauss = [img_o]
        for s in range(1, N_SPLIT + 3):
            inc = math.sqrt(max(sigmas[s] ** 2 - sigmas[s - 1] ** 2, 1e-6))
            gauss.append(_blur(gauss[-1], inc))
        gstack = jnp.stack(gauss)                         # (S+3, Ho, Wo)
        dog = gstack[1:] - gstack[:-1]                    # (S+2, Ho, Wo)
        sc, yx, s_idx, val = _octave_candidates(
            gstack, dog, o, per_oct, mask_o)
        ksig = jnp.asarray(sigmas, jnp.float32)[s_idx + 1]
        # descriptor on the keypoint's own Gaussian layer
        d = _orientation_and_descriptor(
            gstack[1], yx, ksig, root_sift)  # use layer 1 (sigma ~2.0) —
        # one shared layer per octave keeps the gather program small; the
        # scale selectivity lives in the octave + sampling step (ksig)
        scale = float(1 << o) * 0.5               # octave 0 is the 2x upsample
        # -0.25: jax.image.resize uses half-pixel centers, so up-pixel x
        # sits at full-res coord x/2 - 0.25; the [::2,::2] octave decimation
        # keeps alignment with the up grid, so the correction is constant
        uv = jnp.stack([yx[:, 1], yx[:, 0]], axis=1) * scale - 0.25  # (x, y)
        scores.append(jnp.where(val, sc, -jnp.inf))
        uvs.append(uv)
        sigs.append(ksig * scale)
        valids.append(val)
        descs.append(d)
        img_o = img_o[::2, ::2]
        mask_o = None if mask_o is None else mask_o[::2, ::2]

    if not scores:  # image too small for any octave
        return (jnp.zeros((num_features, 2), jnp.float32),
                jnp.zeros((num_features, 128), jnp.float32),
                jnp.zeros((num_features,), bool),
                jnp.zeros((num_features,), jnp.float32))
    score = jnp.concatenate(scores)
    # the candidate pool can be smaller than num_features for small inputs
    # (only the upsampled octave survives the Ho<32 break): clamp k and pad
    # with valid=False instead of letting top_k raise a shape error
    k = min(num_features, score.shape[0])
    top_v, top_i = jax.lax.top_k(score, k)
    uv = jnp.concatenate(uvs)[top_i]
    desc = jnp.concatenate(descs)[top_i]
    valid = jnp.concatenate(valids)[top_i] & jnp.isfinite(top_v)
    resp = jnp.where(valid, top_v, 0.0)
    if k < num_features:
        pad = num_features - k
        uv = jnp.concatenate([uv, jnp.zeros((pad, 2), uv.dtype)])
        desc = jnp.concatenate([desc, jnp.zeros((pad, desc.shape[1]),
                                                desc.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        resp = jnp.concatenate([resp, jnp.zeros((pad,), resp.dtype)])
    return uv, desc, valid, resp


def extract_sift_device_batch(grays, num_features: int = 2048,
                              root_sift: bool = True, mask=None,
                              chunk: int | None = None):
    """Batched host entry: grays (N, H, W) float [0,1] numpy -> numpy
    (uv (N, F, 2), desc (N, F, 128), fmask (N, F)).  Chunks the frame axis
    so one program shape compiles regardless of N; the chunk shrinks with
    the feature count (the descriptor stage's HLO temps scale with
    B x num_features x 256 samples — B=8 at 8096 features measured a
    25.4 GB program on the v5e)."""
    N = len(grays)
    if chunk is None:
        chunk = 2 if num_features > 4096 else 8
    f = jax.jit(jax.vmap(
        lambda g: detect_and_describe(g, num_features=num_features,
                                      root_sift=root_sift, mask=mask)))
    outs = []
    for c0 in range(0, N, chunk):
        sel = np.asarray(grays[c0:c0 + chunk], np.float32)
        pad = chunk - len(sel)
        if pad:
            sel = np.concatenate([sel, np.repeat(sel[-1:], pad, 0)])
        outs.append(f(jnp.asarray(sel)))
    uv = np.concatenate([np.asarray(o[0]) for o in outs])[:N]
    desc = np.concatenate([np.asarray(o[1]) for o in outs])[:N]
    val = np.concatenate([np.asarray(o[2]) for o in outs])[:N]
    return uv.astype(np.float32), desc.astype(np.float32), val

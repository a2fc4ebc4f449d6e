"""Union-find feature-track building (host control plane).

Replaces util/Tracks.{h,cpp} (reference): UnionFind (:34-107) over (image,
feature) observations connected by pair matches, PointTrack assembly
(:109-133), length filtering. Track building is irregular graph work on
small data — control plane, kept on host in numpy (SURVEY.md hard part #4);
the resulting tracks are exported as fixed-shape padded device arrays.
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)
        self.rank = np.zeros(n, dtype=np.int32)

    def find(self, x):
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.rank[ra] += self.rank[ra] == self.rank[rb]


def build_tracks(pair_matches, n_features_per_image, min_length: int = 2,
                 max_length: int | None = None):
    """Build tracks from per-pair matches.

    Args:
      pair_matches: list of (img_i, img_j, matches (K,2) feat idx arrays).
      n_features_per_image: dict or array image -> feature count.
      min_length: drop tracks seen in fewer images (TrackBuilder::Filter).

    Returns (track_img (T, L) int32, track_feat (T, L) int32, mask (T, L)):
    padded observation lists; L = longest kept track. Tracks where one image
    contributes two different features are dropped (inconsistent), matching
    the reference's track filter.
    """
    images = sorted(set(int(k) for k in range(len(n_features_per_image))))
    offsets = np.zeros(len(images) + 1, np.int64)
    for i in images:
        offsets[i + 1] = offsets[i] + int(n_features_per_image[i])
    total = int(offsets[-1])
    uf = UnionFind(total)
    for i, j, m in pair_matches:
        if len(m) == 0:
            continue
        a = offsets[i] + np.asarray(m)[:, 0]
        b = offsets[j] + np.asarray(m)[:, 1]
        for x, y in zip(a, b):
            uf.union(int(x), int(y))

    # collect observed nodes only
    observed = set()
    for i, j, m in pair_matches:
        if len(m) == 0:
            continue
        observed.update((offsets[i] + np.asarray(m)[:, 0]).tolist())
        observed.update((offsets[j] + np.asarray(m)[:, 1]).tolist())
    groups: dict[int, list[int]] = {}
    for node in observed:
        groups.setdefault(uf.find(int(node)), []).append(int(node))

    img_of = np.searchsorted(offsets, np.arange(total), side="right") - 1

    tracks = []
    for nodes in groups.values():
        imgs = img_of[nodes]
        uniq, counts = np.unique(imgs, return_counts=True)
        if (counts > 1).any():
            continue  # inconsistent: one image observes two features
        if len(uniq) < min_length:
            continue
        feats = np.asarray(nodes) - offsets[imgs]
        order = np.argsort(imgs)
        tracks.append((imgs[order], feats[order]))
    if not tracks:
        return (np.zeros((0, 1), np.int32), np.zeros((0, 1), np.int32),
                np.zeros((0, 1), bool))
    L = max(len(t[0]) for t in tracks)
    if max_length:
        L = min(L, max_length)
    T = len(tracks)
    track_img = np.zeros((T, L), np.int32)
    track_feat = np.zeros((T, L), np.int32)
    mask = np.zeros((T, L), bool)
    for k, (imgs, feats) in enumerate(tracks):
        n = min(len(imgs), L)
        track_img[k, :n] = imgs[:n]
        track_feat[k, :n] = feats[:n]
        mask[k, :n] = True
    return track_img, track_feat, mask

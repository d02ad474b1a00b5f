"""ORB-style features on TPU: FAST corners + oriented BRIEF + MXU matching.

The reference extracts ORB descriptors per keyframe with OpenCV
(`global_graph_nodelet.cpp:212-236`, `cv::ORB::create().detectAndCompute`)
and scores keyframe similarity through a DBoW3 vocabulary
(`loop_detector.hpp:231-240`). Rebuilt TPU-first:

- FAST-9/16 corner test as 16 rolled-image comparisons + unrolled
  contiguous-run test (pure VPU element-wise ops over the whole image)
- 3x3 non-max suppression, top-K selection with `lax.top_k`
- intensity-centroid orientation over a radius-15 disc (fixed gather set)
- steered BRIEF-256 with a deterministic Gaussian pair pattern (OpenCV uses
  a learned pattern; byte-level compatibility is not a goal — matching
  quality is)
- descriptor matching as a bit-unpacked {-1,+1} matmul on the MXU:
  hamming = (256 - dot)/2, giving a dense cross-distance matrix in one shot;
  `match_score` = mutual-best-match fraction with a distance gate, a [0,1]
  similarity playing the role of DBoW3's L1 score (same accept-gate scale).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# FAST radius-3 Bresenham circle, clockwise from 12 o'clock: (row, col)
_FAST_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    np.int32,
)

_PATCH_R = 15  # orientation / BRIEF patch radius


def _disc_offsets(radius: int) -> np.ndarray:
    out = [
        (dy, dx)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
        if dy * dy + dx * dx <= radius * radius
    ]
    return np.asarray(out, np.int32)


_DISC = _disc_offsets(_PATCH_R)


def _brief_pattern(n_pairs: int = 256, seed: int = 1234) -> np.ndarray:
    """(n_pairs, 4) int8 offsets (y1,x1,y2,x2), Gaussian like BRIEF."""
    rng = np.random.default_rng(seed)
    sigma = _PATCH_R / 2.5
    pat = np.clip(rng.normal(0, sigma, size=(n_pairs, 4)), -_PATCH_R + 1, _PATCH_R - 1)
    return np.round(pat).astype(np.int32)


_PATTERN = _brief_pattern()


def _box_blur(img: jax.Array) -> jax.Array:
    """3x3 box blur via rolls (BRIEF comparisons use smoothed intensities)."""
    out = jnp.zeros_like(img)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out = out + jnp.roll(jnp.roll(img, dy, 0), dx, 1)
    return out / 9.0


@functools.partial(jax.jit, static_argnums=(1,))
def detect_and_compute(image: jax.Array, max_features: int, threshold: float = 20.0):
    """image (H,W) float32 [0,255] -> (keypoints (K,2) yx, descriptors
    (K,256) bool, scores (K,), valid (K,))."""
    img = image.astype(jnp.float32)
    h, w = img.shape

    # --- FAST-9 ---
    nbrs = jnp.stack(
        [jnp.roll(jnp.roll(img, -dy, 0), -dx, 1) for dy, dx in _FAST_CIRCLE], axis=-1
    )  # (H,W,16): nbr value at circle position
    bright = nbrs > (img[..., None] + threshold)
    dark = nbrs < (img[..., None] - threshold)

    def run9(mask):
        m2 = jnp.concatenate([mask, mask[..., :8]], axis=-1)
        hit = jnp.zeros(img.shape, bool)
        for s in range(16):
            seg = m2[..., s]
            for k in range(1, 9):
                seg = seg & m2[..., s + k]
            hit = hit | seg
        return hit

    corner = run9(bright) | run9(dark)
    score = jnp.maximum(
        jnp.sum(jnp.where(bright, nbrs - img[..., None] - threshold, 0.0), -1),
        jnp.sum(jnp.where(dark, img[..., None] - nbrs - threshold, 0.0), -1),
    )
    score = jnp.where(corner, score, 0.0)

    # 3x3 non-max suppression
    neigh_max = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh_max = jnp.maximum(neigh_max, jnp.roll(jnp.roll(score, dy, 0), dx, 1))
    keep = corner & (score >= neigh_max) & (score > 0)

    # keep away from the border (patch radius + 1)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    b = _PATCH_R + 1
    inside = (yy >= b) & (yy < h - b) & (xx >= b) & (xx < w - b)
    keep = keep & inside

    flat_score = jnp.where(keep, score, -1.0).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat_score, max_features)
    ky = top_idx // w
    kx = top_idx % w
    valid = top_scores > 0
    kpts = jnp.stack([ky, kx], axis=1)

    # --- orientation: intensity centroid over the disc ---
    disc = jnp.asarray(_DISC)
    py = ky[:, None] + disc[None, :, 0]
    px = kx[:, None] + disc[None, :, 1]
    patch = img[jnp.clip(py, 0, h - 1), jnp.clip(px, 0, w - 1)]  # (K,D)
    m10 = jnp.sum(patch * disc[None, :, 1], axis=1)
    m01 = jnp.sum(patch * disc[None, :, 0], axis=1)
    theta = jnp.arctan2(m01, m10)

    # --- steered BRIEF over the blurred image ---
    blurred = _box_blur(img)
    pat = jnp.asarray(_PATTERN, jnp.float32)  # (256,4) y1 x1 y2 x2
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    def rot(y, x):
        # rotate (x,y) by theta: x' = x cos - y sin ; y' = x sin + y cos
        rx = x[None, :] * cos_t[:, None] - y[None, :] * sin_t[:, None]
        ry = x[None, :] * sin_t[:, None] + y[None, :] * cos_t[:, None]
        return ry, rx

    r1y, r1x = rot(pat[:, 0], pat[:, 1])
    r2y, r2x = rot(pat[:, 2], pat[:, 3])
    s1y = jnp.clip(jnp.round(ky[:, None] + r1y).astype(jnp.int32), 0, h - 1)
    s1x = jnp.clip(jnp.round(kx[:, None] + r1x).astype(jnp.int32), 0, w - 1)
    s2y = jnp.clip(jnp.round(ky[:, None] + r2y).astype(jnp.int32), 0, h - 1)
    s2x = jnp.clip(jnp.round(kx[:, None] + r2x).astype(jnp.int32), 0, w - 1)
    desc = blurred[s1y, s1x] < blurred[s2y, s2x]  # (K,256) bool

    return kpts, desc, top_scores, valid


def pack_descriptors(desc_bits: np.ndarray) -> np.ndarray:
    """(K,256) bool -> (K,32) uint8 (cv::Mat-compatible row layout)."""
    return np.packbits(np.asarray(desc_bits, bool), axis=1)


def _pack_bits_device(desc_bits: jax.Array) -> jax.Array:
    """(K,256) bool -> (K,32) uint8 ON DEVICE (np.packbits big-endian
    layout). Packing before the host fetch shrinks the relay transfer 8x —
    the unpacked fetch was the dominant ORB cost (~40-130 ms/keyframe at
    the relay's few MB/s)."""
    k = desc_bits.shape[0]
    bits = desc_bits.reshape(k, 32, 8).astype(jnp.int32)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)


def _pyramid_body(image: jax.Array, k_levels: tuple, threshold: float):
    """All pyramid levels in ONE program: per level run the FAST+BRIEF
    detector, pack descriptor bits, map keypoints back to level 0, and
    concatenate — a single dispatch + one small packed fetch instead of
    (levels x dispatch + levels x 128 KB unpacked-descriptor fetches)."""
    img = image.astype(jnp.float32)
    descs, kpts, valids = [], [], []
    for level, k_level in enumerate(k_levels):
        kp, desc, scores, valid = detect_and_compute(img, k_level, threshold)
        descs.append(_pack_bits_device(desc))
        kpts.append(kp * (2 ** level))
        valids.append(valid)
        img = _halve(img)
    return (
        jnp.concatenate(descs),
        jnp.concatenate(kpts),
        jnp.concatenate(valids),
    )


_detect_pyramid = functools.partial(jax.jit, static_argnums=(1, 2))(_pyramid_body)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _detect_pyramid_batch(images: jax.Array, k_levels: tuple, threshold: float):
    """(B,H,W) images -> batched pyramid extraction in ONE dispatch,
    results packed into ONE (B,K,37) uint8 buffer for a single fetch.

    Layout per row: desc[0:32] | kpt_y int16 LE [32:34] | kpt_x int16 LE
    [34:36] | valid [36]. The per-keyframe path costs an image upload +
    dispatch + fetch rounds of relay latency EACH (~276 ms/keyframe
    measured); batching pays one dispatch + one fetch per chunk."""
    desc, kpts, valid = jax.vmap(
        lambda im: _pyramid_body(im, k_levels, threshold)
    )(images)
    kp16 = jax.lax.bitcast_convert_type(kpts.astype(jnp.int16), jnp.uint8)
    b, k = desc.shape[:2]
    return jnp.concatenate(
        [desc, kp16.reshape(b, k, 4), valid[..., None].astype(jnp.uint8)],
        axis=-1,
    )


def unpack_descriptors(desc: np.ndarray) -> np.ndarray:
    """(K,32) uint8 -> (K,256) bool."""
    return np.unpackbits(np.asarray(desc, np.uint8), axis=1).astype(bool)


@jax.jit
def hamming_matrix(bits_a: jax.Array, bits_b: jax.Array) -> jax.Array:
    """(Da,256),(Db,256) {0,1} -> (Da,Db) hamming distances via MXU matmul."""
    pm_a = bits_a.astype(jnp.float32) * 2.0 - 1.0
    pm_b = bits_b.astype(jnp.float32) * 2.0 - 1.0
    dot = pm_a @ pm_b.T  # agreements - disagreements
    return (bits_a.shape[1] - dot) * 0.5


def match_score(desc_a: np.ndarray, desc_b: np.ndarray, max_dist: float = 64.0) -> float:
    """[0,1] similarity: fraction of mutual-best matches under max_dist.

    Plays the role of the DBoW3 query score in the loop detector
    (`loop_detector.hpp:244` gates at 0.04).
    """
    if desc_a.shape[0] == 0 or desc_b.shape[0] == 0:
        return 0.0
    a = jnp.asarray(unpack_descriptors(desc_a) if desc_a.dtype == np.uint8 and desc_a.shape[1] == 32 else desc_a)
    b = jnp.asarray(unpack_descriptors(desc_b) if desc_b.dtype == np.uint8 and desc_b.shape[1] == 32 else desc_b)
    d = hamming_matrix(a, b)
    best_ab = jnp.argmin(d, axis=1)
    best_ba = jnp.argmin(d, axis=0)
    ia = jnp.arange(a.shape[0])
    mutual = best_ba[best_ab] == ia
    dist_ok = jnp.take_along_axis(d, best_ab[:, None], axis=1)[:, 0] <= max_dist
    n_good = jnp.sum((mutual & dist_ok).astype(jnp.float32))
    return float(n_good / min(a.shape[0], b.shape[0]))


@functools.partial(jax.jit, static_argnums=(4,))
def _match_scores_masked(a, a_mask, bs, b_masks, max_dist: float):
    """a (D,256) vs a stacked candidate batch bs (K,D,256) -> (K,) scores."""

    def one(b, b_mask):
        d = hamming_matrix(a, b)
        valid = a_mask[:, None] & b_mask[None, :]
        d = jnp.where(valid, d, 1e9)
        best_ab = jnp.argmin(d, axis=1)
        best_ba = jnp.argmin(d, axis=0)
        ia = jnp.arange(a.shape[0])
        mutual = (best_ba[best_ab] == ia) & a_mask
        dist_ok = jnp.take_along_axis(d, best_ab[:, None], axis=1)[:, 0] <= max_dist
        n_good = jnp.sum((mutual & dist_ok).astype(jnp.float32))
        na = jnp.sum(a_mask.astype(jnp.float32))
        nb = jnp.sum(b_mask.astype(jnp.float32))
        return n_good / jnp.maximum(jnp.minimum(na, nb), 1.0)

    return jax.vmap(one)(bs, b_masks)


def match_scores_batch(
    desc_a: np.ndarray, desc_list, cap: int = 512, max_dist: float = 64.0
) -> np.ndarray:
    """`match_score` against MANY candidates in ONE device call (the
    reference ranks its loop candidates with one DBoW3 query per candidate,
    `loop_detector.hpp:231-240`; per-candidate device calls cost a relay
    round trip each). Descriptor sets are padded to `cap` rows and the
    candidate count to the next power of two, so compile count stays O(log K)."""
    if desc_a.shape[0] == 0 or not desc_list:
        return np.zeros(len(desc_list))
    bits_a = unpack_descriptors(desc_a) if desc_a.dtype == np.uint8 else np.asarray(desc_a, bool)
    a = np.zeros((cap, 256), bool)
    a[: min(cap, bits_a.shape[0])] = bits_a[:cap]
    a_mask = np.zeros(cap, bool)
    a_mask[: min(cap, bits_a.shape[0])] = True

    k = len(desc_list)
    k_pad = 1
    while k_pad < k:
        k_pad *= 2
    bs = np.zeros((k_pad, cap, 256), bool)
    b_masks = np.zeros((k_pad, cap), bool)
    for i, d in enumerate(desc_list):
        if d is None or d.shape[0] == 0:
            continue
        bits = unpack_descriptors(d) if d.dtype == np.uint8 else np.asarray(d, bool)
        m = min(cap, bits.shape[0])
        bs[i, :m] = bits[:m]
        b_masks[i, :m] = True
    scores = _match_scores_masked(
        jnp.asarray(a), jnp.asarray(a_mask), jnp.asarray(bs), jnp.asarray(b_masks), max_dist
    )
    return np.asarray(scores)[:k]


@jax.jit
def _halve(img: jax.Array) -> jax.Array:
    """2x2 average-pool downsample (the ORB pyramid's level step)."""
    h, w = img.shape
    h2, w2 = (h // 2) * 2, (w // 2) * 2
    x = img[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2)
    return x.mean(axis=(1, 3))


class OrbExtractor:
    """Host-friendly wrapper producing packed uint8 descriptors.

    `n_levels > 1` runs a scale pyramid (2x average-pool per level, like
    OpenCV ORB's image pyramid at scaleFactor 2): features from all levels
    are merged, keypoint coordinates mapped back to level 0, and the feature
    budget split across levels proportional to area.
    """

    def __init__(self, max_features: int = 512, threshold: float = 20.0, n_levels: int = 3):
        self.max_features = max_features
        self.threshold = threshold
        self.n_levels = n_levels

    def detect_and_compute(self, image: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """image (H,W) [0,255] -> (descriptors (K,32) uint8, keypoints (K,2))."""
        img = np.asarray(image, np.float32)
        h, w = img.shape
        norm = sum(0.75**l for l in range(self.n_levels))
        k_levels = []
        for level in range(self.n_levels):
            if min(h, w) < 2 * (_PATCH_R + 1):
                break
            k_levels.append(max(16, int(self.max_features * (0.75**level) / norm)))
            h //= 2
            w //= 2
        if not k_levels:
            return np.zeros((0, 32), np.uint8), np.zeros((0, 2), np.int32)
        desc, kpts, valid = _detect_pyramid(
            jnp.asarray(img), tuple(k_levels), self.threshold
        )
        v = np.asarray(valid)
        desc = np.asarray(desc)[v]
        kpts = np.asarray(kpts)[v]
        return desc[: self.max_features], kpts[: self.max_features]

    def _k_levels(self, h: int, w: int) -> tuple:
        norm = sum(0.75**l for l in range(self.n_levels))
        out = []
        for level in range(self.n_levels):
            if min(h, w) < 2 * (_PATCH_R + 1):
                break
            out.append(max(16, int(self.max_features * (0.75**level) / norm)))
            h //= 2
            w //= 2
        return tuple(out)

    def detect_and_compute_batch(self, images: jax.Array):
        """(B,H,W) DEVICE-RESIDENT images -> list of (descriptors (K,32)
        uint8, keypoints (K,2)) — one dispatch + one fetch round for the
        whole batch. Pad B to a power of two upstream to bound compiles."""
        b, h, w = images.shape
        k_levels = self._k_levels(h, w)
        if not k_levels:
            z = (np.zeros((0, 32), np.uint8), np.zeros((0, 2), np.int32))
            return [z] * b
        packed = np.asarray(_detect_pyramid_batch(images, k_levels, self.threshold))
        desc = packed[:, :, :32]
        kpts = (
            packed[:, :, 32:36].copy().view(np.int16).astype(np.int32).reshape(b, -1, 2)
        )
        valid = packed[:, :, 36].astype(bool)
        out = []
        for i in range(b):
            v = valid[i]
            out.append((desc[i][v][: self.max_features], kpts[i][v][: self.max_features]))
        return out

"""Loop detection: geometric gating + visual ranking + NDT verification.

Rebuild of `LoopDetector` (`include/global_graph/loop_detector.hpp:42-298`):

1. **candidate gating** (`find_candidates`, :107-140): skip everything if the
   new keyframe's accumulated travel is within `min_edge_interval` of the
   last accepted loop; a keyframe is a candidate when the travel difference
   exceeds `accum_distance_thresh` AND the estimated XY distance is under
   `distance_thresh`.
2. **visual ranking** (:231-240): the reference builds a throwaway DBoW3
   database over the candidates' ORB descriptors and queries the top 5. We
   rank by descriptor similarity computed directly on the MXU (bit-unpacked
   Hamming cross-matching, `ops/orb.match_score`), or by a trained k-means
   BoW vocabulary when provided (`graph/bow.py`) — scores share the
   reference's [0,1] scale and its 0.04 accept gate.
3. **geometric verification** (:249-269): NDT (classical, DIRECT7, res 1.0)
   aligns candidate cloud -> new keyframe cloud seeded with the graph
   estimate with z forced to 0; fitness = mean squared NN distance; accept
   the best fitness <= `fitness_score_thresh`.

Deviation from the reference: candidates that pass the visual gate are
verified *in parallel* (vmapped / device-batched) instead of sequentially
with early exit — same accept rule on strictly more candidates.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.config import LoopDetectorConfig
from lv_slam_tpu.graph.keyframe import KeyFrame


@dataclasses.dataclass
class Loop:
    key1: KeyFrame                 # the new keyframe
    key2: KeyFrame                 # the matched (older) keyframe
    relative_pose: np.ndarray      # maps key2's cloud into key1's frame
    fitness: float
    visual_score: float


@functools.lru_cache(maxsize=16)
def _batched_align_fn(resolution: float, neighborhood: str):
    from lv_slam_tpu.core.cloud import PointCloud as PC
    from lv_slam_tpu.ops.ndt_hash import ndt_align_hash_table, to_hash

    def run(target_map, xyz, inten, mask, guesses):
        # hash path: one gather per DIRECT7 offset (2.4x the LUT pass);
        # the conversion is shared across the whole candidate batch
        hmap = to_hash(target_map)

        def one(x, it, m, g):
            return ndt_align_hash_table(
                hmap, PC(x, it, m), g,
                resolution=resolution, transformation_epsilon=0.01,
                max_iterations=64, neighborhood=neighborhood, weighted=False,
            ).transform

        return jax.vmap(one)(xyz, inten, mask, guesses)

    return jax.jit(run)


@functools.lru_cache(maxsize=1)
def _batched_fitness_fn():
    from lv_slam_tpu.core.cloud import PointCloud as PC
    from lv_slam_tpu.ops.nn import build_centroid_grid, nn_sq_dists

    def run(target, xyz, inten, mask, transforms):
        grid = build_centroid_grid(target, 0.25)

        def one(x, it, m, t):
            moved = PC(x, it, m).transformed(t)
            d2 = nn_sq_dists(grid, moved.masked_xyz(), moved.mask)
            ok = jnp.isfinite(d2)
            n = jnp.sum(ok.astype(jnp.float32))
            total = jnp.sum(jnp.where(ok, d2, 0.0))
            return jnp.where(n > 0, total / jnp.maximum(n, 1.0), jnp.inf)

        return jax.vmap(one)(xyz, inten, mask, transforms)

    return jax.jit(run)


class LoopDetector:
    def __init__(self, cfg: Optional[LoopDetectorConfig] = None, vocabulary=None,
                 leaf_cap: int = 16384, lut_extent: int = 256):
        self.cfg = cfg or LoopDetectorConfig()
        self.vocabulary = vocabulary  # optional graph/bow.Vocabulary
        self._index = None            # lazy bow.InvertedIndex over keyframes
        self._indexed: set = set()
        self.last_edge_accum_distance = 0.0
        c = self.cfg
        from lv_slam_tpu.utils.jit_cache import build_map_fn

        # coarse-to-fine ladder: e.g. (4.0, 2.0, 1.0); see LoopDetectorConfig
        self._resolutions = tuple(c.multiscale) + (c.ndt_resolution,)
        self._builds = {
            r: build_map_fn(r, leaf_cap, lut_extent) for r in self._resolutions
        }

    # -- gating (host; cheap over <= keyframe_cap entries) -------------------
    def find_candidates(self, keyframes: Sequence[KeyFrame], new_kf: KeyFrame) -> List[KeyFrame]:
        c = self.cfg
        if new_kf.accum_distance - self.last_edge_accum_distance < c.min_edge_interval:
            return []
        out = []
        new_pos = (new_kf.estimate if new_kf.estimate is not None else new_kf.odom)[:2, 3]
        for k in keyframes:
            if new_kf.accum_distance - k.accum_distance < c.accum_distance_thresh:
                continue
            pos = (k.estimate if k.estimate is not None else k.odom)[:2, 3]
            if np.linalg.norm(new_pos - pos) > c.distance_thresh:
                continue
            out.append(k)
        return out

    # -- visual ranking ------------------------------------------------------
    def _bow_vector(self, kf: KeyFrame) -> np.ndarray:
        """tf-idf vector, computed once per keyframe and cached on it."""
        vec = getattr(kf, "bow_vector", None)
        if vec is None:
            vec = self.vocabulary.transform(kf.descriptor)
            kf.bow_vector = vec
        return vec

    def maybe_train_vocabulary(self, keyframes: Sequence[KeyFrame]) -> None:
        """BoW-by-default: the reference ships a pretrained DBoW3 vocabulary
        (`loop_detector.hpp:51-71`); lacking an asset we train one on the
        mapped sequence itself once enough described keyframes exist, after
        which ranking is vocabulary-driven (host dot products on cached
        vectors — zero device calls per query)."""
        c = self.cfg
        if self.vocabulary is not None or not c.auto_train_vocab:
            return
        described = [k.descriptor for k in keyframes if k.descriptor is not None and k.descriptor.shape[0] > 0]
        if len(described) < c.vocab_min_keyframes:
            return
        from lv_slam_tpu.graph.bow import Vocabulary

        self.vocabulary = Vocabulary.train(described, n_words=c.vocab_words)
        for k in keyframes:  # invalidate any stale cached vectors
            if hasattr(k, "bow_vector"):
                del k.bow_vector
        self._index, self._indexed = None, set()

    def rank_candidates(self, candidates: List[KeyFrame], new_kf: KeyFrame):
        """Returns (ordered candidate list, scores) by visual similarity;
        keyframes without descriptors get score 1.0 (pure-lidar mode ranks by
        recency, matching the reference's non-BoW `matching()` fallback).
        All candidates are scored in one pass: vocabulary mode compares
        cached tf-idf vectors on host; raw mode runs ONE batched device call
        (`ops/orb.match_scores_batch`)."""
        if new_kf.descriptor is None or not any(c.descriptor is not None for c in candidates):
            return candidates[: self.cfg.candidates_cap], [1.0] * min(len(candidates), self.cfg.candidates_cap)
        if self.vocabulary is not None:
            va = self._bow_vector(new_kf)
            if len(candidates) > 16:
                # large candidate sets (>500-keyframe maps with wide gates):
                # inverted-file query — cost scales with the query's posting
                # lists, not the candidate count (bow.InvertedIndex)
                got = self._query_index(va, candidates)
                raw = [got.get(self._kf_key(c), 0.0) for c in candidates]
            else:
                raw = [
                    0.0 if c.descriptor is None
                    else float(1.0 - 0.5 * np.abs(va - self._bow_vector(c)).sum())
                    for c in candidates
                ]
            # baseline-adjusted scale: the reference's absolute 0.04 gate
            # assumes near-orthogonal impostor vectors (large vocabularies);
            # auto-trained small vocabularies carry their measured impostor
            # baseline instead (bow.Vocabulary.adjust; 0 for pretrained)
            scores = [max(0.0, self.vocabulary.adjust(s)) for s in raw]
        else:
            from lv_slam_tpu.ops.orb import match_scores_batch

            idx = [i for i, c in enumerate(candidates) if c.descriptor is not None]
            batch = match_scores_batch(
                new_kf.descriptor,
                [candidates[i].descriptor for i in idx],
                cap=self.cfg.descriptor_cap,
            )
            scores = [0.0] * len(candidates)
            for j, i in enumerate(idx):
                scores[i] = float(batch[j])
        order = np.argsort(scores)[::-1][: self.cfg.candidates_cap]
        ranked = [candidates[i] for i in order]
        rscores = [scores[i] for i in order]
        # BoW accept gate (loop_detector.hpp:244)
        keep = [i for i, s in enumerate(rscores) if s >= self.cfg.bow_score_thresh]
        return [ranked[i] for i in keep], [rscores[i] for i in keep]

    @staticmethod
    def _kf_key(kf: KeyFrame):
        """Stable index key: id() can alias after garbage collection (a new
        KeyFrame reusing a freed address would silently inherit the dead
        keyframe's postings); seq is unique and stable per keyframe."""
        return kf.seq

    def _query_index(self, query_vec: np.ndarray, candidates: List[KeyFrame]) -> dict:
        """Score candidates through the inverted file, indexing any keyframe
        vectors not yet added (each keyframe is indexed once)."""
        from lv_slam_tpu.graph.bow import InvertedIndex

        if self._index is None:
            self._index = InvertedIndex(self.vocabulary.n_words)
        for c in candidates:
            key = self._kf_key(c)
            if c.descriptor is not None and key not in self._indexed:
                self._index.add(key, self._bow_vector(c))
                self._indexed.add(key)
        return self._index.query(
            query_vec, subset={self._kf_key(c) for c in candidates}
        )

    # -- verification --------------------------------------------------------
    def verify(self, candidates: List[KeyFrame], scores, new_kf: KeyFrame) -> Optional[Loop]:
        """Batched verification: all candidates share the new keyframe's maps,
        so each resolution of the coarse-to-fine ladder (and the final fitness
        pass) runs as ONE vmapped device call over the padded candidate batch
        (the reference verifies serially with early exit; we verify all)."""
        if not candidates:
            return None
        c = self.cfg
        k_cap = c.candidates_cap
        candidates = candidates[:k_cap]
        scores = scores[:k_cap]
        k = len(candidates)
        target_maps = {r: self._builds[r](new_kf.cloud) for r in self._resolutions}

        est_new = new_kf.estimate if new_kf.estimate is not None else new_kf.odom
        guesses = []
        for cand in candidates:
            est_cand = cand.estimate if cand.estimate is not None else cand.odom
            g = np.linalg.inv(est_new) @ est_cand
            g[2, 3] = 0.0  # z forced flat (loop_detector.hpp:251)
            guesses.append(g.astype(np.float32))
        # pad the batch to the static cap with repeats (masked out below)
        while len(guesses) < k_cap:
            guesses.append(guesses[0])
        cand_pad = candidates + [candidates[0]] * (k_cap - k)
        xyz = jnp.stack([cd.cloud.xyz for cd in cand_pad])
        inten = jnp.stack([cd.cloud.intensity for cd in cand_pad])
        mask = jnp.stack([cd.cloud.mask for cd in cand_pad])
        transforms = jnp.asarray(np.stack(guesses))
        for r in self._resolutions:
            transforms = self._batch_align(r)(target_maps[r], xyz, inten, mask, transforms)
        fits = self._batch_fitness(new_kf.cloud, xyz, inten, mask, transforms)
        rels = np.asarray(transforms, np.float64)
        fits = np.asarray(fits)

        best = None
        for idx in range(k):
            rel, fit, guess = rels[idx], float(fits[idx]), guesses[idx].astype(np.float64)
            # guess-consistency gate (LoopDetectorConfig.max_guess_correction_*)
            corr = np.linalg.inv(guess) @ rel
            corr_t = np.linalg.norm(corr[:3, 3])
            corr_r = np.arccos(np.clip((np.trace(corr[:3, :3]) - 1.0) / 2.0, -1.0, 1.0))
            if corr_t > c.max_guess_correction_trans or corr_r > c.max_guess_correction_rot:
                continue
            if fit <= c.fitness_score_thresh and (best is None or fit < best.fitness):
                best = Loop(
                    key1=new_kf, key2=candidates[idx], relative_pose=rel,
                    fitness=fit, visual_score=scores[idx],
                )
        if best is not None:
            self.last_edge_accum_distance = new_kf.accum_distance
        return best

    def _batch_align(self, resolution: float):
        return _batched_align_fn(resolution, self.cfg.ndt_neighborhood)

    def _batch_fitness(self, target_cloud, xyz, inten, mask, transforms):
        return _batched_fitness_fn()(target_cloud, xyz, inten, mask, transforms)

    def detect(self, keyframes: Sequence[KeyFrame], new_keyframes: Sequence[KeyFrame]) -> List[Loop]:
        self.maybe_train_vocabulary(list(keyframes) + list(new_keyframes))
        loops = []
        for new_kf in new_keyframes:
            candidates = self.find_candidates(keyframes, new_kf)
            ranked, scores = self.rank_candidates(candidates, new_kf)
            loop = self.verify(ranked, scores, new_kf)
            if loop is not None:
                loops.append(loop)
        return loops

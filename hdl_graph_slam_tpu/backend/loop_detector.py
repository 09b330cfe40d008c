"""Loop-closure detection with *batched* candidate registration.

Equivalent of hdl_graph_slam::LoopDetector (include/hdl_graph_slam/
loop_detector.hpp:31-184): candidate gating by accumulated-distance
difference, XY distance between current estimates, and distance since the
last accepted loop edge; then scan matching of each candidate against the
new keyframe with a z-flattened initial guess; acceptance iff the best
fitness beats fitness_score_thresh.

TPU redesign of the hot part: where the reference aligns candidates
sequentially (loop_detector.hpp:135-154, one kd-tree alignment at a time),
all K gated candidates are stacked and aligned in a single vmapped GICP
program — one compiled kernel, K alignments in parallel on the chip.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cloud import PointCloud
from ..core.config import LoopDetectorConfig
from ..ops import knn
from ..registration import gicp
from ..registration.factory import Registration
from .keyframe import KeyFrame


@dataclasses.dataclass
class Loop:
    key1: KeyFrame  # new keyframe (loop end)
    key2: KeyFrame  # matched past keyframe (loop start)
    relative_pose: np.ndarray  # key1^-1 * key2 (align result, cand -> new)


class LoopDetector:
    def __init__(self, cfg: Optional[LoopDetectorConfig] = None):
        self.cfg = cfg or LoopDetectorConfig()
        self.last_edge_accum_distance = 0.0
        self._use_batched_gicp = "GICP" in self.cfg.registration.registration_method.upper() and "VGICP" not in self.cfg.registration.registration_method.upper()
        self._registration = Registration(self.cfg.registration)
        self._batched_align = None  # compiled lazily

    # -- candidate gating (loop_detector.hpp:81-109) -------------------------

    def find_candidates(self, keyframes: Sequence[KeyFrame], new_keyframe: KeyFrame, estimates: np.ndarray) -> List[int]:
        cfg = self.cfg
        if new_keyframe.accum_distance - self.last_edge_accum_distance < cfg.min_edge_interval:
            return []
        out = []
        dists = []
        new_pos = estimates[new_keyframe.node_id][:2, 3]
        for i, k in enumerate(keyframes):
            if new_keyframe.accum_distance - k.accum_distance < cfg.accum_distance_thresh:
                continue
            pos = estimates[k.node_id][:2, 3]
            d = np.linalg.norm(pos - new_pos)
            if d > cfg.distance_thresh:
                continue
            out.append(i)
            dists.append(d)
        # bound the batched alignment width: keep the closest candidates
        # (the reference aligns every gated candidate sequentially; capping
        # at max_candidates keeps device memory bounded and in practice the
        # nearest candidates are the ones that win the fitness race)
        if len(out) > cfg.max_candidates:
            order = np.argsort(dists)[: cfg.max_candidates]
            out = [out[j] for j in order]
        return out

    # -- matching ------------------------------------------------------------

    def detect(
        self,
        keyframes: Sequence[KeyFrame],
        new_keyframes: Sequence[KeyFrame],
        estimates: np.ndarray,
    ) -> List[Loop]:
        """estimates: (num_nodes, 4, 4) current optimized pose estimates."""
        loops = []
        for nk in new_keyframes:
            cand_idx = self.find_candidates(keyframes, nk, estimates)
            loop = self._match(keyframes, cand_idx, nk, estimates)
            if loop is not None:
                loops.append(loop)
        return loops

    def _match(
        self,
        keyframes: Sequence[KeyFrame],
        cand_idx: List[int],
        new_keyframe: KeyFrame,
        estimates: np.ndarray,
    ) -> Optional[Loop]:
        cfg = self.cfg
        if not cand_idx:
            return None
        # z-flattened init guesses (loop_detector.hpp:139-146)
        new_est = estimates[new_keyframe.node_id]
        guesses = []
        for i in cand_idx:
            guess = np.linalg.inv(new_est) @ estimates[keyframes[i].node_id]
            guess[2, 3] = 0.0
            guesses.append(guess)

        if self._use_batched_gicp:
            scores, transforms, convergeds = self._match_batched_gicp(
                [keyframes[i].cloud for i in cand_idx], new_keyframe.cloud, guesses
            )
        else:
            scores, transforms, convergeds = self._match_sequential(
                [keyframes[i].cloud for i in cand_idx], new_keyframe.cloud, guesses
            )

        best_score = np.inf
        best: Optional[int] = None
        for j in range(len(cand_idx)):
            if not convergeds[j] or scores[j] > best_score:
                continue
            best_score = scores[j]
            best = j

        if best is None or best_score > cfg.fitness_score_thresh:
            return None

        self.last_edge_accum_distance = new_keyframe.accum_distance
        return Loop(
            key1=new_keyframe,
            key2=keyframes[cand_idx[best]],
            relative_pose=np.asarray(transforms[best], dtype=np.float64),
        )

    def _match_sequential(self, sources, target, guesses):
        reg = self._registration
        reg.set_target(target)
        scores, transforms, convs = [], [], []
        for src, guess in zip(sources, guesses):
            res = reg.align(src, guess=jnp.asarray(guess, src.xyz.dtype))
            scores.append(reg.get_fitness_score(self.cfg.fitness_score_max_range))
            transforms.append(np.asarray(res.transformation))
            convs.append(bool(res.converged))
        return scores, transforms, convs

    def _match_batched_gicp(self, sources: List[PointCloud], target: PointCloud, guesses):
        """Stack candidates and run one vmapped GICP align + fitness pass.

        The batch is padded to max_candidates (first candidate repeated,
        results discarded) so the compiled program has one static shape."""
        c = self.cfg.registration
        tgt_state = gicp.preprocess(target, k=c.reg_correspondence_randomness)

        n_real = len(sources)
        # pad to the next power of two (bounded recompile variants, bounded
        # wasted alignment work)
        pad_to = 1
        while pad_to < n_real:
            pad_to *= 2
        sources = list(sources) + [sources[0]] * (pad_to - n_real)
        guesses = list(guesses) + [guesses[0]] * (pad_to - n_real)

        cap = max(s.capacity for s in sources)
        xyz = np.full((len(sources), cap, 3), 1.0e6, dtype=np.float32)
        mask = np.zeros((len(sources), cap), dtype=bool)
        for j, s in enumerate(sources):
            xyz[j, : s.capacity] = np.asarray(s.xyz)
            mask[j, : s.capacity] = np.asarray(s.mask)
        xyz_j = jnp.asarray(xyz)
        mask_j = jnp.asarray(mask)
        guesses_j = jnp.asarray(np.stack(guesses), dtype=xyz_j.dtype)

        srcs = jax.vmap(lambda x, m: gicp.preprocess(PointCloud(xyz=x, mask=m), k=c.reg_correspondence_randomness))(
            xyz_j, mask_j
        )

        def one(src, guess):
            res = gicp.align(
                tgt_state,
                src,
                guess,
                max_corr_dist=c.reg_max_correspondence_distance,
                transformation_epsilon=c.reg_transformation_epsilon,
                max_iterations=c.reg_maximum_iterations,
                reassoc_displacement=c.reg_reassoc_displacement,
            )
            score = knn.fitness_score(
                jnp.where(tgt_state.mask[:, None], tgt_state.xyz, 1.0e6),
                src.xyz,
                src.mask,
                res.transformation,
                max_range=self.cfg.fitness_score_max_range,
            )
            return res.transformation, res.converged, score

        transforms, convs, scores = jax.vmap(one)(srcs, guesses_j)
        return (
            list(np.asarray(scores))[:n_real],
            list(np.asarray(transforms))[:n_real],
            list(np.asarray(convs))[:n_real],
        )

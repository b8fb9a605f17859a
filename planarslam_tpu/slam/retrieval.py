"""Keyframe retrieval database (place recognition).

Replaces the reference's DBoW2 vocabulary tree + inverted file
(`src/KeyFrameDatabase.cc:33-311`, vocabulary loaded from the external
ORBvoc.txt at `src/System.cc:44`). Each keyframe is summarized by an LSH
word histogram: a visual word is `vocab_bits` fixed bit positions sampled
from the 256-bit ORB descriptor, the signature is the tf-normalized word
histogram, and candidate retrieval is one matmul of signatures — no
vocabulary file, fully deterministic, and batched.

Provides both query families of the reference database:
  - `loop_candidates`   (DetectLoopCandidates `:76`)
  - `reloc_candidates`  (DetectRelocalizationCandidates)
"""

from __future__ import annotations

from typing import List

import numpy as np

from planarslam_tpu.config import SystemConfig


class KeyFrameDatabase:
    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        rng = np.random.default_rng(2024)
        self.bit_positions = rng.choice(256, size=cfg.loop.vocab_bits,
                                        replace=False)

    def sketch(self, descs: np.ndarray, valid: np.ndarray) -> np.ndarray:
        """(K, 8) uint32 packed descriptors -> (2^bits,) tf signature."""
        words = np.zeros(len(descs), np.int64)
        for i, b in enumerate(self.bit_positions):
            word_idx, bit_idx = divmod(int(b), 32)
            bit = (descs[:, word_idx] >> np.uint32(bit_idx)) & np.uint32(1)
            words |= bit.astype(np.int64) << i
        sig = np.bincount(words[valid],
                          minlength=1 << self.cfg.loop.vocab_bits)
        sig = sig.astype(np.float32)
        return sig / max(np.linalg.norm(sig), 1e-9)

    def add(self, slam_map, kf: int) -> None:
        slam_map.kf_bow[kf] = self.sketch(slam_map.kf_desc[kf],
                                          slam_map.kf_feat_valid[kf])

    def _scores(self, slam_map, sig: np.ndarray) -> np.ndarray:
        s = slam_map.kf_bow[:slam_map.n_kf] @ sig
        s[~slam_map.kf_valid[:slam_map.n_kf]] = -1.0
        return s

    def loop_candidates(self, slam_map, kf: int, max_out: int = 3
                        ) -> List[int]:
        """Similar KFs outside kf's covisible neighborhood, scoring above
        the worst covisible score (reference minScore gating,
        `src/LoopClosing.cc:121-138`)."""
        sims = self._scores(slam_map, slam_map.kf_bow[kf])
        covis = set(int(c) for c in slam_map.covisible_kfs(kf, min_weight=1))
        recent = set(range(max(0, kf - self.cfg.loop.min_kf_gap), kf + 1))
        excluded = covis | recent
        covis_scores = [sims[c] for c in covis
                        if c != kf and slam_map.kf_valid[c]]
        min_score = min(covis_scores) if covis_scores else 0.3
        return [int(i) for i in np.argsort(-sims)
                if i not in excluded and sims[i] > max(min_score, 0.4)
                ][:max_out]

    def reloc_candidates(self, slam_map, descs: np.ndarray,
                         valid: np.ndarray, max_out: int = 5) -> List[int]:
        """Best-matching KFs for a lost frame."""
        sims = self._scores(slam_map, self.sketch(descs, valid))
        order = np.argsort(-sims)
        return [int(i) for i in order[:max_out] if sims[i] > 0.2]

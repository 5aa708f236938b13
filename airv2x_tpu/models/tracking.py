"""Tracking: appearance-embedding head (device) + Hungarian tracker (host).

Twin of task_heads/tracking_head.py:8-119. The embedding head pools BEV
features per detection and projects to a normalized embedding; association
across frames is host-side Hungarian matching (scipy linear_sum_assignment)
on cosine similarity, with track aging — control flow that belongs on the
host, outside the jitted step.
"""

from __future__ import annotations

import itertools
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment


class TrackingHead(nn.Module):
    """(H, W, C) BEV features + (N, 5+) boxes -> (N, D) unit embeddings.

    The reference pools the whole BEV map per box (its roi_pooling
    placeholder); kept for behavioural parity.
    """

    embed_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bev_features, boxes):
        n = boxes.shape[0]
        pooled = jnp.mean(bev_features, axis=(0, 1))  # (C,)
        pooled = jnp.broadcast_to(pooled, (n, pooled.shape[0]))
        x = nn.relu(nn.Dense(256, dtype=self.dtype)(pooled))
        x = nn.Dense(self.embed_dim, dtype=self.dtype)(x)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)


class Tracker:
    """Host-side track manager (Hungarian association, aging)."""

    def __init__(self, sim_threshold: float = 0.5, max_age: int = 5):
        self.tracks: list[dict] = []
        self._ids = itertools.count()
        self.sim_threshold = sim_threshold
        self.max_age = max_age

    def update(self, boxes: np.ndarray, embeddings: np.ndarray) -> list[int]:
        """boxes (N, *), embeddings (N, D) -> per-detection track ids."""
        n = len(boxes)
        matches, unmatched = self._associate(embeddings)

        det_tid: dict[int, int] = {}
        new_tracks = []
        matched_track_idx = {t for _, t in matches}

        for det_idx, track_idx in matches:
            tr = self.tracks[track_idx]
            tr.update(embedding=embeddings[det_idx], box=boxes[det_idx], age=0)
            new_tracks.append(tr)
            det_tid[det_idx] = tr["id"]

        for idx in unmatched:
            tr = {
                "id": next(self._ids),
                "embedding": embeddings[idx],
                "box": boxes[idx],
                "age": 0,
            }
            new_tracks.append(tr)
            det_tid[idx] = tr["id"]

        for i, tr in enumerate(self.tracks):
            if i not in matched_track_idx:
                tr["age"] += 1
                if tr["age"] <= self.max_age:
                    new_tracks.append(tr)

        self.tracks = new_tracks
        return [det_tid[i] for i in range(n)]

    def _associate(self, embeddings: np.ndarray):
        if not self.tracks or len(embeddings) == 0:
            return [], list(range(len(embeddings)))
        track_embeds = np.stack([t["embedding"] for t in self.tracks])
        sim = embeddings @ track_embeds.T  # (N, M)
        rows, cols = linear_sum_assignment(1.0 - sim)
        matches, unmatched = [], set(range(len(embeddings)))
        for r, c in zip(rows, cols):
            if sim[r, c] > self.sim_threshold:
                matches.append((int(r), int(c)))
                unmatched.discard(int(r))
        return matches, sorted(unmatched)

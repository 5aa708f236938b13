"""Real-data training loader: dataset -> augment -> labels -> prefetch.

The TPU-side replacement for the reference's torch DataLoader plumbing
(tools/train.py:54-102: DistributedSampler + BatchSampler + worker pool +
collate_batch_train). Assembles fixed-shape batches from
:class:`~airv2x_tpu.data.airv2x_dataset.AirV2XDataset` samples:

  * world-level augmentation applied jointly to every agent's (ego-frame)
    cloud and the gt boxes (data_utils/augmentor/data_augmentor.py — the
    reference only augments early fusion; here it is config-driven and the
    intermediate-fusion configs simply ship an empty/ignored queue when
    ``proj_first`` is false);
  * anchor-target generation on device in one vmapped program (the Cython
    ``bbox_overlaps`` + generate_label_airv2x path,
    voxel_postprocessor.py:217-355);
  * epoch shuffling + per-host sharding (DistributedSampler semantics) and
    background prefetch threads so device steps overlap host IO.
"""

from __future__ import annotations

import numpy as np

from airv2x_tpu.data.augment import DataAugmentor
from airv2x_tpu.data.prefetch import Prefetcher


class RealDataLoader:
    """Batches of (batch dict incl. ``labels``) from an on-disk dataset."""

    def __init__(
        self,
        dataset,
        hypes: dict,
        batch_size: int,
        train: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        host_id: int = 0,
        num_hosts: int = 1,
        drop_last: bool = True,
    ):
        from airv2x_tpu.ops.anchors import (
            anchor_standup_boxes,
            generate_anchor_grid,
        )

        self.dataset = dataset
        self.hypes = hypes
        self.batch_size = batch_size
        self.train = train
        self.seed = seed
        self.num_workers = num_workers
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.drop_last = drop_last

        self.anchors = generate_anchor_grid(hypes["postprocess"]["anchor_args"])
        self.standup = anchor_standup_boxes(self.anchors)
        self.target_args = hypes["postprocess"]["target_args"]
        self.augmentor = DataAugmentor(
            hypes.get("data_augment", []) if train else [], train=train
        )
        # the reference skips world augmentation for intermediate fusion
        # (hypes comment "data augmentation is not used for intermediate
        # fusion"); apply only when explicitly opted in
        self.augment_enabled = bool(
            hypes.get("train_params", {}).get("augment", False)
        )
        task = hypes.get("task", hypes["model"]["args"].get("task", "det"))
        self.is_seg = task == "seg"

    def __len__(self):
        """Batches per epoch for this host (matches what batches() yields)."""
        n = -(-len(self.dataset) // self.num_hosts)  # padded equal shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    # ---------- assembly ----------

    def _sample(self, idx: int, epoch: int):
        batch, gt = self.dataset.__getitem__(idx, epoch=epoch)
        if self.train and self.augment_enabled:
            rng = np.random.default_rng((self.seed, epoch, idx, 7))
            pts, boxes = self.augmentor(
                batch["points"][..., :], gt["boxes"], rng
            )
            batch = dict(batch, points=pts.astype(np.float32))
            gt = dict(gt, boxes=boxes.astype(np.float32))
        return batch, gt

    def _collate(self, samples):
        """Stack samples and attach anchor (+seg) labels."""
        import jax
        import jax.numpy as jnp

        from airv2x_tpu.ops.anchors import assign_targets

        batches = [s[0] for s in samples]
        gts = [s[1] for s in samples]
        seg_keys = ("dynamic_seg_label", "static_seg_label")
        batch = {}
        # only keys every sample carries can be stacked; optional blocks
        # (cam_* when some sample's camera files are missing on disk) are
        # dropped for the whole batch rather than crashing mid-epoch
        common = set(batches[0])
        for b in batches[1:]:
            common &= set(b)
        dropped = set(batches[0]) - common
        if dropped - set(seg_keys):
            import logging

            logging.getLogger(__name__).warning(
                "collate: dropping keys missing in some samples: %s",
                sorted(dropped - set(seg_keys)),
            )
        for k in sorted(common):
            if k in seg_keys:
                continue
            if isinstance(batches[0][k], dict):
                batch[k] = {
                    kk: np.stack([b[k][kk] for b in batches])
                    for kk in batches[0][k]
                }
            else:
                batch[k] = np.stack([b[k] for b in batches])
        gt = {k: np.stack([g[k] for g in gts]) for k in gts[0]}

        tgt = jax.vmap(
            lambda bb, mm, cc: assign_targets(
                bb,
                mm,
                cc,
                jnp.asarray(self.anchors),
                jnp.asarray(self.standup),
                pos_threshold=self.target_args["pos_threshold"],
                neg_threshold=self.target_args["neg_threshold"],
            )
        )(
            jnp.asarray(gt["boxes"]),
            jnp.asarray(gt["mask"]),
            jnp.asarray(gt["classes"]),
        )
        batch["labels"] = {
            "pos_equal_one": np.asarray(tgt.pos_equal_one),
            "neg_equal_one": np.asarray(tgt.neg_equal_one),
            "targets": np.asarray(tgt.targets),
            "class_ids": np.asarray(tgt.cls_labels),
        }
        if self.is_seg:
            for k in seg_keys:
                if all(k in b for b in batches):
                    batch["labels"][k] = np.stack(
                        [b[k] for b in batches]
                    ).astype(np.int32)
        return batch, gt

    # ---------- iteration ----------

    def epoch_indices(self, epoch: int):
        """Shuffled (train) per-host index shard for one epoch.

        Shards are padded (cyclic repetition) to equal length like torch's
        DistributedSampler: the jitted train step contains cross-host
        collectives, so every host MUST run the same number of steps or
        multi-host training deadlocks on the last batches of an epoch.
        """
        n = len(self.dataset)
        order = (
            np.random.default_rng((self.seed, epoch)).permutation(n)
            if self.train
            else np.arange(n)
        )
        per_host = -(-n // self.num_hosts)  # ceil
        if per_host * self.num_hosts != n:
            pad = np.resize(order, per_host * self.num_hosts)
            order = pad
        return order[self.host_id :: self.num_hosts].tolist()

    def batches(self, epoch: int = 0, with_gt: bool = False):
        """Yield collated batches with background prefetch workers."""
        idxs = self.epoch_indices(epoch)
        nb = len(idxs) // self.batch_size if self.drop_last else -(
            -len(idxs) // self.batch_size
        )
        groups = [
            idxs[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        groups = [g for g in groups if g]

        def make(group):
            samples = [self._sample(i, epoch) for i in group]
            return self._collate(samples)

        pf = Prefetcher(
            make,
            groups,
            num_workers=self.num_workers,
            buffer_size=max(2, self.num_workers),
        )
        for batch, gt in pf:
            yield (batch, gt) if with_gt else batch

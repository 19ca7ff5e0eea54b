"""Synthetic data for smoke runs / benches (no dataset on disk).

Deterministic class-conditional Gaussian images: class c has a fixed mean
pattern, so models can actually *learn* on synthetic data (loss decreases),
which makes end-to-end training verifiable without CIFAR/ImageNet.
"""

from __future__ import annotations

import numpy as np


class SyntheticIterator:
    def __init__(self, *, image_size: int = 32, num_classes: int = 100,
                 batch_size: int = 64, num_batches: int = 10, seed: int = 0,
                 channels: int = 3):
        self.image_size = image_size
        self.num_classes = num_classes
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.seed = seed
        self.channels = channels
        g = np.random.default_rng(1234)
        # fixed low-res class signatures, upsampled
        self._proto = g.normal(0, 1, (num_classes, 4, 4, channels)).astype(np.float32)

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        s = self.image_size
        for _ in range(self.num_batches):
            labels = rng.integers(0, self.num_classes, self.batch_size)
            proto = self._proto[labels]
            proto = np.repeat(np.repeat(proto, s // 4, axis=1), s // 4, axis=2)
            noise = rng.normal(0, 1, proto.shape).astype(np.float32)
            yield (0.7 * proto + noise).astype(np.float32), labels.astype(np.int32)

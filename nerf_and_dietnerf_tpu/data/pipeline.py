"""Training ray pipeline: precomputed global ray table + keyed permutation.

The reference streams rays through a tf.data graph with a 2M-element shuffle
buffer (``src/UtilsNeuralRadianceField.py:135-162``). The TPU-native design
precomputes **all** rays of the training split once (a few hundred MB at the
largest stock configs — trivially host-resident), then draws a fresh global
permutation per epoch from an explicit PRNG key. This is:

- exactly shuffled (the reference's buffer is only approximately uniform),
- reproducible and host-shardable (each host takes a deterministic slice of
  the permutation → multi-host data parallelism without communication),
- zero per-step host compute: batches are contiguous gathers.

Epoch size matches the reference: ``(n_images * h * w) // batch`` steps
(``src/UtilsNeuralRadianceField.py:237-247``), remainder rays dropped.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_and_dietnerf_tpu.core import cameras


def build_ray_table(
    images: np.ndarray, c2w_matrices: np.ndarray, field_of_view: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten every training pixel into (origin, direction, rgb) rows.

    Ray math runs through the same jitted :mod:`core.cameras` code the model
    uses (no separate host reimplementation to drift).

    :return: ``(origins (N,4), directions (N,4), rgb (N,3))`` float32, where
        ``N = n_images * h * w``.
    """
    n, h, w = images.shape[:3]

    @jax.jit
    def one_image(c2w):
        return cameras.rays_for_image(h, w, field_of_view, c2w)

    origins, dirs = jax.vmap(one_image)(jnp.asarray(c2w_matrices, jnp.float32))
    origins = np.asarray(origins, np.float32).reshape(-1, 4)
    dirs = np.asarray(dirs, np.float32).reshape(-1, 4)
    rgb = np.ascontiguousarray(images.reshape(-1, 3), dtype=np.float32)
    return origins, dirs, rgb


class RayDataset:
    """Globally-permuted ray batches with per-host sharding.

    :param process_index / process_count: this host's slice of each global
        batch (contiguous split — combined with a replicated permutation this
        is the standard multi-host input sharding; every host computes the
        same permutation from the same key, takes rows
        ``[rank * per_host, (rank+1) * per_host)`` of every batch).
    """

    def __init__(
        self,
        images: np.ndarray,
        c2w_matrices: np.ndarray,
        field_of_view: float,
        batch_size: int,
        process_index: int = 0,
        process_count: int = 1,
    ):
        if batch_size % process_count:
            raise ValueError("batch_size must divide evenly across hosts")
        self.origins, self.directions, self.rgb = build_ray_table(
            images, c2w_matrices, field_of_view
        )
        self.batch_size = batch_size
        self.per_host = batch_size // process_count
        self.process_index = process_index
        self.n_rays = self.rgb.shape[0]
        self.batches_per_epoch = self.n_rays // batch_size

    def epoch(self, key) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield this host's slice of each batch for one epoch.

        :param key: PRNG key; the permutation is a pure function of it, so all
            hosts agree without communicating.
        """
        perm = np.asarray(jax.random.permutation(key, self.n_rays))
        lo = self.process_index * self.per_host
        hi = lo + self.per_host
        for b in range(self.batches_per_epoch):
            idx = perm[b * self.batch_size : (b + 1) * self.batch_size][lo:hi]
            yield self.origins[idx], self.directions[idx], self.rgb[idx]

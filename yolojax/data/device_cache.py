"""Device-resident dataset cache: batch assembly moves on-device.

When the decoded dataset fits in accelerator memory (canvases are uint8 —
600 images at 672 squared are ~0.8 GB against 16 GB of v5e HBM), the
per-step host-to-device batch transfer can be eliminated entirely: upload
every canvas and padded label array ONCE, replicated over the mesh, and
assemble each training batch on-device with a row gather driven by
host-sampled indices.  A step then ships a few dozen bytes of indices
instead of tens of MB of pixels, and the fused augment+train executable is
unchanged — the gathered batch carries the same batch sharding the loader
path feeds (parallel/mesh.py batch_sharding).

Why it matters: on weak-host or remote-device setups the wire is the train
bottleneck (the axon tunnel moves 11-83 MB/s; a 16x512 squared uint8 batch
is 12.6 MB — over a second of wire per ~0.1 s device step, DEVNOTES.md),
and even on a healthy host this removes the PCIe copy and the loader
threads from the hot loop.  The reference keeps its dataset on the host and
pays a .cuda() copy every batch (SURVEY.md §2.4); a TPU-native loop can do
strictly better whenever the working set fits.

Enable with ``[data] device_dataset = 1`` (off by default — real VOC/COCO
do not fit; the synthetic gate workspaces do).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import batch_sharding, replicated_sharding

__all__ = ["DeviceDataset"]

# exactly the pytree the fused train step's batch argument expects
# (parallel/mesh.py make_train_step) — extra keys would change the treedef
# and miss the prewarmed executable
KEYS = ("canvas", "hw", "yx_min", "yx_max", "cls", "valid")


def _put_replicated(v: np.ndarray, sharding, chunk_bytes: int = 64 << 20):
    """Upload host rows in bounded chunks, concatenated on-device.

    A single near-GB transfer is one giant message on remote-device
    transports (the axon tunnel); chunking keeps each put modest and fails
    fast if the wire drops.  Peak device memory is 2x the array while the
    concatenate runs, released immediately after.
    """
    if v.nbytes <= chunk_bytes:
        return jax.device_put(v, sharding)
    rows = max(1, int(chunk_bytes // max(1, v[0].nbytes)))
    parts = [jax.device_put(v[i:i + rows], sharding)
             for i in range(0, len(v), rows)]
    out = jax.jit(lambda *ps: jnp.concatenate(ps, axis=0),
                  out_shardings=sharding)(*parts)
    out.block_until_ready()
    return out


class DeviceDataset:
    """Whole-dataset device arrays + jitted on-device batch gather.

    Iterating yields ready-to-train device batch dicts forever, with the
    Loader's epoch semantics (seed-synchronized permutation, drop-last).
    Multi-host: every process samples the identical GLOBAL index sequence
    (the rng is seeded, not time-dependent), and the gather's output
    sharding splits the global batch over the pod mesh — so no per-process
    shard bookkeeping is needed at all.
    """

    def __init__(self, dataset, mesh, batch_size: int, *, seed: int = 0,
                 shuffle: bool = True):
        n = len(dataset)
        if n == 0:
            raise ValueError("device dataset: empty dataset")
        host = {k: [] for k in KEYS}
        for i in range(n):
            item = dataset.load(i)
            for k in KEYS:
                host[k].append(item[k])
        stacked = {k: np.stack(v) for k, v in host.items()}

        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        if jax.process_count() == 1:
            self.arrays = {k: _put_replicated(v, repl)
                           for k, v in stacked.items()}
        else:
            # multi-process meshes cannot ingest host numpy via device_put;
            # every process holds the identical full copy, so a replicated
            # global array is assembled from any single shard callback
            self.arrays = {
                k: jax.make_array_from_callback(
                    v.shape, repl, lambda idx, v=v: v[idx])
                for k, v in stacked.items()}
        nbytes = sum(v.nbytes for v in stacked.values())
        del stacked, host

        self.n = n
        self.global_batch = batch_size * jax.process_count()
        self.nbytes = nbytes
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

        def gather(arrays, idx):
            # row gather of whole canvases: an HBM slab copy, not the
            # per-element gathers DEVNOTES flags as poison
            return {k: jnp.take(v, idx, axis=0, mode="clip")
                    for k, v in arrays.items()}

        self._gather = jax.jit(
            gather,
            in_shardings=({k: repl for k in KEYS}, repl),
            out_shardings={k: data for k in KEYS})

    def gather(self, indices: np.ndarray):
        """Assemble one batch on-device from global indices."""
        return self._gather(self.arrays, np.asarray(indices, np.int32))

    def _epochs(self):
        b = self.global_batch
        while True:
            order = np.arange(self.n)
            if self.shuffle:
                self.rng.shuffle(order)
            for i in range(0, len(order) - b + 1, b):
                yield order[i:i + b]

    def __iter__(self):
        for idx in self._epochs():
            yield self.gather(idx)

"""Darknet ``.weights`` import/export (SURVEY.md §2.16, call stack §3.5).

File format (as consumed by the reference's ``convert_darknet_torch.py``
(recon) and darknet itself):

* header: int32 ``major, minor, revision`` then ``seen`` — uint32 when
  ``major*10 + minor < 2``, uint64 otherwise;
* per conv layer, in cfg order: with BN — ``beta[n] gamma[n] mean[n] var[n]``
  then conv weights; without BN — ``bias[n]`` then conv weights; conv weights
  are float32 in OIHW order.

Differences from a torch import, by design:

* weights land in HWIO (TPU conv layout) — transpose of the stored OIHW;
* the final head conv's **output channels are permuted at import time**: the
  darknet region layer reads per-anchor fields ``[tx, ty, tw, th, to, cls…]``
  while this framework's decode contract is yx-order ``[ty, tx, th, tw, to,
  cls…]`` (SURVEY.md's "yx order everywhere" convention).  Baking the swap
  into the weights keeps decode branch-free.  The permutation is an
  involution, so export applies the same one.

The reader asserts the file is consumed exactly to EOF — the reference's
implicit byte-count parity check (SURVEY.md §4).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

__all__ = ["load_weights", "save_weights", "head_permutation"]

_HEADER_VERSION = (0, 2, 0)


def head_permutation(num_anchors: int, num_classes: int) -> np.ndarray:
    """Output-channel permutation mapping darknet xy/wh field order to yx.

    For each anchor block of size 5+C: [1, 0, 3, 2, 4, 5, …] — swap (tx,ty)
    and (tw,th). Involution: the same permutation converts both directions.
    """
    per = 5 + num_classes
    block = np.arange(per)
    block[[0, 1, 2, 3]] = [1, 0, 3, 2]
    return np.concatenate([a * per + block for a in range(num_anchors)])


class _Reader:
    def __init__(self, path: str):
        self.buf = np.fromfile(path, dtype=np.uint8)
        self.pos = 0
        self.size = self.buf.size

    def take(self, count: int, dtype) -> np.ndarray:
        nbytes = count * np.dtype(dtype).itemsize
        if self.pos + nbytes > self.size:
            raise ValueError(
                f"darknet weights truncated: need {nbytes} bytes at offset "
                f"{self.pos}, file has {self.size}")
        out = self.buf[self.pos:self.pos + nbytes].view(dtype)
        self.pos += nbytes
        return out.copy()


def load_weights(path: str, model, reinit_head_on_mismatch: bool = False,
                 head_rng_seed: int = 0):
    """Read a darknet ``.weights`` file into (params, state) for ``model``.

    Layer order follows ``model.layer_defs`` (plan order == cfg order).
    Returns (params, state, seen) — ``seen`` feeds the loss warmup schedule.

    ``reinit_head_on_mismatch`` enables the reference's finetune behavior
    (SURVEY.md §2.13): when the file's final conv was trained for a different
    class count, its bytes are consumed and discarded and the model keeps a
    freshly-initialized head.
    """
    r = _Reader(os.path.expanduser(path))
    major, minor, _rev = (int(v) for v in r.take(3, np.int32))
    seen = int(r.take(1, np.uint64 if major * 10 + minor >= 2 else np.uint32)[0])

    params, state = {}, {}
    defs = model.layer_defs
    perm = head_permutation(len(model.anchors), model.num_classes)
    for d in defs:
        n = d.out_ch
        if d is defs[-1] and reinit_head_on_mismatch and not d.bn:
            expected = n * 4 + n * (d.in_ch // d.groups) * d.ksize * d.ksize * 4
            remaining = r.size - r.pos
            if remaining != expected:
                # head trained for a different class count: validate the
                # remainder parses as bias+weights of SOME channel count,
                # discard it, and keep the fresh init for this layer
                per_out = (1 + (d.in_ch // d.groups) * d.ksize * d.ksize) * 4
                if remaining % per_out:
                    raise ValueError(
                        f"darknet head mismatch: {remaining} trailing bytes "
                        f"do not parse as a {d.ksize}x{d.ksize} conv over "
                        f"{d.in_ch} inputs")
                r.take(remaining // 4, np.float32)
                import jax

                from ..models.blocks import conv_init

                p, _ = conv_init(jax.random.PRNGKey(head_rng_seed),
                                 d.in_ch, n, d.ksize, use_bn=False)
                params[d.name] = p
                continue
        p: dict = {}
        if d.bn:
            p["beta"] = jnp.asarray(r.take(n, np.float32))
            p["gamma"] = jnp.asarray(r.take(n, np.float32))
            state[d.name] = {
                "mean": jnp.asarray(r.take(n, np.float32)),
                "var": jnp.asarray(r.take(n, np.float32)),
            }
        else:
            p["b"] = jnp.asarray(r.take(n, np.float32))
        w = r.take(n * (d.in_ch // d.groups) * d.ksize * d.ksize, np.float32)
        w = w.reshape(n, d.in_ch // d.groups, d.ksize, d.ksize).transpose(2, 3, 1, 0)
        p["w"] = jnp.asarray(w)
        # head conv: bake the xy→yx field swap into the weights.  Guarded on
        # the channel count so non-detection files (e.g. a darknet19
        # classification-pretrained trunk) import unchanged.
        if d is defs[-1] and n == perm.size:
            p["w"] = p["w"][..., perm]
            if "b" in p:
                p["b"] = p["b"][perm]
        params[d.name] = p

    if r.pos != r.size:
        raise ValueError(
            f"darknet weights not fully consumed: {r.size - r.pos} bytes left "
            f"(model/file layer mismatch?)")
    return params, state, seen


def save_weights(path: str, model, params, state, seen: int = 0):
    """Write (params, state) back to darknet ``.weights`` format."""
    chunks = [np.asarray(_HEADER_VERSION, np.int32).view(np.uint8)]
    major, minor, _ = _HEADER_VERSION
    seen_dtype = np.uint64 if major * 10 + minor >= 2 else np.uint32
    chunks.append(np.asarray([seen], seen_dtype).view(np.uint8))

    defs = model.layer_defs
    perm = head_permutation(len(model.anchors), model.num_classes)
    for d in defs:
        p = dict(params[d.name])
        if d is defs[-1] and d.out_ch == perm.size:
            p["w"] = np.asarray(p["w"])[..., perm]
            if "b" in p:
                p["b"] = np.asarray(p["b"])[perm]
        if d.bn:
            s = state[d.name]
            for arr in (p["beta"], p["gamma"], s["mean"], s["var"]):
                chunks.append(np.asarray(arr, np.float32).view(np.uint8))
        else:
            chunks.append(np.asarray(p["b"], np.float32).view(np.uint8))
        w = np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1)  # HWIO→OIHW
        chunks.append(np.ascontiguousarray(w).reshape(-1).view(np.uint8))
    np.concatenate(chunks).tofile(os.path.expanduser(path))

"""Data-parallel sharded overlap-detection device step.

The per-read ``kt_for`` fan-out of the reference (ecovlp.cpp:6078) becomes
batch sharding over a device mesh: window-alignment problems are sharded on
the batch axis, each chip runs the banded Myers scan on its shard, and
per-step statistics (aligned windows, total errors — the ``b->cnt[]``
aggregation of Assembly.cpp:1111) are combined with a ``psum`` over ICI.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hifiasm_tpu.ops.banded_align_jax import _banded_jax


def make_sharded_align_step(mesh: Mesh, e: int, traceback: bool = True):
    """Returns a jitted step: (x, xlen, y, ylen) sharded by batch ->
    (err, y_start, y_end, tb, ins_cnt, ins_base, stats) with stats summed
    across the mesh."""
    batch = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(batch, batch, batch, batch),
        out_shardings=(batch, batch, batch, batch, batch, batch, repl))
    def step(x, xlen, y, ylen):
        err, ys, yn, tb, ic, ib = _banded_jax(x, xlen, y, ylen, e, traceback)
        ok = err >= 0
        stats = jnp.stack([ok.sum().astype(jnp.int32),
                           jnp.where(ok, err, 0).sum().astype(jnp.int32)])
        return err, ys, yn, tb, ic, ib, stats

    return step


def make_sharded_chain_step(mesh: Mesh, max_anchors: int):
    """Jitted data-parallel chain-scoring step over padded anchor groups:
    each problem is one (query,target,strand) anchor run (self_off, t_off,
    span, weight padded to max_anchors); returns best chain score + end
    index per problem (the device half of lchain_qdp, Hash_Table.cpp:1841).
    """
    batch = NamedSharding(mesh, P("data"))

    @functools.partial(
        jax.jit,
        in_shardings=(batch,) * 7,
        out_shardings=(batch, batch))
    def step(self_off, t_off, span, weight, n, xl, yl):
        from hifiasm_tpu.ops.chain_jax import chain_scores_batch
        f, pre = chain_scores_batch(self_off, t_off, span, weight, n, xl, yl)
        best = jnp.argmax(f, axis=1).astype(jnp.int32)
        return jnp.take_along_axis(f, best[:, None], axis=1)[:, 0], best

    return step

"""Multi-device assembly == single-device assembly, byte-identical GFA.

The conftest pins jax to 8 virtual CPU devices, so mesh_devices=0 (auto)
runs the device-EC path SPMD over an 8-way mesh with the bucket-sharded
anchor gather (parallel/ec_shard.py), while mesh_devices=1 pins the
single-device path.  Both must produce identical outputs (reruns are
byte-identical by contract — CLAUDE.md hard rules)."""

import os

import numpy as np
import jax

from hifiasm_tpu.assemble import assemble
from hifiasm_tpu.config import HifiasmConfig
from hifiasm_tpu.io.readstore import ReadStore
from tests.synth import make_genome, sample_reads


def _mk_store(rng):
    g = make_genome(rng, 12000)
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=1800,
                               err_rate=0.004)
    return ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                 reads)


def _run(rng, tmp_path, tag, mesh_devices):
    store = _mk_store(rng)
    pfx = str(tmp_path / tag)
    cfg = HifiasmConfig(output_prefix=pfx, n_rounds_ec=1, ignore_bin=True,
                        align_engine="jax", mesh_devices=mesh_devices)
    assemble(store, cfg)
    return pfx


def test_mesh_assembly_matches_single_device(tmp_path):
    assert len(jax.devices()) >= 2, "conftest should provide 8 cpu devices"
    p1 = _run(np.random.default_rng(11), tmp_path, "one", mesh_devices=1)
    pn = _run(np.random.default_rng(11), tmp_path, "all", mesh_devices=0)
    compared = 0
    for suffix in ("bp.p_ctg.gfa", "bp.r_utg.gfa", "bp.p_utg.gfa",
                   "p_ctg.fa"):
        f1, fn = f"{p1}.{suffix}", f"{pn}.{suffix}"
        assert os.path.exists(f1) and os.path.exists(fn), suffix
        with open(f1, "rb") as a, open(fn, "rb") as b:
            assert a.read() == b.read(), f"{suffix} differs"
        compared += 1
    assert compared == 4

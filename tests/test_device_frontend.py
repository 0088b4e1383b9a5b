"""Device-frontend assembly == host assembly, byte-identical GFA.

With align_engine="jax" and mesh_devices=1 the EC pipeline routes the
index front end (sketch + position table + anchor gather) through the
HBM-resident device path (ops/sketch_jax.py + index/pos_table_jax.py)
instead of the host numpy/native path.  The reference keeps this index
in ha_pt_t (htab.cpp:1232-1287) and queries it with ha_pt_get
(htab.cpp:518); our contract is byte-identical outputs either way."""

import os

import numpy as np

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


def _run(tmp_path, tag, engine):
    store = _mk_store(np.random.default_rng(11))
    pfx = str(tmp_path / tag)
    cfg = HifiasmConfig(output_prefix=pfx, n_rounds_ec=1, ignore_bin=True,
                        align_engine=engine, mesh_devices=1)
    assemble(store, cfg)
    return pfx

def test_device_frontend_assembly_matches_host(tmp_path):
    ph = _run(tmp_path, "host", "native")
    pd = _run(tmp_path, "devfe", "jax")
    compared = 0
    for suffix in ("bp.p_ctg.gfa", "bp.r_utg.gfa", "bp.p_utg.gfa",
                   "p_ctg.fa"):
        fh, fd = f"{ph}.{suffix}", f"{pd}.{suffix}"
        assert os.path.exists(fh) and os.path.exists(fd), suffix
        with open(fh, "rb") as a, open(fd, "rb") as b:
            assert a.read() == b.read(), f"{suffix} differs"
        compared += 1
    assert compared == 4


def test_device_frontend_falls_back_when_disabled(tmp_path):
    """device_frontend=False on the device path must still assemble (host
    index + device EC) and stay byte-identical."""
    store = _mk_store(np.random.default_rng(11))
    pfx = str(tmp_path / "nofe")
    cfg = HifiasmConfig(output_prefix=pfx, n_rounds_ec=1, ignore_bin=True,
                        align_engine="jax", mesh_devices=1,
                        device_frontend=False)
    assemble(store, cfg)
    ph = _run(tmp_path, "host2", "native")
    with open(f"{pfx}.bp.p_ctg.gfa", "rb") as a, \
            open(f"{ph}.bp.p_ctg.gfa", "rb") as b:
        assert a.read() == b.read()


def test_device_frontend_repeat_heavy(tmp_path):
    """Repeat-rich diploid-ish genome: multi-copy chains + quota/dedup
    must survive the device-resident chain path byte-identically."""
    rng = np.random.default_rng(7)
    g = make_genome(rng, 16000, repeat_frac=0.3)
    reads, _, _ = sample_reads(rng, g, depth=14, read_len=2200,
                               err_rate=0.004)
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)

    outs = {}
    for tag, eng in (("h", "native"), ("d", "jax")):
        store2 = ReadStore.from_arrays(
            store.names, [store.get_codes(i)
                          for i in range(store.n_reads)])
        pfx = str(tmp_path / tag)
        cfg = HifiasmConfig(output_prefix=pfx, n_rounds_ec=1,
                            ignore_bin=True, align_engine=eng,
                            mesh_devices=1)
        assemble(store2, cfg)
        outs[tag] = pfx
    for suffix in ("bp.p_ctg.gfa", "bp.r_utg.gfa"):
        with open(f"{outs['h']}.{suffix}", "rb") as a, \
                open(f"{outs['d']}.{suffix}", "rb") as b:
            assert a.read() == b.read(), f"{suffix} differs"


def test_plan_windows_many_matches_per_read(rng):
    """Vectorized chunk planning == per-read plan_read_windows."""
    from hifiasm_tpu.ec.pipeline import _chain_all_reads
    from hifiasm_tpu.ec.window_align import (
        plan_read_windows, plan_windows_many,
    )
    from hifiasm_tpu.config import HifiasmConfig
    from hifiasm_tpu.io.readstore import ReadStore
    from hifiasm_tpu.index.pos_table import build_position_table
    from tests.synth import make_genome, sample_reads

    g = make_genome(rng, 30000)
    reads, _, _ = sample_reads(rng, g, depth=9, read_len=3000,
                               err_rate=0.003)
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig()
    pt, hom, _, mzs = build_position_table(reads, cfg.k, cfg.w)
    codes = [store.get_codes(i) for i in range(store.n_reads)]
    read_ovs = _chain_all_reads(store, codes, mzs, pt, cfg,
                                hom if hom > 0 else 9)
    many = plan_windows_many(read_ovs, cfg.ec_window, cfg.max_ov_diff_ec)
    for rr, ov in read_ovs:
        one = plan_read_windows(ov, cfg.ec_window, cfg.max_ov_diff_ec,
                                with_tws=False)
        for k in ("ov_idx", "ws", "wlen", "thre", "last"):
            np.testing.assert_array_equal(many[rr][k], one[k], f"{rr}:{k}")

"""Device-resident EC vs the host CSR path: identical semantics."""

import numpy as np

from hifiasm_tpu.config import HifiasmConfig
from hifiasm_tpu.ec.pipeline import ec_round, final_overlap_pass
from hifiasm_tpu.io.readstore import ReadStore
from tests.synth import make_genome, sample_reads


def _mk_store(rng):
    g = make_genome(rng, 8000)
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=1800,
                               err_rate=0.004)
    return ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                 reads)


def test_device_matches_host_round(rng):
    s_host = _mk_store(rng)
    s_dev = ReadStore.from_arrays(
        s_host.names, [s_host.get_codes(i) for i in range(s_host.n_reads)])
    cfg_h = HifiasmConfig(align_engine="numpy")
    cfg_d = HifiasmConfig(align_engine="jax")
    rh = ec_round(s_host, cfg_h, None, 0)
    rd = ec_round(s_dev, cfg_d, None, 0)
    assert rh[2] > 0, "no corrections at all"
    # identical corrected sequences
    n_diff = sum(
        not np.array_equal(s_host.get_codes(i), s_dev.get_codes(i))
        for i in range(s_host.n_reads))
    assert n_diff == 0, f"{n_diff} reads differ between host/device EC"
    assert rh[2] == rd[2]


def test_device_matches_host_final(rng):
    s = _mk_store(rng)
    cfg_h = HifiasmConfig(align_engine="numpy")
    cfg_d = HifiasmConfig(align_engine="jax")
    res_h = final_overlap_pass(s, cfg_h, None)
    res_d = final_overlap_pass(s, cfg_d, None)
    assert res_h.paf.total == res_d.paf.total
    assert res_h.reverse_paf.total == res_d.reverse_paf.total
    for rid in range(s.n_reads):
        a, b = res_h.paf[rid], res_d.paf[rid]
        np.testing.assert_array_equal(a.tn, b.tn)
        np.testing.assert_array_equal(a.qs, b.qs)
        np.testing.assert_array_equal(a.qe, b.qe)
        np.testing.assert_array_equal(a.ts, b.ts)
        np.testing.assert_array_equal(a.te, b.te)
        np.testing.assert_array_equal(a.ml, b.ml)


def test_device_read_batching_identical(rng, monkeypatch):
    """Bounded-HBM read batching (vote planes sized per batch) must not
    change any output: forcing tiny batches == one-shot processing."""
    import hifiasm_tpu.ec.device_ec as D

    s1 = _mk_store(rng)
    s2 = ReadStore.from_arrays(
        s1.names, [s1.get_codes(i) for i in range(s1.n_reads)])
    cfg = HifiasmConfig(align_engine="jax")
    r1 = ec_round(s1, cfg, None, 0)

    orig = D.DeviceEC._process_batch

    def tiny_process(self, read_ovs):
        return orig(self, read_ovs)

    monkeypatch.setattr(
        D.DeviceEC, "process",
        lambda self, read_ovs, plans=None:
        _merge_batches(self, read_ovs, orig, 7, plans))
    r2 = ec_round(s2, cfg, None, 0)
    assert r1[2] == r2[2]
    for i in range(s1.n_reads):
        np.testing.assert_array_equal(s1.get_codes(i), s2.get_codes(i))


def _merge_batches(dev, read_ovs, orig, rows, plans=None):
    outs, cns = {}, {}
    for b0 in range(0, len(read_ovs), rows):
        o, c = orig(dev, read_ovs[b0:b0 + rows], plans)
        outs.update(o)
        cns.update(c)
    return outs, cns


def test_route_windows_slot_invariants():
    """Owner-routed slot layout: every window lands exactly once, in a
    slot owned by its read-row's device, in stable within-device order;
    unroute is the exact inverse."""
    import jax
    from hifiasm_tpu.ec.device_ec import DeviceEC
    from hifiasm_tpu.io.readstore import ReadStore

    rng = np.random.default_rng(11)
    reads = [rng.integers(0, 4, 500).astype(np.uint8) for _ in range(8)]
    store = ReadStore.from_arrays([f"r{i}" for i in range(8)], reads)
    from hifiasm_tpu.parallel.mesh import make_mesh
    dev = DeviceEC(store, mesh=make_mesh(8))
    nd = dev.n_dev
    Rp = 256
    rb = Rp // nd
    q_row = rng.integers(0, 200, 3000).astype(np.int32)
    wmap, C, rb_got = dev._route_windows(q_row, Rp)
    assert rb_got == rb
    sel = wmap >= 0
    # exactly once
    assert sorted(wmap[sel].tolist()) == list(range(3000))
    # slot ownership matches the row's device
    pc = dev.chunk // nd
    slots = np.flatnonzero(sel)
    dev_of_slot = (slots % dev.chunk) // pc
    assert np.array_equal(dev_of_slot,
                          np.minimum(q_row[wmap[sel]] // rb, nd - 1))
    # stable order within each device
    for d in range(nd):
        wd = wmap[slots[dev_of_slot == d]]
        assert np.all(np.diff(wd) > 0)
    # unroute inverts
    flat = np.zeros(C * dev.chunk, np.int64)
    flat[sel] = wmap[sel] * 7 + 1
    back = dev._unroute(flat, wmap, 3000)
    assert np.array_equal(back, np.arange(3000) * 7 + 1)

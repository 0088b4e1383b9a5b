#!/usr/bin/env python
"""Scale harness: synthetic genome -> full assembly, wall + contiguity.

Usage: python scripts/scale_assembly.py [LENGTH] [--diploid] [--tpu]
       [--ul] [--hic]   (UL ONT reads / Hi-C PE library through the
       full integration paths, per-stage walls in the [M::] log)
(CPU-forced unless --tpu; see ROADMAP.md environment notes.  --tpu
forces the device-EC path regardless of input size and reports the
per-stage walls so the device/host split is visible.)
"""
import os
import sys
import time

USE_TPU = "--tpu" in sys.argv
if not USE_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

if not USE_TPU:
    jax.config.update("jax_platforms", "cpu")

from tests.synth import make_genome, sample_reads          # noqa: E402
from hifiasm_tpu.io.readstore import ReadStore             # noqa: E402
from hifiasm_tpu.assemble import assemble                  # noqa: E402
from hifiasm_tpu.config import HifiasmConfig               # noqa: E402


def _write_fa(path, reads):
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">u{i}\n{nt[r].tobytes().decode()}\n")


def _gen_ul(rng, genomes, depth=0.5):
    """Long ONT-like reads (60-120 kb, 2% homopolymer-dominated error)."""
    from tests.synth import inject_errors_hifi
    out = []
    for g in genomes:
        total = int(depth * len(g))
        acc = 0
        while acc < total:
            rl = int(rng.integers(60_000, min(120_000, len(g) - 1)))
            s = int(rng.integers(0, len(g) - rl))
            seg = g[s:s + rl].copy()
            if rng.integers(0, 2):
                seg = (3 - seg[::-1]) & 3
            out.append(inject_errors_hifi(rng, seg, 0.02))
            acc += rl
    return out


def _gen_hic(rng, genomes, n_pairs):
    """Intra-haplotype PE pairs, log-distributed insert, 1% error."""
    r1, r2 = [], []
    for _ in range(n_pairs):
        g = genomes[int(rng.integers(0, len(genomes)))]
        a = int(rng.integers(0, len(g) - 200))
        ins = int(min(np.exp(rng.normal(10.0, 1.2)), len(g) - a - 160))
        b = min(a + max(ins, 300), len(g) - 160)
        for lst, s in ((r1, a), (r2, b)):
            seg = g[s:s + 150].copy()
            m = rng.random(150) < 0.01
            seg[m] = (seg[m] + rng.integers(1, 4, int(m.sum()))) % 4
            lst.append(seg)
    return r1, r2


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    diploid = "--diploid" in sys.argv
    rng = np.random.default_rng(11)
    # deterministic store cache: the single-threaded synthetic data gen
    # costs ~45 min at 10 Gb — reruns at the same (L, ploidy) reuse it
    cache = f"/tmp/scale_store_{L}_{int(diploid)}"
    from hifiasm_tpu.io.binfiles import load_reads, write_reads
    store = None
    if os.path.exists(cache + ".npz"):
        try:
            store = load_reads(cache + ".npz")
            print(f"reads={store.n_reads} bases={store.total_bases} "
                  f"(cached)", flush=True)
        except Exception:
            store = None
    if store is None:
        if diploid:
            h1, h2 = make_genome(rng, L, het_rate=0.001)
            r1, _, _ = sample_reads(rng, h1, 11, 15000, 0.003)
            r2, _, _ = sample_reads(rng, h2, 11, 15000, 0.003)
            reads = r1 + r2
        else:
            g = make_genome(rng, L)
            reads, _, _ = sample_reads(rng, g, 12, 15000, 0.003)
        print(f"reads={len(reads)} bases={sum(len(r) for r in reads)}",
              flush=True)
        store = ReadStore.from_arrays(
            [f"r{i}" for i in range(len(reads))], reads)
        del reads
        try:
            write_reads(cache + ".npz", store)
        except Exception:
            pass
    from hifiasm_tpu.native import set_threads
    set_threads(os.cpu_count())          # -t equivalent for the harness
    cfg = HifiasmConfig(output_prefix="/tmp/scale_asm", n_rounds_ec=1,
                        ignore_bin=True, threads=os.cpu_count())
    if USE_TPU:
        cfg.align_engine = "jax"     # force the device-EC path
    genomes = [h1, h2] if diploid else [g]
    write_outputs = False
    if "--ul" in sys.argv:
        ul = _gen_ul(rng, genomes)
        _write_fa("/tmp/scale_ul.fa", ul)
        cfg.ul_reads = ["/tmp/scale_ul.fa"]
        print(f"UL: {len(ul)} reads, "
              f"{sum(len(r) for r in ul)} bases", flush=True)
    if "--hic" in sys.argv:
        n_pairs = max(sum(len(r) for r in reads) // 3000, 1000)
        hr1, hr2 = _gen_hic(rng, genomes, n_pairs)
        _write_fa("/tmp/scale_hic1.fa", hr1)
        _write_fa("/tmp/scale_hic2.fa", hr2)
        cfg.hic_reads_1 = ["/tmp/scale_hic1.fa"]
        cfg.hic_reads_2 = ["/tmp/scale_hic2.fa"]
        write_outputs = True          # Hi-C phasing runs in the writers
        print(f"Hi-C: {n_pairs} PE pairs", flush=True)
    t0 = time.time()
    res = assemble(store, cfg, write_outputs=write_outputs)
    dt = time.time() - t0
    lens = [u.len for u in res.ug.utgs]
    print(f"WALL {dt:.1f}s  contigs={len(lens)} "
          f"top={sorted(lens)[::-1][:5]} total={sum(lens)}")
    if diploid and res.purge:
        prim = [lens[i] for i in res.purge.primary]
        alt = [lens[i] for i in res.purge.alternate]
        print(f"primary {sum(prim)} in {len(prim)}; "
              f"alternate {sum(alt)} in {len(alt)}")


if __name__ == "__main__":
    main()

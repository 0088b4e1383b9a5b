#!/usr/bin/env python
"""Scale harness: synthetic genome -> full assembly, wall + contiguity.

Usage: python scripts/scale_assembly.py [LENGTH] [--diploid] [--tpu]
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


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    diploid = "--diploid" in sys.argv
    rng = np.random.default_rng(11)
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
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  reads)
    cfg = HifiasmConfig(output_prefix="/tmp/scale_asm", n_rounds_ec=1,
                        ignore_bin=True)
    if USE_TPU:
        cfg.align_engine = "jax"     # force the device-EC path
    t0 = time.time()
    res = assemble(store, cfg, write_outputs=False)
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

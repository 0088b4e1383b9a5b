import os, cProfile, pstats, io, time
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import sys
sys.argv = ["x"]
from bench import _gen_data
from hifiasm_tpu.assemble import assemble
from hifiasm_tpu.config import HifiasmConfig
from hifiasm_tpu.io.readstore import ReadStore

reads = _gen_data()
store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))], reads)
cfg = HifiasmConfig(n_rounds_ec=1, align_engine="jax")
t0=time.time()
pr = cProfile.Profile(); pr.enable()
assemble(store, cfg, write_outputs=False)
pr.disable()
print("TOTAL", time.time()-t0)
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(28)
print("\n".join(l for l in s.getvalue().splitlines() if "hifiasm" in l or "ncalls" in l or "jax" in l.lower())[:4000])

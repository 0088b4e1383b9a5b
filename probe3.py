import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from hifiasm_tpu.ops.banded_align_jax import banded_batch_jax
rng = np.random.default_rng(0)
e, XL, B = 15, 127, 256
YL = XL + 2*e
y = rng.integers(0,4,(B,YL)).astype(np.uint8)
x = y[:, e:e+XL].copy()
t=time.time(); r = banded_batch_jax(x, np.full(B,XL), y, np.full(B,YL), e); print(f"c1 {time.time()-t:.1f}s")

from hifiasm_tpu.io.fastx import iter_fastx  # noqa: F401
from hifiasm_tpu.io.readstore import ReadStore, hpc_compress  # noqa: F401

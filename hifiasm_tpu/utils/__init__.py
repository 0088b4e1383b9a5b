from hifiasm_tpu.utils.logging import log, phase_timer  # noqa: F401

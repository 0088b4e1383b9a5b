"""`python -m hifiasm_tpu` == the `hifiasm-tpu` console script."""
import sys

from hifiasm_tpu.cli import main

sys.exit(main())

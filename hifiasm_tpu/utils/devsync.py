"""Pipelined device->host transfers.

Through the dev-environment device link every BLOCKING np.asarray pays a
full dispatch+sync round trip (~0.5-1.4 s measured), so N sequential
fetches cost N round trips even when the arrays are tiny.  Starting
every copy with ``copy_to_host_async`` first lets the transfers overlap;
the blocking materialization pass then pays ~one round trip total.
"""

from __future__ import annotations

from typing import Iterable, List

import numpy as np


def fetch_all(arrays: Iterable) -> List[np.ndarray]:
    """Materialize device arrays on the host with overlapped transfers."""
    arrs = list(arrays)
    for a in arrs:
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass
    return [np.asarray(a) for a in arrs]


def prefetch(arrays: Iterable) -> None:
    """Start device->host copies without blocking (fetch later)."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass

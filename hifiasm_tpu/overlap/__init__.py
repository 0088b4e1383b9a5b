from hifiasm_tpu.overlap.anchors import (  # noqa: F401
    Anchors, OverlapRegions, collect_anchors, chain_anchors,
    filter_overlaps_quota,
)

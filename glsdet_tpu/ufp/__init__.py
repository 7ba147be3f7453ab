from glsdet_tpu.ufp.packing import (
    Region,
    foreground_regions,
    pack_regions,
    strip_pack,
    unified_foreground_packing,
)
from glsdet_tpu.ufp.assembly import (assemble_mosaic, assemble_mosaic_fast,
                                     unmap_chip_detections,
                                      unmap_chip_detections_argmax)

__all__ = [
    "Region",
    "foreground_regions",
    "pack_regions",
    "strip_pack",
    "unified_foreground_packing",
    "assemble_mosaic",
    "assemble_mosaic_fast",
    "unmap_chip_detections",
    "unmap_chip_detections_argmax",
]

"""Fixed-shape label assignment (ATSS, SimOTA) for XLA:TPU."""

from glsdet_tpu.assign.atss import AssignResult, atss_assign
from glsdet_tpu.assign.sim_ota import OTAResult, sim_ota_assign

__all__ = ["AssignResult", "atss_assign", "OTAResult", "sim_ota_assign"]
